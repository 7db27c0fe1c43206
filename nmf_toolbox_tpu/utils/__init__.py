from .init import kmeans, kmeans_indicator_h, convex_hull_anchors, nndsvd
from .viz import sort_dictionary, view_dictionary, view_consensus
from .checkpoint import save_factors, load_factors, run_checkpointed
from .checkpoint_orbax import (save_factors_orbax, load_factors_orbax,
                               wait_for_saves)
from .io import load_matrix, save_matrix
from .separation import wiener_masks, separate, separate_waveforms
from .audio import stft, istft, hann_window, magnitude, griffinlim

__all__ = ["kmeans", "kmeans_indicator_h", "convex_hull_anchors", "nndsvd",
           "sort_dictionary", "view_dictionary", "view_consensus",
           "save_factors", "load_factors", "run_checkpointed",
           "save_factors_orbax", "load_factors_orbax", "wait_for_saves",
           "load_matrix", "save_matrix", "wiener_masks", "separate",
           "separate_waveforms",
           "stft", "istft", "hann_window", "magnitude", "griffinlim"]
