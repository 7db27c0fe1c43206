from .init import kmeans, kmeans_indicator_h, convex_hull_anchors, nndsvd
from .viz import sort_dictionary, view_dictionary
from .checkpoint import save_factors, load_factors, run_checkpointed
from .io import load_matrix, save_matrix

__all__ = ["kmeans", "kmeans_indicator_h", "convex_hull_anchors", "nndsvd",
           "sort_dictionary", "view_dictionary",
           "save_factors", "load_factors", "run_checkpointed",
           "load_matrix", "save_matrix"]
