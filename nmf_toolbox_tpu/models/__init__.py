from .nmf import nmf
from .lnmf import lnmf
from .seminmf import seminmf
from .convexnmf import convexnmf
from .chnmf import chnmf
from .cnmf import cnmf
from .nmfsc import nmfsc
from .cnmfsc import cnmfsc
from .cmfwisa import cmfwisa
from .chcnmf import chcnmf
from .constrainednmf import constrainednmf
from .hals import nmf_hals
from .streaming import nmf_streaming, nmf_encode_streaming
from .nmf2d import nmf2d
from .symnmf import symnmf
from .batched import (nmf_batched, nmf_multiseed, nmf_encode, cnmf_encode,
                      cmfwisa_encode, nmf2d_encode)

__all__ = ["nmf", "lnmf", "seminmf", "convexnmf", "chnmf", "cnmf",
           "nmfsc", "cnmfsc", "cmfwisa", "chcnmf", "constrainednmf",
           "nmf_hals", "nmf_streaming", "nmf_encode_streaming", "nmf_batched", "nmf_multiseed", "nmf_encode", "cnmf_encode", "cmfwisa_encode", "nmf2d_encode", "nmf2d", "symnmf"]
