from .nmf import nmf
from .lnmf import lnmf
from .seminmf import seminmf
from .convexnmf import convexnmf
from .chnmf import chnmf
from .cnmf import cnmf

__all__ = ["nmf", "lnmf", "seminmf", "convexnmf", "chnmf", "cnmf"]
