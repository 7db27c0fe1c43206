"""Valid-region masks for mesh-padded problems (parallel/padding.py).

``valid`` is the static (m_valid, n_valid) of the true problem inside a
zero-padded (m, n) array, or None for the unpadded fast path.  The masks
are jit-time constants built from iota comparisons, so XLA fuses them
into the surrounding elementwise pipelines at zero HBM cost.
"""
from __future__ import annotations

import jax.numpy as jnp


def region_mask(shape, valid):
    """(m, n) bool mask of the valid region; None when ``valid`` is None."""
    if valid is None:
        return None
    m, n = shape[-2], shape[-1]
    mv, nv = valid
    rows = jnp.arange(m) < mv
    cols = jnp.arange(n) < nv
    return rows[:, None] & cols[None, :]


def col_mask(n: int, n_valid):
    """(n,) bool mask of the valid columns; None when ``n_valid`` is None."""
    if n_valid is None:
        return None
    return jnp.arange(n) < n_valid
