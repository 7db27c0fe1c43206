"""Shape-robust sharding: zero-pad to mesh multiples, mask, slice back.

NamedSharding requires every sharded dimension to divide by its mesh-axis
size; production shapes (spectrogram frames, corpus sizes, data-dependent
hull sizes) almost never do.  The framework therefore pads V and the
factor inits with zeros up to the next mesh multiple at the placement
boundary, runs the padded problem, and slices the factors back.

Zero padding composes exactly with the multiplicative-update algebra:

* zero-initialized factor pads are fixed points of every MU rule (the
  update is X .* ratio, and the padded rows/columns of every numerator
  are zero because V's pads are zero);
* all Gram-form quantities (V H', W'V, H H', W'W, the Gram-form costs)
  receive exactly-zero contributions from the pad region, so the padded
  trajectory is BIT-COMPATIBLE with the unpadded one wherever the math is
  linear in V;
* the nonlinear elementwise fields (KL/IS/AB ratios and costs: 0/0, the
  Hoyer projection's per-vector lengths, the convolutive shift spill into
  the pad region) are masked at the few places they occur — see
  ops/divergence.py `mask=`, ops/shift.py `n_valid=`,
  ops/projection.py `valid=`.

Each solver passes its static true sizes through its spec so the masks
compile to constants and fuse into the surrounding elementwise work
(zero extra HBM traffic).
"""
from __future__ import annotations

import jax.numpy as jnp

from .mesh import FEATURE_AXIS, SAMPLE_AXIS


def mesh_multiples(mesh) -> tuple[int, int]:
    """(feature multiple, sample multiple) the mesh demands; (1, 1) for
    no mesh."""
    if mesh is None:
        return 1, 1
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return sizes.get(FEATURE_AXIS, 1), sizes.get(SAMPLE_AXIS, 1)


def pad_amount(size: int, mult: int) -> int:
    return (-size) % mult


def pad_axes(arr, pads: dict):
    """Zero-pad ``arr`` at the end of the given axes ({axis: amount})."""
    if not any(pads.values()):
        return arr
    widths = [(0, int(pads.get(d, 0))) for d in range(arr.ndim)]
    return jnp.pad(arr, widths)


def plan_padding(mesh, m: int, n: int):
    """Return (pad_m, pad_n, valid) where ``valid`` is (m, n) when any
    padding is needed and None otherwise (the no-mask fast path)."""
    mmul, nmul = mesh_multiples(mesh)
    pm, pn = pad_amount(m, mmul), pad_amount(n, nmul)
    return pm, pn, ((m, n) if (pm or pn) else None)


def prepare_weights(weights, dtype, shape, mesh, solver: str,
                    pad_m: int, pad_n: int, valid):
    """Validate/cast/zero-pad/shard a per-entry weight matrix like V.

    One shared path for every solver that accepts ``weights=`` (nmf,
    cnmf, constrainednmf): the weight matrix must match V's (m, n), pads
    with ZEROS under a mesh (pad entries contribute nothing to the
    weighted objective), and takes V's placement.  Returns None for None.
    """
    if weights is None:
        return None
    import jax.numpy as jnp
    from .mesh import apply_placements
    weights = jnp.asarray(weights, dtype)
    if weights.shape != tuple(shape):
        raise ValueError(f"weights has shape {weights.shape}, "
                         f"expected {tuple(shape)}")
    # ADVICE r2: negative weights would be hard-zeroed in most gradient
    # fields (weights > 0 gate) but flow raw into the KL/AB ones-field
    # denominators, flipping update signs — reject uniformly instead of
    # letting the inconsistency break nonnegativity silently.  NaN weights
    # are rejected by the same comparison (NaN < 0 is False, so use any
    # finite-aware check).
    bad = jnp.any(weights < 0) | jnp.any(jnp.isnan(weights))
    if bool(bad):
        raise ValueError(
            "weights must be nonnegative and NaN-free; to down-weight or "
            "drop entries use 0, and to mask NaN DATA pass the NaN in V "
            "with weight 0 (see API.md 'weights')")
    if valid is not None:
        weights = pad_axes(weights, {0: pad_m, 1: pad_n})
    return apply_placements(mesh, solver, V=weights)
