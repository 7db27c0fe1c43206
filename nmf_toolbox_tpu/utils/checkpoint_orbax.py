"""Orbax checkpoint backend: sharded, async, multi-host persistence.

SURVEY.md section 5 plans "an orbax-style save of the factor pytree +
iteration/cost state" on top of the reference's checkpoint-friendly API
(every solver takes ``*_init`` kwargs — nmf.m:51-60, chnmf.m:18-28).
The npz backend (checkpoint.py) covers single-host runs but gathers
every factor into one host file: on a sharded multi-chip run that is a
full cross-device gather per checkpoint, and on multi-host only process
0 even holds the data it writes.  This backend removes both limits:

- **Per-shard writes.** Factors are saved as the ``jax.Array``s they
  are; orbax writes each shard from the device holding it, with no
  gather and no host staging of the full factor.
- **Sharded restore.** ``load_factors_orbax(..., mesh=, solver=)``
  rebuilds each factor directly INTO the solver's placement
  (``parallel.mesh.placements_for``), so a resumed run starts
  device-resident and correctly sharded without a host round-trip.
- **Async saves.** ``wait=False`` returns as soon as the on-device data
  is snapshotted; serialization overlaps the next solver chunk
  (``wait_for_saves`` joins before the next save of the same path).
- **Multi-host coordination.** Under ``jax.distributed`` every process
  calls the same save with the same path; orbax coordinates the commit
  (untestable on this rig — same status as parallel/mesh.init_distributed).

The on-disk layout is one directory per checkpoint:
``{factors: {W, H, ...}, aux: {n_iters, cost}, extra: {...}}`` with
multi-source factor lists stored natively as pytree lists.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from .checkpoint import _FACTOR_KEYS

_CHECKPOINTER = None
_PENDING: set = set()


def _checkpointer():
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        import orbax.checkpoint as ocp
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def wait_for_saves() -> None:
    """Block until every pending async save has committed."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()
    _PENDING.clear()


def save_factors_orbax(path, result_or_dict, extra: dict | None = None,
                       *, wait: bool = True) -> None:
    """Persist a Result's factors (and cost trace) to directory ``path``.

    Accepts the same inputs as checkpoint.save_factors.  jax.Arrays are
    saved as-is (sharded arrays write per-shard); with ``wait=False``
    the call returns once the device data is snapshotted and the write
    completes in the background.
    """
    obj = result_or_dict
    if hasattr(obj, "fields"):  # core.Result
        items = {f: getattr(obj, f) for f in obj.fields}
        aux = {"n_iters": np.asarray(obj.n_iters)}
    else:
        items = dict(obj)
        aux = {}
    factors = {}
    for name, val in items.items():
        if val is None:
            continue
        if name in _FACTOR_KEYS:
            factors[name] = list(val) if isinstance(val, (list, tuple)) \
                else val
        elif name == "cost":
            aux["cost"] = np.asarray(val)
    state = {"factors": factors, "aux": aux}
    if extra:
        # resume_state entries may be jax.Arrays; keep them as-is so
        # stepsize scalars ride the same per-shard path.
        state["extra"] = dict(extra)
    path = os.path.abspath(os.fspath(path))
    ck = _checkpointer()
    if path in _PENDING:  # a previous async save of this path may still
        wait_for_saves()  # be writing; orbax forbids overlapped writes
    ck.save(path, state, force=True)
    _PENDING.add(path)
    if wait:
        wait_for_saves()


def load_factors_orbax(path, as_inits: bool = True, *, mesh=None,
                       solver: str | None = None) -> dict:
    """Load an orbax checkpoint written by save_factors_orbax.

    With ``as_inits`` (default) factor arrays come back under their
    ``*_init`` kwarg names, ready to splat into a solver.  With
    ``mesh=`` and ``solver=`` each factor is restored directly into that
    solver's placement (parallel.mesh.placements_for) — sharded,
    device-resident, no host round-trip; factors without a placement
    entry (and all aux/extra entries) restore replicated.
    Without a mesh everything restores to host-backed arrays.
    """
    path = os.path.abspath(os.fspath(path))
    ck = _checkpointer()
    wait_for_saves()  # never read a half-written async checkpoint
    tree = ck.metadata(path).item_metadata.tree

    specs = {}
    axis_sizes = {}
    if mesh is not None:
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if solver is not None:
            from ..parallel.mesh import placements_for
            specs = placements_for(solver, mesh)

    def leaf(name, m):
        if mesh is None:
            return jax.ShapeDtypeStruct(m.shape, m.dtype)
        spec = specs.get(name, PartitionSpec())
        # A placement only applies if its rank matches (e.g. cnmf's W is
        # (m, k, T) but a checkpoint may hold a 2-D W from plain nmf)
        # AND every sharded dim divides: checkpoints hold factors
        # TRIMMED to their true sizes, so a non-divisible axis (the
        # pad/mask layer's case) restores replicated — the solver
        # re-pads and re-places it at entry (parallel/padding.py).
        # Tolerant lookup: a tuple-of-axes entry or an axis name absent
        # from the mesh (possible with a hand-written spec) also falls
        # back to replicated instead of raising.
        if len(spec) > len(m.shape):
            spec = PartitionSpec()
        for d, ax in enumerate(spec):
            if ax is None:
                continue
            size = axis_sizes.get(ax) if isinstance(ax, str) else None
            if size is None or m.shape[d] % size != 0:
                spec = PartitionSpec()
                break
        return jax.ShapeDtypeStruct(m.shape, m.dtype,
                                    sharding=NamedSharding(mesh, spec))

    abstract = {}
    for group, sub in tree.items():
        abstract[group] = {}
        for name, v in sub.items():
            pick = name if group == "factors" else None
            if isinstance(v, list):
                abstract[group][name] = [leaf(pick, x) for x in v]
            else:
                abstract[group][name] = leaf(pick, v)
    state = ck.restore(path, abstract)

    raw: dict = {}
    for name, val in state.get("factors", {}).items():
        raw[name] = val
    for name, val in state.get("aux", {}).items():
        raw[name] = np.asarray(val)  # host logic reads these
    for name, val in state.get("extra", {}).items():
        raw[f"extra__{name}"] = val
    if not as_inits:
        return raw
    return {f"{k}_init": raw[k] for k in _FACTOR_KEYS if k in raw}
