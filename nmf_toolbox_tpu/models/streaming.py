"""Out-of-core / streaming NMF — a beyond-the-reference extra.

The reference (and every in-memory solver here) requires V resident in
device memory.  For production corpora where n (samples) outgrows HBM,
``nmf_streaming`` factorizes V column-block by column-block with online
multiplicative updates (Lefèvre, Bach & Févotte 2011 flavor, euclidean):

    per block V_b:  H_b  <- a few MU encodings of V_b against current W
                    A    <- rho A + V_b H_b'      (k-rank sufficient stats)
                    B    <- rho B + H_b H_b'
                    W    <- W * (A / max(W B, eps)),  unit-L2 columns

Only (m, block) slices ever touch the device; the data source can be a
NumPy array, a memory-mapped .npy, or anything indexable with
``[:, a:b]``.  Sufficient statistics make the W update independent of n,
so one epoch streams V exactly once.  Returns (W, H?, cost-per-epoch):
H for the full matrix is optional (re-encoded in blocks at the end) since
it may not fit in memory either.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import common_scalars, Result, merge_config, resolve_dtype, uniform_init
from ..ops.normalize import unit_l2_columns
from ..parallel import mesh_multiples, pad_amount


class _Spec(NamedTuple):
    inner_iters: int
    eps: float


@functools.lru_cache(maxsize=None)
def _block_fns(spec: _Spec):
    eps_v = spec.eps

    @jax.jit
    def encode(Vb, W, Hb):
        """A few MU encodings of the block against a fixed basis."""
        eps = jnp.asarray(eps_v, Vb.dtype)
        WtV = W.T @ Vb
        WtW = W.T @ W

        def body(_, H):
            return H * (WtV / jnp.maximum(WtW @ H, eps))

        return jax.lax.fori_loop(0, spec.inner_iters, body, Hb)

    @jax.jit
    def stats(Vb, Hb):
        return Vb @ Hb.T, Hb @ Hb.T, jnp.sum(Vb * Vb)

    @jax.jit
    def update_w(W, A, B):
        eps = jnp.asarray(eps_v, W.dtype)
        Wn = W * (A / jnp.maximum(W @ B, eps))
        return unit_l2_columns(Wn)

    @jax.jit
    def block_cost(v_sq, Vb, W, Hb):
        WtV = W.T @ Vb
        WtW = W.T @ W
        c = 0.5 * (v_sq - 2.0 * jnp.sum(WtV * Hb)
                   + jnp.sum((WtW @ Hb) * Hb))
        return jnp.maximum(c, 0.0)

    return encode, stats, update_w, block_cost


def nmf_streaming(V, num_basis_elems: int, config: dict | None = None,
                  **kwargs):
    """Online euclidean NMF over column blocks of V.

    ``V``: array-like supporting ``V.shape`` and ``V[:, a:b]`` — e.g.
    ``np.load(path, mmap_mode='r')`` for out-of-core data.

    Parameters: block_size (4096 columns), epochs (via maxiter, default
    ~5 passes), inner_iters (3 MU encodings per block), forget (sufficient
    -statistics discount rho per block, default 1.0 = no forgetting),
    W_init, return_H (False: skip the final full-matrix encoding),
    tolerance (early stop on epoch-cost decrease), seed, dtype,
    mesh (shard each streamed block over the device mesh: W and the
    sufficient statistics follow the feature axis and stay replicated on
    a 1-D sample mesh; block columns shard over the sample axis — the
    out-of-core path composes with multi-chip; blocks are zero-padded to
    a uniform mesh multiple, which is exact for the MU algebra and also
    means ONE compiled program serves every block incl. the short tail).

    Returns Result as (W, H, cost) with cost = per-epoch objective
    (computed online from the streamed blocks) and H = None unless
    return_H.
    """
    cfg = merge_config(config, kwargs)
    # np.asarray on a memmap is a no-copy view, so this never materializes
    # the out-of-core source
    dtype = resolve_dtype(V, cfg.get("dtype"))
    m, n = V.shape
    k = int(num_basis_elems)
    maxiter, tolerance, eps, key = common_scalars(cfg)
    epochs = int(cfg.get("epochs", min(maxiter, 5)))
    block = int(cfg.get("block_size", 4096))
    inner = int(cfg.get("inner_iters", 3))
    rho = float(cfg.get("forget", 1.0))
    kw, kh = jax.random.split(key)

    mesh = cfg.get("mesh")
    mmul, nmul = mesh_multiples(mesh)
    pad_m = pad_amount(m, mmul)
    # every block ships at one uniform padded width (zero pad is exact;
    # one compiled program serves all blocks)
    blk_pad = block + pad_amount(block, nmul) if mesh is not None else block
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        m_ax = "m" if "m" in mesh.axis_names else None
        n_ax = "n" if "n" in mesh.axis_names else None
        sh_V = NamedSharding(mesh, P(m_ax, n_ax))
        sh_W = NamedSharding(mesh, P(m_ax, None))
        sh_H = NamedSharding(mesh, P(None, n_ax))
        sh_B = NamedSharding(mesh, P())

    def place(x, sh):
        return jax.device_put(x, sh) if mesh is not None else x

    def pad_block(arr, width, axis, row_pad=0):
        pads = [(0, 0)] * arr.ndim
        pads[axis] = (0, width - arr.shape[axis])
        if row_pad:
            pads[0] = (0, row_pad)
        return jnp.pad(jnp.asarray(arr), pads) if any(p != (0, 0) for p in pads) \
            else jnp.asarray(arr)

    W = cfg.get("W_init")
    if W is None:
        W = unit_l2_columns(uniform_init(kw, (m, k), dtype))
    W = place(pad_block(jnp.asarray(W, dtype), k, 1, row_pad=pad_m), sh_W) \
        if mesh is not None else jnp.asarray(W, dtype)

    encode, stats, update_w, block_cost = _block_fns(_Spec(inner, eps))

    starts = list(range(0, n, block))
    # Per-block encodings persist across epochs (warm starts); padded
    # columns start (and stay) exactly zero under the MU encodings.
    hkeys = jax.random.split(kh, len(starts))
    H_blocks = []
    for hk, a in zip(hkeys, starts):
        w_valid = min(block, n - a)
        Hb = uniform_init(hk, (k, w_valid), dtype)
        if mesh is not None:
            Hb = place(pad_block(Hb, blk_pad, 1), sh_H)
        H_blocks.append(Hb)

    A = place(jnp.zeros((m + pad_m, k), dtype), sh_W) if mesh is not None \
        else jnp.zeros((m, k), dtype)
    B = place(jnp.zeros((k, k), dtype), sh_B) if mesh is not None \
        else jnp.zeros((k, k), dtype)
    cost = []
    for epoch in range(epochs):
        total = 0.0
        for bi, a in enumerate(starts):
            b = min(a + block, n)
            Vb = jnp.asarray(np.asarray(V[:, a:b]), dtype)
            if mesh is not None:
                Vb = place(pad_block(Vb, blk_pad, 1, row_pad=pad_m), sh_V)
            Hb = encode(Vb, W, H_blocks[bi])
            H_blocks[bi] = Hb
            Ab, Bb, v_sq = stats(Vb, Hb)
            A = rho * A + Ab
            B = rho * B + Bb
            W = update_w(W, A, B)
            total += float(block_cost(v_sq, Vb, W, Hb))
        cost.append(total)
        if (epoch > 0 and cost[-1] < cost[-2]
                and cost[-2] - cost[-1] < tolerance):
            break

    def host_block(Hb, a):
        w_valid = min(block, n - a)
        return np.asarray(Hb)[:, :w_valid]

    H = None
    if cfg.get("return_H", False):
        parts = []
        for bi, a in enumerate(starts):
            Vb = jnp.asarray(np.asarray(V[:, a:min(a + block, n)]), dtype)
            if mesh is not None:
                Vb = place(pad_block(Vb, blk_pad, 1, row_pad=pad_m), sh_V)
            parts.append(host_block(encode(Vb, W, H_blocks[bi]), a))
        H = np.concatenate(parts, axis=1)
    return Result(fields=("W", "H", "cost"),
                  W=np.asarray(W)[:m], H=H, cost=np.asarray(cost),
                  n_iters=len(cost), converged=len(cost) < epochs)


def nmf_encode_streaming(V, W, config: dict | None = None, **kwargs):
    """EXACT out-of-core encoding of one wide matrix against a frozen
    dictionary — the streaming counterpart of ``nmf_encode``.

    With W fixed, every MU H update is COLUMN-LOCAL (the denominator
    fields of nmf.m:178-199 touch each column of H independently), so
    encoding column blocks separately reproduces the in-memory
    ``nmf(V, k, W_init=W, W_fixed=True)`` trajectory exactly — unlike
    streaming TRAINING (``nmf_streaming``), which is an online
    approximation.  Only (m, block) slices ever touch the device; V can
    be a memory-mapped .npy.

    Parameters: block_size (4096), divergence (full nmf family),
    alpha/beta, H_sparsity, H_init ((k, n) indexable, sliced per block;
    default per-block uniform from ``seed``), weights ((m, n) indexable,
    sliced per block), maxiter (100), seed, dtype, eps, out (optional
    (k, n) writable array — e.g. an np.memmap — H blocks are written in
    place and the Result carries ``H=out``).  Returns Result with
    W (m, k, normalized), H (k, n) (or the ``out`` array), and
    cost (maxiter,) — the per-iteration objective summed over blocks,
    equal to the in-memory trace up to summation order.
    """
    from .batched import nmf_encode

    cfg = merge_config(config, kwargs)
    block = int(cfg.pop("block_size", 4096) or 4096)
    out = cfg.pop("out", None)
    if cfg.get("mesh") is not None:
        raise ValueError("nmf_encode_streaming is the single-device "
                         "out-of-core path; use nmf_encode(mesh=) for "
                         "in-memory multi-chip encoding")
    m, n = V.shape
    dtype = resolve_dtype(np.asarray(V[:, :1]), cfg.get("dtype"))
    W = jnp.asarray(W, dtype)
    if W.ndim != 2 or W.shape[0] != m:
        raise ValueError(f"dictionary W must be (m, k) = ({m}, k); got "
                         f"{W.shape}")
    k = W.shape[1]
    W = unit_l2_columns(W)  # idempotent with nmf_encode's own entry norm
    H_init = cfg.pop("H_init", None)
    weights = cfg.pop("weights", None)
    maxiter, _, _, key = common_scalars(cfg)
    cfg.pop("tolerance", None)  # fixed-iteration engine, like nmf_encode

    if out is not None and np.shape(out) != (k, n):
        raise ValueError(f"out must be a writable (k, n) = {(k, n)} array; "
                         f"got {np.shape(out)}")
    parts = [] if out is None else None
    cost = np.zeros(maxiter, np.float64)
    starts = list(range(0, n, block))
    for bi, a in enumerate(starts):
        b = min(a + block, n)
        Vb = np.asarray(V[:, a:b])
        if H_init is not None:
            Hb0 = np.asarray(H_init[:, a:b])[None]
        else:
            Hb0 = np.asarray(uniform_init(
                jax.random.fold_in(key, bi), (1, k, b - a), dtype))
        bcfg = dict(cfg)
        bcfg.pop("maxiter", None)  # passed explicitly below
        if weights is not None:
            bcfg["weights"] = np.asarray(weights[:, a:b])
        res = nmf_encode(Vb[None], W, H_init=Hb0, maxiter=maxiter, **bcfg)
        cost += np.asarray(res.cost[0], np.float64)
        if out is None:
            parts.append(np.asarray(res.H[0]))
        else:
            out[:, a:b] = np.asarray(res.H[0])
    H = out if out is not None else np.concatenate(parts, axis=1)
    return Result(fields=("W", "H", "cost"),
                  W=np.asarray(W), H=H, cost=cost,
                  n_iters=maxiter, converged=False)
