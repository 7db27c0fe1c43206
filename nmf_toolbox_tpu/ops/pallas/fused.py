"""Fused Pallas TPU kernels for the KL / IS multiplicative updates.

The KL and IS gradient fields are nonlinear in the reconstruction
(Phi = V / (W H), V / (W H)^2, 1 / (W H) — nmf.m:151-156), so unlike the
Euclidean Gram path the m-by-n reconstruction is mathematically required.
These kernels keep it OUT of HBM: each (TM, TN) grid step rebuilds the
local V_hat tile on the MXU from the resident W/H blocks, applies the
elementwise field on the VPU, and contracts it against H' (or W') in the
same pass, accumulating into an (m, k) / (k, n) output block that lives
in VMEM across the reduction dimension.

HBM traffic per pass = one read of V + the small factor/output arrays,
versus the unfused path's materialized V_hat and ratio arrays (~4x the
traffic for KL, more for IS).

All kernels accept arbitrary (unpadded) shapes: inputs are padded to the
tile grid at the call boundary and masked inside the kernel (0/0 in the
padded region would otherwise poison the fields).  float32 only (TPU
Pallas has no f64); the solvers fall back to the jnp path for other
dtypes.  On non-TPU backends the kernels run in interpreter mode so the
same code path is testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: multiples of the f32 (8, 128) min tile, sized so
# V + W + H + out blocks stay well under VMEM for k <= 1024.
TM = 256
TN = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to(x, rows, cols):
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def _cdiv(a, b):
    return -(-a // b)


def _masks(i, j, m, n, tm, tn):
    row = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0) + i * tm
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1) + j * tn
    return (row < m) & (col < n)


def _dot_bf16(A, B):
    """MXU matmul with bf16 inputs and f32 accumulation — the same
    precision XLA's default ('fastest') matmul uses on TPU, and ~3x the
    f32 throughput on v5e.  Interpreter mode (CPU tests) keeps f32 so the
    numerics there stay strict."""
    if _interpret():
        return jnp.dot(A, B, preferred_element_type=jnp.float32)
    return jnp.dot(A.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _vhat_tile(W_i, H_j):
    return _dot_bf16(W_i, H_j)


# ---------------------------------------------------------------------------
# W-phase kernels: Phi @ H'  (grid i-major, accumulate over j)
# ---------------------------------------------------------------------------

def _w_phase_kernel(V_ref, W_ref, H_ref, out1_ref, out2_ref,
                    acc1_ref, acc2_ref, *, mode, m, n):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    W_i = W_ref[...]
    H_j = H_ref[...]
    V = V_ref[...]
    V_hat = _vhat_tile(W_i, H_j)
    mask = _masks(pl.program_id(0), j, m, n, V.shape[0], V.shape[1])
    safe = jnp.where(mask, V_hat, 1.0)
    if mode == "kl":
        phi1 = jnp.where(mask, V / safe, 0.0)
        phi2 = None
    else:  # is
        phi1 = jnp.where(mask, V / (safe * safe), 0.0)
        phi2 = jnp.where(mask, 1.0 / safe, 0.0)
    # Accumulate in a VMEM scratch across the reduction (j) dimension and
    # write the output block once, at the last step — no per-step HBM
    # read-modify-write of the output.
    acc1 = _dot_bf16(phi1, H_j.T)

    @pl.when(j == 0)
    def _():
        acc1_ref[...] = acc1

    @pl.when(j > 0)
    def _():
        acc1_ref[...] += acc1

    @pl.when(j == nj - 1)
    def _():
        out1_ref[...] = acc1_ref[...]

    if phi2 is not None:
        acc2 = _dot_bf16(phi2, H_j.T)

        @pl.when(j == 0)
        def _():
            acc2_ref[...] = acc2

        @pl.when(j > 0)
        def _():
            acc2_ref[...] += acc2

        @pl.when(j == nj - 1)
        def _():
            out2_ref[...] = acc2_ref[...]


@functools.partial(jax.jit, static_argnames=("mode",))
def phi_dot_ht(V, W, H, mode: str = "kl"):
    """Phi(V, W@H) @ H' without materializing W@H or Phi in HBM.

    mode='kl' returns one (m, k) array ((V / V_hat) @ H', nmf.m:152);
    mode='is' returns two ((V / V_hat^2) @ H', (1 / V_hat) @ H',
    nmf.m:155-156).
    """
    m, n = V.shape
    k = W.shape[1]
    mp, np_, kp = _cdiv(m, TM) * TM, _cdiv(n, TN) * TN, max(_cdiv(k, 128) * 128, 128)
    Vp = _pad_to(V, mp, np_)
    Wp = _pad_to(W, mp, kp)
    Hp = _pad_to(H, kp, np_)
    grid = (mp // TM, np_ // TN)
    n_out = 1 if mode == "kl" else 2
    out_shape = [jax.ShapeDtypeStruct((mp, kp), jnp.float32)] * n_out
    if mode == "kl":
        out_shape = out_shape + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]
    flops_per = 4 * TM * TN * kp * (1 if mode == "kl" else 1.5)
    outs = pl.pallas_call(
        functools.partial(_w_phase_kernel, mode=mode, m=m, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
            pl.BlockSpec((TM, kp), lambda i, j: (i, 0)),
            pl.BlockSpec((kp, TN), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((TM, kp), lambda i, j: (i, 0)),
            (pl.BlockSpec((TM, kp), lambda i, j: (i, 0)) if mode == "is"
             else pl.BlockSpec((8, 128), lambda i, j: (0, 0))),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((TM, kp), jnp.float32),
                        pltpu.VMEM((TM, kp) if mode == "is" else (8, 128),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per * grid[0] * grid[1]),
            bytes_accessed=int(Vp.size * 4), transcendentals=0),
        interpret=_interpret(),
    )(Vp, Wp, Hp)
    if mode == "kl":
        return outs[0][:m, :k]
    return outs[0][:m, :k], outs[1][:m, :k]


# ---------------------------------------------------------------------------
# H-phase kernels: W' @ Phi  (grid j-major, accumulate over i)
# ---------------------------------------------------------------------------

def _h_phase_kernel(V_ref, W_ref, H_ref, out1_ref, out2_ref, *, mode, m, n):
    j = pl.program_id(0)
    i = pl.program_id(1)
    W_i = W_ref[...]
    H_j = H_ref[...]
    V = V_ref[...]
    V_hat = _vhat_tile(W_i, H_j)
    mask = _masks(i, j, m, n, V.shape[0], V.shape[1])
    safe = jnp.where(mask, V_hat, 1.0)
    if mode == "kl":
        phi1 = jnp.where(mask, V / safe, 0.0)
        phi2 = None
    else:
        phi1 = jnp.where(mask, V / (safe * safe), 0.0)
        phi2 = jnp.where(mask, 1.0 / safe, 0.0)
    acc1 = _dot_bf16(W_i.T, phi1)

    @pl.when(i == 0)
    def _():
        out1_ref[...] = acc1

    @pl.when(i > 0)
    def _():
        out1_ref[...] += acc1

    if phi2 is not None:
        acc2 = _dot_bf16(W_i.T, phi2)

        @pl.when(i == 0)
        def _():
            out2_ref[...] = acc2

        @pl.when(i > 0)
        def _():
            out2_ref[...] += acc2


@functools.partial(jax.jit, static_argnames=("mode",))
def wt_dot_phi(V, W, H, mode: str = "kl"):
    """W' @ Phi(V, W@H) without materializing W@H or Phi in HBM.

    mode='kl' returns (k, n) W'(V / V_hat) (nmf.m:183); mode='is' returns
    (W'(V / V_hat^2), W'(1 / V_hat)) (nmf.m:186-187).
    """
    m, n = V.shape
    k = W.shape[1]
    mp, np_, kp = _cdiv(m, TM) * TM, _cdiv(n, TN) * TN, max(_cdiv(k, 128) * 128, 128)
    Vp = _pad_to(V, mp, np_)
    Wp = _pad_to(W, mp, kp)
    Hp = _pad_to(H, kp, np_)
    grid = (np_ // TN, mp // TM)
    n_out = 1 if mode == "kl" else 2
    out_shape = [jax.ShapeDtypeStruct((kp, np_), jnp.float32)] * n_out
    if mode == "kl":
        out_shape = out_shape + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(_h_phase_kernel, mode=mode, m=m, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda j, i: (i, j)),
            pl.BlockSpec((TM, kp), lambda j, i: (i, 0)),
            pl.BlockSpec((kp, TN), lambda j, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((kp, TN), lambda j, i: (0, j)),
            (pl.BlockSpec((kp, TN), lambda j, i: (0, j)) if mode == "is"
             else pl.BlockSpec((8, 128), lambda j, i: (0, 0))),
        ],
        out_shape=out_shape,
        interpret=_interpret(),
    )(Vp, Wp, Hp)
    if mode == "kl":
        return outs[0][:k, :n]
    return outs[0][:k, :n], outs[1][:k, :n]


# ---------------------------------------------------------------------------
# Cost kernels: scalar divergence pieces that need the m-by-n field
# ---------------------------------------------------------------------------

def _cost_kernel(V_ref, W_ref, H_ref, s1_ref, s2_ref, *, mode, m, n):
    i = pl.program_id(0)
    j = pl.program_id(1)
    W_i = W_ref[...]
    H_j = H_ref[...]
    V = V_ref[...]
    V_hat = _vhat_tile(W_i, H_j)
    mask = _masks(i, j, m, n, V.shape[0], V.shape[1])
    safe = jnp.where(mask, V_hat, 1.0)
    if mode == "kl":
        # sum V * log(V_hat); (V log V, sum V, sum V_hat) are cheap outside.
        t1 = jnp.sum(jnp.where(mask, V * jnp.log(safe), 0.0))
        t2 = jnp.zeros((), jnp.float32)
    else:
        # sum log(V_hat) and sum V / V_hat (nmf.m:212)
        t1 = jnp.sum(jnp.where(mask, jnp.log(safe), 0.0))
        t2 = jnp.sum(jnp.where(mask, V / safe, 0.0))

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        s1_ref[0, 0] = t1
        s2_ref[0, 0] = t2

    @pl.when(~first)
    def _():
        s1_ref[0, 0] += t1
        s2_ref[0, 0] += t2


@functools.partial(jax.jit, static_argnames=("mode",))
def cost_terms(V, W, H, mode: str = "kl"):
    """Scalar field-dependent cost pieces, fused over tiles.

    mode='kl': returns sum(V * log(W@H)).
    mode='is': returns (sum(log(W@H)), sum(V / (W@H))).
    """
    m, n = V.shape
    k = W.shape[1]
    mp, np_, kp = _cdiv(m, TM) * TM, _cdiv(n, TN) * TN, max(_cdiv(k, 128) * 128, 128)
    Vp = _pad_to(V, mp, np_)
    Wp = _pad_to(W, mp, kp)
    Hp = _pad_to(H, kp, np_)
    grid = (mp // TM, np_ // TN)
    s1, s2 = pl.pallas_call(
        functools.partial(_cost_kernel, mode=mode, m=m, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
            pl.BlockSpec((TM, kp), lambda i, j: (i, 0)),
            pl.BlockSpec((kp, TN), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 2,
        interpret=_interpret(),
    )(Vp, Wp, Hp)
    if mode == "kl":
        return s1[0, 0]
    return s1[0, 0], s2[0, 0]

