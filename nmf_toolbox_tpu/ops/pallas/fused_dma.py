"""Manually-pipelined variant of the fused KL W-phase kernel.

The grid-blocked kernels in fused.py pay per-grid-step overhead on the
reduction dimension (measured ~4.8 us/step vs ~1 us of DMA per V tile).
Here the grid covers ONLY the parallel row-block dimension; each program
streams its row of V tiles from HBM with a two-slot double buffer
(pallas_guide 'Patterns: Double Buffering') while H stays resident in
VMEM, so the reduction loop runs at DMA/compute overlap speed.

Scope: KL W-phase only ((V / (W@H)) @ H') — the experiment that decides
whether manual pipelining can beat XLA's fusion.  STATUS: MEASURED on
the v5e (round 2, benchmarks/PALLAS_COMPARE_v5e.json): this kernel is
identical in speed to the grid-blocked fused.py kernel at every shape
tried (15.2 vs 15.3 ms at 40k x 10k r100) — per-grid-step overhead was
NOT the gap — and XLA's automatic fusion beats both by up to 3.2x,
reaching 41%% of the one-V-read HBM floor.  The Pallas north-star item
is retired on this evidence; XLA fusion is the production compute path
and these kernels stay opt-in reference implementations.  Requires
k <= 512 and n such that H fits VMEM (kp * np * 4 <= ~6 MB).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256
TN = 512


def _cdiv(a, b):
    return -(-a // b)


def _kernel(W_ref, H_ref, V_hbm, out_ref, *, m, n, nj):
    i = pl.program_id(0)

    def body(vbuf, sems, acc):
        def dma(slot, j):
            return pltpu.make_async_copy(
                V_hbm.at[pl.ds(i * TM, TM), pl.ds(j * TN, TN)],
                vbuf.at[slot], sems.at[slot])

        dma(0, 0).start()
        acc[...] = jnp.zeros_like(acc)

        def loop(j, _):
            slot = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < nj)
            def _():
                dma(nxt, j + 1).start()

            dma(slot, j).wait()
            H_j = H_ref[:, pl.ds(j * TN, TN)]
            V = vbuf[slot]
            V_hat = jnp.dot(W_ref[...].astype(jnp.bfloat16),
                            H_j.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0) + i * TM
            col = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) + j * TN
            mask = (row < m) & (col < n)
            phi = jnp.where(mask, V / jnp.where(mask, V_hat, 1.0), 0.0)
            acc[...] += jnp.dot(phi.astype(jnp.bfloat16),
                                H_j.T.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            return ()

        jax.lax.fori_loop(0, nj, loop, ())
        out_ref[...] = acc[...]

    pl.run_scoped(
        body,
        vbuf=pltpu.VMEM((2, TM, TN), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
        acc=pltpu.VMEM((TM, out_ref.shape[1]), jnp.float32),
    )


@jax.jit
def kl_phi_dot_ht_dma(V, W, H):
    """(V / (W@H)) @ H' with a manually double-buffered V stream."""
    m, n = V.shape
    k = W.shape[1]
    mp = _cdiv(m, TM) * TM
    np_ = _cdiv(n, TN) * TN
    kp = max(_cdiv(k, 128) * 128, 128)
    Vp = jnp.pad(V, ((0, mp - m), (0, np_ - n)))
    Wp = jnp.pad(W, ((0, mp - m), (0, kp - k)))
    Hp = jnp.pad(H, ((0, kp - k), (0, np_ - n)))
    nj = np_ // TN
    out = pl.pallas_call(
        functools.partial(_kernel, m=m, n=n, nj=nj),
        grid=(mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, kp), lambda i: (i, 0)),   # W row block
            pl.BlockSpec(memory_space=pltpu.VMEM),       # H resident
            pl.BlockSpec(memory_space=pl.ANY),           # V streamed manually
        ],
        out_specs=pl.BlockSpec((TM, kp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, kp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(Wp, Hp, Vp)
    return out[:m, :k]
