"""Settle the Pallas north-star question with on-chip data (VERDICT #4).

Measures the KL W-phase gradient op  A = (V / (W @ H)) @ H'  three ways:

  xla    — plain jnp composition; XLA fuses the ratio into the matmuls
  fused  — ops/pallas/fused.py grid-blocked kernel (round-1 production)
  dma    — ops/pallas/fused_dma.py manually double-buffered V stream
           (the round-1 experiment whose TPU measurement was blocked)

at three shapes, with the bench methodology (entropy-perturbed inputs,
discarded first trial, host-readback completion fence).  Also prints the
HBM roofline floor (one V read at ~819 GB/s v5e) per shape — the op is
memory-bound, so the floor is the speed-of-light reference.

Usage: python benchmarks/pallas_compare.py [--variant xla|fused|dma]
       (run one variant per process on relay-attached rigs)
"""
from __future__ import annotations

# repo root on sys.path: these scripts run as 'python benchmarks/x.py'
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
import sys
import time

import numpy as np

SHAPES = [(40_000, 10_000, 100), (20_000, 5_000, 100), (10_000, 10_000, 200)]
HBM_GBPS = 819.0  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="xla", choices=["xla", "fused", "dma"])
    ap.add_argument("--shapes", default=None,
                    help="comma list of shape indices (default all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.variant == "xla":
        @jax.jit
        def op(V, W, H):
            return (V / (W @ H)) @ H.T
    elif args.variant == "fused":
        from nmf_toolbox_tpu.ops.pallas import phi_dot_ht

        @jax.jit
        def op(V, W, H):
            return phi_dot_ht(V, W, H, "kl")
    else:
        from nmf_toolbox_tpu.ops.pallas.fused_dma import kl_phi_dot_ht_dma as op

    idxs = ([int(i) for i in args.shapes.split(",")] if args.shapes
            else range(len(SHAPES)))
    rows = []
    for si in idxs:
        m, n, k = SHAPES[si]
        kv, kw, kh = jax.random.split(jax.random.PRNGKey(si), 3)
        V = jax.random.uniform(kv, (m, n), jnp.float32, 0.05, 1.0)
        W = jax.random.uniform(kw, (m, k), jnp.float32, 0.05, 1.0)
        H = jax.random.uniform(kh, (k, n), jnp.float32, 0.05, 1.0)
        jax.block_until_ready(V)

        out = op(V, W, H)  # compile
        float(jnp.ravel(out)[0])

        # A single dispatch through the tunneled relay pays ~60 ms of
        # round-trip overhead — amortize over K chained dispatches whose
        # inputs depend on the previous output (defeats the relay's
        # identical-argument cache without host syncs), one fence at the
        # end.  K dispatches of the SAME compiled program back-to-back.
        K = 32
        scale = np.float32(1e-9)

        def run_chain(Wt):
            o = None
            for _ in range(K):
                o = op(V, Wt, H)
                Wt = Wt + scale * o[: Wt.shape[0], : Wt.shape[1]]
            return o

        ent = np.random.default_rng()
        ts = []
        for t in range(3):
            Wt = W * np.float32(1.0 + 1e-5 * ent.uniform(0.1, 1.0))
            jax.block_until_ready(Wt)
            t0 = time.perf_counter()
            out = run_chain(Wt)
            jax.block_until_ready(out)
            float(jnp.ravel(out)[0])  # readback fence
            ts.append((time.perf_counter() - t0) / K)
        med = sorted(ts[1:])[0]
        floor_ms = (m * n * 4) / (HBM_GBPS * 1e9) * 1e3
        row = {"variant": args.variant, "shape": f"{m}x{n} r{k}",
               "ms": round(med * 1e3, 3),
               "hbm_floor_ms": round(floor_ms, 3),
               "pct_of_floor": round(100 * floor_ms / (med * 1e3), 1)}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
    print(json.dumps({"results": rows}))


if __name__ == "__main__":
    main()
