"""Profile the flagship gram step (VERDICT item 5).

Questions this answers with on-chip data:

1. Where does the 8.7 ms/iter at 100k x 10k r200 f32 go?  Roofline:
   the two V-touching matmuls (V @ H' at nmf.m:149, W' @ V at nmf.m:180)
   are 8e11 FLOP/iter -> 4.1 ms at v5e bf16 peak (197 TF/s), but reading
   the 4 GB f32 V twice is 8 GB -> 9.8 ms at 819 GB/s HBM.  f32 storage
   should therefore be HBM-BOUND, and bf16 V storage (half the dominant
   traffic) should approach the MXU floor — contradicting round 1's
   unrecorded "bf16 gains only ~3%" note.
2. Does the compiled HLO materialize a transpose of V (a 4 GB copy)
   for the W' @ V term, and does bf16 V avoid upcasts?
3. Do donated factor buffers / fused renorm change anything measurable?

Methodology per .claude/skills/verify/SKILL.md: chained dispatches whose
inputs depend on the previous output (defeats the relay's identical-arg
cache), scalar host readback as the completion fence, discard the first
post-warmup trial, report the median.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nmf_toolbox_tpu.models.nmf import _build_solver, _Spec
from nmf_toolbox_tpu.core import EPS
from nmf_toolbox_tpu.ops.normalize import unit_l2_columns

M, N, K = 100_000, 10_000, 200
ITERS = 20
TRIALS = 4  # first discarded


def make_problem(data_dtype):
    key = jax.random.PRNGKey(0)
    kv, kw, kh = jax.random.split(key, 3)
    V = jax.random.uniform(kv, (M, N), jnp.float32, 0.05, 1.0)
    V = V.astype(data_dtype)
    W0 = unit_l2_columns(jax.random.uniform(kw, (M, K), jnp.float32))
    H0 = jax.random.uniform(kh, (K, N), jnp.float32)
    jax.block_until_ready(V)
    return V, W0, H0


def time_solver(solve, V, W0, H0, tag):
    zeros = jnp.zeros((K,), jnp.float32)
    tol = jnp.float32(1e-30)
    out = solve(V, W0, H0, zeros, zeros, tol)  # compile + warmup run
    float(out.cost_buf[-1])

    dts = []
    W, H = W0, H0
    for trial in range(TRIALS):
        jax.block_until_ready((W, H))
        t0 = time.perf_counter()
        out = solve(V, W, H, zeros, zeros, tol)
        W, H = out.state            # chain: next trial depends on this one
        fence = float(out.cost_buf[-1])
        dts.append(time.perf_counter() - t0)
    dts = dts[1:]
    med = sorted(dts)[len(dts) // 2]
    ms = med * 1e3 / ITERS
    print(f"{tag}: {ms:.2f} ms/iter ({ITERS/med:.1f} iters/s) "
          f"trials={['%.1f' % (d*1e3/ITERS) for d in dts]} fence={fence:.3e}",
          flush=True)
    return ms


def hlo_report(solve, V, W0, H0, tag):
    zeros = jnp.zeros((K,), jnp.float32)
    tol = jnp.float32(1e-30)
    txt = jax.jit(solve).lower(V, W0, H0, zeros, zeros, tol).compile().as_text()
    big_transposes = [l for l in txt.splitlines()
                      if "transpose(" in l and ("100000,10000" in l or
                                                "10000,100000" in l)]
    big_converts = [l for l in txt.splitlines()
                    if "convert(" in l and ("100000,10000" in l or
                                            "10000,100000" in l)]
    n_fusion = txt.count("fusion(")
    print(f"{tag} HLO: {len(big_transposes)} full-size transposes, "
          f"{len(big_converts)} full-size converts, {n_fusion} fusions",
          flush=True)
    for l in (big_transposes + big_converts)[:6]:
        print("   ", l.strip()[:160], flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    spec = _Spec("euclidean", 1.0, 1.0, "gram", ITERS,
                 (False,), (False,), ((0, K),), EPS)
    solve = _build_solver(spec)

    results = {}
    V32, W0, H0 = make_problem(jnp.float32)
    hlo_report(solve, V32, W0, H0, "f32")
    results["f32_ms_per_iter"] = time_solver(solve, V32, W0, H0, "f32 V")

    Vbf, _, _ = make_problem(jnp.bfloat16)
    hlo_report(solve, Vbf, W0, H0, "bf16")
    results["bf16_ms_per_iter"] = time_solver(solve, Vbf, W0, H0, "bf16 V")

    results["speedup_bf16"] = round(
        results["f32_ms_per_iter"] / results["bf16_ms_per_iter"], 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
