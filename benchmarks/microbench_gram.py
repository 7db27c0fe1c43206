"""Decompose the flagship gram iteration: where do 8.8 ms/iter go?

Each component runs as a 20-iteration lax.scan whose carry depends on the
previous output (no relay cache, no per-dispatch overhead in the margin),
timed with the chained-dispatch methodology of profile_flagship.py.

Components at (m, n, k) = (100k, 10k, 200), V f32 (and bf16 variants):
  dot1      y = V @ H.T                 (the W-update numerator, nmf.m:149)
  dot2      y = V.T @ W   (as dot_general, no transpose node; nmf.m:180)
  gramrest  everything in the gram step EXCEPT the two V dots
  full      the real production step (profile_flagship baseline)
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

M, N, K = 100_000, 10_000, 200
ITERS = 20
TRIALS = 4


def chained(fn, carry, tag):
    run = jax.jit(lambda c: jax.lax.scan(lambda c, _: (fn(c), None),
                                         c, None, length=ITERS)[0])
    out = run(carry)
    jax.block_until_ready(out)
    dts = []
    c = carry
    for _ in range(TRIALS):
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = run(c)
        jax.block_until_ready(c)
        dts.append(time.perf_counter() - t0)
    dts = dts[1:]
    ms = sorted(dts)[len(dts) // 2] * 1e3 / ITERS
    print(f"{tag}: {ms:.3f} ms/iter", flush=True)
    return ms


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    kv, kw, kh = jax.random.split(key, 3)
    V = jax.random.uniform(kv, (M, N), jnp.float32, 0.05, 1.0)
    W = jax.random.uniform(kw, (M, K), jnp.float32)
    H = jax.random.uniform(kh, (K, N), jnp.float32)
    Vb = V.astype(jnp.bfloat16)
    jax.block_until_ready((V, Vb, W, H))
    r = {}

    def dot1(V):
        def f(H):
            y = jax.lax.dot(V, H.T.astype(V.dtype),
                            preferred_element_type=jnp.float32)
            return H * (1.0 + 1e-12 * jnp.mean(y))
        return f

    def dot2(V):
        def f(W):
            # V.T @ W without a transpose node: contract dim 0 with dim 0
            y = jax.lax.dot_general(V, W.astype(V.dtype),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return W * (1.0 + 1e-12 * jnp.mean(y))
        return f

    def dot2_tnode(V):
        def f(W):
            y = jax.lax.dot(V.T, W.astype(V.dtype),
                            preferred_element_type=jnp.float32)
            return W * (1.0 + 1e-12 * jnp.mean(y))
        return f

    # the gram-only remainder: everything else in one production iteration
    # (VHt / WtV stand-ins passed in as device arrays, not jit constants)
    VHt0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
    WtV0 = jax.random.normal(jax.random.PRNGKey(2), (K, N), jnp.float32)
    jax.block_until_ready((VHt0, WtV0))

    def gramrest(carry):
        W, H = carry
        eps = jnp.float32(2.220446049250313e-16)
        HHt = H @ H.T
        WG = W @ HHt
        dneg = jnp.sum(W * WG, axis=0)
        dpos = jnp.sum(W * VHt0, axis=0)
        neg = VHt0 + W * dneg[None, :]
        pos = WG + W * dpos[None, :]
        Wn = W * (neg / jnp.maximum(pos, eps))
        Wn = Wn / jnp.sqrt(jnp.maximum(jnp.sum(Wn * Wn, axis=0), eps))[None, :]
        WtW = Wn.T @ Wn
        Hn = H * (WtV0 / jnp.maximum(WtW @ H, eps))
        c = jnp.sum(WtV0 * Hn) * 1e-12
        return Wn * (1.0 + c), Hn

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    jobs = {
        "dot1_f32": lambda: chained(dot1(V), H, "dot1 V@H' (f32 V)"),
        "dot1_bf16": lambda: chained(dot1(Vb), H, "dot1 V@H' (bf16 V)"),
        "dot2_f32": lambda: chained(dot2(V), W, "dot2 V'W dot_general (f32 V)"),
        "dot2_bf16": lambda: chained(dot2(Vb), W, "dot2 V'W dot_general (bf16 V)"),
        "dot2t_f32": lambda: chained(dot2_tnode(V), W, "dot2 V.T@W transpose-node (f32 V)"),
        "gramrest": lambda: chained(gramrest, (W, H), "gram remainder (no V dots)"),
    }
    for name, job in jobs.items():
        if which in ("all", name):
            r[name] = job()
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
