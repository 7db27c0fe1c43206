"""Time-to-tolerance: MU vs HALS vs NNDSVD-seeded HALS.

The reference toolbox offers one solver speed class (multiplicative
updates).  This framework adds two orthogonal accelerators for the
Euclidean objective:

  * ``nt.nmf_hals``      — exact rank-1 sweeps (far fewer iterations)
  * ``init='nndsvdar'``  — SVD-seeded factors (far better starting point)

Run (CPU-friendly sizes):  python examples/fast_convergence.py
"""
import time

import numpy as np

# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def rel_err(V, W, H):
    return float(np.linalg.norm(V - W @ H) / np.linalg.norm(V))


def main():
    rng = np.random.default_rng(0)
    m, n, r, k = 2000, 1500, 12, 16
    V = (rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n))
         + 0.01 * rng.uniform(size=(m, n))).astype(np.float32)

    runs = [
        ("MU (reference parity)", nt.nmf, {}),
        ("HALS", nt.nmf_hals, {}),
        ("HALS + NNDSVD seed", nt.nmf_hals, {"init": "nndsvdar"}),
    ]
    target = 0.05
    print(f"target relative error: {target}")
    for name, fn, extra in runs:
        t0 = time.perf_counter()
        res = fn(V, k, maxiter=400, tolerance=1e-9, seed=1, **extra)
        dt = time.perf_counter() - t0
        e = rel_err(V, res.W, res.H)
        print(f"{name:24s} {res.n_iters:4d} iters  {dt:6.2f}s  "
              f"rel err {e:.4f}")


if __name__ == "__main__":
    main()
