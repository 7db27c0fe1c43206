"""Parts-based decomposition with Hoyer sparseness (nmfsc) and the
dictionary viewer.

Run: python examples/sparse_parts.py  -> writes examples/basis.png
"""
import os

import numpy as np
# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.utils import view_dictionary, sort_dictionary


def main():
    rng = np.random.default_rng(0)
    m, n, k = 64, 400, 8
    # ground-truth localized "parts": bumps at distinct positions
    parts = np.zeros((m, k))
    for j in range(k):
        c = (j + 0.5) * m / k
        parts[:, j] = np.exp(-0.5 * ((np.arange(m) - c) / 3.0) ** 2)
    H_true = rng.gamma(0.5, 1.0, (k, n))
    V = parts @ H_true + 0.01

    res = nt.nmfsc(V.astype(np.float64), k, W_sparsity=0.7, H_sparsity=0.5,
                   maxiter=60, seed=4, dtype=np.float64)
    W = sort_dictionary(np.asarray(res.W))
    ax = view_dictionary(W, flipud=True)
    out = os.path.join(os.path.dirname(__file__), "basis.png")
    ax.figure.savefig(out, dpi=120)
    print(f"cost: {res.cost[0]:.4f} -> {res.cost[-1]:.4f} "
          f"({len(res.cost) - 1} iterations)")
    print(f"basis written to {out}")
    # each learned column should be localized (Hoyer sparseness ~0.7)
    sp = (np.sqrt(m) - np.abs(W).sum(0)) / (np.sqrt(m) - 1)
    print("column sparseness:", np.round(sp, 3))


if __name__ == "__main__":
    main()
