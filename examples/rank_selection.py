"""How many basis elements? Pick the rank from the data.

Builds a spectrogram-like matrix with a KNOWN number of sources, then
recovers that number two independent ways:

1. `estimate_rank_svd` — the randomized-SVD energy curve (seconds, one
   device program; good first guess).
2. `pick_rank(..., ranks=...)` — Brunet-style consensus/stability: for
   each candidate rank, many random restarts run as ONE fused device
   program (`nmf_multiseed`), and the cophenetic correlation of the
   restart consensus says how reproducible that rank's clustering is.

The reference toolbox has no rank-selection tooling — every solver
takes num_basis_elems as a required input (nmf.m:1).
"""
import numpy as np

import nmf_toolbox_tpu as nt

K_TRUE = 4


def make_data(seed=0, m=60, n=90, noise=0.02):
    """K_TRUE well-separated 'sources': each column is one source's
    spectral template at a random gain (+ noise)."""
    rng = np.random.default_rng(seed)
    W = np.zeros((m, K_TRUE))
    band = m // K_TRUE
    for j in range(K_TRUE):
        W[j * band:(j + 1) * band, j] = rng.uniform(0.5, 1.0, band)
    H = np.zeros((K_TRUE, n))
    H[np.arange(n) % K_TRUE, np.arange(n)] = rng.uniform(0.8, 1.2, n)
    return (W @ H + noise * rng.random((m, n))).astype(np.float32)


def main():
    V = make_data()

    # 1. Spectral energy: where does the energy curve saturate?
    k_svd, curve = nt.estimate_rank_svd(V, energy=0.99, max_rank=12)
    print(f"SVD energy estimate: k={k_svd} "
          f"(curve: {np.round(curve[:6], 4).tolist()})")
    assert k_svd == K_TRUE, (k_svd, K_TRUE)

    # 2. Consensus stability across restarts.
    sel = nt.pick_rank(V, ranks=(2, 3, 4, 6), n_seeds=12, maxiter=150,
                       seed=0, dtype="float64")
    for s in sel.stats:
        print(f"  k={s.rank}: cophenetic={s.cophenetic:.4f} "
              f"dispersion={s.dispersion:.4f} best_cost={s.best_cost:.4f}")
    print(f"consensus recommends k={sel.recommended}")
    assert sel.recommended == K_TRUE, (sel.recommended, K_TRUE)

    # Factorize at the selected rank; keep the best of the restarts the
    # sweep already computed? The sweep returns stats only — rerun the
    # multiseed engine once at the chosen rank and keep the best restart.
    res = nt.nmf_multiseed(V, sel.recommended, 12, maxiter=300, seed=1,
                           dtype="float64")
    best = int(np.argmin(res.cost[:, -1]))
    W, H = res.W[best], res.H[best]
    rel = np.linalg.norm(V - W @ H) / np.linalg.norm(V)
    print(f"best-of-12 factorization at k={sel.recommended}: "
          f"relative error {rel:.4f}")
    assert rel < 0.05, rel


if __name__ == "__main__":
    main()
