"""Clustering with NMF: consensus matrix -> symmetric NMF.

The rank-selection sweep (consensus_stability) already computes a
consensus matrix — the fraction of NMF restarts that cluster each
sample pair together.  SymNMF factors that similarity directly into
soft cluster memberships (A ~ H H', Ding 2005), closing the loop:
restarts vote, symnmf reads the election.

Run: python examples/clustering.py  (CPU-friendly, ~seconds)
"""
from itertools import permutations

import numpy as np
# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def main():
    rng = np.random.default_rng(8)
    # 60 samples in 3 latent groups, observed through a random basis
    labels = np.repeat([0, 1, 2], 20)
    W_true = np.zeros((30, 3))
    W_true[:10, 0] = W_true[10:20, 1] = W_true[20:, 2] = 1.0
    H_true = np.zeros((3, 60))
    for j, lbl in enumerate(labels):
        H_true[lbl, j] = rng.uniform(0.5, 1.5)
    V = (W_true @ H_true + 0.02 * rng.uniform(size=(30, 60))
         ).astype(np.float32)

    # 1) restart sweep at the candidate rank: the consensus matrix is a
    # similarity built from co-clustering votes (fused on device via
    # nmf_multiseed)
    sel = nt.consensus_stability(V, (3,), n_seeds=8, seed=1)
    C = np.asarray(sel.stats[0].consensus, np.float64)
    C = (C + C.T) / 2
    print(f"rank 3: cophenetic {sel.stats[0].cophenetic:.3f}, "
          f"dispersion {sel.stats[0].dispersion:.3f}")

    # 2) symmetric NMF turns the votes into memberships
    r = nt.symnmf(C, 3, maxiter=300, seed=2, tolerance=1e-12)
    pred = np.argmax(np.asarray(r.H), axis=1)
    acc = max(np.mean(np.array([pm[l] for l in labels]) == pred)
              for pm in permutations(range(3)))
    print(f"symnmf converged in {r.n_iters} iterations, "
          f"final cost {r.cost[-1]:.3e}")
    print(f"clustering accuracy vs planted groups: {acc:.3f}")
    assert acc >= 0.95


if __name__ == "__main__":
    main()
