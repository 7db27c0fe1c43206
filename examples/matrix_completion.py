"""Nonnegative matrix completion with per-entry weights.

A fraction of the entries of a low-rank nonnegative matrix is
unobserved.  `weights=` (a 0/1 mask here; any nonnegative confidence
matrix works) makes every solver divergence minimize the weighted
objective sum(weights * d(V, WH)) — the unobserved entries contribute
nothing, and the low-rank structure completes them.

Run:  python examples/matrix_completion.py
"""
import numpy as np

# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def main():
    rng = np.random.default_rng(0)
    m, n, r = 500, 400, 8
    V_true = rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n))
    observed = rng.uniform(size=(m, n)) < 0.35  # only 35% observed

    V_obs = np.where(observed, V_true, 0.0).astype(np.float32)
    mask = observed.astype(np.float32)

    res = nt.nmf(V_obs, r, weights=mask, maxiter=500, tolerance=1e-9,
                 seed=1)
    # weighted HALS (rank-1 sweeps on the observed entries): same cost
    # per sweep, severalfold fewer sweeps — the recommended fast path
    res_hals = nt.nmf_hals(V_obs, r, weights=mask, maxiter=120,
                           tolerance=1e-9, seed=1)

    miss = ~observed
    print(f"observed entries: {observed.mean():.0%}")
    for name, rr in (("weighted MU (500 iters)", res),
                     ("weighted HALS (120 iters)", res_hals)):
        V_hat = np.asarray(rr.W) @ np.asarray(rr.H)
        err_missing = (np.linalg.norm((V_hat - V_true)[miss])
                       / np.linalg.norm(V_true[miss]))
        err_observed = (np.linalg.norm((V_hat - V_true)[observed])
                        / np.linalg.norm(V_true[observed]))
        print(f"{name}: rel err observed {err_observed:.4f}, "
              f"MISSING {err_missing:.4f}")
        assert err_missing < 0.25


if __name__ == "__main__":
    main()
