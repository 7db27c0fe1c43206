"""Tests for the HALS extra solver (beyond-reference surface)."""
import numpy as np

import nmf_toolbox_tpu as nt


def test_hals_beats_mu_convergence():
    rng = np.random.default_rng(0)
    Wt = rng.gamma(2.0, 1.0, (200, 8))
    Ht = rng.gamma(0.5, 1.0, (8, 300))
    V = (Wt @ Ht + 0.01).astype(np.float64)
    W0 = rng.uniform(size=(200, 8))
    H0 = rng.uniform(size=(8, 300))
    mu = nt.nmf(V, 8, W_init=W0, H_init=H0, maxiter=150, tolerance=1e-30,
                dtype=np.float64)
    ha = nt.nmf_hals(V, 8, W_init=W0, H_init=H0, maxiter=150,
                     tolerance=1e-30, dtype=np.float64)
    assert ha.cost[-1] < mu.cost[-1] * 0.5  # far better fit, same budget
    # cost is monotone non-increasing and nonnegative
    c = np.asarray(ha.cost)
    assert np.all(np.diff(c) <= 1e-9 * np.maximum(np.abs(c[:-1]), 1e-30))
    assert np.all(c >= 0)
    assert np.all(np.asarray(ha.W) >= 0) and np.all(np.asarray(ha.H) >= 0)


def test_hals_early_stop_and_mesh():
    import jax
    rng = np.random.default_rng(1)
    V = rng.uniform(0.1, 1, (24, 64)).astype(np.float64)
    r = nt.nmf_hals(V, 3, maxiter=500, tolerance=1e-8, seed=2,
                    dtype=np.float64)
    assert r.converged and len(r.cost) < 500
    if len(jax.devices()) >= 8:
        from nmf_toolbox_tpu.parallel import make_mesh
        W0 = rng.uniform(size=(24, 3))
        H0 = rng.uniform(size=(3, 64))
        a = nt.nmf_hals(V, 3, W_init=W0, H_init=H0, maxiter=10,
                        tolerance=1e-30, dtype=np.float64)
        b = nt.nmf_hals(V, 3, W_init=W0, H_init=H0, maxiter=10,
                        tolerance=1e-30, dtype=np.float64, mesh=make_mesh(8))
        np.testing.assert_allclose(a.W, b.W, atol=1e-9)


def test_hals_stops_at_exact_fit():
    """A perfectly factorizable V drives the clamped cost to 0; the
    inclusive stop rule must end the run instead of spinning to maxiter."""
    rng = np.random.default_rng(5)
    W = rng.gamma(2.0, 1.0, (40, 3))
    H = rng.gamma(1.0, 1.0, (3, 50))
    V = (W @ H).astype(np.float32)
    r = nt.nmf_hals(V, 3, W_init=W.astype(np.float32),
                    H_init=H.astype(np.float32), maxiter=500, tolerance=1e-12)
    assert r.converged and len(r.cost) < 500


def test_hals_extrapolated_converges_better():
    """extrapolate=True (Ang & Gillis 2019): same per-iteration cost,
    measurably lower objective at equal iterations on a low-rank fit."""
    rng = np.random.default_rng(4)
    m, n, k = 300, 250, 10
    A = rng.gamma(2.0, 1.0, (m, k)) * (0.7 ** np.arange(k))[None, :]
    V = (A @ rng.gamma(0.5, 1.0, (k, n)) + 1e-3).astype(np.float32)
    plain = nt.nmf_hals(V, k, maxiter=60, tolerance=1e-30, seed=1)
    extra = nt.nmf_hals(V, k, maxiter=60, tolerance=1e-30, seed=1,
                        extrapolate=True)
    def err(r):
        return np.linalg.norm(V - np.asarray(r.W) @ np.asarray(r.H))
    assert np.all(np.isfinite(np.asarray(extra.cost)))
    assert np.all(np.asarray(extra.W) >= 0) and np.all(np.asarray(extra.H) >= 0)
    # at worst marginally behind, typically clearly ahead
    assert err(extra) <= err(plain) * 1.02, (err(extra), err(plain))


def test_hals_extrapolated_tolerance_stop():
    rng = np.random.default_rng(5)
    V = rng.uniform(0.1, 1.0, (60, 50)).astype(np.float32)
    r = nt.nmf_hals(V, 5, maxiter=500, tolerance=1e-2, seed=2,
                    extrapolate=True)
    assert r.converged and r.n_iters < 500
    assert len(r.cost) == r.n_iters


def test_hals_weighted_matches_masked_objective():
    """Weighted HALS fits only the observed entries: on a mask-completed
    low-rank problem it recovers the hidden entries accurately and
    converges in far fewer iterations than weighted MU."""
    rng = np.random.default_rng(7)
    m, n, r = 120, 100, 5
    truth = rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n)) + 0.01
    M = (rng.uniform(size=(m, n)) < 0.5).astype(np.float64)
    V_obs = truth * M  # hidden entries zeroed (any junk works: weight 0)
    res = nt.nmf_hals(V_obs, r, weights=M, maxiter=150, tolerance=1e-12,
                      seed=1, dtype=np.float64)
    rec = np.asarray(res.W) @ np.asarray(res.H)
    hidden = M == 0
    err = np.linalg.norm((rec - truth)[hidden]) / np.linalg.norm(truth[hidden])
    assert err < 0.05, err
    # weighted MU from the same init budget is far behind at equal iters
    mu = nt.nmf(V_obs, r, weights=M, maxiter=150, tolerance=1e-12, seed=1,
                dtype=np.float64)
    rec_mu = np.asarray(mu.W) @ np.asarray(mu.H)
    err_mu = np.linalg.norm((rec_mu - truth)[hidden]) / np.linalg.norm(truth[hidden])
    assert err < err_mu, (err, err_mu)


def test_hals_weighted_cost_monotone_and_nan_safe():
    rng = np.random.default_rng(8)
    V = rng.uniform(0.1, 1.0, (40, 30))
    M = (rng.uniform(size=(40, 30)) < 0.7).astype(np.float64)
    V_nan = V.copy()
    V_nan[M == 0] = np.nan
    r = nt.nmf_hals(V_nan, 4, weights=M, maxiter=40, tolerance=1e-30,
                    seed=2, dtype=np.float64)
    c = np.asarray(r.cost)[:r.n_iters]
    assert np.all(np.isfinite(c))
    assert np.all(np.diff(c) <= 1e-9 * np.abs(c[:-1]) + 1e-12)  # monotone
    assert np.all(np.isfinite(r.W)) and np.all(np.isfinite(r.H))


def test_hals_weighted_nndsvd_seed_with_nan():
    rng = np.random.default_rng(9)
    V = rng.uniform(0.1, 1.0, (40, 30))
    M = (rng.uniform(size=(40, 30)) < 0.7).astype(np.float64)
    V_nan = np.where(M > 0, V, np.nan)
    r = nt.nmf_hals(V_nan, 4, weights=M, init="nndsvdar", maxiter=10,
                    seed=3, dtype=np.float64)
    assert np.all(np.isfinite(np.asarray(r.cost)[:r.n_iters]))


def test_hals_extrapolated_chunked_resume_bit_exact(tmp_path):
    """Extrapolated HALS momentum (Wy/Hy/beta) rides through
    resume_state, so chunked runs match single-dispatch exactly."""
    from nmf_toolbox_tpu.utils.checkpoint import run_checkpointed
    rng = np.random.default_rng(11)
    V = rng.uniform(0.1, 1.0, (50, 40))
    kw = dict(extrapolate=True, tolerance=1e-30, seed=3, dtype=np.float64)
    ref = nt.nmf_hals(V, 4, maxiter=30, **kw)
    res = run_checkpointed(nt.nmf_hals, V, 4, total_iters=30, chunk=7,
                           path=tmp_path / "eh.npz", **kw)
    np.testing.assert_array_equal(res.W, ref.W)
    np.testing.assert_array_equal(res.H, ref.H)
    np.testing.assert_array_equal(np.asarray(res.cost), np.asarray(ref.cost))


def test_nmf_weighted_nndsvd_seed_with_nan():
    """Review finding: nmf (not just nmf_hals) must seed cleanly from
    NaN-at-zero-weight data."""
    rng = np.random.default_rng(12)
    V = rng.uniform(0.1, 1.0, (40, 30))
    M = (rng.uniform(size=(40, 30)) < 0.7).astype(np.float64)
    V_nan = np.where(M > 0, V, np.nan)
    r = nt.nmf(V_nan, 4, weights=M, init="nndsvdar", maxiter=8,
               seed=3, dtype=np.float64)
    assert np.all(np.isfinite(np.asarray(r.cost)[:r.n_iters]))
    assert np.all(np.isfinite(r.W)) and np.all(np.isfinite(r.H))
