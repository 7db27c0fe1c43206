"""Parity + property tests for lnmf, seminmf, convexnmf, chnmf."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.utils.init import kmeans, convex_hull_anchors, _convhull_2d
import oracle


def make_problem(m=30, n=24, k=4, seed=0, lo=0.1, hi=1.0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(lo, hi, (m, n))
    W0 = rng.uniform(size=(m, k))
    H0 = rng.uniform(size=(k, n))
    return V, W0, H0


# --------------------------------------------------------------------- lnmf
def test_lnmf_parity():
    V, W0, H0 = make_problem()
    res = nt.lnmf(V, 4, W_init=W0, H_init=H0, maxiter=25, tolerance=1e-12,
                  dtype=np.float64)
    Wg, Hg, cg = oracle.lnmf(V, W0, H0, maxiter=25, tolerance=1e-12)
    np.testing.assert_allclose(res.W, Wg, atol=1e-10)
    np.testing.assert_allclose(res.H, Hg, atol=1e-10)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-9)


def test_lnmf_no_trim_quirk():
    """lnmf breaks on convergence but never trims (lnmf.m:89-91)."""
    V, W0, H0 = make_problem()
    res = nt.lnmf(V, 4, W_init=W0, H_init=H0, maxiter=80, tolerance=1e-1,
                  dtype=np.float64)
    _, _, cg = oracle.lnmf(V, W0, H0, maxiter=80, tolerance=1e-1)
    assert len(res.cost) == 80 == len(cg)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-9)
    assert res.converged and res.n_iters < 80


def test_lnmf_colsum_invariant():
    V, W0, H0 = make_problem(seed=5)
    res = nt.lnmf(V, 4, W_init=W0, H_init=H0, maxiter=10, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(res.W).sum(0), np.ones(4), atol=1e-12)


# ------------------------------------------------------------------ seminmf
def test_seminmf_parity():
    rng = np.random.default_rng(1)
    V = rng.normal(size=(25, 40))  # mixed-sign data
    W0 = rng.uniform(-1, 1, (25, 4))
    H0 = rng.uniform(size=(4, 40)) + 0.2
    res = nt.seminmf(V, 4, W_init=W0, H_init=H0, maxiter=30, tolerance=1e-12,
                     dtype=np.float64)
    Wg, Hg, cg = oracle.seminmf(V, W0, H0, maxiter=30, tolerance=1e-12)
    np.testing.assert_allclose(res.W, Wg, atol=1e-8)
    np.testing.assert_allclose(res.H, Hg, atol=1e-8)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)
    assert np.all(np.asarray(res.H) >= 0)


def test_seminmf_default_init_runs():
    rng = np.random.default_rng(2)
    V = rng.normal(size=(20, 30))
    res = nt.seminmf(V, 3, maxiter=15, dtype=np.float64, seed=1)
    assert np.all(np.isfinite(res.cost))
    assert np.all(np.asarray(res.H) >= 0)


# ---------------------------------------------------------------- convexnmf
def test_convexnmf_parity():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(15, 35))
    G0 = rng.uniform(size=(35, 4))
    H0 = rng.uniform(size=(4, 35)) + 0.2
    res = nt.convexnmf(V, 4, G_init=G0, H_init=H0, maxiter=30,
                       tolerance=1e-12, dtype=np.float64)
    Wg, Hg, Gg, cg = oracle.convexnmf(V, G0, H0, maxiter=30, tolerance=1e-12)
    np.testing.assert_allclose(res.G, Gg, atol=1e-8)
    np.testing.assert_allclose(res.H, Hg, atol=1e-8)
    np.testing.assert_allclose(res.W, Wg, atol=1e-7)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)


def test_convexnmf_g_colsum_and_default_init():
    rng = np.random.default_rng(4)
    V = rng.uniform(size=(12, 40))
    res = nt.convexnmf(V, 3, maxiter=10, dtype=np.float64, seed=7)
    np.testing.assert_allclose(np.asarray(res.G).sum(0), np.ones(3), atol=1e-10)
    assert np.all(np.isfinite(res.cost))
    # W = V @ G (convexnmf.m:84,97)
    np.testing.assert_allclose(res.W, V @ np.asarray(res.G), atol=1e-10)


def test_convexnmf_nonneg_parity():
    """Nonnegative V takes the specialized step (VV_neg exactly zero,
    shared symmetric-Gram product — convexnmf.py round 3); it must still
    match the literal pos/neg-split oracle."""
    rng = np.random.default_rng(13)
    V = rng.uniform(0.1, 1.0, (15, 35))
    G0 = rng.uniform(size=(35, 4))
    H0 = rng.uniform(size=(4, 35)) + 0.2
    res = nt.convexnmf(V, 4, G_init=G0, H_init=H0, maxiter=30,
                       tolerance=1e-12, dtype=np.float64)
    Wg, Hg, Gg, cg = oracle.convexnmf(V, G0, H0, maxiter=30, tolerance=1e-12)
    np.testing.assert_allclose(res.G, Gg, atol=1e-8)
    np.testing.assert_allclose(res.H, Hg, atol=1e-8)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)


def test_convexnmf_nonneg_matches_general_path():
    """The nonneg specialization and the general pos/neg-split solver are
    the same algorithm: force both through the internal builder on the
    SAME nonnegative problem."""
    import importlib
    import jax.numpy as jnp
    cvx = importlib.import_module("nmf_toolbox_tpu.models.convexnmf")
    from nmf_toolbox_tpu.ops.gram import pos_neg_split

    rng = np.random.default_rng(14)
    V = jnp.asarray(rng.uniform(0.1, 1.0, (12, 30)))
    G0 = jnp.asarray(rng.uniform(size=(30, 3)))
    H0 = jnp.asarray(rng.uniform(size=(3, 30)) + 0.2)
    VtV = V.T @ V
    v_sq = jnp.trace(VtV)
    tol = jnp.asarray(1e-30, V.dtype)
    zero = jnp.asarray(0.0, V.dtype)
    a = cvx._build_solver(cvx._Spec(20, False, False, None, True))(
        (VtV,), G0, H0, v_sq, zero, tol)
    b = cvx._build_solver(cvx._Spec(20, False, False, None, False))(
        pos_neg_split(VtV), G0, H0, v_sq, zero, tol)
    np.testing.assert_allclose(np.asarray(a.state[0]), np.asarray(b.state[0]),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a.state[1]), np.asarray(b.state[1]),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a.cost_buf), np.asarray(b.cost_buf),
                               rtol=1e-10)


def test_convexnmf_sparsity():
    rng = np.random.default_rng(5)
    V = rng.normal(size=(10, 25))
    G0 = rng.uniform(size=(25, 3))
    H0 = rng.uniform(size=(3, 25)) + 0.2
    res = nt.convexnmf(V, 3, G_init=G0, H_init=H0, G_sparsity=0.2,
                       maxiter=15, tolerance=1e-12, dtype=np.float64)
    _, Hg, Gg, cg = oracle.convexnmf(V, G0, H0, G_sparsity=0.2,
                                     maxiter=15, tolerance=1e-12)
    np.testing.assert_allclose(res.G, Gg, atol=1e-8)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)


# -------------------------------------------------------------------- chnmf
def test_chnmf_parity_given_s():
    rng = np.random.default_rng(6)
    V = rng.uniform(size=(12, 50))
    S = V[:, rng.choice(50, 9, replace=False)]
    G0 = rng.uniform(size=(9, 4))
    H0 = rng.uniform(size=(4, 50))
    res = nt.chnmf(V, 4, S_init=S, G_init=G0, H_init=H0, maxiter=30,
                   tolerance=1e-12, dtype=np.float64)
    Wg, Hg, Gg, cg = oracle.chnmf(V, S, G0, H0, maxiter=30, tolerance=1e-12)
    np.testing.assert_allclose(res.G, Gg, atol=1e-8)
    np.testing.assert_allclose(res.H, Hg, atol=1e-8)
    np.testing.assert_allclose(res.W, Wg, atol=1e-8)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)


def test_chnmf_hull_extraction_runs():
    rng = np.random.default_rng(7)
    V = rng.uniform(size=(8, 60))
    res = nt.chnmf(V, 3, maxiter=10, dtype=np.float64, seed=3)
    assert res.S.shape[0] == 8 and res.S.shape[1] >= 3
    # anchors must be actual columns of V
    for j in range(res.S.shape[1]):
        assert np.min(np.sum((V - res.S[:, j:j+1])**2, axis=0)) < 1e-20
    assert np.all(np.isfinite(res.cost))


def test_convhull_2d_correct():
    rng = np.random.default_rng(8)
    pts = rng.normal(size=(100, 2))
    idx = _convhull_2d(pts)
    # every point must be inside the hull polygon: check via support function
    hull = pts[idx]
    for d in [np.array([np.cos(a), np.sin(a)]) for a in np.linspace(0, 2*np.pi, 36)]:
        assert np.max(pts @ d) <= np.max(hull @ d) + 1e-12


def test_kmeans_basic():
    import jax
    rng = np.random.default_rng(9)
    X = np.concatenate([rng.normal(0, .1, (30, 2)),
                        rng.normal(5, .1, (30, 2))])
    labels, centers = kmeans(jax.random.PRNGKey(0), X, 2)
    labels = np.asarray(labels)
    assert len(np.unique(labels[:30])) == 1
    assert len(np.unique(labels[30:])) == 1
    assert labels[0] != labels[-1]


def test_convexnmf_default_g_has_no_frozen_zeros():
    """The default G_init must be strictly positive: exact zeros can never
    be unfrozen by a multiplicative update (reference init keeps the +0.2
    indicator offset in the numerator, ValidateParameters.m:105-109)."""
    rng = np.random.default_rng(11)
    V = rng.uniform(size=(12, 40))
    res = nt.convexnmf(V, 3, maxiter=1, dtype=np.float64, seed=7)
    assert np.all(np.asarray(res.G) > 0)


def test_seminmf_survives_near_singular_gram():
    """Nearly-duplicate H rows make H H' singular to roundoff; the LU
    solve must stay finite like MATLAB's mrdivide (seminmf.m:68) — a
    Cholesky solve NaNs out here.  (An EXACTLY singular Gram yields
    inf/NaN in MATLAB too; that case is out of scope.)"""
    rng = np.random.default_rng(12)
    V = rng.normal(size=(10, 20))
    base = np.ones((1, 20))
    H0 = np.vstack([base, base + 1e-13 * rng.uniform(size=(1, 20)),
                    rng.uniform(size=(1, 20))])
    W0 = rng.uniform(-1, 1, (10, 3))
    res = nt.seminmf(V, 3, W_init=W0, H_init=H0, maxiter=3, dtype=np.float64)
    assert np.all(np.isfinite(res.cost))
