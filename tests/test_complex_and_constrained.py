"""Parity tests for cmfwisa (complex), chcnmf, and constrainednmf."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
import oracle


# ------------------------------------------------------------------ cmfwisa
def test_cmfwisa_single_source_parity():
    rng = np.random.default_rng(0)
    m, n, k = 20, 30, 4
    V = rng.normal(size=(m, n)) + 1j * rng.normal(size=(m, n))
    W0 = rng.uniform(size=(m, k))
    H0 = rng.uniform(size=(k, n))
    r = nt.cmfwisa(V, k, W_init=W0, H_init=H0, maxiter=20, tolerance=1e-12,
                   dtype=np.complex128)
    Wg, Hg, Pg, cg = oracle.cmfwisa(V, [W0], [H0], maxiter=20, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-10)
    np.testing.assert_allclose(r.W, Wg[0], atol=1e-10)
    np.testing.assert_allclose(r.H, Hg[0], atol=1e-10)
    np.testing.assert_allclose(r.P, Pg[0], atol=1e-10)
    # phases stay unit-modulus
    np.testing.assert_allclose(np.abs(r.P), 1.0, atol=1e-12)


def test_cmfwisa_two_sources_short():
    """Multi-source trajectories are chaotic through the angle() branch
    (different-but-valid float association of W_all H_all); parity is
    checked over few iterations where divergence is still ~1e-12."""
    rng = np.random.default_rng(1)
    m, n = 20, 30
    V = rng.normal(size=(m, n)) + 1j * rng.normal(size=(m, n))
    W0, H0 = rng.uniform(size=(m, 4)), rng.uniform(size=(4, n))
    W1, H1 = rng.uniform(size=(m, 3)), rng.uniform(size=(3, n))
    r = nt.cmfwisa(V, [4, 3], W_init=[W0, W1], H_init=[H0, H1],
                   H_sparsity=[0.1, 0.0], maxiter=4, tolerance=1e-15,
                   dtype=np.complex128)
    Wg, Hg, Pg, cg = oracle.cmfwisa(V, [W0, W1], [H0, H1],
                                    H_sparsity=[0.1, 0.0], maxiter=4,
                                    tolerance=1e-15)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-10)
    for i in range(2):
        np.testing.assert_allclose(r.W[i], Wg[i], atol=1e-10)
        np.testing.assert_allclose(r.H[i], Hg[i], atol=1e-10)
        np.testing.assert_allclose(r.P[i], Pg[i], atol=1e-8)


def test_cmfwisa_p_fixed_and_separation():
    """P_fixed freezes phases; reconstruction approximates V."""
    rng = np.random.default_rng(2)
    m, n, k = 16, 24, 3
    mag = rng.gamma(2.0, 1.0, (m, k)) @ rng.gamma(1.0, 1.0, (k, n))
    V = mag * np.exp(1j * rng.uniform(-np.pi, np.pi, (m, n)))
    r = nt.cmfwisa(V, k, maxiter=50, seed=5, dtype=np.complex128,
                   P_fixed=True)
    np.testing.assert_allclose(r.P, np.exp(1j * np.angle(V)), atol=1e-12)
    assert r.cost[-1] < r.cost[0]


def test_cmfwisa_complex64_runs():
    rng = np.random.default_rng(3)
    V = (rng.normal(size=(12, 18)) + 1j * rng.normal(size=(12, 18))).astype(np.complex64)
    r = nt.cmfwisa(V, 3, maxiter=10, dtype=np.complex64)
    assert r.P.dtype == np.complex64
    assert np.all(np.isfinite(r.cost))


# ------------------------------------------------------------------- chcnmf
def test_chcnmf_parity():
    rng = np.random.default_rng(4)
    m, n, k, T, p = 14, 40, 3, 3, 8
    V = rng.uniform(0.05, 1, (m, n))
    S = V[:, rng.choice(n, p, replace=False)]
    G0 = rng.uniform(size=(p, k, T))
    H0 = rng.uniform(size=(k, n))
    r = nt.chcnmf(V, k, T, S_init=S, G_init=G0, H_init=H0, maxiter=15,
                  tolerance=1e-12, dtype=np.float64)
    Wg, Hg, Gg, cg = oracle.chcnmf(V, S, G0, H0, T, maxiter=15, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.G, Gg, atol=1e-9)
    np.testing.assert_allclose(r.H, Hg, atol=1e-9)
    np.testing.assert_allclose(r.W, Wg, atol=1e-9)


def test_chcnmf_sparsity_parity():
    rng = np.random.default_rng(5)
    m, n, k, T, p = 14, 40, 3, 3, 8
    V = rng.uniform(0.05, 1, (m, n))
    S = V[:, rng.choice(n, p, replace=False)]
    G0 = rng.uniform(size=(p, k, T))
    H0 = rng.uniform(size=(k, n))
    r = nt.chcnmf(V, k, T, S_init=S, G_init=G0, H_init=H0, H_sparsity=0.05,
                  G_sparsity=0.02, maxiter=12, tolerance=1e-12,
                  dtype=np.float64)
    Wg, Hg, Gg, cg = oracle.chcnmf(V, S, G0, H0, T, H_sparsity=0.05,
                                   G_sparsity=0.02, maxiter=12, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.G, Gg, atol=1e-9)


def test_chcnmf_w_init_fit_and_hull():
    """W_init triggers the inner G-fit (chcnmf.m:140-170); default S comes
    from hull extraction."""
    rng = np.random.default_rng(6)
    m, n, k, T = 10, 50, 3, 2
    V = rng.uniform(size=(m, n))
    W_init = rng.uniform(size=(m, k, T))
    r = nt.chcnmf(V, k, T, W_init=W_init, maxiter=8, dtype=np.float64, seed=2)
    assert r.S.shape[0] == m
    # G columns sum to 1 per frame
    np.testing.assert_allclose(np.asarray(r.G).sum(0), np.ones((k, T)), atol=1e-10)
    assert np.all(np.isfinite(r.cost))
    # W_fixed implies G_fixed (chcnmf.m:133-137)
    r2 = nt.chcnmf(V, k, T, W_init=W_init, W_fixed=True, maxiter=4,
                   dtype=np.float64, seed=2)
    r3 = nt.chcnmf(V, k, T, W_init=W_init, W_fixed=True, maxiter=1,
                   dtype=np.float64, seed=2)
    np.testing.assert_allclose(r2.G, r3.G, atol=1e-12)


# ------------------------------------------------------------ constrainednmf
@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_constrainednmf_parity(div):
    rng = np.random.default_rng(7)
    m, n, k = 18, 30, 4
    V = rng.uniform(0.1, 1, (m, n))
    labels = rng.integers(0, 3, n)
    labels[rng.choice(n, 10, replace=False)] = -1
    W0 = rng.uniform(size=(m, k))
    nlab = int((labels > -1).sum())
    nu = n - nlab
    ncls = len(np.unique(labels)) - 1
    Z0 = rng.uniform(size=(k, nu + ncls))
    r = nt.constrainednmf(V, labels, k, W_init=W0, Z_init=Z0, divergence=div,
                          maxiter=15, tolerance=1e-12, dtype=np.float64)
    Wg, Hg, Zg, Ag, cg = oracle.constrainednmf(V, labels, W0, Z0,
                                               divergence=div, maxiter=15,
                                               tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-10)
    np.testing.assert_allclose(r.W, Wg, atol=1e-10)
    np.testing.assert_allclose(r.Z, Zg, atol=1e-10)
    np.testing.assert_array_equal(r.A, Ag)
    np.testing.assert_allclose(r.H, Hg, atol=1e-10)


def test_constrainednmf_label_structure():
    """Labeled samples of the same class share identical H columns
    (the hard constraint H = Z A)."""
    rng = np.random.default_rng(8)
    m, n, k = 12, 20, 3
    V = rng.uniform(0.1, 1, (m, n))
    labels = np.array([0] * 7 + [1] * 7 + [-1] * 6)
    r = nt.constrainednmf(V, labels, k, maxiter=10, dtype=np.float64, seed=1)
    H = np.asarray(r.H)
    for c in (0, 1):
        cols = H[:, labels == c]
        assert np.max(np.abs(cols - cols[:, :1])) < 1e-12
    assert r.A.shape == (6 + 2, n)


def test_constrainednmf_all_labeled():
    rng = np.random.default_rng(9)
    V = rng.uniform(0.1, 1, (10, 12))
    labels = rng.integers(5, 8, 12)  # arbitrary class ids, all labeled
    r = nt.constrainednmf(V, labels, 3, maxiter=8, dtype=np.float64)
    assert r.A.shape == (3, 12)  # no unlabeled block
    assert np.all(np.isfinite(r.cost))


def test_constrainednmf_label_length_check():
    rng = np.random.default_rng(10)
    V = rng.uniform(size=(5, 8))
    with pytest.raises(ValueError, match="label vector"):
        nt.constrainednmf(V, np.zeros(5), 2)


def test_cmfwisa_fixed_flags_parity():
    rng = np.random.default_rng(20)
    m, n, k = 16, 22, 3
    V = rng.normal(size=(m, n)) + 1j * rng.normal(size=(m, n))
    W0 = rng.uniform(size=(m, k))
    H0 = rng.uniform(size=(k, n))
    r = nt.cmfwisa(V, k, W_init=W0, H_init=H0, W_fixed=True, P_fixed=True,
                   maxiter=10, tolerance=1e-12, dtype=np.complex128)
    Wg, Hg, Pg, cg = oracle.cmfwisa(V, [W0], [H0], W_fixed=[True],
                                    P_fixed=[True], maxiter=10,
                                    tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-10)
    np.testing.assert_allclose(r.H, Hg[0], atol=1e-10)
    # fixed W only normalized once; fixed P stays the init phase
    np.testing.assert_allclose(r.W, W0 / np.sqrt((W0**2).sum(0)), atol=1e-12)
    np.testing.assert_allclose(r.P, np.exp(1j * np.angle(V)), atol=1e-12)


def test_chcnmf_fixed_flags_parity():
    rng = np.random.default_rng(21)
    m, n, k, T, p = 12, 30, 3, 2, 7
    V = rng.uniform(size=(m, n))
    S = V[:, rng.choice(n, p, replace=False)]
    G0 = rng.uniform(size=(p, k, T))
    H0 = rng.uniform(size=(k, n))
    for kw in [dict(G_fixed=True), dict(H_fixed=True)]:
        r = nt.chcnmf(V, k, T, S_init=S, G_init=G0, H_init=H0, maxiter=8,
                      tolerance=1e-12, dtype=np.float64, **kw)
        Wg, Hg, Gg, cg = oracle.chcnmf(V, S, G0, H0, T, maxiter=8,
                                       tolerance=1e-12, **kw)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
        np.testing.assert_allclose(r.G, Gg, atol=1e-9)
        np.testing.assert_allclose(r.H, Hg, atol=1e-9)


def test_constrainednmf_all_unlabeled():
    """labels all -1: A degenerates to the identity and the model reduces
    to plain NMF with H = Z."""
    rng = np.random.default_rng(30)
    V = rng.uniform(0.1, 1, (10, 14))
    labels = np.full(14, -1)
    r = nt.constrainednmf(V, labels, 3, maxiter=5, dtype=np.float64, seed=1)
    np.testing.assert_array_equal(r.A, np.eye(14))
    np.testing.assert_allclose(r.H, r.Z, atol=0)
    assert np.all(np.isfinite(r.cost))
