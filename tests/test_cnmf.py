"""Parity + property tests for convolutive NMF."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
import oracle


def make_problem(m=20, n=30, k=3, T=4, seed=0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(0.1, 1.0, (m, n))
    W0 = rng.uniform(0.1, 1.0, (m, k, T))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    return V, W0, H0


@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_cnmf_parity(div):
    V, W0, H0 = make_problem()
    res = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, divergence=div,
                  maxiter=20, tolerance=1e-12, dtype=np.float64)
    Wg, Hg, cg = oracle.cnmf(V, W0, H0, 4, divergence=div,
                             maxiter=20, tolerance=1e-12)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-9)
    np.testing.assert_allclose(res.W, Wg, atol=1e-9)
    np.testing.assert_allclose(res.H, Hg, atol=1e-8)


def test_cnmf_ab():
    V, W0, H0 = make_problem(seed=2)
    res = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, divergence="ab",
                  alpha=0.5, beta=0.5, maxiter=10, tolerance=1e-12,
                  dtype=np.float64)
    Wg, Hg, cg = oracle.cnmf(V, W0, H0, 4, divergence="ab",
                             alpha=0.5, beta=0.5, maxiter=10, tolerance=1e-12)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-9)
    np.testing.assert_allclose(res.W, Wg, atol=1e-8)


def test_cnmf_sparsity_and_earlystop():
    V, W0, H0 = make_problem(seed=3)
    res = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, W_sparsity=0.05,
                  H_sparsity=0.02, maxiter=150, tolerance=1e-3,
                  dtype=np.float64)
    Wg, Hg, cg = oracle.cnmf(V, W0, H0, 4, W_sparsity=0.05, H_sparsity=0.02,
                             maxiter=150, tolerance=1e-3)
    assert len(res.cost) == len(cg)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)


def test_cnmf_context_1_equals_shapes():
    """T=1 reduces to plain NMF reconstruction semantics."""
    V, W0, H0 = make_problem(T=1, seed=4)
    res = nt.cnmf(V, 3, 1, W_init=W0, H_init=H0, maxiter=10,
                  tolerance=1e-12, dtype=np.float64)
    assert res.W.shape == (20, 3, 1)
    Vh = np.asarray(nt.reconstruct(np.asarray(res.W), np.asarray(res.H)))
    np.testing.assert_allclose(Vh, res.W[:, :, 0] @ res.H, rtol=1e-12)


def test_cnmf_crossframe_norm_invariant():
    """After each iteration ||W[:, k, :]||_F / T == 1 (cnmf.m:196-199)."""
    V, W0, H0 = make_problem(seed=5)
    res = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, maxiter=8,
                  dtype=np.float64)
    norms = np.sqrt(np.sum(np.asarray(res.W)**2, axis=(0, 2))) / 4
    np.testing.assert_allclose(norms, np.ones(3), atol=1e-12)


def test_cnmf_default_inits_run():
    V, _, _ = make_problem()
    res = nt.cnmf(V.astype(np.float32), 3, 4, maxiter=8, seed=11)
    assert res.W.shape == (20, 3, 4)
    assert np.all(np.isfinite(res.cost))
    assert np.all(res.W >= 0) and np.all(res.H >= 0)


def test_cnmf_multisource():
    V, W0, H0 = make_problem()
    rng = np.random.default_rng(7)
    W1 = rng.uniform(0.1, 1.0, (20, 2, 4))
    H1 = rng.uniform(0.1, 1.0, (2, 30))
    res = nt.cnmf(V, [3, 2], 4, W_init=[W0, W1], H_init=[H0, H1],
                  maxiter=10, tolerance=1e-12, dtype=np.float64)
    assert isinstance(res.W, list)
    assert res.W[0].shape == (20, 3, 4) and res.W[1].shape == (20, 2, 4)
    assert np.all(np.isfinite(res.cost))


def test_cnmf_gram_matches_naive():
    V, W0, H0 = make_problem(seed=9)
    a = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, method="naive",
                maxiter=25, tolerance=1e-12, dtype=np.float64)
    b = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, method="gram",
                maxiter=25, tolerance=1e-12, dtype=np.float64)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-9)
    np.testing.assert_allclose(a.W, b.W, atol=1e-9)
    np.testing.assert_allclose(a.H, b.H, atol=1e-9)


def test_cnmf_gram_rejects_noneuclid():
    V, W0, H0 = make_problem()
    import pytest
    with pytest.raises(ValueError):
        nt.cnmf(V, 3, 4, divergence="kl", method="gram")


def test_cnmf_multisource_parity():
    """Concatenated-block multi-source cnmf must match the literal
    per-source oracle (cross-frame norms and diag corrections are
    column-local by design — this pins that)."""
    rng = np.random.default_rng(13)
    m, n, T = 18, 26, 3
    V = rng.uniform(0.1, 1.0, (m, n))
    W0 = rng.uniform(0.1, 1.0, (m, 3, T))
    W1 = rng.uniform(0.1, 1.0, (m, 2, T))
    H0 = rng.uniform(0.1, 1.0, (3, n))
    H1 = rng.uniform(0.1, 1.0, (2, n))
    res = nt.cnmf(V, [3, 2], T, W_init=[W0, W1], H_init=[H0, H1],
                  W_sparsity=[0.02, 0.0], H_sparsity=[0.0, 0.01],
                  H_fixed=[False, True], maxiter=12, tolerance=1e-12,
                  dtype=np.float64, method="naive")
    Wg, Hg, cg = oracle.cnmf_multi(V, [W0, W1], [H0, H1], T,
                                   W_sparsity=[0.02, 0.0],
                                   H_sparsity=[0.0, 0.01],
                                   H_fixed=[False, True],
                                   maxiter=12, tolerance=1e-12)
    for s in range(2):
        np.testing.assert_allclose(res.W[s], Wg[s], atol=1e-9)
        np.testing.assert_allclose(res.H[s], Hg[s], atol=1e-9)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-9)
    # gram path must agree too
    res2 = nt.cnmf(V, [3, 2], T, W_init=[W0, W1], H_init=[H0, H1],
                   W_sparsity=[0.02, 0.0], H_sparsity=[0.0, 0.01],
                   H_fixed=[False, True], maxiter=12, tolerance=1e-12,
                   dtype=np.float64, method="gram")
    for s in range(2):
        np.testing.assert_allclose(res2.W[s], Wg[s], atol=1e-8)
    np.testing.assert_allclose(res2.cost, cg, rtol=1e-8)
