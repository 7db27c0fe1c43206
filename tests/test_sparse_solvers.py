"""Parity tests for the projected-gradient family: nmfsc, cnmfsc."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
import oracle


def make_problem(m=24, n=36, k=4, seed=0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(0.05, 1.0, (m, n))
    W0 = rng.uniform(size=(m, k))
    H0 = rng.uniform(size=(k, n))
    H0 = H0 / np.sqrt((H0**2).sum(1, keepdims=True))
    return V, W0, H0


# -------------------------------------------------------------------- nmfsc
@pytest.mark.parametrize("kw", [
    {},                                       # plain MU + row renorm
    {"H_sparsity": 0.6},                      # H line search
    {"W_sparsity": 0.5},                      # W line search
    {"W_sparsity": 0.5, "H_sparsity": 0.6},   # both
])
def test_nmfsc_parity(kw):
    V, W0, H0 = make_problem()
    r = nt.nmfsc(V, 4, W_init=W0, H_init=H0, maxiter=20, tolerance=1e-12,
                 dtype=np.float64, **kw)
    Wg, Hg, cg = oracle.nmfsc(V, W0, H0, maxiter=20, tolerance=1e-12, **kw)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.W, Wg, atol=1e-9)
    np.testing.assert_allclose(r.H, Hg, atol=1e-9)
    assert len(r.cost) == len(cg)


def test_nmfsc_rejects_negative():
    V, W0, H0 = make_problem()
    V[0, 0] = -1.0
    with pytest.raises(ValueError, match="Negative values"):
        nt.nmfsc(V, 4)


def test_nmfsc_sparseness_invariant():
    """With both factors sparse, W columns satisfy the Hoyer sparseness
    target after every accepted step: unit L2 and L1 == hoyer_l1_target
    (nmfsc.m:93-96).  (With H_sparsity == 0 the reference's H-row renorm
    transfers norms INTO W, deliberately breaking the W projection until
    the next accepted W step — so that mode is not asserted here.)"""
    from nmf_toolbox_tpu.ops.projection import hoyer_l1_target
    V, W0, H0 = make_problem(seed=2)
    sp = 0.7
    r = nt.nmfsc(V, 4, W_init=W0, H_init=H0, W_sparsity=sp, H_sparsity=0.5,
                 maxiter=10, dtype=np.float64)
    W = np.asarray(r.W)
    np.testing.assert_allclose((W**2).sum(0), np.ones(4), atol=1e-8)
    np.testing.assert_allclose(np.abs(W).sum(0),
                               hoyer_l1_target(24, sp) * np.ones(4), atol=1e-8)
    assert np.all(W >= 0)


def test_nmfsc_initial_cost_stored():
    V, W0, H0 = make_problem(seed=3)
    r = nt.nmfsc(V, 4, W_init=W0, H_init=H0, maxiter=5, dtype=np.float64)
    Vs = V / V.max()
    c0 = 0.5 * np.sum((Vs - W0 @ H0) ** 2)
    np.testing.assert_allclose(r.cost[0], c0, rtol=1e-12)
    assert len(r.cost) == 6  # maxiter+1 semantics (nmfsc.m:137-139)


# ------------------------------------------------------------------- cnmfsc
@pytest.mark.parametrize("kw", [
    {},
    {"H_sparsity": 0.6},
    {"W_sparsity": 0.5},
    {"W_sparsity": 0.5, "H_sparsity": 0.6},
])
def test_cnmfsc_parity(kw):
    rng = np.random.default_rng(0)
    m, n, k, T = 16, 40, 3, 3
    V = rng.uniform(0.05, 1, (m, n))
    W0 = rng.uniform(0.1, 1, (m, k, T))
    H0 = rng.uniform(size=(k, n))
    H0 = H0 / np.sqrt((H0**2).sum(1, keepdims=True))
    r = nt.cnmfsc(V, k, T, W_init=W0, H_init=H0, maxiter=15, tolerance=1e-12,
                  dtype=np.float64, **kw)
    Wg, Hg, cg = oracle.cnmfsc(V, W0, H0, T, maxiter=15, tolerance=1e-12, **kw)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.W, Wg, atol=1e-9)
    np.testing.assert_allclose(r.H, Hg, atol=1e-9)
    assert len(r.cost) == len(cg)


def test_cnmfsc_t1_ws_parity():
    """T=1 exercises the W line search without cross-frame interaction;
    the line-search underflow return path (cnmfsc.m:245-249) must match
    the oracle exactly, including the trimmed cost length."""
    rng = np.random.default_rng(1)
    V = rng.uniform(0.05, 1, (16, 30))
    W0 = rng.uniform(0.1, 1, (16, 3, 1))
    H0 = rng.uniform(size=(3, 30))
    H0 = H0 / np.sqrt((H0**2).sum(1, keepdims=True))
    r = nt.cnmfsc(V, 3, 1, W_init=W0, H_init=H0, W_sparsity=0.4,
                  maxiter=12, tolerance=1e-12, dtype=np.float64)
    Wg, Hg, cg = oracle.cnmfsc(V, W0, H0, 1, W_sparsity=0.4,
                               maxiter=12, tolerance=1e-12)
    assert len(r.cost) == len(cg)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.W, Wg, atol=1e-9)


def test_cnmfsc_rejects_negative():
    rng = np.random.default_rng(2)
    V = rng.uniform(size=(8, 10))
    V[0, 0] = -0.5
    with pytest.raises(ValueError, match="Negative values"):
        nt.cnmfsc(V, 2, 2)


@pytest.mark.parametrize("kw", [
    {"W_fixed": True, "H_sparsity": 0.6},
    {"H_fixed": True, "W_sparsity": 0.5},
])
def test_nmfsc_fixed_flags_parity(kw):
    V, W0, H0 = make_problem(seed=9)
    r = nt.nmfsc(V, 4, W_init=W0, H_init=H0, maxiter=12, tolerance=1e-12,
                 dtype=np.float64, **kw)
    Wg, Hg, cg = oracle.nmfsc(V, W0, H0, maxiter=12, tolerance=1e-12, **kw)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.W, Wg, atol=1e-9)
    np.testing.assert_allclose(r.H, Hg, atol=1e-9)
