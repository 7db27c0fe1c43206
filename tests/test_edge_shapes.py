"""Randomized small-shape parity sweep: odd shapes (k=1, k>m, tiny n)
exercise einsum/broadcast edges that fixed-size tests miss."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
import oracle


SHAPES = [(5, 7, 1), (3, 9, 4), (12, 2, 2), (2, 2, 1), (6, 40, 6)]


@pytest.mark.parametrize("m,n,k", SHAPES)
@pytest.mark.parametrize("div", ["euclidean", "kl"])
def test_nmf_edge_shapes(m, n, k, div):
    rng = np.random.default_rng(m * 100 + n + k)
    V = rng.uniform(0.1, 1, (m, n))
    W0 = rng.uniform(0.1, 1, (m, k))
    H0 = rng.uniform(0.1, 1, (k, n))
    r = nt.nmf(V, k, W_init=W0, H_init=H0, divergence=div, maxiter=8,
               tolerance=1e-12, dtype=np.float64)
    Wg, Hg, cg = oracle.nmf(V, [W0], [H0], divergence=div, maxiter=8,
                            tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.W, Wg[0], atol=1e-9)


@pytest.mark.parametrize("m,n,k,T", [(4, 10, 1, 2), (5, 6, 2, 3), (8, 12, 3, 1)])
def test_cnmf_edge_shapes(m, n, k, T):
    rng = np.random.default_rng(m + n + k + T)
    V = rng.uniform(0.1, 1, (m, n))
    W0 = rng.uniform(0.1, 1, (m, k, T))
    H0 = rng.uniform(0.1, 1, (k, n))
    for method in ("naive", "gram"):
        r = nt.cnmf(V, k, T, W_init=W0, H_init=H0, maxiter=6,
                    tolerance=1e-12, dtype=np.float64, method=method)
        Wg, Hg, cg = oracle.cnmf(V, W0, H0, T, maxiter=6, tolerance=1e-12)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
        np.testing.assert_allclose(r.W, Wg, atol=1e-9)


@pytest.mark.parametrize("m,n,k", [(4, 8, 1), (10, 5, 3)])
def test_small_family_edge_shapes(m, n, k):
    rng = np.random.default_rng(m * 7 + n + k)
    V = rng.uniform(0.1, 1, (m, n))
    W0 = rng.uniform(0.1, 1, (m, k))
    H0 = rng.uniform(0.1, 1, (k, n))
    r = nt.lnmf(V, k, W_init=W0, H_init=H0, maxiter=6, dtype=np.float64)
    Wg, Hg, cg = oracle.lnmf(V, W0, H0, maxiter=6)
    np.testing.assert_allclose(r.W, Wg, atol=1e-9)
    Vm = V - 0.5
    Wm = rng.uniform(-1, 1, (m, k))
    Hm = H0 + 0.2
    r = nt.seminmf(Vm, k, W_init=Wm, H_init=Hm, maxiter=6, tolerance=1e-12,
                   dtype=np.float64)
    Wg, Hg, cg = oracle.seminmf(Vm, Wm, Hm, maxiter=6, tolerance=1e-12)
    np.testing.assert_allclose(r.H, Hg, atol=1e-8)


def test_projfunc_tiny_vectors():
    from nmf_toolbox_tpu.ops.projection import projfunc, hoyer_l1_target
    for N in (2, 3):
        rng = np.random.default_rng(N)
        s = rng.uniform(size=N)
        L1 = hoyer_l1_target(N, 0.5)
        v, it = projfunc(s, L1, 1.0)
        vr, itr = oracle.projfunc(s, L1, 1.0)
        np.testing.assert_allclose(np.asarray(v), vr, atol=1e-10)


def test_nmfsc_single_column():
    """k=1: the row projection operates on a single row."""
    rng = np.random.default_rng(9)
    V = rng.uniform(0.1, 1, (10, 14))
    W0 = rng.uniform(size=(10, 1))
    H0 = rng.uniform(size=(1, 14))
    H0 = H0 / np.sqrt((H0**2).sum())
    r = nt.nmfsc(V, 1, W_init=W0, H_init=H0, H_sparsity=0.5, maxiter=6,
                 tolerance=1e-12, dtype=np.float64)
    Wg, Hg, cg = oracle.nmfsc(V, W0, H0, H_sparsity=0.5, maxiter=6,
                              tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.H, Hg, atol=1e-9)


@pytest.mark.parametrize("m,n,k,T,P", [
    (4, 10, 1, 1, 1),   # fully degenerate: plain nmf-shaped
    (5, 6, 2, 3, 1),    # pitch axis degenerate
    (6, 8, 1, 1, 4),    # time axis degenerate, pitch active
    (3, 12, 2, 2, 3),   # P = m: maximal pitch range
])
def test_nmf2d_edge_shapes(m, n, k, T, P):
    rng = np.random.default_rng(m * 13 + n + k + T + P)
    V = rng.uniform(0.1, 1, (m, n))
    W0 = rng.uniform(0.1, 1, (m, k, T))
    H0 = rng.uniform(0.1, 1, (k, n, P))
    r = nt.nmf2d(V, k, T, P, W_init=W0, H_init=H0, maxiter=6,
                 tolerance=1e-12, dtype=np.float64)
    Wg, Hg, cg = oracle.nmf2d(V, W0, H0, T, P, maxiter=6, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9)
    np.testing.assert_allclose(r.W, Wg, atol=1e-9)
    np.testing.assert_allclose(r.H, Hg, atol=1e-9)


@pytest.mark.parametrize("n,k", [(2, 1), (5, 5), (9, 2)])
def test_symnmf_edge_shapes(n, k):
    rng = np.random.default_rng(n * 11 + k)
    B = rng.uniform(0.1, 1, (n, max(k, 1)))
    A = B @ B.T
    A = (A + A.T) / 2
    H0 = rng.uniform(0.1, 1, (n, k))
    r = nt.symnmf(A, k, H_init=H0, maxiter=6, tolerance=1e-12,
                  dtype=np.float64)
    Hg, cg = oracle.symnmf(A, H0, maxiter=6, tolerance=1e-12)
    # near-exact fits (k covers rank(A)) drive the cost to the f64
    # cancellation floor of the Gram identity vs the oracle's direct
    # residual: compare with the ~||A||^2 * eps_f64 absolute floor
    floor = float(np.sum(A * A)) * np.finfo(np.float64).eps
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9,
                               atol=4 * floor)
    np.testing.assert_allclose(r.H, Hg, atol=1e-9)
