"""Accelerated MU / HALS inner iterations (Gillis & Glineur 2012,
arXiv:1107.5194 — PAPERS.md).  `inner_iters` repeats the Gram-space
factor updates, reusing the V-touching products V@H' / W'@V, so one
outer iteration buys several updates' progress for the same HBM traffic.

Default inner_iters=1 is the exact reference trajectory (covered by the
oracle-parity tests); these tests pin the accelerated variant.
"""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt


def _problem(m=150, n=100, r=8, seed=0):
    rng = np.random.default_rng(seed)
    V = (rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n))
         + 0.01).astype(np.float32)
    W0 = rng.uniform(size=(m, 10)).astype(np.float32)
    H0 = rng.uniform(size=(10, n)).astype(np.float32)
    return V, W0, H0


def test_inner_one_is_reference_trajectory():
    V, W0, H0 = _problem()
    a = nt.nmf(V, 10, W_init=W0, H_init=H0, maxiter=10, tolerance=1e-30)
    b = nt.nmf(V, 10, W_init=W0, H_init=H0, maxiter=10, tolerance=1e-30,
               inner_iters=1)
    np.testing.assert_array_equal(a.W, b.W)
    np.testing.assert_array_equal(a.cost, b.cost)


@pytest.mark.parametrize("solver", ["nmf", "hals"])
def test_inner_monotone_and_faster(solver):
    V, W0, H0 = _problem(seed=4)
    fn = nt.nmf if solver == "nmf" else nt.nmf_hals
    base = fn(V, 10, W_init=W0, H_init=H0, maxiter=12, tolerance=1e-30)
    acc = fn(V, 10, W_init=W0, H_init=H0, maxiter=12, tolerance=1e-30,
             inner_iters=3)
    # inner repetitions are valid descent steps on the same objective
    assert np.all(np.diff(acc.cost) <= 1e-4 * np.abs(acc.cost[:-1]) + 1e-5)
    # and after the same number of OUTER iterations the fit is better
    assert acc.cost[-1] < base.cost[-1]


def test_inner_validation():
    V, W0, H0 = _problem()
    with pytest.raises(ValueError, match="inner_iters"):
        nt.nmf(V, 10, inner_iters=0)
    with pytest.raises(ValueError, match="Gram"):
        nt.nmf(V, 10, divergence="kl", inner_iters=2)
    with pytest.raises(ValueError, match="inner_iters"):
        nt.nmf_hals(V, 10, inner_iters=-1)


def test_inner_respects_fixed_factors():
    V, W0, H0 = _problem(seed=7)
    r = nt.nmf(V, 10, W_init=W0, H_init=H0, maxiter=5, tolerance=1e-30,
               inner_iters=3, W_fixed=True)
    # fixed W: still exactly the (renormalized) init
    Wn = W0 / np.sqrt((W0 ** 2).sum(0, keepdims=True))
    np.testing.assert_allclose(r.W, Wn, rtol=2e-6)


def test_inner_composes_with_mesh():
    from nmf_toolbox_tpu.parallel import make_mesh
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest env")
    V, W0, H0 = _problem(m=64, n=67, seed=2)  # non-divisible n
    single = nt.nmf(V, 10, W_init=W0, H_init=H0, maxiter=6,
                    tolerance=1e-30, inner_iters=2)
    meshed = nt.nmf(V, 10, W_init=W0, H_init=H0, maxiter=6,
                    tolerance=1e-30, inner_iters=2, mesh=make_mesh(8))
    np.testing.assert_allclose(meshed.W, single.W, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(meshed.cost, single.cost, rtol=2e-4)
