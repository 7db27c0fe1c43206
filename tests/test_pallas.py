"""Fused Pallas kernel tests (interpreter mode on CPU; the same code
compiles for real on TPU — exercised by the verify drive and bench)."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.ops.pallas import phi_dot_ht, wt_dot_phi, cost_terms


def make(m=300, n=700, k=40, seed=0):
    """Deliberately non-tile-aligned shapes to exercise the masking."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    V = jnp.asarray(rng.uniform(0.1, 1, (m, n)), jnp.float32)
    W = jnp.asarray(rng.uniform(0.1, 1, (m, k)), jnp.float32)
    H = jnp.asarray(rng.uniform(0.1, 1, (k, n)), jnp.float32)
    return V, W, H


def rel(a, b):
    return np.max(np.abs(np.asarray(a, np.float64) - b)
                  / np.maximum(np.abs(b), 1e-6))


def test_kl_w_phase():
    V, W, H = make()
    Vh = np.asarray(W, np.float64) @ np.asarray(H, np.float64)
    ref = (np.asarray(V) / Vh) @ np.asarray(H).T
    assert rel(phi_dot_ht(V, W, H, "kl"), ref) < 1e-4


def test_is_w_phase():
    V, W, H = make(seed=1)
    Vh = np.asarray(W, np.float64) @ np.asarray(H, np.float64)
    a, b = phi_dot_ht(V, W, H, "is")
    assert rel(a, (np.asarray(V) / Vh**2) @ np.asarray(H).T) < 1e-4
    assert rel(b, (1.0 / Vh) @ np.asarray(H).T) < 1e-4


def test_kl_h_phase():
    V, W, H = make(seed=2)
    Vh = np.asarray(W, np.float64) @ np.asarray(H, np.float64)
    ref = np.asarray(W).T @ (np.asarray(V) / Vh)
    assert rel(wt_dot_phi(V, W, H, "kl"), ref) < 1e-4


def test_is_h_phase():
    V, W, H = make(seed=3)
    Vh = np.asarray(W, np.float64) @ np.asarray(H, np.float64)
    a, b = wt_dot_phi(V, W, H, "is")
    assert rel(a, np.asarray(W).T @ (np.asarray(V) / Vh**2)) < 1e-4
    assert rel(b, np.asarray(W).T @ (1.0 / Vh)) < 1e-4


def test_cost_terms():
    V, W, H = make(seed=4)
    Vh = np.asarray(W, np.float64) @ np.asarray(H, np.float64)
    assert rel(cost_terms(V, W, H, "kl"),
               np.sum(np.asarray(V) * np.log(Vh))) < 1e-4
    s1, s2 = cost_terms(V, W, H, "is")
    assert rel(s1, np.sum(np.log(Vh))) < 1e-4
    assert rel(s2, np.sum(np.asarray(V) / Vh)) < 1e-4


@pytest.mark.parametrize("div", ["kl", "is"])
def test_fused_solver_matches_naive(div):
    rng = np.random.default_rng(5)
    m, n, k = 150, 200, 10
    V = rng.uniform(0.1, 1, (m, n)).astype(np.float32)
    W0 = rng.uniform(size=(m, k)).astype(np.float32)
    H0 = rng.uniform(size=(k, n)).astype(np.float32)
    a = nt.nmf(V, k, W_init=W0, H_init=H0, divergence=div, method="naive",
               maxiter=8, tolerance=1e-30, dtype=np.float32)
    b = nt.nmf(V, k, W_init=W0, H_init=H0, divergence=div, method="fused",
               maxiter=8, tolerance=1e-30, dtype=np.float32)
    np.testing.assert_allclose(a.cost, b.cost, rtol=2e-3)
    np.testing.assert_allclose(a.W, b.W, atol=2e-3)
    np.testing.assert_allclose(a.H, b.H, atol=2e-2)


def test_fused_rejects_bad_config():
    rng = np.random.default_rng(6)
    V = rng.uniform(0.1, 1, (20, 20))
    with pytest.raises(ValueError):
        nt.nmf(V, 3, divergence="euclidean", method="fused")
    with pytest.raises(ValueError):
        nt.nmf(V, 3, divergence="kl", method="fused", dtype=np.float64)


def test_dma_kernel_matches_reference():
    """Manually-pipelined W-phase kernel (fused_dma) in interpreter mode."""
    import jax.numpy as jnp
    from nmf_toolbox_tpu.ops.pallas.fused_dma import kl_phi_dot_ht_dma
    rng = np.random.default_rng(7)
    m, n, k = 300, 700, 40
    V = jnp.asarray(rng.uniform(0.1, 1, (m, n)), jnp.float32)
    W = jnp.asarray(rng.uniform(0.1, 1, (m, k)), jnp.float32)
    H = jnp.asarray(rng.uniform(0.1, 1, (k, n)), jnp.float32)
    ref = (np.asarray(V) / (np.asarray(W, np.float64) @ np.asarray(H, np.float64))) \
        @ np.asarray(H).T
    got = np.asarray(kl_phi_dot_ht_dma(V, W, H))
    # bf16 MXU dots inside -> ~1e-3 relative
    assert np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-6)) < 5e-3
