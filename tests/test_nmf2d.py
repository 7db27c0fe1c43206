"""NMF2D (2-D deconvolution, Schmidt & Morup 2006) — beyond-reference.

The correctness anchor is the REDUCTION: with pitch_len=1 the model is
exactly cnmf, and nmf2d follows cnmf's naive-step update order,
diagonal correction terms, and cross-frame normalization — so
trajectories must match bit-for-bit for every divergence whose cnmf
path uses paper-correct shifted fields (euclidean, IS, AB).  KL is the
one documented exception: cnmf reproduces the reference's no-shift
ones-field quirk (cnmf.m:220-224) while nmf2d is paper-correct.
"""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.ops.shift import shift_down_rows, shift_right


def model2d(W, H):
    """Literal reference reconstruction: the double shift sum (kept as
    an independent check of ops.shift.conv_reconstruct_2d)."""
    m, k, T = W.shape
    _, n, P = H.shape
    Lam = np.zeros((m, n))
    for t in range(T):
        for p in range(P):
            Wd = np.asarray(shift_down_rows(W[:, :, t], p))
            Hs = np.asarray(shift_right(H[:, :, p], t))
            Lam += Wd @ Hs
    return Lam


def test_public_reconstruct_dispatches_2d():
    rng = np.random.default_rng(0)
    W = rng.uniform(size=(9, 2, 2))
    H = rng.uniform(size=(2, 11, 3))
    np.testing.assert_allclose(np.asarray(nt.reconstruct(W, H)),
                               model2d(W, H), atol=1e-12)


@pytest.mark.parametrize("div,extra", [("euclidean", {}), ("is", {}),
                                       ("ab", {"alpha": 0.7, "beta": 0.8}),
                                       ("ab", {"alpha": 0.0, "beta": 0.9})])
def test_reduces_to_cnmf(div, extra):
    rng = np.random.default_rng(1)
    m, n, k, T = 14, 22, 3, 3
    V = rng.uniform(0.1, 1, (m, n))
    W0 = rng.uniform(size=(m, k, T))
    H0 = rng.uniform(size=(k, n))
    a = nt.nmf2d(V, k, T, 1, W_init=W0, H_init=H0[:, :, None], maxiter=12,
                 tolerance=1e-30, dtype=np.float64, divergence=div, **extra)
    b = nt.cnmf(V, k, T, W_init=W0, H_init=H0, maxiter=12, tolerance=1e-30,
                dtype=np.float64, divergence=div, method="naive", **extra)
    np.testing.assert_allclose(np.asarray(a.W), np.asarray(b.W), atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.H)[:, :, 0], np.asarray(b.H),
                               atol=1e-12)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-12)


def test_kl_reduction_differs_by_documented_quirk():
    # cnmf's KL keeps the reference's unshifted ones field
    # (cnmf.m:220-224); nmf2d uses the paper-correct shifted field, so
    # the trajectories must be close in objective but NOT identical.
    rng = np.random.default_rng(2)
    V = rng.uniform(0.1, 1, (12, 18))
    W0 = rng.uniform(size=(12, 2, 3))
    H0 = rng.uniform(size=(2, 18))
    a = nt.nmf2d(V, 2, 3, 1, W_init=W0, H_init=H0[:, :, None],
                 divergence="kl", maxiter=10, tolerance=1e-30,
                 dtype=np.float64)
    b = nt.cnmf(V, 2, 3, W_init=W0, H_init=H0, divergence="kl",
                maxiter=10, tolerance=1e-30, dtype=np.float64)
    assert not np.allclose(a.cost, b.cost, rtol=1e-6)
    assert abs(a.cost[-1] - b.cost[-1]) < 0.25 * b.cost[-1]


@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_cost_monotone(div):
    rng = np.random.default_rng(3)
    V = rng.uniform(0.1, 1, (16, 24))
    r = nt.nmf2d(V, 3, 2, 3, divergence=div, maxiter=25, seed=5,
                 tolerance=1e-30, dtype=np.float64)
    assert r.cost.shape == (25,)
    assert np.all(np.diff(r.cost) <= 1e-9 * np.abs(r.cost[:-1]))
    # reconstruction identity: returned cost is the cost of the model
    Lam = model2d(np.asarray(r.W), np.asarray(r.H))
    assert np.all(np.isfinite(Lam)) and Lam.min() >= 0


def test_recovers_planted_2d_structure():
    """A pitch-shifted pattern that ONE nmf2d element explains needs
    several plain-cnmf elements: fit both at k=1 and compare fits."""
    rng = np.random.default_rng(4)
    m, n, k, T, P = 24, 60, 1, 2, 4
    W_true = np.zeros((m, k, T))
    W_true[2, 0, 0], W_true[5, 0, 0], W_true[3, 0, 1] = 1.0, 0.6, 0.8
    H_true = rng.uniform(size=(k, n, P)) * (rng.uniform(size=(k, n, P)) < 0.15)
    V = model2d(W_true, H_true) + 1e-3
    r = nt.nmf2d(V, k, T, P, maxiter=300, seed=7, tolerance=1e-30,
                 dtype=np.float64)
    rel2d = np.linalg.norm(model2d(np.asarray(r.W), np.asarray(r.H)) - V) \
        / np.linalg.norm(V)
    c = nt.cnmf(V, k, T, maxiter=300, seed=7, tolerance=1e-30,
                dtype=np.float64)
    relc = np.linalg.norm(np.asarray(nt.reconstruct(c.W, c.H)) - V) \
        / np.linalg.norm(V)
    # MU from a random init converges slowly on sparse targets (the
    # measured plateau is ~0.32 at k=1 after 300-600 iters; gradients
    # finite-difference-verified) — the claim under test is the MODEL's:
    # the pitch axis must fit this data far better than plain cnmf at
    # the same k (measured 0.32 vs 0.67).
    assert rel2d < 0.4, rel2d
    assert rel2d < 0.55 * relc, (rel2d, relc)


def test_sparsity_and_fixed_factors():
    rng = np.random.default_rng(5)
    V = rng.uniform(0.1, 1, (12, 20))
    W0 = rng.uniform(size=(12, 2, 2))
    r = nt.nmf2d(V, 2, 2, 2, W_init=W0, W_fixed=True, maxiter=8, seed=1,
                 tolerance=1e-30, dtype=np.float64)
    # fixed basis: W equals the entry-normalized init at every step
    from nmf_toolbox_tpu.ops.normalize import cross_frame_norm
    Wn, _ = cross_frame_norm(np.asarray(W0, np.float64), None, 2)
    np.testing.assert_allclose(np.asarray(r.W), np.asarray(Wn), atol=1e-12)
    rs = nt.nmf2d(V, 2, 2, 2, H_sparsity=0.5, maxiter=20, seed=1,
                  tolerance=1e-30, dtype=np.float64)
    r0 = nt.nmf2d(V, 2, 2, 2, maxiter=20, seed=1, tolerance=1e-30,
                  dtype=np.float64)
    assert np.sum(np.asarray(rs.H)) < np.sum(np.asarray(r0.H))
    assert np.all(np.diff(rs.cost) <= 1e-9 * np.abs(rs.cost[:-1]))


def test_mesh_matches_single_device():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nmf_toolbox_tpu.parallel import make_mesh
    rng = np.random.default_rng(6)
    m, n, k, T, P = 13, 8 * 8 + 3, 3, 3, 2  # non-divisible n
    V = rng.uniform(0.1, 1, (m, n))
    W0 = rng.uniform(size=(m, k, T))
    H0 = rng.uniform(size=(k, n, P))
    a = nt.nmf2d(V, k, T, P, W_init=W0, H_init=H0, maxiter=8,
                 tolerance=1e-30, dtype=np.float64)
    for mesh in (make_mesh(8), make_mesh(shape=(2, 4))):
        b = nt.nmf2d(V, k, T, P, W_init=W0, H_init=H0, maxiter=8,
                     tolerance=1e-30, dtype=np.float64, mesh=mesh)
        np.testing.assert_allclose(np.asarray(a.W), np.asarray(b.W),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(a.H), np.asarray(b.H),
                                   atol=1e-10)
        np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


def test_validation():
    V = np.full((8, 10), 0.5, np.float32)
    with pytest.raises(ValueError, match="pitch_len"):
        nt.nmf2d(V, 2, 2, 9)  # P > m
    with pytest.raises(ValueError, match=">= 1"):
        nt.nmf2d(V, 2, 0, 1)
    with pytest.raises(TypeError, match="single-source"):
        nt.nmf2d(V, [2, 2], 2, 1)
    with pytest.raises(ValueError, match="W_init"):
        nt.nmf2d(V, 2, 2, 2, W_init=np.ones((8, 2)))
    with pytest.raises(ValueError, match="H_init"):
        nt.nmf2d(V, 2, 2, 2, H_init=np.ones((2, 10)))
    with pytest.raises(ValueError, match="2-D"):
        nt.nmf2d(V[None], 2, 2, 1)


def test_fuzzed_configs_match_oracle():
    """Randomized config sweep vs the literal-loop oracle (the
    test_fuzz_configs.py methodology, applied to the new solver)."""
    import oracle
    rng = np.random.default_rng(99)
    for trial in range(6):
        m = int(rng.integers(8, 16))
        n = int(rng.integers(10, 20))
        k = int(rng.integers(1, 4))
        T = int(rng.integers(1, 4))
        P = int(rng.integers(1, 4))
        div = rng.choice(["euclidean", "kl", "is", "ab"])
        extra = {}
        if div == "ab":
            extra = {"alpha": float(rng.choice([0.0, 0.5, 1.5])),
                     "beta": float(rng.choice([0.5, 1.0, 2.0]))}
        wsp = float(rng.choice([0.0, 0.3]))
        hsp = float(rng.choice([0.0, 0.2]))
        w_fx = bool(rng.random() < 0.2)
        h_fx = bool((not w_fx) and rng.random() < 0.2)
        V = rng.gamma(2.0, 1.0, (m, n)) + 0.05
        W0 = rng.uniform(0.1, 1.0, (m, k, T))
        H0 = rng.uniform(0.1, 1.0, (k, n, P))
        Wo, Ho, co = oracle.nmf2d(
            V, W0, H0, T, P, divergence=div, W_sparsity=wsp,
            H_sparsity=hsp, W_fixed=w_fx, H_fixed=h_fx, maxiter=8,
            tolerance=1e-12, **extra)
        r = nt.nmf2d(V, k, T, P, W_init=W0, H_init=H0, divergence=div,
                     W_sparsity=wsp, H_sparsity=hsp, W_fixed=w_fx,
                     H_fixed=h_fx, maxiter=8, tolerance=1e-12,
                     dtype=np.float64, **extra)
        cfg = (trial, div, extra, T, P, wsp, hsp, w_fx, h_fx)
        np.testing.assert_allclose(np.asarray(r.W), Wo, atol=1e-9,
                                   err_msg=str(cfg))
        np.testing.assert_allclose(np.asarray(r.H), Ho, atol=1e-9,
                                   err_msg=str(cfg))
        np.testing.assert_allclose(np.asarray(r.cost), co, rtol=1e-9,
                                   err_msg=str(cfg))
