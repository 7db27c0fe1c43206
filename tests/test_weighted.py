"""Per-entry weighted NMF (weights= on nt.nmf; beyond-reference).

The weighted MU rules fall out of the same elementwise majorization as
the reference's updates with both gradient fields scaled by the weights
(ops/divergence.fields).  Pinned here against a literal NumPy oracle of
the weighted update equations, plus property and recovery tests.
"""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt

EPS = np.finfo(np.float64).eps


def _problem(m=60, n=40, r=5, seed=0):
    rng = np.random.default_rng(seed)
    V = (rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n))
         + 0.01).astype(np.float64)
    W0 = rng.uniform(0.1, 1.0, (m, 6))
    H0 = rng.uniform(0.1, 1.0, (6, n))
    M = (rng.uniform(size=(m, n)) < 0.8).astype(np.float64)
    return V, W0, H0, M


def _oracle_euclidean(V, W, H, M, iters):
    W = W / np.sqrt((W ** 2).sum(0, keepdims=True))
    costs = []
    for _ in range(iters):
        Vh = W @ H
        A = (M * V) @ H.T
        B = (M * Vh) @ H.T
        neg = A + W * np.diag(W.T @ B)[None, :]
        pos = B + W * np.diag(W.T @ A)[None, :]
        W = W * (neg / np.maximum(pos, EPS))
        W = W / np.sqrt((W ** 2).sum(0, keepdims=True))
        Vh = W @ H
        H = H * ((W.T @ (M * V)) / np.maximum(W.T @ (M * Vh), EPS))
        Vh = W @ H
        costs.append(0.5 * np.sum(M * (V - Vh) ** 2))
    return W, H, np.array(costs)


def _oracle_kl(V, W, H, M, iters):
    W = W / np.sqrt((W ** 2).sum(0, keepdims=True))
    costs = []
    for _ in range(iters):
        Vh = W @ H
        A = (M * V / Vh) @ H.T
        B = M @ H.T
        neg = A + W * np.diag(W.T @ B)[None, :]
        pos = B + W * np.diag(W.T @ A)[None, :]
        W = W * (neg / np.maximum(pos, EPS))
        W = W / np.sqrt((W ** 2).sum(0, keepdims=True))
        Vh = W @ H
        H = H * ((W.T @ (M * V / Vh)) / np.maximum(W.T @ M, EPS))
        Vh = W @ H
        term = V * np.log(V / Vh) - V + Vh
        costs.append(np.sum(M * term))
    return W, H, np.array(costs)


@pytest.mark.parametrize("div", ["euclidean", "kl"])
def test_weighted_matches_oracle(div):
    V, W0, H0, M = _problem()
    oracle = _oracle_euclidean if div == "euclidean" else _oracle_kl
    Wo, Ho, co = oracle(V, W0.copy(), H0.copy(), M, 8)
    r = nt.nmf(V, 6, W_init=W0, H_init=H0, weights=M, divergence=div,
               maxiter=8, tolerance=1e-300, dtype="float64")
    np.testing.assert_allclose(r.W, Wo, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(r.H, Ho, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(r.cost, co, rtol=1e-8)


@pytest.mark.parametrize("div", ["euclidean", "kl", "is", "ab"])
def test_weighted_monotone(div):
    V, W0, H0, M = _problem(seed=3)
    kw = {"alpha": 0.7, "beta": 0.8} if div == "ab" else {}
    r = nt.nmf(V, 6, W_init=W0, H_init=H0, weights=M, divergence=div,
               maxiter=12, tolerance=1e-300, dtype="float64", **kw)
    assert np.all(np.isfinite(r.cost))
    assert np.all(np.diff(r.cost) <= 1e-9 * np.abs(r.cost[:-1]) + 1e-9)


def test_uniform_weights_equal_unweighted():
    V, W0, H0, _ = _problem(seed=5)
    ones = np.ones_like(V)
    a = nt.nmf(V, 6, W_init=W0, H_init=H0, maxiter=6, tolerance=1e-300,
               dtype="float64", method="naive")
    b = nt.nmf(V, 6, W_init=W0, H_init=H0, weights=ones, maxiter=6,
               tolerance=1e-300, dtype="float64")
    np.testing.assert_allclose(b.W, a.W, rtol=1e-12)
    np.testing.assert_allclose(b.cost, a.cost, rtol=1e-12)


def test_missing_data_recovery():
    # Mask 30% of the entries of an exactly low-rank matrix; the weighted
    # factorization must fit the OBSERVED entries and, by the low-rank
    # structure, complete the missing ones far better than treating the
    # corrupted entries as data.
    rng = np.random.default_rng(7)
    m, n, r = 80, 60, 4
    V_true = (rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n)))
    mask = rng.uniform(size=(m, n)) < 0.7
    V_corrupt = np.where(mask, V_true, 37.0)  # garbage where unobserved
    rw = nt.nmf(V_corrupt.astype(np.float32), r,
                weights=mask.astype(np.float32), maxiter=400, seed=2,
                tolerance=1e-300)
    ru = nt.nmf(V_corrupt.astype(np.float32), r, maxiter=400, seed=2,
                tolerance=1e-300)
    err_w = np.linalg.norm((rw.W @ rw.H - V_true)[~mask])
    err_u = np.linalg.norm((ru.W @ ru.H - V_true)[~mask])
    assert err_w < 0.2 * err_u


def test_weighted_validation():
    V, W0, H0, M = _problem()
    with pytest.raises(ValueError, match="naive"):
        nt.nmf(V, 6, weights=M, method="gram")
    with pytest.raises(ValueError, match="shape"):
        nt.nmf(V, 6, weights=M[:10])


def test_weighted_composes_with_mesh():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest env")
    from nmf_toolbox_tpu.parallel import make_mesh
    V, W0, H0, M = _problem(m=64, n=67, seed=11)  # non-divisible n
    V, W0, H0, M = (x.astype(np.float32) for x in (V, W0, H0, M))
    single = nt.nmf(V, 6, W_init=W0, H_init=H0, weights=M, maxiter=6,
                    tolerance=1e-30)
    meshed = nt.nmf(V, 6, W_init=W0, H_init=H0, weights=M, maxiter=6,
                    tolerance=1e-30, mesh=make_mesh(8))
    np.testing.assert_allclose(meshed.W, single.W, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(meshed.cost, single.cost, rtol=2e-4)


def test_facade_weights_fit_only():
    from nmf_toolbox_tpu.estimators import NMF
    V, W0, H0, M = _problem(seed=13)
    X = V.astype(np.float32).T
    # weights are given in sklearn orientation (n_samples, n_features),
    # same as X (ADVICE r2 #2); fit works, transform on differently-sized
    # data must not forward them
    est = NMF(5, solver="mu", max_iter=8, tol=1e-30,
              weights=M.astype(np.float32).T)
    Ht = est.fit_transform(X)
    assert Ht.shape == (V.shape[1], 5)
    X_new = X[:10]
    Ht2 = est.transform(X_new)
    assert Ht2.shape == (10, 5)


# ---------------------------------------------------------------------------
# Convolutive family (weights= on nt.cnmf)
# ---------------------------------------------------------------------------

def _conv_problem(m=40, n=50, k=4, T=3, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.gamma(2.0, 1.0, (m, k, T))
    H = rng.gamma(0.5, 1.0, (k, n))
    V = sum(W[:, :, t] @ np.pad(H, ((0, 0), (t, 0)))[:, :n]
            for t in range(T)) + 0.01
    M = (rng.uniform(size=(m, n)) < 0.8).astype(np.float64)
    W0 = rng.uniform(0.1, 1.0, (m, k, T))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    return V.astype(np.float64), W0, H0, M


def test_cnmf_uniform_weights_equal_unweighted_naive():
    V, W0, H0, _ = _conv_problem()
    ones = np.ones(V.shape)
    a = nt.cnmf(V, 4, 3, W_init=W0, H_init=H0, maxiter=6, tolerance=1e-300,
                dtype="float64", method="naive")
    b = nt.cnmf(V, 4, 3, W_init=W0, H_init=H0, weights=ones, maxiter=6,
                tolerance=1e-300, dtype="float64")
    np.testing.assert_allclose(b.W, a.W, rtol=1e-12)
    np.testing.assert_allclose(b.cost, a.cost, rtol=1e-12)


@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_cnmf_weighted_monotone_and_nan_tolerant(div):
    V, W0, H0, M = _conv_problem(seed=4)
    V_nan = np.where(M > 0, V, np.nan)
    r = nt.cnmf(V_nan, 4, 3, W_init=W0, H_init=H0, weights=M,
                divergence=div, maxiter=10, tolerance=1e-300,
                dtype="float64")
    assert np.all(np.isfinite(r.W)) and np.all(np.isfinite(r.cost))
    assert np.all(np.diff(r.cost) <= 1e-9 * np.abs(r.cost[:-1]) + 1e-9)


def test_cnmf_weighted_recovers_missing():
    V, W0, H0, M = _conv_problem(m=50, n=80, seed=9)
    V_corrupt = np.where(M > 0, V, 53.0)
    rw = nt.cnmf(V_corrupt.astype(np.float32), 4, 3,
                 weights=M.astype(np.float32), maxiter=300, seed=3,
                 tolerance=1e-300)
    ru = nt.cnmf(V_corrupt.astype(np.float32), 4, 3, maxiter=300, seed=3,
                 tolerance=1e-300, method="naive")
    from nmf_toolbox_tpu.ops.shift import reconstruct
    Vw = np.asarray(reconstruct(rw.W, rw.H))
    Vu = np.asarray(reconstruct(ru.W, ru.H))
    miss = M == 0
    err_w = np.linalg.norm((Vw - V)[miss])
    err_u = np.linalg.norm((Vu - V)[miss])
    assert err_w < 0.3 * err_u


def test_cnmf_weighted_validation_and_mesh():
    V, W0, H0, M = _conv_problem()
    with pytest.raises(ValueError, match="naive"):
        nt.cnmf(V, 4, 3, weights=M, method="gram")
    with pytest.raises(ValueError, match="shape"):
        nt.cnmf(V, 4, 3, weights=M[:5])
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest env")
    from nmf_toolbox_tpu.parallel import make_mesh
    V32, W032, H032, M32 = (np.asarray(x, np.float32)
                            for x in (V, W0, H0, M))
    single = nt.cnmf(V32, 4, 3, W_init=W032, H_init=H032, weights=M32,
                     maxiter=5, tolerance=1e-30)
    meshed = nt.cnmf(V32, 4, 3, W_init=W032, H_init=H032, weights=M32,
                     maxiter=5, tolerance=1e-30, mesh=make_mesh(8))
    np.testing.assert_allclose(meshed.W, single.W, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(meshed.cost, single.cost, rtol=2e-4)


def test_weighted_multisource():
    # weights are per-entry of V and orthogonal to the source blocks
    V, W0, H0, M = _problem(seed=17)
    r = nt.nmf(V, [4, 2], weights=M, W_sparsity=[0.0, 0.1], maxiter=8,
               tolerance=1e-300, dtype="float64", seed=5)
    assert isinstance(r.W, list) and r.W[0].shape == (60, 4)
    assert np.all(np.diff(r.cost) <= 1e-9 * np.abs(r.cost[:-1]) + 1e-9)


def _oracle_is(V, W, H, M, iters):
    W = W / np.sqrt((W ** 2).sum(0, keepdims=True))
    costs = []
    for _ in range(iters):
        Vh = W @ H
        A = (M * V / Vh ** 2) @ H.T
        B = (M / Vh) @ H.T
        neg = A + W * np.diag(W.T @ B)[None, :]
        pos = B + W * np.diag(W.T @ A)[None, :]
        W = W * (neg / np.maximum(pos, EPS))
        W = W / np.sqrt((W ** 2).sum(0, keepdims=True))
        Vh = W @ H
        H = H * ((W.T @ (M * V / Vh ** 2)) / np.maximum(W.T @ (M / Vh), EPS))
        Vh = W @ H
        term = np.log(Vh / V) + V / Vh - 1.0
        costs.append(np.sum(M * term))
    return W, H, np.array(costs)


def test_weighted_is_matches_oracle():
    V, W0, H0, M = _problem(seed=19)
    Wo, Ho, co = _oracle_is(V, W0.copy(), H0.copy(), M, 6)
    r = nt.nmf(V, 6, W_init=W0, H_init=H0, weights=M, divergence="is",
               maxiter=6, tolerance=1e-300, dtype="float64")
    np.testing.assert_allclose(r.W, Wo, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(r.cost, co, rtol=1e-8)


def test_weighted_with_sparsity_matches_oracle():
    # the L1 penalty enters the POS denominator and the cost unweighted
    # (it constrains the factors, not the data) — same as nmf.m:168,216
    V, W0, H0, M = _problem(seed=23)
    wsp, hsp = 0.05, 0.02
    W, H = W0.copy() / np.sqrt((W0 ** 2).sum(0, keepdims=True)), H0.copy()
    costs = []
    for _ in range(5):
        Vh = W @ H
        A = (M * V) @ H.T
        B = (M * Vh) @ H.T
        neg = A + W * np.diag(W.T @ B)[None, :]
        pos = B + W * np.diag(W.T @ A)[None, :]
        W = W * (neg / np.maximum(pos + wsp, EPS))
        W = W / np.sqrt((W ** 2).sum(0, keepdims=True))
        Vh = W @ H
        H = H * ((W.T @ (M * V)) / np.maximum(W.T @ (M * Vh) + hsp, EPS))
        Vh = W @ H
        costs.append(0.5 * np.sum(M * (V - Vh) ** 2)
                     + wsp * np.abs(W).sum() + hsp * np.abs(H).sum())
    r = nt.nmf(V, 6, W_init=W0, H_init=H0, weights=M, W_sparsity=wsp,
               H_sparsity=hsp, maxiter=5, tolerance=1e-300, dtype="float64")
    np.testing.assert_allclose(r.W, W, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(r.cost, np.array(costs), rtol=1e-8)


def test_constrainednmf_weighted():
    # weights follow V through the unlabeled-first sample reorder; with
    # all-uniform weights the trajectory matches unweighted exactly
    rng = np.random.default_rng(29)
    V, W0, H0, M = _problem(seed=29)
    labels = np.full(V.shape[1], -1)
    labels[::3] = rng.integers(0, 3, size=len(labels[::3]))
    a = nt.constrainednmf(V, labels, 5, maxiter=6, tolerance=1e-300,
                          dtype="float64", seed=3)
    b = nt.constrainednmf(V, labels, 5, weights=np.ones(V.shape),
                          maxiter=6, tolerance=1e-300, dtype="float64",
                          seed=3)
    np.testing.assert_allclose(b.W, a.W, rtol=1e-12)
    np.testing.assert_allclose(b.cost, a.cost, rtol=1e-12)
    # masked NaN entries stay contained, weighted cost is monotone
    V_nan = np.where(M > 0, V, np.nan)
    r = nt.constrainednmf(V_nan, labels, 5, weights=M, divergence="kl",
                          maxiter=8, tolerance=1e-300, dtype="float64",
                          seed=3)
    assert np.all(np.isfinite(r.W)) and np.all(np.isfinite(r.cost))
    assert np.all(np.diff(r.cost) <= 1e-9 * np.abs(r.cost[:-1]) + 1e-9)
    with pytest.raises(ValueError, match="shape"):
        nt.constrainednmf(V, labels, 5, weights=M[:5])


def test_cnmf_weighted_kl_documented_boundary_divergence():
    # For KL the weighted path always uses the paper-correct SHIFTED
    # positive field while the unweighted path keeps the reference's
    # no-shift quirk (cnmf.m:220-224) — weights=ones therefore does NOT
    # reproduce the unweighted KL trajectory (documented in the cnmf
    # docstring / API.md).  Pin the fact so a future change that silently
    # alters either branch is caught.
    V, W0, H0, _ = _conv_problem(seed=31)
    ones = np.ones(V.shape)
    a = nt.cnmf(V, 4, 3, W_init=W0, H_init=H0, divergence="kl", maxiter=6,
                tolerance=1e-300, dtype="float64")
    b = nt.cnmf(V, 4, 3, W_init=W0, H_init=H0, divergence="kl",
                weights=ones, maxiter=6, tolerance=1e-300, dtype="float64")
    assert not np.allclose(b.W, a.W, rtol=1e-9)
    # both are valid monotone KL descents
    for r in (a, b):
        assert np.all(np.diff(r.cost) <= 1e-9 * np.abs(r.cost[:-1]) + 1e-9)
