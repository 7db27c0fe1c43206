"""sklearn-style facade tests."""
import numpy as np

from nmf_toolbox_tpu.estimators import NMF


def test_fit_transform_shapes_and_reconstruction():
    rng = np.random.default_rng(0)
    # low-rank nonneg data: samples x features
    X = rng.gamma(2.0, 1.0, (120, 6)) @ rng.gamma(1.0, 1.0, (6, 40)) + 0.01
    est = NMF(n_components=6, max_iter=150, tol=1e-9, random_state=1,
              dtype=np.float64)
    Ht = est.fit_transform(X)
    assert Ht.shape == (120, 6)
    assert est.components_.shape == (6, 40)
    rec = est.inverse_transform(Ht)
    rel = np.linalg.norm(X - rec) / np.linalg.norm(X)
    assert rel < 0.1
    assert est.n_iter_ > 0 and est.reconstruction_err_ > 0


def test_transform_new_data():
    rng = np.random.default_rng(1)
    W = rng.gamma(2.0, 1.0, (30, 4))
    X_train = (rng.gamma(1.0, 1.0, (80, 4)) @ W.T) + 0.01
    X_new = (rng.gamma(1.0, 1.0, (10, 4)) @ W.T) + 0.01
    est = NMF(n_components=4, max_iter=200, tol=1e-10, random_state=2,
              dtype=np.float64).fit(X_train)
    Ht = est.transform(X_new)
    rel = np.linalg.norm(X_new - est.inverse_transform(Ht)) / np.linalg.norm(X_new)
    assert Ht.shape == (10, 4) and rel < 0.2


def test_hals_solver_and_kl():
    rng = np.random.default_rng(2)
    X = rng.uniform(0.1, 1, (50, 20))
    a = NMF(n_components=3, solver="hals", max_iter=50, dtype=np.float64,
            random_state=3)
    Ht = a.fit_transform(X)
    assert np.all(Ht >= 0)
    b = NMF(n_components=3, divergence="kl", max_iter=20, dtype=np.float64)
    b.fit(X)
    assert b.cost_trace_.shape[0] <= 20


def test_transform_refuses_unfixable_solver():
    import pytest
    rng = np.random.default_rng(3)
    X = rng.uniform(0.1, 1, (30, 12))
    est = NMF(n_components=3, solver="convexnmf", max_iter=5,
              dtype=np.float64).fit(X)
    with pytest.raises(NotImplementedError):
        est.transform(X)


def test_fit_refuses_3d_basis_solver():
    import pytest
    rng = np.random.default_rng(4)
    X = rng.uniform(0.1, 1, (30, 12))
    with pytest.raises(ValueError, match="3-D basis"):
        NMF(n_components=3, solver="cnmf", solver_args=(2,), max_iter=3,
            dtype=np.float64).fit(X)


def test_nmfsc_solver_facade_roundtrip():
    rng = np.random.default_rng(5)
    X = (rng.gamma(2.0, 1.0, (60, 4)) @ rng.gamma(1.0, 1.0, (4, 24)) + 0.01)
    est = NMF(n_components=4, solver="nmfsc", H_sparsity=0.5, max_iter=30,
              dtype=np.float64, random_state=6).fit(X)
    Ht = est.transform(X[:5])
    assert Ht.shape == (5, 4)
    assert np.all(np.isfinite(Ht))


def test_sklearn_params_protocol():
    est = NMF(n_components=3, divergence="kl", H_sparsity=0.1)
    p = est.get_params()
    assert p["n_components"] == 3 and p["H_sparsity"] == 0.1
    est.set_params(max_iter=7, H_sparsity=0.2)
    assert est.max_iter == 7 and est.config["H_sparsity"] == 0.2


def test_facade_hals_weights():
    """solver='hals' + weights= composes through the facade (weighted
    rank-1 sweeps), with weights in sklearn orientation like X."""
    rng = np.random.default_rng(21)
    X = rng.uniform(0.1, 1.0, (25, 18))
    w = (rng.uniform(size=(25, 18)) < 0.8).astype(np.float64)
    est = NMF(n_components=3, solver="hals", max_iter=10, tol=1e-12,
              random_state=2, weights=w)
    Ht = est.fit_transform(X)
    assert Ht.shape == (25, 3)
    assert np.isfinite(est.reconstruction_err_)


def test_auto_rank():
    """n_components='auto' (default) picks the rank at fit via the SVD
    energy curve and records it sklearn-style in n_components_."""
    rng = np.random.default_rng(30)
    X = (rng.random((60, 3)) @ rng.random((3, 40))).astype(np.float64)
    est = NMF(rank_energy=0.999, max_iter=50, random_state=1)
    Ht = est.fit_transform(X)
    assert est.n_components_ <= 3
    assert Ht.shape == (60, est.n_components_)
    assert est.components_.shape[0] == est.n_components_
    # transform works off the fitted basis without re-resolving the rank
    assert est.transform(X).shape == (60, est.n_components_)
    # explicit integer still resolves to itself
    est2 = NMF(n_components=4, max_iter=5).fit(X)
    assert est2.n_components_ == 4
