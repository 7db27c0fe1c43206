"""NNDSVD initialization (beyond-reference extra, utils/init.py).

Properties: nonnegative factors of the right shape; the rank-1 leading
term approximates V's dominant structure; seeding nmf/nmf_hals with
init='nndsvdar' reaches a lower objective than random init in the same
iteration budget on a low-rank-plus-noise matrix; invalid combinations
raise.
"""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.utils import nndsvd


def _lowrank(m, n, r, seed=0, noise=0.01):
    rng = np.random.default_rng(seed)
    V = rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n))
    V += noise * rng.uniform(size=(m, n))
    return V.astype(np.float32)


def test_nndsvd_shapes_and_nonneg():
    V = _lowrank(60, 40, 5)
    for variant in ("nndsvd", "nndsvda", "nndsvdar"):
        W, H = nndsvd(V, 8, variant=variant)
        assert W.shape == (60, 8) and H.shape == (8, 40)
        assert np.all(np.asarray(W) >= 0)
        assert np.all(np.asarray(H) >= 0)
    # strict variant keeps exact zeros; the filled variants do not
    W, H = nndsvd(V, 8, variant="nndsvd")
    assert np.any(np.asarray(W) == 0)
    W, H = nndsvd(V, 8, variant="nndsvdar")
    assert np.all(np.asarray(W) > 0) and np.all(np.asarray(H) > 0)


def test_nndsvd_leading_term_tracks_v():
    V = _lowrank(50, 30, 3, noise=0.0)
    W, H = nndsvd(V, 4, variant="nndsvd")
    # the rank-1 seed alone should already explain most of a rank-3 V
    R = V - np.asarray(W[:, :1]) @ np.asarray(H[:1, :])
    assert np.linalg.norm(R) / np.linalg.norm(V) < 0.6


def test_nndsvd_k1():
    V = _lowrank(20, 10, 2)
    W, H = nndsvd(V, 1)
    assert W.shape == (20, 1) and H.shape == (1, 10)
    assert np.all(np.asarray(W) >= 0)


def test_nndsvd_bad_variant():
    V = _lowrank(10, 8, 2)
    with pytest.raises(ValueError, match="variant"):
        nndsvd(V, 2, variant="bogus")


@pytest.mark.parametrize("solver", ["nmf", "hals"])
def test_init_beats_random(solver):
    V = _lowrank(120, 80, 6, seed=3)
    kw = dict(maxiter=15, tolerance=1e-30, seed=7)
    if solver == "nmf":
        r_rand = nt.nmf(V, 6, **kw)
        r_svd = nt.nmf(V, 6, init="nndsvdar", **kw)
    else:
        r_rand = nt.nmf_hals(V, 6, **kw)
        r_svd = nt.nmf_hals(V, 6, init="nndsvdar", **kw)
    assert r_svd.cost[-1] < r_rand.cost[-1]
    # and the very first recorded cost is already better
    assert r_svd.cost[0] < r_rand.cost[0]


def test_init_validation():
    V = _lowrank(30, 20, 3)
    with pytest.raises(ValueError, match="unknown init"):
        nt.nmf(V, 3, init="svd")
    with pytest.raises(ValueError, match="combined"):
        nt.nmf(V, 3, init="nndsvdar", W_init=np.ones((30, 3), np.float32))
    with pytest.raises(ValueError, match="single source"):
        nt.nmf(V, [2, 2], init="nndsvdar")
    with pytest.raises(ValueError, match="unknown init"):
        nt.nmf_hals(V, 3, init="svd")


def test_init_nndsvd_preserves_product_through_renorm():
    # nmf normalizes W columns (nmf.m:132-134); the wrapper must transfer
    # the norms into H so the seeded reconstruction survives.
    V = _lowrank(40, 25, 4, noise=0.0)
    r = nt.nmf(V, 4, init="nndsvda", maxiter=1, tolerance=1e-30)
    rel = np.linalg.norm(V - r.W @ r.H) / np.linalg.norm(V)
    # the seed itself (before the solver's W renorm + 1 MU step) — if the
    # wrapper failed to transfer the column norms into H, the first
    # iteration would start from a mis-scaled product and end up far
    # worse than the raw seed; with the transfer it must improve on it.
    import jax
    from nmf_toolbox_tpu.utils import nndsvd
    # same key path as the wrapper (common_scalars: PRNGKey(seed=0))
    Wn, Hn = nndsvd(V, 4, key=jax.random.PRNGKey(0), variant="nndsvda")
    rel_seed = (np.linalg.norm(V - np.asarray(Wn) @ np.asarray(Hn))
                / np.linalg.norm(V))
    assert rel < rel_seed


def test_estimator_facade_with_nndsvd_init():
    from nmf_toolbox_tpu.estimators import NMF
    X = _lowrank(40, 30, 4, seed=9).T  # sklearn layout: samples x features
    est = NMF(4, solver="mu", max_iter=10, tol=1e-30, init="nndsvdar")
    Ht = est.fit_transform(X)
    assert Ht.shape == (30, 4)
    # transform must not forward the fit-time init choice alongside W_init
    Ht2 = est.transform(X)
    assert Ht2.shape == (30, 4)
