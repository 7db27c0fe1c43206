"""Symmetric NMF (A ~ H H', Ding 2005) — beyond-reference clustering."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt


import oracle  # tests/oracle.py: the single literal reference copy


def _blocks(rng, sizes, noise=0.05):
    labels = np.repeat(np.arange(len(sizes)), sizes)
    n = len(labels)
    A = (labels[:, None] == labels[None, :]) * 0.9 + noise \
        + noise * rng.uniform(size=(n, n))
    return (A + A.T) / 2, labels


def test_matches_numpy_reference():
    rng = np.random.default_rng(1)
    A, _ = _blocks(rng, [8, 7, 5])
    H0 = rng.uniform(size=(20, 3))
    ref_H, ref_c = oracle.symnmf(A, H0, maxiter=15, tolerance=1e-30)
    r = nt.symnmf(A, 3, H_init=H0, maxiter=15, tolerance=1e-30,
                  dtype=np.float64)
    np.testing.assert_allclose(np.asarray(r.H), ref_H, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r.cost), ref_c, rtol=1e-10)


def test_clusters_planted_blocks():
    from itertools import permutations
    rng = np.random.default_rng(0)
    A, labels = _blocks(rng, [20, 15, 25])
    r = nt.symnmf(A, 3, maxiter=300, seed=1, tolerance=1e-12,
                  dtype=np.float64)
    pred = np.argmax(np.asarray(r.H), axis=1)
    acc = max(np.mean(np.array([pm[l] for l in labels]) == pred)
              for pm in permutations(range(3)))
    assert acc == 1.0
    assert np.all(np.diff(r.cost) <= 1e-9 * np.abs(np.asarray(r.cost)[:-1]))
    assert np.asarray(r.H).min() >= 0


def test_consensus_matrix_integration():
    """SymNMF factors the rank-selection consensus matrix directly into
    cluster memberships — same assignments as the blocks that built it."""
    from itertools import permutations
    rng = np.random.default_rng(3)
    # consensus-like matrix: fraction of restarts co-clustering (i, j)
    labels = np.repeat([0, 1], [12, 14])
    C = (labels[:, None] == labels[None, :]) * 0.85 + 0.1
    C = (C + C.T) / 2 + 0.02 * rng.uniform(size=(26, 26))
    C = (C + C.T) / 2
    r = nt.symnmf(C, 2, maxiter=200, seed=2, dtype=np.float64,
                  tolerance=1e-12)
    pred = np.argmax(np.asarray(r.H), axis=1)
    acc = max(np.mean(np.array([pm[l] for l in labels]) == pred)
              for pm in permutations(range(2)))
    assert acc == 1.0


def test_mesh_matches_single_device():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nmf_toolbox_tpu.parallel import make_mesh
    rng = np.random.default_rng(4)
    A, _ = _blocks(rng, [11, 9, 13])  # n = 33: non-divisible
    H0 = rng.uniform(size=(33, 3))
    a = nt.symnmf(A, 3, H_init=H0, maxiter=10, tolerance=1e-30,
                  dtype=np.float64)
    for mesh in (make_mesh(8), make_mesh(shape=(2, 4))):
        b = nt.symnmf(A, 3, H_init=H0, maxiter=10, tolerance=1e-30,
                      dtype=np.float64, mesh=mesh)
        np.testing.assert_allclose(np.asarray(a.H), np.asarray(b.H),
                                   atol=1e-10)
        np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


def test_validation():
    rng = np.random.default_rng(5)
    with pytest.raises(ValueError, match="square"):
        nt.symnmf(rng.uniform(size=(4, 6)), 2)
    with pytest.raises(ValueError, match="nonnegative"):
        nt.symnmf(-np.eye(4), 2)
    with pytest.raises(ValueError, match="symmetric"):
        A = rng.uniform(size=(5, 5))
        nt.symnmf(A, 2)
    with pytest.raises(ValueError, match="H_init"):
        nt.symnmf(np.eye(4), 2, H_init=np.ones((3, 2)))
    # early exit honors the family's convergence rule
    A, _ = _blocks(rng, [6, 6], noise=0.0)
    r = nt.symnmf(A, 2, maxiter=500, seed=0, tolerance=1e-6,
                  dtype=np.float64)
    assert r.converged and r.n_iters < 500
    assert len(r.cost) == r.n_iters
