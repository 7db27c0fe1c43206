"""Tests for the vectorized Hoyer projection vs the scalar oracle."""
import numpy as np
import pytest

from nmf_toolbox_tpu.ops.projection import project_columns, projfunc, hoyer_l1_target
import oracle


def test_projfunc_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(20):
        N = rng.integers(4, 60)
        s = rng.uniform(-0.2, 1.0, N)
        L2 = 1.0
        sp = rng.uniform(0.05, 0.95)
        L1 = hoyer_l1_target(N, sp)
        v_ref, it_ref = oracle.projfunc(s, L1, L2, nn=True)
        v, it = projfunc(s, L1, L2, nonneg=True)
        np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-10)
        assert int(it) == it_ref


def test_project_columns_batched():
    rng = np.random.default_rng(1)
    N, B = 30, 17
    S = rng.uniform(-0.5, 1.0, (N, B))
    L1 = hoyer_l1_target(N, 0.6)
    V, iters = project_columns(S, L1, 1.0)
    V = np.asarray(V)
    for j in range(B):
        v_ref, it_ref = oracle.projfunc(S[:, j], L1, 1.0, nn=True)
        np.testing.assert_allclose(V[:, j], v_ref, atol=1e-10)
        assert int(iters[j]) == it_ref


def test_projection_satisfies_constraints():
    rng = np.random.default_rng(2)
    N, B = 50, 8
    S = rng.uniform(size=(N, B))
    L1 = hoyer_l1_target(N, 0.8)
    V, _ = project_columns(S, L1, 1.0)
    V = np.asarray(V)
    assert np.all(V >= 0)
    np.testing.assert_allclose(V.sum(0), L1, atol=1e-8)
    np.testing.assert_allclose((V**2).sum(0), 1.0, atol=1e-8)


def test_projfunc_signed():
    rng = np.random.default_rng(3)
    s = rng.normal(size=20)
    L1 = hoyer_l1_target(20, 0.5)
    v_ref, _ = oracle.projfunc(s, L1, 1.0, nn=False)
    v, _ = projfunc(s, L1, 1.0, nonneg=False)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-10)
