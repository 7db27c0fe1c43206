"""Unit tests for the ops primitives (divergence dispatch, shifts, loop
driver edge semantics)."""
import numpy as np
import pytest
import jax.numpy as jnp

from nmf_toolbox_tpu.ops import divergence as dv
from nmf_toolbox_tpu.ops import loop as looplib
from nmf_toolbox_tpu.ops.shift import shift_left, shift_right, conv_wt_phi, conv_phi_ht


def test_canon_and_aliases():
    assert dv.canon("euclidean") == dv.canon("frobenius") == "euclidean"
    assert dv.canon("KL_divergence") == dv.canon("kl") == "kl"
    assert dv.canon("is_divergence") == "is"
    assert dv.canon("AB") == "ab"
    with pytest.raises(ValueError, match="No update equations"):
        dv.canon("cosine")


def test_ab_params_mapping():
    assert dv.ab_params("euclidean", 9, 9) == (1.0, 1.0)
    assert dv.ab_params("kl", 9, 9) == (1.0, 0.0)
    assert dv.ab_params("is", 9, 9) == (1.0, -1.0)
    assert dv.ab_params("ab", 0.5, -0.5) == (0.5, -0.5)


def test_shift_identities():
    rng = np.random.default_rng(0)
    H = rng.uniform(size=(3, 10))
    np.testing.assert_array_equal(np.asarray(shift_right(H, 0)), H)
    s = np.asarray(shift_right(H, 4))
    assert np.all(s[:, :4] == 0)
    np.testing.assert_array_equal(s[:, 4:], H[:, :6])
    t = np.asarray(shift_left(H, 4))
    assert np.all(t[:, 6:] == 0)
    np.testing.assert_array_equal(t[:, :6], H[:, 4:])
    # shift wider than the array -> all zeros (graceful superset of MATLAB)
    assert np.all(np.asarray(shift_right(H, 12)) == 0)


def test_conv_contractions_match_loops():
    rng = np.random.default_rng(1)
    m, k, T, n = 6, 3, 4, 12
    W = rng.uniform(size=(m, k, T))
    Phi = rng.uniform(size=(m, n))
    H = rng.uniform(size=(k, n))
    # sum_t W_t' shift_left(Phi, t)
    ref = np.zeros((k, n))
    for t in range(T):
        ref += W[:, :, t].T @ np.concatenate([Phi[:, t:], np.zeros((m, t))], 1)
    np.testing.assert_allclose(np.asarray(conv_wt_phi(jnp.asarray(W),
                                                      jnp.asarray(Phi))),
                               ref, rtol=1e-10)
    # Phi @ shift_right(H, t)' stacked over t
    got = np.asarray(conv_phi_ht(jnp.asarray(Phi), jnp.asarray(H), T))
    for t in range(T):
        Hs = np.concatenate([np.zeros((k, t)), H[:, :n - t]], 1)
        np.testing.assert_allclose(got[:, :, t], Phi @ Hs.T, rtol=1e-10)


def test_loop_driver_semantics():
    # strictly decreasing by 10 until iteration 5, then by 1e-4 (above
    # the f32 ulp at 60, below the 1e-3 tolerance)
    costs = [100.0 - 10 * i for i in range(5)]
    costs += [costs[-1] - 1e-4 * (i + 1) for i in range(10)]
    seq = jnp.asarray(costs)

    def step(state, i):
        return state, seq[i], jnp.asarray(False)

    out = looplib.run(step, (), 15, 1e-3)
    assert int(out.n_iters) == 6  # first tiny decrease fires the rule
    assert bool(out.stopped)
    trimmed = looplib.trim_cost(out, 15)
    assert len(trimmed) == 6
    # inclusive variant stops on an equal pair too
    eq = jnp.asarray([5.0, 4.0, 4.0] + [3.0] * 12)

    def step2(state, i):
        return state, eq[i], jnp.asarray(False)

    out2 = looplib.run(step2, (), 15, 1e-9, inclusive=True)
    assert int(out2.n_iters) == 3 and bool(out2.stopped)
    # strict variant does NOT stop on the equal pair
    out3 = looplib.run(step2, (), 15, 1e-9)
    assert int(out3.n_iters) == 15 and not bool(out3.stopped)


def test_loop_terminate_trims_to_current_iteration():
    def step(state, i):
        return state, jnp.float32(1.0), i >= 2  # terminate during iter 3

    out = looplib.run(step, (), 10, 1e-9, offset=1, initial_cost=5.0,
                      cost_dtype=jnp.float32)
    assert bool(out.terminated)
    trimmed = looplib.trim_cost(out, 10, offset=1)
    # MATLAB cost(1:iter): initial + iterations before the underflow one
    assert len(trimmed) == 3


def test_vertical_shifts_and_adjoint():
    """shift_down_rows / shift_up_rows (nmf2d's pitch axis): shape
    preservation, zero-fill, and the adjoint identity
    <shift_down(W, p), X> == <W, shift_up(X, p)>."""
    import numpy as np
    from nmf_toolbox_tpu.ops.shift import shift_down_rows, shift_up_rows
    rng = np.random.default_rng(0)
    W = rng.normal(size=(6, 4))
    X = rng.normal(size=(6, 4))
    for p in range(4):
        D = np.asarray(shift_down_rows(W, p))
        U = np.asarray(shift_up_rows(X, p))
        assert D.shape == W.shape and U.shape == X.shape
        np.testing.assert_allclose(D[p:], W[: 6 - p])
        np.testing.assert_allclose(D[:p], 0.0)
        np.testing.assert_allclose(U[: 6 - p], X[p:])
        np.testing.assert_allclose(U[6 - p:], 0.0)
        np.testing.assert_allclose(np.sum(D * X), np.sum(W * U), rtol=1e-12)
    # batched leading dims
    Wb = rng.normal(size=(3, 6, 4))
    np.testing.assert_allclose(np.asarray(shift_down_rows(Wb, 2))[1],
                               np.asarray(shift_down_rows(Wb[1], 2)))
