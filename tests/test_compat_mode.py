"""compat="reference" mode: reproduce the reference's bugs on demand.

The framework defaults to paper-correct math (COMPAT.md "Reference bugs
fixed"); a user migrating a MATLAB workflow that RELIED on the buggy
behavior can opt back in with compat="reference":

- chnmf: the literal chnmf.m:187 H update (no G' projection; p == k only)
- convexnmf: error when G_init is missing, like the reference's
  undefined-variable default at convexnmf.m:69-71
"""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
import oracle


def test_chnmf_compat_trajectory_matches_buggy_oracle():
    rng = np.random.default_rng(11)
    V = rng.uniform(size=(10, 40))
    k = 5
    S = V[:, rng.choice(40, k, replace=False)]  # p == k for the buggy form
    G0 = rng.uniform(size=(k, k))
    H0 = rng.uniform(size=(k, 40))
    res = nt.chnmf(V, k, S_init=S, G_init=G0, H_init=H0, maxiter=25,
                   tolerance=1e-12, dtype=np.float64, compat="reference")
    Wg, Hg, Gg, cg = oracle.chnmf(V, S, G0, H0, maxiter=25, tolerance=1e-12,
                                  compat=True)
    np.testing.assert_allclose(res.G, Gg, atol=1e-8)
    np.testing.assert_allclose(res.H, Hg, atol=1e-8)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)
    # and the buggy trajectory genuinely differs from the paper-correct one
    res_paper = nt.chnmf(V, k, S_init=S, G_init=G0, H_init=H0, maxiter=25,
                         tolerance=1e-12, dtype=np.float64)
    assert not np.allclose(res_paper.H, res.H)


def test_chnmf_compat_requires_square():
    rng = np.random.default_rng(12)
    V = rng.uniform(size=(10, 40))
    S = V[:, :7]  # p=7 != k=4
    with pytest.raises(ValueError, match="p == k"):
        nt.chnmf(V, 4, S_init=S, maxiter=5, compat="reference")


def test_convexnmf_compat_requires_g_init():
    rng = np.random.default_rng(13)
    V = rng.uniform(size=(8, 30))
    with pytest.raises(ValueError, match="G_init"):
        nt.convexnmf(V, 3, maxiter=5, compat="reference")
    # with G_init supplied, compat mode runs the (already reference-exact)
    # update path
    G0 = rng.uniform(size=(30, 3))
    H0 = rng.uniform(size=(3, 30))
    res = nt.convexnmf(V, 3, G_init=G0, H_init=H0, maxiter=10,
                       tolerance=1e-12, dtype=np.float64, compat="reference")
    _, Hg, Gg, cg = oracle.convexnmf(V, G0, H0, maxiter=10, tolerance=1e-12)
    np.testing.assert_allclose(res.G, Gg, atol=1e-8)
    np.testing.assert_allclose(res.cost, cg, rtol=1e-8)


@pytest.mark.parametrize("fn,args", [
    (nt.chnmf, (4,)), (nt.convexnmf, (3,))])
def test_bad_compat_value_rejected(fn, args):
    V = np.random.default_rng(0).uniform(size=(6, 20))
    with pytest.raises(ValueError, match="compat"):
        fn(V, *args, maxiter=2, compat="matlab")
