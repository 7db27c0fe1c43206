"""Shape-robust sharding: every solver must handle NON-DIVISIBLE shapes
on any mesh (production shapes are never mesh multiples) by zero-padding
at the placement boundary and masking the nonlinear pad interactions
(parallel/padding.py).  Each padded-mesh run must match the single-device
unpadded run to 1e-9, on 1-D (8) and 2-D (2x4) meshes."""
import numpy as np
import pytest
import jax

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.parallel import make_mesh, plan_padding

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")

MESHES = [lambda: make_mesh(8), lambda: make_mesh(shape=(2, 4))]


def _assert_close(a, b, fields, rtol=1e-9, atol=1e-9):
    for f in fields:
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=rtol, atol=atol, err_msg=f)
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost),
                               rtol=rtol, err_msg="cost")
    assert a.n_iters == b.n_iters


def test_plan_padding():
    mesh = make_mesh(8)
    assert plan_padding(None, 32, 67) == (0, 0, None)
    assert plan_padding(mesh, 32, 67) == (0, 5, (32, 67))
    assert plan_padding(mesh, 32, 64) == (0, 0, None)
    mesh2 = make_mesh(shape=(2, 4))
    assert plan_padding(mesh2, 33, 67) == (1, 1, (33, 67))


@needs_8
@pytest.mark.parametrize("div", ["euclidean", "kl", "is", "ab"])
def test_nmf_padded(div):
    rng = np.random.default_rng(0)
    V = rng.uniform(0.1, 1.0, (33, 67))
    W0 = rng.uniform(size=(33, 4))
    H0 = rng.uniform(size=(4, 67))
    kw = dict(alpha=0.7, beta=0.4) if div == "ab" else {}
    a = nt.nmf(V, 4, W_init=W0, H_init=H0, divergence=div, maxiter=12,
               tolerance=1e-12, dtype=np.float64, **kw)
    for mk in MESHES:
        b = nt.nmf(V, 4, W_init=W0, H_init=H0, divergence=div, maxiter=12,
                   tolerance=1e-12, dtype=np.float64, mesh=mk(), **kw)
        _assert_close(a, b, ("W", "H"))


@needs_8
def test_lnmf_padded():
    rng = np.random.default_rng(1)
    V = rng.uniform(0.1, 1.0, (33, 67))
    W0 = rng.uniform(size=(33, 4))
    H0 = rng.uniform(size=(4, 67))
    a = nt.lnmf(V, 4, W_init=W0, H_init=H0, maxiter=10, tolerance=1e-12,
                dtype=np.float64)
    for mk in MESHES:
        b = nt.lnmf(V, 4, W_init=W0, H_init=H0, maxiter=10, tolerance=1e-12,
                    dtype=np.float64, mesh=mk())
        _assert_close(a, b, ("W", "H"))


@needs_8
def test_seminmf_padded():
    rng = np.random.default_rng(2)
    V = rng.uniform(size=(33, 67)) - 0.5
    W0 = rng.uniform(size=(33, 4)) - 0.5
    H0 = rng.uniform(size=(4, 67))
    a = nt.seminmf(V, 4, W_init=W0, H_init=H0, maxiter=10, tolerance=1e-12,
                   dtype=np.float64)
    for mk in MESHES:
        b = nt.seminmf(V, 4, W_init=W0, H_init=H0, maxiter=10,
                       tolerance=1e-12, dtype=np.float64, mesh=mk())
        _assert_close(a, b, ("W", "H"))


@needs_8
def test_convexnmf_padded():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(13, 67))
    G0 = rng.uniform(size=(67, 3))
    H0 = rng.uniform(size=(3, 67)) + 0.2
    a = nt.convexnmf(V, 3, G_init=G0, H_init=H0, maxiter=10, tolerance=1e-12,
                     dtype=np.float64)
    for mk in MESHES:
        b = nt.convexnmf(V, 3, G_init=G0, H_init=H0, maxiter=10,
                         tolerance=1e-12, dtype=np.float64, mesh=mk())
        _assert_close(a, b, ("W", "H", "G"))


@needs_8
def test_chnmf_padded_2d_mesh():
    rng = np.random.default_rng(4)
    V = rng.uniform(size=(33, 67))
    S = V[:, rng.choice(67, 9, replace=False)]  # p=9: divides nothing
    G0 = rng.uniform(size=(9, 4))
    H0 = rng.uniform(size=(4, 67))
    a = nt.chnmf(V, 4, S_init=S, G_init=G0, H_init=H0, maxiter=10,
                 tolerance=1e-12, dtype=np.float64)
    for mk in MESHES:
        b = nt.chnmf(V, 4, S_init=S, G_init=G0, H_init=H0, maxiter=10,
                     tolerance=1e-12, dtype=np.float64, mesh=mk())
        _assert_close(a, b, ("W", "H", "G", "S"))


@needs_8
def test_chcnmf_padded_2d_mesh():
    rng = np.random.default_rng(5)
    V = rng.uniform(size=(17, 67))
    S = V[:, rng.choice(67, 7, replace=False)]  # p=7
    G0 = rng.uniform(size=(7, 3, 2))
    H0 = rng.uniform(size=(3, 67))
    a = nt.chcnmf(V, 3, 2, S_init=S, G_init=G0, H_init=H0, maxiter=8,
                  tolerance=1e-12, dtype=np.float64)
    for mk in MESHES:
        b = nt.chcnmf(V, 3, 2, S_init=S, G_init=G0, H_init=H0, maxiter=8,
                      tolerance=1e-12, dtype=np.float64, mesh=mk())
        _assert_close(a, b, ("W", "H", "G"))


@needs_8
@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_cnmf_padded(div):
    rng = np.random.default_rng(6)
    V = rng.uniform(0.1, 1.0, (17, 67))
    W0 = rng.uniform(0.1, 1.0, (17, 3, 4))
    H0 = rng.uniform(0.1, 1.0, (3, 67))
    a = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, maxiter=8, tolerance=1e-12,
                dtype=np.float64, divergence=div)
    for mk in MESHES:
        b = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, maxiter=8,
                    tolerance=1e-12, dtype=np.float64, divergence=div,
                    mesh=mk())
        _assert_close(a, b, ("W", "H"))


@needs_8
@pytest.mark.parametrize("kw", [{"H_sparsity": 0.5}, {"W_sparsity": 0.6},
                                {"W_sparsity": 0.4, "H_sparsity": 0.5}, {}])
def test_nmfsc_padded(kw):
    rng = np.random.default_rng(7)
    V = rng.uniform(0.05, 1, (33, 67))
    W0 = rng.uniform(size=(33, 3))
    H0 = rng.uniform(size=(3, 67))
    H0 = H0 / np.sqrt((H0 ** 2).sum(1, keepdims=True))
    a = nt.nmfsc(V, 3, W_init=W0, H_init=H0, maxiter=8, tolerance=1e-12,
                 dtype=np.float64, **kw)
    for mk in MESHES:
        b = nt.nmfsc(V, 3, W_init=W0, H_init=H0, maxiter=8, tolerance=1e-12,
                     dtype=np.float64, mesh=mk(), **kw)
        _assert_close(a, b, ("W", "H"))


@needs_8
@pytest.mark.parametrize("kw", [{"H_sparsity": 0.5}, {"W_sparsity": 0.5}, {}])
def test_cnmfsc_padded(kw):
    rng = np.random.default_rng(8)
    V = rng.uniform(0.05, 1, (17, 67))
    W0 = rng.uniform(0.1, 1, (17, 3, 3))
    H0 = rng.uniform(size=(3, 67))
    H0 = H0 / np.sqrt((H0 ** 2).sum(1, keepdims=True))
    a = nt.cnmfsc(V, 3, 3, W_init=W0, H_init=H0, maxiter=6, tolerance=1e-12,
                  dtype=np.float64, **kw)
    for mk in MESHES:
        b = nt.cnmfsc(V, 3, 3, W_init=W0, H_init=H0, maxiter=6,
                      tolerance=1e-12, dtype=np.float64, mesh=mk(), **kw)
        _assert_close(a, b, ("W", "H"))


@needs_8
def test_cmfwisa_padded_2d_mesh():
    rng = np.random.default_rng(9)
    V = rng.normal(size=(33, 67)) + 1j * rng.normal(size=(33, 67))
    W0 = rng.uniform(size=(33, 3))
    H0 = rng.uniform(size=(3, 67))
    a = nt.cmfwisa(V, 3, W_init=W0, H_init=H0, maxiter=8, tolerance=1e-12,
                   dtype=np.complex128)
    for mk in MESHES:
        b = nt.cmfwisa(V, 3, W_init=W0, H_init=H0, maxiter=8,
                       tolerance=1e-12, dtype=np.complex128, mesh=mk())
        _assert_close(a, b, ("W", "H", "P"))


@needs_8
@pytest.mark.parametrize("div", ["euclidean", "kl"])
def test_constrainednmf_padded(div):
    rng = np.random.default_rng(10)
    V = rng.uniform(0.1, 1, (33, 67))
    labels = rng.integers(0, 3, 67)
    labels[rng.choice(67, 20, replace=False)] = -1
    W0 = rng.uniform(size=(33, 4))
    nu = int((labels == -1).sum())
    Z0 = rng.uniform(size=(4, nu + 3))
    a = nt.constrainednmf(V, labels, 4, W_init=W0, Z_init=Z0, maxiter=8,
                          tolerance=1e-12, dtype=np.float64, divergence=div)
    for mk in MESHES:
        b = nt.constrainednmf(V, labels, 4, W_init=W0, Z_init=Z0, maxiter=8,
                              tolerance=1e-12, dtype=np.float64,
                              divergence=div, mesh=mk())
        _assert_close(a, b, ("W", "H", "Z", "A"))


@needs_8
def test_projection_masked_matches_unpadded():
    """project_columns(valid=) is bit-compatible with projecting the
    unpadded vectors."""
    from nmf_toolbox_tpu.ops.projection import project_columns
    rng = np.random.default_rng(11)
    S = rng.uniform(size=(13, 5))
    Sp = np.zeros((16, 5))
    Sp[:13] = S
    v, it = project_columns(S, 2.5, 1.0)
    vp, itp = project_columns(Sp, 2.5, 1.0, valid=13)
    np.testing.assert_allclose(np.asarray(vp[:13]), np.asarray(v), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(vp[13:]), 0.0)
    np.testing.assert_array_equal(np.asarray(it), np.asarray(itp))


@needs_8
def test_padded_default_inits_match():
    """Default (seeded) inits are generated at the TRUE shape, so padded
    mesh runs reproduce unpadded seeded runs exactly."""
    rng = np.random.default_rng(12)
    V = rng.uniform(0.1, 1.0, (30, 67))
    a = nt.nmf(V, 5, seed=7, maxiter=10, tolerance=1e-12, dtype=np.float64)
    b = nt.nmf(V, 5, seed=7, maxiter=10, tolerance=1e-12, dtype=np.float64,
               mesh=make_mesh(8))
    _assert_close(a, b, ("W", "H"))
