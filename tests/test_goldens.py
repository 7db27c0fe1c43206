"""Stored golden trajectories (generated ONCE from the NumPy oracle and
committed): detects numeric drift even if oracle.py and the solvers were
edited together."""
import pathlib

import numpy as np
import pytest

import nmf_toolbox_tpu as nt

GOLD = pathlib.Path(__file__).parent / "goldens"


def test_golden_nmf_kl():
    g = np.load(GOLD / "nmf_kl.npz")
    r = nt.nmf(g["V"], g["W0"].shape[1], W_init=g["W0"], H_init=g["H0"],
               divergence="kl", maxiter=20, tolerance=1e-12, dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_cnmf_euclid():
    g = np.load(GOLD / "cnmf_euclid.npz")
    for method in ("naive", "gram"):
        r = nt.cnmf(g["V"], g["W0"].shape[1], g["W0"].shape[2],
                    W_init=g["W0"], H_init=g["H0"], maxiter=15,
                    tolerance=1e-12, dtype=np.float64, method=method)
        np.testing.assert_allclose(r.W, g["W"], atol=1e-8)
        np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-8)


def test_golden_nmfsc_sparse():
    g = np.load(GOLD / "nmfsc_sparse.npz")
    r = nt.nmfsc(g["V"], g["W0"].shape[1], W_init=g["W0"], H_init=g["H0"],
                 W_sparsity=0.5, H_sparsity=0.6, maxiter=12, tolerance=1e-12,
                 dtype=np.float64)
    assert len(r.cost) == len(g["cost"])
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_nmf_weighted_kl():
    g = np.load(GOLD / "nmf_weighted_kl.npz")
    r = nt.nmf(g["V"], g["W0"].shape[1], W_init=g["W0"], H_init=g["H0"],
               weights=g["M"], divergence="kl", maxiter=15, tolerance=1e-12,
               dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_lnmf():
    g = np.load(GOLD / "lnmf.npz")
    r = nt.lnmf(g["V"], g["W0"].shape[1], W_init=g["W0"], H_init=g["H0"],
                maxiter=15, tolerance=1e-12, dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_seminmf():
    g = np.load(GOLD / "seminmf.npz")
    r = nt.seminmf(g["V"], g["W0"].shape[1], W_init=g["W0"], H_init=g["H0"],
                   maxiter=15, tolerance=1e-12, dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_convexnmf():
    g = np.load(GOLD / "convexnmf.npz")
    r = nt.convexnmf(g["V"], g["G0"].shape[1], G_init=g["G0"],
                     H_init=g["H0"], maxiter=15, tolerance=1e-12,
                     dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(r.G, g["G"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_chnmf():
    g = np.load(GOLD / "chnmf.npz")
    r = nt.chnmf(g["V"], g["G0"].shape[1], S_init=g["S"], G_init=g["G0"],
                 H_init=g["H0"], maxiter=15, tolerance=1e-12,
                 dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_chcnmf():
    g = np.load(GOLD / "chcnmf.npz")
    r = nt.chcnmf(g["V"], g["G0"].shape[1], int(g["T"]), S_init=g["S"],
                  G_init=g["G0"], H_init=g["H0"],
                  H_sparsity=float(g["H_sparsity"]), maxiter=12,
                  tolerance=1e-12, dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-8)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-8)


def test_golden_cmfwisa():
    g = np.load(GOLD / "cmfwisa.npz")
    r = nt.cmfwisa(g["V"], g["W0"].shape[1], W_init=g["W0"], H_init=g["H0"],
                   H_sparsity=float(g["H_sparsity"]), maxiter=15,
                   tolerance=1e-12, dtype=np.complex128)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.P), g["P"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_constrainednmf_kl():
    g = np.load(GOLD / "constrainednmf_kl.npz")
    r = nt.constrainednmf(g["V"], g["labels"], g["W0"].shape[1],
                          W_init=g["W0"], Z_init=g["Z0"], divergence="kl",
                          maxiter=15, tolerance=1e-12, dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(r.Z, g["Z"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.A), g["A"], atol=0)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_cnmfsc_sparse():
    g = np.load(GOLD / "cnmfsc_sparse.npz")
    r = nt.cnmfsc(g["V"], g["W0"].shape[1], int(g["T"]), W_init=g["W0"],
                  H_init=g["H0"], W_sparsity=float(g["W_sparsity"]),
                  H_sparsity=float(g["H_sparsity"]), maxiter=10,
                  tolerance=1e-12, dtype=np.float64)
    assert len(r.cost) == len(g["cost"])
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_nmf2d_kl():
    g = np.load(GOLD / "nmf2d_kl.npz")
    r = nt.nmf2d(g["V"], g["W0"].shape[1], g["W0"].shape[2],
                 g["H0"].shape[2], W_init=g["W0"], H_init=g["H0"],
                 divergence="kl", maxiter=15, tolerance=1e-12,
                 dtype=np.float64)
    np.testing.assert_allclose(r.W, g["W"], atol=1e-9)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)


def test_golden_symnmf():
    g = np.load(GOLD / "symnmf.npz")
    r = nt.symnmf(g["A"], g["H0"].shape[1], H_init=g["H0"], maxiter=15,
                  tolerance=1e-12, dtype=np.float64)
    np.testing.assert_allclose(r.H, g["H"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.cost), g["cost"], rtol=1e-9)
