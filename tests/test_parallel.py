"""Sharded-solver tests on the 8-virtual-CPU-device mesh (SURVEY.md
section 4 item 3): every mesh-enabled solver must produce (tolerance-)
identical results to its single-device run."""
import numpy as np
import pytest
import jax

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.parallel import make_mesh, placements_for


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


def make_problem(m=32, n=64, k=4, seed=0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(0.1, 1.0, (m, n))
    W0 = rng.uniform(size=(m, k))
    H0 = rng.uniform(size=(k, n))
    return V, W0, H0


@needs_8
@pytest.mark.parametrize("div", ["euclidean", "kl"])
def test_nmf_sharded_matches_single(div):
    V, W0, H0 = make_problem()
    mesh = make_mesh(8)
    a = nt.nmf(V, 4, W_init=W0, H_init=H0, divergence=div, maxiter=20,
               tolerance=1e-12, dtype=np.float64)
    b = nt.nmf(V, 4, W_init=W0, H_init=H0, divergence=div, maxiter=20,
               tolerance=1e-12, dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(a.W, b.W, atol=1e-10)
    np.testing.assert_allclose(a.H, b.H, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


@needs_8
def test_nmf_sharded_2d_mesh():
    V, W0, H0 = make_problem()
    mesh = make_mesh(shape=(2, 4))
    a = nt.nmf(V, 4, W_init=W0, H_init=H0, maxiter=15, tolerance=1e-12,
               dtype=np.float64)
    b = nt.nmf(V, 4, W_init=W0, H_init=H0, maxiter=15, tolerance=1e-12,
               dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(a.W, b.W, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


@needs_8
def test_cnmf_sharded_halo():
    """Convolutive shifts across shard boundaries: the static pad/slice
    must lower to a correct halo exchange under pjit (zero-padding only at
    the global boundary)."""
    rng = np.random.default_rng(1)
    V = rng.uniform(0.1, 1.0, (16, 64))
    W0 = rng.uniform(0.1, 1.0, (16, 3, 4))
    H0 = rng.uniform(0.1, 1.0, (3, 64))
    mesh = make_mesh(8)
    a = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, maxiter=12, tolerance=1e-12,
                dtype=np.float64)
    b = nt.cnmf(V, 3, 4, W_init=W0, H_init=H0, maxiter=12, tolerance=1e-12,
                dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(a.W, b.W, atol=1e-10)
    np.testing.assert_allclose(a.H, b.H, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


@needs_8
@pytest.mark.parametrize("solver,kwargs", [
    ("lnmf", {}),
    ("seminmf", {}),
    ("nmfsc", {"H_sparsity": 0.5}),
])
def test_other_solvers_sharded(solver, kwargs):
    V, W0, H0 = make_problem(seed=2)
    if solver == "seminmf":
        V = V - 0.5  # mixed sign
    mesh = make_mesh(8)
    fn = getattr(nt, solver)
    a = fn(V, 4, W_init=W0, H_init=H0, maxiter=10, tolerance=1e-12,
           dtype=np.float64, **kwargs)
    b = fn(V, 4, W_init=W0, H_init=H0, maxiter=10, tolerance=1e-12,
           dtype=np.float64, mesh=mesh, **kwargs)
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost), rtol=1e-9)
    np.testing.assert_allclose(a.W, b.W, atol=1e-9)


@needs_8
def test_convexnmf_sharded():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(12, 64))
    G0 = rng.uniform(size=(64, 3))
    H0 = rng.uniform(size=(3, 64)) + 0.2
    mesh = make_mesh(8)
    a = nt.convexnmf(V, 3, G_init=G0, H_init=H0, maxiter=10, tolerance=1e-12,
                     dtype=np.float64)
    b = nt.convexnmf(V, 3, G_init=G0, H_init=H0, maxiter=10, tolerance=1e-12,
                     dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(a.G, b.G, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


@needs_8
def test_cmfwisa_sharded():
    rng = np.random.default_rng(4)
    V = rng.normal(size=(16, 64)) + 1j * rng.normal(size=(16, 64))
    W0 = rng.uniform(size=(16, 3))
    H0 = rng.uniform(size=(3, 64))
    mesh = make_mesh(8)
    a = nt.cmfwisa(V, 3, W_init=W0, H_init=H0, maxiter=8, tolerance=1e-12,
                   dtype=np.complex128)
    b = nt.cmfwisa(V, 3, W_init=W0, H_init=H0, maxiter=8, tolerance=1e-12,
                   dtype=np.complex128, mesh=mesh)
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost), rtol=1e-9)
    np.testing.assert_allclose(a.W, b.W, atol=1e-9)


def test_placement_tables_complete():
    mesh = make_mesh(min(8, len(jax.devices())))
    for solver in ["nmf", "lnmf", "nmfsc", "seminmf", "constrainednmf",
                   "cnmf", "cnmfsc", "cmfwisa", "convexnmf", "chnmf", "chcnmf"]:
        specs = placements_for(solver, mesh)
        assert "V" in specs


@needs_8
def test_chnmf_sharded():
    rng = np.random.default_rng(5)
    V = rng.uniform(size=(12, 64))
    S = V[:, rng.choice(64, 9, replace=False)]
    G0 = rng.uniform(size=(9, 4))
    H0 = rng.uniform(size=(4, 64))
    mesh = make_mesh(8)
    a = nt.chnmf(V, 4, S_init=S, G_init=G0, H_init=H0, maxiter=10,
                 tolerance=1e-12, dtype=np.float64)
    b = nt.chnmf(V, 4, S_init=S, G_init=G0, H_init=H0, maxiter=10,
                 tolerance=1e-12, dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(a.G, b.G, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


@needs_8
def test_chcnmf_sharded():
    rng = np.random.default_rng(6)
    V = rng.uniform(size=(12, 64))
    S = V[:, rng.choice(64, 8, replace=False)]
    G0 = rng.uniform(size=(8, 3, 2))
    H0 = rng.uniform(size=(3, 64))
    mesh = make_mesh(8)
    a = nt.chcnmf(V, 3, 2, S_init=S, G_init=G0, H_init=H0, maxiter=8,
                  tolerance=1e-12, dtype=np.float64)
    b = nt.chcnmf(V, 3, 2, S_init=S, G_init=G0, H_init=H0, maxiter=8,
                  tolerance=1e-12, dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(a.G, b.G, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


@needs_8
def test_cnmfsc_sharded():
    rng = np.random.default_rng(7)
    V = rng.uniform(0.05, 1, (16, 64))
    W0 = rng.uniform(0.1, 1, (16, 3, 3))
    H0 = rng.uniform(size=(3, 64))
    H0 = H0 / np.sqrt((H0**2).sum(1, keepdims=True))
    mesh = make_mesh(8)
    a = nt.cnmfsc(V, 3, 3, W_init=W0, H_init=H0, H_sparsity=0.5, maxiter=8,
                  tolerance=1e-12, dtype=np.float64)
    b = nt.cnmfsc(V, 3, 3, W_init=W0, H_init=H0, H_sparsity=0.5, maxiter=8,
                  tolerance=1e-12, dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost), rtol=1e-9)
    np.testing.assert_allclose(a.W, b.W, atol=1e-9)


@needs_8
def test_constrainednmf_sharded():
    rng = np.random.default_rng(8)
    V = rng.uniform(0.1, 1, (16, 64))
    labels = rng.integers(0, 3, 64)
    labels[rng.choice(64, 20, replace=False)] = -1
    W0 = rng.uniform(size=(16, 4))
    nu = int((labels == -1).sum())
    Z0 = rng.uniform(size=(4, nu + 3))
    mesh = make_mesh(8)
    a = nt.constrainednmf(V, labels, 4, W_init=W0, Z_init=Z0, maxiter=8,
                          tolerance=1e-12, dtype=np.float64)
    b = nt.constrainednmf(V, labels, 4, W_init=W0, Z_init=Z0, maxiter=8,
                          tolerance=1e-12, dtype=np.float64, mesh=mesh)
    np.testing.assert_allclose(a.W, b.W, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-10)


@needs_8
def test_multiseed_sharded():
    """Restarts shard over the sample axis; V over features (2-D mesh).
    Trajectories must match the unsharded run per restart."""
    rng = np.random.default_rng(9)
    # 17 features: NOT divisible by the 2-D mesh's feature axis — the
    # zero-pad path must be bit-exact (zero W rows are absorbing in MU).
    V = rng.uniform(0.05, 1, (17, 40))
    S, k = 8, 3
    W0 = rng.uniform(size=(S, 17, k))
    H0 = rng.uniform(size=(S, k, 40))
    a = nt.nmf_multiseed(V, k, S, W_init=W0, H_init=H0, maxiter=10,
                         dtype=np.float64)
    for mesh in (make_mesh(8), make_mesh(shape=(2, 4))):
        b = nt.nmf_multiseed(V, k, S, W_init=W0, H_init=H0, maxiter=10,
                             dtype=np.float64, mesh=mesh)
        np.testing.assert_allclose(a.cost, b.cost, rtol=1e-9)
        np.testing.assert_allclose(a.W, b.W, atol=1e-9)
        np.testing.assert_allclose(a.H, b.H, atol=1e-9)


@needs_8
def test_consensus_sweep_on_mesh():
    """The rank sweep composes with a mesh (restarts data-parallel):
    same seed -> identical stats and recommendation as unsharded."""
    from nmf_toolbox_tpu import consensus_stability
    rng = np.random.default_rng(10)
    W = np.kron(np.eye(3), np.ones((5, 1)))
    H = np.zeros((3, 24))
    H[np.arange(24) % 3, np.arange(24)] = 1.0
    V = W @ H + 0.01 * rng.random((15, 24))
    a = consensus_stability(V, ranks=(2, 3, 4), n_seeds=8, maxiter=80,
                            seed=3, dtype=np.float64)
    b = consensus_stability(V, ranks=(2, 3, 4), n_seeds=8, maxiter=80,
                            seed=3, dtype=np.float64, mesh=make_mesh(8))
    assert b.recommended == a.recommended
    for sa, sb in zip(a.stats, b.stats):
        np.testing.assert_allclose(sb.consensus, sa.consensus)
        assert sb.cophenetic == pytest.approx(sa.cophenetic, abs=1e-9)
        assert sb.mean_cost == pytest.approx(sa.mean_cost, rel=1e-9)


@needs_8
def test_multiseed_kl_sharded_padded():
    """KL multiseed on a 2-D mesh with a non-divisible feature axis: the
    masked 0/0 fields in the pad rows must not perturb the trajectory."""
    rng = np.random.default_rng(11)
    V = rng.uniform(0.05, 1, (17, 40))
    S, k = 8, 3
    W0 = rng.uniform(size=(S, 17, k))
    H0 = rng.uniform(size=(S, k, 40))
    a = nt.nmf_multiseed(V, k, S, divergence="kl", W_init=W0, H_init=H0,
                         maxiter=8, dtype=np.float64)
    b = nt.nmf_multiseed(V, k, S, divergence="kl", W_init=W0, H_init=H0,
                         maxiter=8, dtype=np.float64,
                         mesh=make_mesh(shape=(2, 4)))
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-9)
    np.testing.assert_allclose(a.W, b.W, atol=1e-9)
