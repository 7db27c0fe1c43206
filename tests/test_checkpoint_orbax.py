"""Orbax checkpoint backend: sharded round-trip, async save, and
run_checkpointed equivalence with the npz backend (SURVEY.md section 5
"orbax-style save of the factor pytree + iteration/cost state")."""
import numpy as np
import jax
import pytest

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.parallel import make_mesh, placements_for
from nmf_toolbox_tpu.utils.checkpoint import run_checkpointed
from nmf_toolbox_tpu.utils.checkpoint_orbax import (
    load_factors_orbax, save_factors_orbax)


def _problem(seed=0, m=32, n=40, k=4):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0.1, 1, (m, n)), rng.uniform(size=(m, k)),
            rng.uniform(size=(k, n)))


def test_round_trip_plain(tmp_path):
    V, W0, H0 = _problem()
    res = nt.nmf(V, 4, W_init=W0, H_init=H0, maxiter=5, tolerance=1e-30,
                 dtype=np.float64)
    p = tmp_path / "ck"
    save_factors_orbax(p, res)
    inits = load_factors_orbax(p)
    np.testing.assert_array_equal(np.asarray(inits["W_init"]),
                                  np.asarray(res.W))
    np.testing.assert_array_equal(np.asarray(inits["H_init"]),
                                  np.asarray(res.H))
    raw = load_factors_orbax(p, as_inits=False)
    assert int(raw["n_iters"]) == 5 and len(raw["cost"]) == 5


def test_sharded_save_and_placement_restore(tmp_path):
    # Factors produced sharded on the mesh are saved per-shard and
    # restored straight into the solver's placement: no host gather in
    # the save path, no re-placement needed on resume.
    mesh = make_mesh(8)
    V, W0, H0 = _problem(1)
    res = nt.nmf(V, 4, W_init=W0, H_init=H0, maxiter=4, tolerance=1e-30,
                 dtype=np.float64, mesh=mesh)
    p = tmp_path / "ck"
    save_factors_orbax(p, res)
    inits = load_factors_orbax(p, mesh=mesh, solver="nmf")
    specs = placements_for("nmf", mesh)
    assert inits["W_init"].sharding.spec == specs["W"]
    assert inits["H_init"].sharding.spec == specs["H"]
    np.testing.assert_array_equal(np.asarray(inits["W_init"]),
                                  np.asarray(res.W))
    # and the restored factors resume the run exactly
    ref = nt.nmf(V, 4, W_init=res.W, H_init=res.H, maxiter=3,
                 tolerance=1e-30, dtype=np.float64, mesh=mesh)
    out = nt.nmf(V, 4, maxiter=3, tolerance=1e-30, dtype=np.float64,
                 mesh=mesh, **inits)
    np.testing.assert_allclose(np.asarray(out.W), np.asarray(ref.W),
                               atol=1e-14)


def test_async_save_then_load(tmp_path):
    V, W0, H0 = _problem(2)
    res = nt.nmf(V, 4, W_init=W0, H_init=H0, maxiter=3, tolerance=1e-30,
                 dtype=np.float64)
    p = tmp_path / "ck"
    save_factors_orbax(p, res, extra={"iters_done": np.asarray(3)},
                       wait=False)
    # load joins pending saves before reading
    raw = load_factors_orbax(p, as_inits=False)
    assert int(raw["extra__iters_done"]) == 3
    np.testing.assert_array_equal(np.asarray(raw["W"]), np.asarray(res.W))


def test_run_checkpointed_orbax_matches_npz(tmp_path):
    mesh = make_mesh(8)
    V, W0, H0 = _problem(3)
    kw = dict(W_init=W0, H_init=H0, tolerance=1e-30, dtype=np.float64,
              mesh=mesh)
    ref = run_checkpointed(nt.nmf, V, 4, total_iters=20, chunk=8,
                           path=tmp_path / "run.npz", backend="npz", **kw)
    res = run_checkpointed(nt.nmf, V, 4, total_iters=20, chunk=8,
                           path=tmp_path / "run_orbax", backend="orbax",
                           **kw)
    np.testing.assert_allclose(np.asarray(res.W), np.asarray(ref.W),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.cost), np.asarray(ref.cost),
                               atol=1e-12)
    assert res.n_iters == ref.n_iters == 20


def test_run_checkpointed_orbax_crash_resume(tmp_path):
    mesh = make_mesh(8)
    V, W0, H0 = _problem(4)
    kw = dict(W_init=W0, H_init=H0, tolerance=1e-30, dtype=np.float64,
              mesh=mesh)
    p = tmp_path / "run_orbax"
    run_checkpointed(nt.nmf, V, 4, total_iters=10, chunk=5, path=p,
                     backend="orbax", **kw)
    res = run_checkpointed(nt.nmf, V, 4, total_iters=30, chunk=5, path=p,
                           backend="orbax", **kw)
    ref = nt.nmf(V, 4, maxiter=30, **kw)
    np.testing.assert_allclose(np.asarray(res.W), np.asarray(ref.W),
                               atol=1e-13)
    assert res.n_iters == 30


def test_auto_backend_selects_orbax_for_mesh_dir(tmp_path):
    mesh = make_mesh(8)
    V, W0, H0 = _problem(5)
    p = tmp_path / "auto_ck"
    run_checkpointed(nt.nmf, V, 4, total_iters=6, chunk=3, path=p,
                     W_init=W0, H_init=H0, tolerance=1e-30,
                     dtype=np.float64, mesh=mesh)
    assert p.is_dir()  # orbax directory layout, not an npz file


def test_nmfsc_resume_state_via_orbax(tmp_path):
    # projected-gradient stepsize state rides the orbax extra group
    V, _, _ = _problem(6, m=24, n=30, k=3)
    kw = dict(W_sparsity=0.5, tolerance=1e-30, dtype=np.float64, seed=0)
    ref = nt.nmfsc(V, 3, maxiter=12, **kw)
    res = run_checkpointed(nt.nmfsc, V, 3, total_iters=12, chunk=4,
                           path=tmp_path / "sc", backend="orbax", **kw)
    np.testing.assert_array_equal(np.asarray(res.W), np.asarray(ref.W))
    np.testing.assert_array_equal(np.asarray(res.H), np.asarray(ref.H))


def test_unknown_backend_rejected(tmp_path):
    V, W0, H0 = _problem(7)
    with pytest.raises(ValueError, match="backend"):
        run_checkpointed(nt.nmf, V, 4, total_iters=4, chunk=2,
                         path=tmp_path / "x", backend="hdf5",
                         W_init=W0, H_init=H0)
