"""Crash-resume equivalence: a checkpointed run interrupted and resumed
must produce exactly the factors of an uninterrupted run."""
import numpy as np

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.utils.checkpoint import run_checkpointed


def test_chunked_equals_continuous(tmp_path):
    rng = np.random.default_rng(0)
    V = rng.uniform(0.1, 1, (30, 40))
    W0 = rng.uniform(size=(30, 4))
    H0 = rng.uniform(size=(4, 40))
    # continuous 40-iteration run
    ref = nt.nmf(V, 4, W_init=W0, H_init=H0, maxiter=40, tolerance=1e-30,
                 dtype=np.float64)
    # chunked 4 x 10 with checkpoints
    p = tmp_path / "run.npz"
    res = run_checkpointed(nt.nmf, V, 4, total_iters=40, chunk=10, path=p,
                           W_init=W0, H_init=H0, tolerance=1e-30,
                           dtype=np.float64)
    np.testing.assert_allclose(res.W, ref.W, atol=1e-12)
    np.testing.assert_allclose(res.H, ref.H, atol=1e-12)
    assert len(res.cost) == 40


def test_crash_resume(tmp_path):
    rng = np.random.default_rng(1)
    V = rng.uniform(0.1, 1, (25, 30))
    W0 = rng.uniform(size=(25, 3))
    H0 = rng.uniform(size=(3, 30))
    p = tmp_path / "run.npz"
    # "crash" after 2 chunks: run only 20 of 60 iterations
    run_checkpointed(nt.nmf, V, 3, total_iters=20, chunk=10, path=p,
                     W_init=W0, H_init=H0, tolerance=1e-30, dtype=np.float64)
    # resume to 60 total (fresh process semantics: only the path survives)
    res = run_checkpointed(nt.nmf, V, 3, total_iters=60, chunk=10, path=p,
                           W_init=W0, H_init=H0, tolerance=1e-30,
                           dtype=np.float64)
    ref = nt.nmf(V, 3, W_init=W0, H_init=H0, maxiter=60, tolerance=1e-30,
                 dtype=np.float64)
    np.testing.assert_allclose(res.W, ref.W, atol=1e-12)
    np.testing.assert_allclose(res.H, ref.H, atol=1e-12)
    assert len(res.cost) == 60


def test_convergence_stops_chunking(tmp_path):
    rng = np.random.default_rng(2)
    V = rng.uniform(0.1, 1, (20, 25))
    res = run_checkpointed(nt.nmf, V, 3, total_iters=500, chunk=100,
                           path=tmp_path / "c.npz", tolerance=1e-2,
                           seed=3, dtype=np.float64)
    assert res.converged
    assert len(res.cost) < 500
