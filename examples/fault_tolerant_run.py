"""Fault-tolerant long runs: chunked checkpointing with BIT-exact resume.

Every solver in the toolbox can be driven in bounded chunks with the
factors (and, for the projected-gradient family, the line-search
stepsize state — nmfsc.m:147,178) persisted after each chunk.  A
"crash" between chunks loses nothing: the resumed trajectory is
bit-identical to an uninterrupted run, including for the stateful
nmfsc/cnmfsc solvers whose stepsizes ride through Result.resume_state.

Run: python examples/fault_tolerant_run.py  (CPU-friendly, ~seconds)
"""
import os
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.utils.checkpoint import run_checkpointed


def main():
    rng = np.random.default_rng(0)
    V = (rng.gamma(2.0, 1.0, (120, 9)) @ rng.gamma(0.5, 1.0, (9, 300))
         + 0.01)
    kw = dict(W_sparsity=0.5, H_sparsity=0.6, tolerance=1e-30,
              dtype=np.float64)

    # the uninterrupted reference trajectory
    ref = nt.nmfsc(V, 9, maxiter=24, seed=7, **kw)

    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "run.npz")
        # chunked run, checkpoint every 5 iterations ...
        run_checkpointed(nt.nmfsc, V, 9, total_iters=10, chunk=5,
                         path=ckpt, seed=7, **kw)
        print("'crash' after 10 of 24 iterations — checkpoint on disk:",
              os.path.getsize(ckpt), "bytes")
        # ... a fresh process resumes from the file alone
        res = run_checkpointed(nt.nmfsc, V, 9, total_iters=24, chunk=5,
                               path=ckpt, seed=7, **kw)

    assert np.array_equal(res.W, ref.W), "resume diverged!"
    assert np.array_equal(np.asarray(res.cost), np.asarray(ref.cost))
    print(f"resumed run: {res.n_iters} total iterations, final cost "
          f"{float(np.asarray(res.cost)[-1]):.6f}")
    print("trajectory is BIT-identical to the uninterrupted run "
          "(factors and full cost trace)")

    # manual two-call continuation via the public resume_state surface
    a = nt.nmfsc(V, 9, maxiter=10, seed=7, **kw)
    b = nt.nmfsc(V, 9, W_init=a.W, H_init=a.H,
                 resume_state=a.resume_state, maxiter=14, **kw)
    assert np.array_equal(b.W, ref.W)
    print("manual resume_state continuation: also bit-identical")

    # Sharded runs: the orbax backend writes factor SHARDS from their
    # owning devices (no host gather; saves can run async behind the
    # next chunk) and restores straight into the solver's placements.
    import jax
    from nmf_toolbox_tpu.parallel import make_mesh
    mesh = make_mesh(jax.device_count())
    with tempfile.TemporaryDirectory() as d:
        ck = os.path.join(d, "sharded_ck")
        r1 = run_checkpointed(nt.nmf, V, 9, total_iters=20, chunk=10,
                              path=ck, backend="orbax", seed=3,
                              tolerance=1e-30, dtype=np.float64, mesh=mesh)
        r2 = nt.nmf(V, 9, maxiter=20, seed=3, tolerance=1e-30,
                    dtype=np.float64, mesh=mesh)
    assert np.allclose(np.asarray(r1.W), np.asarray(r2.W), atol=1e-13)
    print(f"orbax sharded checkpointing over {jax.device_count()} "
          "device(s): chunked == uninterrupted")


if __name__ == "__main__":
    main()
