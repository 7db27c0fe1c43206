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


if __name__ == "__main__":
    main()
