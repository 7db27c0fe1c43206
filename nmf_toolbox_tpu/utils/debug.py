"""Tracing, profiling, and numerical-debug helpers (SURVEY.md section 5).

The reference's only observability is the per-iteration cost vector and
two 'Algorithm converged' prints.  Here:

* ``trace(label)``: jax.profiler trace annotation context for solver
  calls (view with TensorBoard / xprof).
* ``profile_to(logdir)``: capture a device profile around a block.
* ``check_finite(result)``: post-hoc guard that factors and cost are
  finite — the debug-mode analog of the reference's eps-guard philosophy.
* ``iteration_logger()``: host callback printing the per-iteration cost
  from inside the on-device loop (opt-in; synchronizes every iteration).
"""
from __future__ import annotations

import contextlib

import numpy as np
import jax


def trace(label: str):
    """Profiler annotation: ``with trace('nmf'): nt.nmf(...)``."""
    return jax.profiler.TraceAnnotation(label)


@contextlib.contextmanager
def profile_to(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_finite(result) -> None:
    """Raise if any factor or the cost trace contains NaN/Inf."""
    for f in result.fields:
        val = getattr(result, f)
        arrs = val if isinstance(val, (list, tuple)) else [val]
        for a in arrs:
            if a is None:
                continue
            a = np.asarray(a)
            if not np.all(np.isfinite(a)):
                raise FloatingPointError(
                    f"non-finite values in result field '{f}'")


def iteration_logger(prefix: str = "iter"):
    """Returns a callback(iteration, cost) -> None suitable for wiring
    through jax.debug.callback from inside a solver step."""
    def cb(i, c):
        print(f"{prefix} {int(i) + 1}: cost = {float(c):.6e}")
    return cb
