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


@contextlib.contextmanager
def emulate_tpu_matmul_numerics():
    """CPU-side emulation of TPU f32 matmul numerics (one-pass bf16
    inputs, f32 accumulation — the MXU's default f32 behavior).

    Inside the context, every f32 ``dot_general`` traced under jit gets
    its operands rounded to bfloat16 with a float32 accumulator —
    exactly the error model the real chip applies — so golden-parity
    thresholds can be calibrated against the worse of {CPU-f32,
    CPU-bf16-matmul} with zero chip time (the round-2 f32/bf16 bug
    class).  Elementwise ops stay f32, matching the chip.

    REQUIRES ``XLA_FLAGS=--xla_allow_excess_precision=false`` in the
    environment before jax initializes: with excess precision allowed
    (the default) XLA legally folds the f32->bf16->f32 rounding away
    and the emulation silently measures plain f32.  A RuntimeError
    guards against that silent no-op.

    Interception point: ``dot_general_p.bind_with_trace`` — the one
    funnel every jnp matmul/einsum/@ passes through under tracing.
    The bf16 casts are bound through the SAME trace object so the
    rewrite composes with jit/scan/while_loop/vmap.  Complex64 dots are
    left untouched (the CPU backend keeps them full-precision; on TPU
    they decompose to f32 dots, so complex-path calibration still needs
    the chip).  Emulation-only diagnostic: never use in the product
    path.
    """
    import os
    if "--xla_allow_excess_precision=false" not in \
            os.environ.get("XLA_FLAGS", ""):
        raise RuntimeError(
            "emulate_tpu_matmul_numerics needs "
            "XLA_FLAGS=--xla_allow_excess_precision=false set before "
            "jax starts; without it XLA folds the bf16 rounding away "
            "and the emulation is a silent no-op")
    from jax._src.lax import lax as _lax
    import jax.numpy as jnp
    prim = _lax.dot_general_p
    cet = _lax.convert_element_type_p
    orig = prim.bind_with_trace
    f32 = np.dtype("float32")
    bf16 = np.dtype(jnp.bfloat16)

    def _round_bf16(trace, x):
        # f32 -> bf16 -> f32 ROUNDING, then an ordinary f32 dot: the
        # product of two bf16 values is exact in f32 (8-bit mantissas),
        # so this equals a bf16xbf16->f32-accumulate dot — the MXU's
        # one-pass behavior — while staying on dot shapes XLA:CPU can
        # execute (its DotThunk rejects BF16xBF16=F32 for some batched
        # forms).  The excess-precision flag keeps XLA from folding the
        # round-trip away.
        for dt in (bf16, f32):
            x = cet.bind_with_trace(
                trace, (x,), dict(new_dtype=dt, weak_type=False,
                                  sharding=None))
        return x

    def _is_default_precision(p):
        if p is None:
            return True
        import jax
        vals = p if isinstance(p, tuple) else (p,)
        return all(v in (None, jax.lax.Precision.DEFAULT) for v in vals)

    def bwt(trace, args, params):
        lhs, rhs = args
        # Explicitly raised precision (e.g. the nmfsc line search's
        # 'highest') runs multi-pass on the chip too — leave it f32.
        if (getattr(lhs, "dtype", None) == f32
                and getattr(rhs, "dtype", None) == f32
                and _is_default_precision(params.get("precision"))):
            lhs = _round_bf16(trace, lhs)
            rhs = _round_bf16(trace, rhs)
        return orig(trace, (lhs, rhs), params)

    # jnp's ops are internally jit(inline=True)-wrapped and cache their
    # traced jaxprs by aval: a matmul shape traced BEFORE entry would
    # silently bypass the emulation, and one traced INSIDE would leak
    # the bf16 rounding out after exit.  Flush on both edges.
    jax.clear_caches()
    prim.bind_with_trace = bwt
    try:
        yield
    finally:
        prim.bind_with_trace = orig
        jax.clear_caches()
