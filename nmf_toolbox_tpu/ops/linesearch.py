"""Backtracking projected-gradient line search (nmfsc.m:152-179).

Shared by nmfsc and cnmfsc: trial step, project, accept when the
objective does not increase, halve otherwise, declare convergence when
the stepsize underflows 1e-200 (nmfsc.m:170-174), grow 1.2x on success
(nmfsc.m:178).  On underflow X is returned unchanged (MATLAB returns the
un-accepted factor).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import STEP_UNDERFLOW


def backtracking_search(obj_fn, X, dX, step0, project, begobj):
    """Returns (X_out, step_out, underflow, accepted_obj)."""
    dt = X.dtype

    def cond(carry):
        _, _, _, accepted, underflow = carry
        return (~accepted) & (~underflow)

    def body(carry):
        step, Xb, _, _, _ = carry
        Xnew = project(X - step * dX)
        newobj = obj_fn(Xnew)
        accepted = newobj <= begobj
        step_next = jnp.where(accepted, step, step / 2.0)
        underflow = (~accepted) & (step_next < STEP_UNDERFLOW)
        return step_next, jnp.where(accepted, Xnew, Xb), newobj, accepted, underflow

    step, Xn, obj, accepted, underflow = jax.lax.while_loop(
        cond, body, (jnp.asarray(step0, dt), X, jnp.zeros((), dt),
                     jnp.asarray(False), jnp.asarray(False)))
    X_out = jnp.where(accepted, Xn, X)
    step_out = jnp.where(accepted, 1.2 * step, step)
    return X_out, step_out, underflow, obj
