"""On-device convergence-driven iteration loop.

Every reference solver runs ``for iter = 1:maxiter`` with the early-exit
rule (SURVEY.md section 2.3 item 2):

  stop at iter > 1 when cost(iter) < cost(iter-1)
                    and cost(iter-1) - cost(iter) < tolerance

(lnmf.m:89 uses <= on both comparisons; nmfsc/cnmfsc additionally return
when a line-search stepsize underflows 1e-200.)

Here the whole loop runs inside one jitted ``lax.while_loop`` with the
tolerance check on device and a fixed-size cost buffer; the host trims
the buffer afterwards according to each algorithm's quirk (some solvers
store the initial cost at index 0 and carry maxiter+1 entries —
nmfsc.m:137-139; lnmf never trims).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LoopOut(NamedTuple):
    state: object
    cost_buf: jnp.ndarray  # (maxiter + offset,)
    n_iters: jnp.ndarray   # iterations actually executed (int32)
    stopped: jnp.ndarray   # tolerance rule fired (bool)
    terminated: jnp.ndarray  # step_fn requested termination (line-search underflow)


def run(step_fn: Callable, init_state, maxiter: int, tolerance,
        *, offset: int = 0, initial_cost=None, inclusive: bool = False,
        cost_dtype=None, callback: Callable | None = None,
        cost_every: int = 1) -> LoopOut:
    """Run the MU loop.

    ``step_fn(state, i) -> (state, cost, terminate)`` performs one full
    iteration (both factor updates + cost).  ``terminate`` is a traced bool;
    when True the returned state is the mid-iteration state the reference
    would have returned from (pass ``False`` constants if unused).

    offset=1 reserves index 0 of the cost buffer for ``initial_cost``
    (nmfsc-family semantics).  ``inclusive`` switches both comparisons of
    the stop rule to <= (lnmf.m:89).

    ``cost_every`` must match the cadence the step's :func:`cost_cadence`
    tail was built with: when > 1 the stop rule is checked only on the
    iterations that computed a fresh objective.  Strict-rule solvers don't
    need this (a carried cost repeats the previous entry, so
    ``c < prev`` can't fire), but the inclusive ``<=`` rule (lnmf) WOULD
    fire spuriously on every skipped iteration (0 <= tol) without it.
    """
    if cost_dtype is None:
        cost_dtype = jnp.result_type(initial_cost) if initial_cost is not None else jnp.float32
    buf0 = jnp.zeros((maxiter + offset,), dtype=cost_dtype)
    if initial_cost is not None:
        buf0 = buf0.at[0].set(jnp.asarray(initial_cost, cost_dtype))
    tol = jnp.asarray(tolerance, cost_dtype)

    def cond(carry):
        _, _, i, stopped, terminated = carry
        return (~stopped) & (~terminated) & (i < maxiter)

    def body(carry):
        state, buf, i, stopped, terminated = carry
        state, c, term = step_fn(state, i)
        c = jnp.asarray(c, cost_dtype)
        if callback is not None:
            jax.debug.callback(callback, i, c)
        buf = buf.at[i + offset].set(c)
        prev = buf[jnp.maximum(i + offset - 1, 0)]
        if inclusive:
            trigger = (c <= prev) & (prev - c <= tol)
        else:
            trigger = (c < prev) & (prev - c < tol)
        trigger = trigger & (i >= 1) & (~term)
        if int(cost_every) > 1:
            # Same check-point predicate as cost_cadence: only fresh
            # objectives may stop the loop.
            ce = jnp.int32(cost_every)
            is_check = (((i + 1) % ce == 0) | (i == 0)
                        | (i + 1 >= maxiter))
            trigger = trigger & is_check
        return state, buf, i + 1, trigger, term

    state, buf, n, stopped, terminated = jax.lax.while_loop(
        cond, body, (init_state, buf0, jnp.int32(0), jnp.asarray(False), jnp.asarray(False))
    )
    return LoopOut(state, buf, n, stopped, terminated)


def cadence_state(state: tuple, ce: int, dtype) -> tuple:
    """Initial carry for a ``run`` step using :func:`cost_cadence`:
    with cost_every > 1 the carry grows a trailing slot holding the last
    computed objective (+inf until the first evaluation, so no stop-rule
    comparison can fire early)."""
    if int(ce) == 1:
        return state
    return tuple(state) + (jnp.asarray(jnp.inf, dtype),)


def cost_cadence(ce: int, maxiter: int):
    """Build the ``finish(state, carry, i, cost_fn)`` tail for a ``run``
    step function implementing the ``cost_every`` knob.

    The objective feeds ONLY the stopping rule (nmf.m:221-224), never
    the factor updates, so with cost_every = N > 1 it is evaluated on
    iterations {1, N, 2N, ..., maxiter} and carried forward in between
    (the same cadence trick sklearn's NMF uses, checking tol every 10
    iterations): the skipped iterations drop the objective's
    reconstruction and divergence-field pass entirely.  Carried entries
    repeat the last computed value, which can never fire the strict
    ``cost(i) < cost(i-1)`` trigger, so the stop rule degrades exactly
    to "decrease over the last N iterations < tolerance".  With
    cost_every == 1 (default) this is the reference semantics and the
    carry/jaxpr are byte-identical to the knob-free step.

    ``state`` is the updated factor tuple, ``carry`` the incoming loop
    carry (whose trailing slot is the last computed objective when
    ce > 1), ``cost_fn()`` the objective of the updated state.  Returns
    the ``(new_carry, cost, terminate)`` triple ``run`` expects.
    """
    ce = int(ce)

    def finish(state, carry, i, cost_fn):
        if ce == 1:
            return tuple(state), cost_fn(), jnp.asarray(False)
        cp = carry[-1]
        compute = (((i + 1) % ce == 0) | (i == 0)
                   | (i + 1 >= maxiter))
        c = jax.lax.cond(compute,
                         lambda: jnp.asarray(cost_fn(), cp.dtype),
                         lambda: cp)
        return tuple(state) + (c,), c, jnp.asarray(False)

    return finish


def trim_cost(out: LoopOut, maxiter: int, *, offset: int = 0,
              trim: bool = True):
    """Host-side cost-vector trimming matching each solver's semantics.

    Returns a NumPy array.
    - standard solvers (offset=0): trimmed to n_iters on early stop
      (nmf.m:221-224); full length if the loop ran out.
    - lnmf: pass trim=False — the reference breaks without trimming, so the
      vector keeps length maxiter with zeros after the stop (lnmf.m:89-91).
    - nmfsc family (offset=1): tolerance stop -> first n_iters+1 entries
      (initial cost + each iteration, nmfsc.m:241-243); line-search
      underflow at iteration i -> first i entries only (nmfsc.m:170-174).
    """
    import numpy as np
    buf = np.asarray(out.cost_buf)
    n = int(out.n_iters)
    stopped = bool(out.stopped)
    terminated = bool(out.terminated)
    if not trim:
        return buf
    if terminated:
        # MATLAB: cost = cost(1:iter) at the underflow point.
        return buf[: n - 1 + offset]
    if stopped:
        return buf[: n + offset]
    return buf
