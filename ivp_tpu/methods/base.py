"""Engine protocol shared by all integrators.

An *engine* turns one integrator into three pure functions that the generic
``lax.while_loop`` driver (core/driver.py) composes:

* ``init(rhs, t0, y0, ra, p) -> (ms, nfev)``: build the method-state pytree.
* ``attempt(rhs, t, y, naccpt, ms, ra, p) -> StepProposal``: one step attempt
  (accepted or rejected), fully branchless/masked so it vmaps over ensembles.
* ``interp(cont, xold, h, ti) -> y``: evaluate the step's dense interpolant.

This replaces the reference's per-method monolithic ``solve()`` time loops
(e.g. reference src/methods/dopri5.rs:266-461) with a step-function form that
XLA compiles once and that composes with vmap / shard_map.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp


class RunArgs(NamedTuple):
    """Traced per-solve arguments (changing these does not recompile)."""

    tend: Any
    rtol: Any  # (n,) broadcastable
    atol: Any  # (n,)
    hmax: Any  # |max_step|
    hmin: Any  # |min_step|
    max_steps: Any  # int32
    t_grid: Any = None  # optional (m,) sorted sample times for in-loop emission


class StepProposal(NamedTuple):
    accepted: Any      # bool — error test passed (statistics)
    advance: Any       # bool — state actually advances (accepted & healthy)
    finished: Any      # bool — this accepted step reached tend
    status: Any        # int32 — Status.RUNNING unless the engine failed
    t_new: Any
    y_new: Any
    xold: Any          # left edge of the step (== t)
    h_used: Any        # signed step size actually attempted
    cont: Any          # (C, n) dense coefficients (valid when advance)
    nfev_inc: Any
    njev_inc: Any
    nlu_inc: Any
    count_step: Any    # bool — whether nstep increments for this attempt
    count_reject: Any  # bool — whether nrejct increments
    ms: Any            # updated method state


class Engine(NamedTuple):
    name: str
    ncoeff: int
    init: Callable
    attempt: Callable
    interp: Callable
    # Jacobian evaluations performed inside ``init`` (BDF evaluates the
    # Jacobian up front; the driver adds this to njev on in-device event
    # restarts, which re-run ``init`` from the event point).
    init_njev: int = 0
    # State-representation adapters for engines whose carried state is not a
    # plain array (the dd tier carries a DD pair, methods/dd_erk.py).  The
    # driver lowers the state to a plain array at the event/interp boundary
    # (event functions, restart maps and event buffers see plain arrays) and
    # lifts interp-grade arrays back when they re-enter the state path
    # (event-restart re-init).  None = identity (plain-array engines).
    lower: Any = None
    lift: Any = None


def dotk(coeffs, ks):
    """Sparse linear combination of stage derivatives.

    ``coeffs`` is {stage_index: weight} or a dense sequence; zero weights are
    skipped at trace time so XLA never sees them.
    """
    if isinstance(coeffs, dict):
        items = coeffs.items()
    else:
        items = ((i, c) for i, c in enumerate(coeffs))
    acc = None
    for i, c in items:
        c = float(c)
        if c == 0.0:
            continue
        term = c * ks[i]
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros_like(ks[0])
    return acc
