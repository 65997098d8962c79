"""Reverse-mode (adjoint) differentiation through the adaptive solvers.

The integration driver is a ``lax.while_loop``, which JAX differentiates in
forward mode (jvp — the forward-sensitivity path, tests/test_sensitivity.py)
but cannot reverse-differentiate.  This module adds the missing direction via
the *continuous adjoint method*: the gradient of a loss on solution samples is
obtained by solving the adjoint ODE

    a'(t) = -aᵀ ∂f/∂y,      g'(t) = -aᵀ ∂f/∂θ

backward from the last sample time to ``t0``, re-integrating the state
alongside (no trajectory storage — O(1) memory in the number of steps, the
standard neural-ODE formulation).  ``∂f/∂y``- and ``∂f/∂θ``-vector products
come from ``jax.vjp`` of the user RHS, so the augmented system is exact for
any traced RHS.

The reference library has no differentiation support at all (it is a pure
Rust solver, reference src/lib.rs:87-103); this tier exists because the
TPU-native design makes the solve a pure function of its inputs.

Two entry points:

- ``odeint(fun, y0, ts, args)`` — integrate through the sample times ``ts``
  and return the ``(len(ts), n)`` states.  Pure and jit/vmap-composable;
  forward-mode differentiable (jvp/jacfwd) but NOT reverse-mode.
- ``odeint_adjoint(...)`` — same contract, plus ``jax.grad``/``jacrev``
  support via ``jax.custom_vjp`` with the continuous adjoint backward pass.
  Gradients flow to ``y0``, the sample times ``ts`` (including ``t0``) and
  any pytree of parameters in ``args``.

Accuracy note: the backward pass solves its own IVP at ``adjoint_rtol`` /
``adjoint_atol``, so gradients carry integration error of that order — the
standard continuous-adjoint trade-off.  The backward state is re-anchored at
every sample time (each backward segment restarts from the recorded forward
sample), which bounds state drift by the forward tolerance per segment.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from .core.driver import DriverConfig, make_driver, run_args
from .methods import get_engine
from .types import canonical_method

__all__ = ["odeint", "odeint_adjoint"]


def _norm_args(args) -> tuple:
    if isinstance(args, (tuple, list)):
        return tuple(args)
    return (args,)


def _make_integrator(rhs, n, method, max_steps, max_step, solver_options,
                     dtype):
    """A jittable ``integrate(y0, t0, t1, rtol_v, atol_v) -> (y1, status)``
    over the low-level engine + driver (lowlevel.py tier); supports forward
    and backward spans and closes over traced values in ``rhs``."""
    method_c = canonical_method(method)
    opts = dict(solver_options or {})
    jac_fn = None
    if method_c in ("RADAU", "BDF"):
        jac_fn = opts.pop("jac_fn", None)
        if jac_fn is None:
            def jac_fn(t, y):
                return jax.jacfwd(lambda yy: rhs(t, yy))(y)
    engine, p = get_engine(method_c, need_cont=False, jac_fn=jac_fn, n=n,
                           **opts)
    cfg = DriverConfig(rec_cap=0, record_cont=False, ncoeff=0, unroll=4)
    init_carry, run_chunk, _, _ = make_driver(engine, p, cfg, rhs)

    def integrate(y0, t0, t1, rtol_v, atol_v):
        hmax = jnp.abs(t1 - t0)
        if max_step is not None:
            hmax = jnp.minimum(hmax, jnp.abs(jnp.asarray(max_step, dtype)))
        ra = run_args(t1, rtol_v, atol_v, hmax, 0.0, max_steps, dtype)
        c = init_carry(jnp.asarray(t0, dtype), y0, None, ra)
        c = run_chunk(c, ra)
        return c.y, c.status

    return integrate


def _tol_vec(tol, n, dtype, name):
    v = jnp.asarray(tol, dtype)
    if v.ndim == 0:
        return jnp.broadcast_to(v, (n,))
    if v.shape != (n,):
        raise ValueError(f"{name} must be a scalar or shape ({n},), "
                         f"got {v.shape}")
    return v


def odeint(fun, y0, ts, args=(), *, method="DOPRI5", rtol=1e-6, atol=1e-9,
           max_steps: int = 100_000, max_step: Optional[float] = None,
           solver_options: Optional[dict] = None, return_status: bool = False):
    """Integrate ``y' = fun(t, y, *args)`` through the sample times ``ts``.

    Returns ``ys`` of shape ``(len(ts), n)`` with ``ys[0] == y0`` (states at
    exactly the requested times — each segment lands on its endpoint, the
    in-loop equivalent of reference t_eval sampling, solout.rs:344-386).
    ``ts`` must be monotone (either direction).  Pure JAX: composes with
    jit/vmap and is forward-mode differentiable; for reverse-mode use
    :func:`odeint_adjoint`.
    """
    args = _norm_args(args)
    y0 = jnp.asarray(y0)
    dtype = (y0.dtype if jnp.issubdtype(y0.dtype, jnp.floating)
             else jnp.dtype(jnp.result_type(1.0)))
    y0 = y0.astype(dtype)
    if y0.ndim != 1:
        raise ValueError("y0 must be 1-D; vmap odeint for batches")
    n = y0.shape[0]
    ts = jnp.asarray(ts, dtype)
    if ts.ndim != 1 or ts.shape[0] < 2:
        raise ValueError("ts must be 1-D with at least 2 points")

    def rhs(t, y):
        return jnp.asarray(fun(t, y, *args), dtype).reshape(n)

    integrate = _make_integrator(rhs, n, method, max_steps, max_step,
                                 solver_options, dtype)
    rtol_v = _tol_vec(rtol, n, dtype, "rtol")
    atol_v = _tol_vec(atol, n, dtype, "atol")

    def seg(y, tp):
        t_a, t_b = tp
        y1, st = integrate(y, t_a, t_b, rtol_v, atol_v)
        return y1, (y1, st)

    _, (ys_tail, sts) = lax.scan(seg, y0, (ts[:-1], ts[1:]))
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    if return_status:
        return ys, sts
    return ys


def odeint_adjoint(fun, y0, ts, args=(), *, method="DOPRI5", rtol=1e-6,
                   atol=1e-9, max_steps: int = 100_000,
                   max_step: Optional[float] = None,
                   solver_options: Optional[dict] = None,
                   adjoint_method: Optional[str] = None,
                   adjoint_rtol: Optional[float] = None,
                   adjoint_atol: Optional[float] = None,
                   adjoint_max_steps: Optional[int] = None,
                   adjoint_options: Optional[dict] = None):
    """:func:`odeint` with reverse-mode differentiation (continuous adjoint).

    ``jax.grad`` / ``jax.jacrev`` of any function of the returned ``ys``
    produce gradients with respect to ``y0``, ``ts`` (sample times incl.
    ``t0``: ``dL/dts[i] = ȳᵢ·f(tᵢ, yᵢ)`` for i≥1 and
    ``dL/dt0 = -a(t0)·f(t0, y0)``) and every array leaf of the ``args``
    pytree.  The backward pass integrates the augmented system
    ``[y, a, g]`` (dimension ``2n + n_params``) from each sample time to the
    previous with the same solver family — pass ``adjoint_method="RADAU"``
    etc. when the adjoint dynamics are stiff (the adjoint of a stiff system
    is stiff).  Defaults: adjoint method/tolerances follow the forward ones.
    """
    args = _norm_args(args)
    y0 = jnp.asarray(y0)
    dtype = (y0.dtype if jnp.issubdtype(y0.dtype, jnp.floating)
             else jnp.dtype(jnp.result_type(1.0)))
    y0 = y0.astype(dtype)
    if y0.ndim != 1:
        raise ValueError("y0 must be 1-D; vmap odeint_adjoint for batches")
    n = y0.shape[0]
    ts = jnp.asarray(ts, dtype)

    fwd_kw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
                  max_step=max_step, solver_options=solver_options)
    a_method = adjoint_method if adjoint_method is not None else method
    a_rtol = adjoint_rtol if adjoint_rtol is not None else rtol
    a_atol = adjoint_atol if adjoint_atol is not None else atol
    a_max_steps = (adjoint_max_steps if adjoint_max_steps is not None
                   else max_steps)
    # The adjoint/quadrature components have no user tolerance scale; use
    # scalars (max over any per-component vectors).
    a_rtol = jnp.max(jnp.asarray(a_rtol, dtype))
    a_atol = jnp.max(jnp.asarray(a_atol, dtype))

    @jax.custom_vjp
    def _solve(y0, ts, args):
        return odeint(fun, y0, ts, args, **fwd_kw)

    def _fwd(y0, ts, args):
        ys = odeint(fun, y0, ts, args, **fwd_kw)
        return ys, (ys, ts, args)

    def _bwd(res, ys_bar):
        ys, ts, args_ = res
        theta, unravel = ravel_pytree(args_)
        theta = theta.astype(dtype) if theta.size else jnp.zeros((0,), dtype)
        m = theta.shape[0]

        def rhs_theta(t, y, th):
            return jnp.asarray(fun(t, y, *unravel(th)), dtype).reshape(n)

        def aug_rhs(t, z):
            y, a = z[:n], z[n:2 * n]
            fy, vjp = jax.vjp(lambda yy, th: rhs_theta(t, yy, th), y, theta)
            y_bar, th_bar = vjp(a)
            return jnp.concatenate([fy, -y_bar, -th_bar])

        n_aug = 2 * n + m
        integrate = _make_integrator(aug_rhs, n_aug, a_method, a_max_steps,
                                     max_step, adjoint_options, dtype)
        rtol_v = jnp.broadcast_to(a_rtol, (n_aug,))
        atol_v = jnp.broadcast_to(a_atol, (n_aug,))

        def body(carry, inp):
            a, g = carry
            y_i, ybar_i, t_i, t_prev = inp
            a = a + ybar_i
            z0 = jnp.concatenate([y_i, a, g])
            z1, st = integrate(z0, t_i, t_prev, rtol_v, atol_v)
            return (z1[n:2 * n], z1[2 * n:]), st

        init = (jnp.zeros((n,), dtype), jnp.zeros((m,), dtype))
        inputs = (ys[1:][::-1], ys_bar[1:][::-1], ts[1:][::-1], ts[:-1][::-1])
        (a0, g0), _ = lax.scan(body, init, inputs)

        # Sample-time gradients: dL/dts[i] = ȳᵢ·f(tᵢ, yᵢ) for i >= 1;
        # row 0 of ys is y0 itself (no t0 dependence), while t0 moves every
        # later sample through the flow: dL/dt0 = -a(t0)·f(t0, y0) with a(t0)
        # the adjoint accumulated from rows >= 1 (before adding ȳ₀).
        f_all = jax.vmap(lambda t, y: rhs_theta(t, y, theta))(ts, ys)
        ts_bar = jnp.sum(ys_bar * f_all, axis=-1)
        ts_bar = ts_bar.at[0].set(-jnp.dot(a0, f_all[0]))
        y0_bar = a0 + ys_bar[0]
        args_bar = unravel(g0)
        return y0_bar, ts_bar, args_bar

    _solve.defvjp(_fwd, _bwd)
    return _solve(y0, ts, args)
