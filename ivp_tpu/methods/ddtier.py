"""Shared plumbing for the double-float precision tier (``dtype="dd"``).

The dd tier delivers f64-class state precision from the framework's own
Dekker double-f32 arithmetic (core/ddmath.py) at 1.7-2x the platform's
emulated-f64 throughput on TPU (docs/BENCH.md).  This module holds the
pieces the single-IVP facade (ivp_tpu/solve.py) and the ensemble builders
(ivp_tpu/batch.py) share:

* :func:`is_dd` — dtype-string detection
* :func:`dd_jac_fn` — f32 Jacobians for the dd stiff engines
* :func:`make_dd_engine` — engine factory (dd_erk / dd_radau / dd_bdf)
* :func:`resolve_auto_dtype` — ``dtype="auto"`` routing: the dd tier is the
  default f64-class execution path on TPUs (where platform f64 is software
  emulation), with precision-aware fallback to platform f64 where dd's
  interp-grade sampled outputs would not meet the requested tolerance.

The reference's precision tier is uniform across its whole API
(reference src/lib.rs:78-85); ``dtype="auto"`` is how this framework makes
its *fastest* f64-class tier the uniform default without silently degrading
tight-tolerance dense output.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import ddmath as ddm


def is_dd(dtype) -> bool:
    """True for the double-float precision tier (``dtype="dd"``)."""
    return isinstance(dtype, str) and dtype.lower() in ("dd", "ddf32",
                                                        "double-float")


def is_auto_dtype(dtype) -> bool:
    return isinstance(dtype, str) and dtype.lower() == "auto"


def platform_f64_is_emulated() -> bool:
    """True on backends where float64 is software emulation (TPU) — the
    regime where the dd tier wins.  CPU/GPU have native f64 units."""
    return jax.default_backend() in ("tpu", "axon")


def resolve_auto_dtype(dtype, *, rtol=None, sampled_output: bool = False,
                       has_mass: bool = False, has_dae: bool = False,
                       method: str = ""):
    """Resolve ``dtype="auto"`` to a concrete tier.

    Routing rules (measured basis in docs/BENCH.md):

    * On backends with native f64 (CPU/GPU) -> platform f64 (dd's arithmetic
      savings only exist against f64 *emulation*).
    * Mass matrices / DAE index structure -> platform f64 (the dd stiff
      engines integrate identity-mass ODEs only).
    * Sampled outputs requested (t_eval / dense_output / events) with
      min(rtol) < 1e-6 -> platform f64: dd's dense interpolants and event
      states are f32-grade (~1e-7 relative), which would exceed a tighter
      tolerance budget.  Final-state / step-endpoint outputs are exempt —
      the driver records the full DD pair, so those keep f64-class
      precision at any rtol (step sequences match platform f64 through
      rtol 1e-13, docs/BENCH.md).
    * Otherwise -> "dd".

    Non-"auto" dtypes pass through unchanged.
    """
    if not is_auto_dtype(dtype):
        return dtype
    if not platform_f64_is_emulated():
        return jnp.float64
    if has_mass or has_dae:
        return jnp.float64
    if sampled_output and rtol is not None:
        if float(np.min(np.asarray(rtol, dtype=float))) < 1e-6:
            return jnp.float64
    return "dd"


def dd_jac_fn(fun, args_, jac, n, jac_sparsity=None):
    """f32 Jacobian for the dd stiff tier: the factored Newton matrices are
    f32 by construction (methods/dd_radau.py), so the Jacobian never needs
    more than f32 — from the user's jac callable (evaluated at the state's
    hi words), grouped FD under a sparsity pattern, or jacfwd of the plain
    RHS."""
    if jac is not None and callable(jac):
        def jac_fn(t, y):
            return jnp.asarray(jac(t, y.hi, *args_),
                               jnp.float32).reshape(n, n)
        return jac_fn
    if jac is not None:
        # Constant Jacobian (array or scipy-sparse with .toarray).
        arr = jac.toarray() if hasattr(jac, "toarray") else jac
        J_const = jnp.asarray(np.asarray(arr), jnp.float32).reshape(n, n)
        return lambda t, y: J_const

    def f32_rhs2(t, yy):
        out = fun(t, yy, *args_)
        if isinstance(out, ddm.DD):
            out = out.hi
        return jnp.asarray(out, jnp.float32).reshape(n)

    if jac_sparsity is not None:
        from ..core.sparsity import make_grouped_fd_jac
        fd_jac, _ = make_grouped_fd_jac(f32_rhs2, jac_sparsity, n,
                                        jnp.float32)

        def jac_fn(t, y):
            return fd_jac(t, y.hi)
    else:
        def jac_fn(t, y):
            return jax.jacfwd(lambda yy: f32_rhs2(t, yy))(y.hi)
    return jac_fn


def make_dd_engine(method_c, need_cont, fun, args_, jac, n, opts,
                   jac_sparsity=None):
    """Engine factory for the dd tier: explicit methods via methods/dd_erk,
    the stiff methods via methods/dd_radau / dd_bdf (dd state + f32 Newton
    solves).  ``opts`` is the merged engine-option dict (banded routing etc.
    already resolved by the caller)."""
    from . import dd_erk
    if method_c in ("RADAU", "BDF"):
        jf = dd_jac_fn(fun, args_, jac, n, jac_sparsity)
        if method_c == "RADAU":
            from . import dd_radau
            return dd_radau.make_engine(need_cont, jac_fn=jf, n=n, **opts)
        from . import dd_bdf
        return dd_bdf.make_engine(need_cont, jac_fn=jf, n=n, **opts)
    return dd_erk.make_engine(method_c, need_cont=need_cont, **opts)
