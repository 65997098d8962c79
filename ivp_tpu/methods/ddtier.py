"""Shared plumbing for the double-float precision tier (``dtype="dd"``).

The dd tier delivers f64-class state precision from the framework's own
Dekker double-f32 arithmetic (core/ddmath.py) at 1.7-2x the platform's
emulated-f64 throughput on TPU (docs/BENCH.md).  This module holds the
pieces the single-IVP facade (ivp_tpu/solve.py) and the ensemble builders
(ivp_tpu/batch.py) share:

* :func:`is_dd` — dtype-string detection
* :func:`dd_jac_fn` — f32 Jacobians for the dd stiff engines
* :func:`make_dd_engine` — engine factory (dd_erk / dd_radau / dd_bdf)
* :func:`resolve_auto_dtype` — ``dtype=None``/``"auto"`` routing: the dd
  tier is the DEFAULT f64-class execution path on TPUs (where platform f64
  is software emulation), with fallback to platform f64 on native-f64
  backends and for mass/DAE problems.
* :func:`dd_pack_cont` / :func:`dd_wrap_interp` — dd-grade dense output:
  dense coefficients recorded as (hi, lo) row pairs and interpolated in
  f64, so the dd tier is precision-uniform across its whole output
  surface (dense samples, t_eval, event states/times), like the
  reference's Float tier (reference src/lib.rs:78-85, src/dense.rs:9-157).
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
    * Otherwise -> "dd".

    Sampled outputs (t_eval / dense_output / events) no longer force a
    fallback: since round 5 the dd engines record their dense coefficients
    as full DD pairs (:func:`dd_pack_cont`) and interpolate in f64
    (:func:`dd_wrap_interp`), so dense samples, event states and event
    times are f64-grade at any rtol — the dd tier is precision-uniform
    across the whole output surface, like the reference's Float tier
    (reference src/lib.rs:78-85, src/dense.rs:9-157).  ``rtol`` and
    ``sampled_output`` are retained for API stability (and future
    heuristics) but no longer affect routing.

    Non-"auto" dtypes pass through unchanged.
    """
    del rtol, sampled_output  # no precision fallback needed since round 5
    if not is_auto_dtype(dtype):
        return dtype
    if not platform_f64_is_emulated():
        return jnp.float64
    if has_mass or has_dae:
        return jnp.float64
    return "dd"


# Below ~1e-10 relative, adaptive controllers on this TPU hit the noise
# floor of double-float arithmetic — BOTH the dd tier (~2^-48/op) and the
# platform's emulated f64 — and step-storm instead of converging (measured:
# CR3BP DOP853 rtol=1e-12 stagnates identically on dd, platform f64, and
# platform f64 with a full-precision controller; rtol=1e-9 is clean on
# both; docs/TPU_NOTES.md #36).  Native-f64 backends (CPU) are unaffected.
EMULATION_RTOL_FLOOR = 1e-10


def warn_below_emulation_floor(rtol, dtype=None):
    """One-shot UserWarning when a requested rtol sits below the TPU
    f64-emulation noise floor (EMULATION_RTOL_FLOOR).  Not an error: smooth
    well-scaled problems (e.g. small VdP) do converge below the floor —
    but CR3BP-class problems step-storm, so the user should know the
    request is below the hardware's reliable precision on every emulated
    tier (dd and platform f64 alike)."""
    if not platform_f64_is_emulated():
        return
    if (dtype is not None and not isinstance(dtype, str)
            and jnp.dtype(dtype) == jnp.float32):
        return  # an explicit f32 request has its own (coarser) expectations
    try:
        rmin = float(np.min(np.asarray(rtol, dtype=float)))
    except Exception:
        return
    if rmin < EMULATION_RTOL_FLOOR:
        import warnings
        warnings.warn(
            f"rtol={rmin:g} is below this TPU's double-float noise floor "
            f"(~{EMULATION_RTOL_FLOOR:g} relative; both the dd tier and the "
            "platform's emulated f64 — docs/TPU_NOTES.md #36).  The "
            "controller may stagnate at tiny steps instead of converging; "
            "pass max_steps= to bound the cost, or run on a native-f64 "
            "backend (CPU) for tighter tolerances.",
            UserWarning, stacklevel=3)


# =============================================================================
# dd-grade dense output (round-5 VERDICT #2)
# =============================================================================

def dd_pack_cont(rows: ddm.DD):
    """Pack a (C, n) DD coefficient stack into a plain (2C, n) f32 array:
    hi rows first, lo rows second.

    The packed form keeps the driver's record buffers, the host drain and
    the sharded recording path representation-agnostic (a dense cont record
    stays one plain array per step, core/driver.py), while carrying full
    dd precision — the TPU-native analog of the reference's full-Float
    ``cont`` buffers (reference src/dense.rs:9-157)."""
    return jnp.concatenate([rows.hi, rows.lo], axis=0)


def dd_wrap_interp(base_interp):
    """f64-grade dense interpolant over dd-packed cont rows.

    Lifts the (2C, n) hi/lo pairs to f64 and evaluates the platform-f64
    interpolant formula on them.  Interpolation is a per-sample cost (not
    per-step), so emulated-f64 polynomial evaluation is cheap relative to
    the dd hot loop, and it gives exactly the platform engines' dense
    semantics — dd-vs-f64 dense samples agree to the dd state floor."""
    def interp(cont, xold, h, ti):
        C = cont.shape[0] // 2
        c64 = cont[:C].astype(jnp.float64) + cont[C:].astype(jnp.float64)
        return base_interp(c64, xold, h, ti)
    return interp


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
