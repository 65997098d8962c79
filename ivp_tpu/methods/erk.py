"""Explicit Runge–Kutta engines: RK4, RK23, DOPRI5, DOP853.

Each engine is a pure, branchless ``attempt`` step function (accepted and
rejected attempts are both one invocation) so that ``vmap`` over an ensemble
axis yields per-trajectory adaptive stepping with done-masking for free.

Algorithmic parity with the reference (formulas, controllers, counters):
* DOPRI5: reference src/methods/dopri5.rs:266-478 (Lund-stabilized PI control,
  stiffness detector, 5-coefficient dense output).
* DOP853: reference src/methods/dop853.rs:272-670 (dual 8(5,3) error norm,
  3 extra dense stages, 8-coefficient dense output).
* RK23:   reference src/methods/rk23.rs:188-321 (FSAL, cubic dense output).
* RK4:    reference src/methods/rk4.rs:140-244 (fixed step, Hermite dense
  output; we use the mathematically correct start-slope k1 rather than the
  reference's k4).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple

import jax.numpy as jnp
from jax import lax

from .. import tableaus as tab
from ..types import Status
from ..core.common import hinit, safe_pow, scaled_rms
from .base import Engine, RunArgs, StepProposal, dotk


class ERKState(NamedTuple):
    h: Any        # signed next step size
    k1: Any       # (n,) derivative at (t, y) — FSAL carry
    facold: Any   # Lund stabilization memory, stored as log(facold): the
    #               controller needs err^expo1 / facold^beta, evaluated as
    #               exp(expo1*log(err) - beta*log_facold) — one emulated-f64
    #               log per attempt instead of two pows (TPU f64 pow is
    #               log+exp+mul, each ~dozens of emulated ops)
    reject: Any   # bool: previous attempt was rejected
    iasti: Any    # int32 stiffness counter
    nonstiff: Any
    hlamb: Any
    posneg: Any   # integration direction sign


@dataclasses.dataclass(frozen=True)
class ERKParams:
    """Static (compile-time) controller configuration."""

    method: str
    need_cont: bool
    uround: float = 2.3e-16
    safety: float = 0.9
    scale_min: float = 0.2
    scale_max: float = 10.0
    beta: float = 0.04
    stiff_test: int = 1000
    stiff_threshold: float = 3.25
    iord: int = 5
    # Error-norm + step-controller arithmetic precision.  Step control only
    # needs a few digits (it chooses h, it does not touch the solution), so
    # under emulated f64 the scale/divide/rms/log/exp chain runs in f32 by
    # default — the roofline (docs/BENCH.md) shows the f64 path is
    # emulation-op-bound, and this removes ~15% of the amplified ops.  Set
    # "state" to keep the controller in the state dtype.
    controller_precision: str = "float32"


DOPRI5_DEFAULTS = dict(scale_min=0.2, scale_max=10.0, beta=0.04,
                       stiff_threshold=3.25, iord=5)
DOP853_DEFAULTS = dict(scale_min=0.333, scale_max=6.0, beta=0.0,
                       stiff_threshold=6.1, iord=8)
RK23_DEFAULTS = dict(scale_min=0.2, scale_max=10.0, iord=3)


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def erk_init(rhs, t0, y0, first_step, ra: RunArgs, p: ERKParams):
    """Common ERK initialization: evaluate k1, choose h (hinit or given)."""
    posneg = jnp.sign(ra.tend - t0)
    k1 = rhs(t0, y0)
    if first_step is not None:
        h = jnp.abs(first_step) * posneg
        nfev = 1
    else:
        h, _ = hinit(rhs, t0, y0, posneg, k1, p.iord, ra.hmax, ra.atol, ra.rtol)
        nfev = 2
    cdt = jnp.float32 if p.controller_precision == "float32" else y0.dtype
    ms = ERKState(
        h=h, k1=k1, facold=jnp.log(jnp.full((), 1e-4, cdt)),
        reject=jnp.zeros((), bool), iasti=_i32(0), nonstiff=_i32(0),
        hlamb=jnp.zeros((), cdt), posneg=posneg,
    )
    return ms, nfev


# =============================================================================
# DOPRI5
# =============================================================================

def dopri5_attempt(rhs, t, y, naccpt, ms: ERKState, ra: RunArgs, p: ERKParams):
    A, C, E, D = tab.DOPRI5_A, tab.DOPRI5_C, tab.DOPRI5_E, tab.DOPRI5_D
    h, posneg = ms.h, ms.posneg
    facc1 = 1.0 / p.scale_min
    facc2 = 1.0 / p.scale_max
    expo1 = 0.2 - p.beta * 0.75

    too_small = 0.1 * jnp.abs(h) <= jnp.abs(t) * p.uround
    last = (t + 1.01 * h - ra.tend) * posneg > 0.0
    h = jnp.where(last, ra.tend - t, h)
    # State-space h: under the f64-time/f32-state hybrid t/h carry f64 while
    # the state math stays in y's dtype (no-op cast otherwise).
    hy = h.astype(y.dtype)

    k1 = ms.k1
    k2 = rhs(t + C[1] * h, y + hy * dotk(A[0], [k1]))
    k3 = rhs(t + C[2] * h, y + hy * dotk(A[1], [k1, k2]))
    k4 = rhs(t + C[3] * h, y + hy * dotk(A[2], [k1, k2, k3]))
    k5 = rhs(t + C[4] * h, y + hy * dotk(A[3], [k1, k2, k3, k4]))
    ysti = y + hy * dotk(A[4], [k1, k2, k3, k4, k5])
    k6 = rhs(t + h, ysti)
    ynew = y + hy * dotk(A[5], [k1, k2, k3, k4, k5, k6])
    k7 = rhs(t + h, ynew)
    ks = [k1, k2, k3, k4, k5, k6, k7]

    # Error norm + controller in controller_precision (f32 by default —
    # step control needs only a few digits; see ERKParams).
    cdt = jnp.float32 if p.controller_precision == "float32" else y.dtype
    err_vec = hy * dotk(E, ks)
    sk = (ra.atol.astype(cdt)
          + ra.rtol.astype(cdt)
          * jnp.maximum(jnp.abs(y.astype(cdt)), jnp.abs(ynew.astype(cdt))))
    err = scaled_rms(err_vec.astype(cdt), sk)

    accepted = (err <= 1.0) & ~too_small

    # --- Stiffness detection (reference dopri5.rs:363-391) ---
    # The detector compares h*sqrt(||k7-k6||^2/||ynew-ysti||^2) to a 3.25
    # threshold — a yes/no classifier that needs no precision, so its
    # square-sums, divide and sqrt run in controller precision (under
    # emulated f64 the divide+sqrt alone are ~dozens of amplified ops,
    # executed every attempt under vmap).
    do_stiff = accepted & (((naccpt + 1) % p.stiff_test == 0) | (ms.iasti > 0))
    stnum = jnp.sum((k7 - k6).astype(cdt) ** 2)
    stden = jnp.sum((ynew - ysti).astype(cdt) ** 2)
    hlamb = jnp.where(do_stiff & (stden > 0.0),
                      jnp.abs(hy).astype(cdt) * jnp.sqrt(stnum / stden),
                      ms.hlamb)
    is_stiff = hlamb > p.stiff_threshold
    iasti = jnp.where(do_stiff, jnp.where(is_stiff, ms.iasti + 1, ms.iasti), ms.iasti)
    nonstiff = jnp.where(do_stiff,
                         jnp.where(is_stiff, _i32(0), ms.nonstiff + 1), ms.nonstiff)
    iasti = jnp.where(do_stiff & ~is_stiff & (nonstiff == 6), _i32(0), iasti)
    stiff_fail = do_stiff & is_stiff & (iasti == 15)

    advance = accepted & ~stiff_fail

    # --- Dense output (reference dopri5.rs:329-334, 393-403) ---
    if p.need_cont:
        ydiff = ynew - y
        bspl = hy * k1 - ydiff
        cont = jnp.stack([y, ydiff, bspl, -hy * k7 + ydiff - bspl, hy * dotk(D, ks)])
    else:
        cont = jnp.zeros((0,) + y.shape, y.dtype)

    # --- Controller (Lund-stabilized PI; reference dopri5.rs:351-459) ---
    # err^expo1 / facold^beta via one log + exps (facold stored as log).
    # err is floored at 1e-35 before the log: the TPU's emulated-f64 log
    # misbehaves at 0/inf (docs/TPU_NOTES.md), and exp(expo1*log(1e-35)) is
    # ~1e-6, clamped to the same facc2 bound the exact fac11=0 would hit.
    log_err = jnp.log(jnp.maximum(err, 1e-35))
    fac11 = jnp.exp(expo1 * log_err)
    fac = jnp.exp(expo1 * log_err - p.beta * ms.facold)
    fac = jnp.maximum(facc2, jnp.minimum(facc1, fac / p.safety))
    hnew_acc = h / fac
    hnew_acc = jnp.where(jnp.abs(hnew_acc) > ra.hmax, posneg * ra.hmax, hnew_acc)
    hnew_acc = jnp.where(ms.reject, posneg * jnp.minimum(jnp.abs(hnew_acc), jnp.abs(h)),
                         hnew_acc)
    hnew_rej = h / jnp.minimum(facc1, fac11 / p.safety)
    h_next = jnp.where(accepted, hnew_acc, hnew_rej)

    t_new = jnp.where(last, ra.tend, t + h)
    status = jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                       jnp.where(stiff_fail, _i32(Status.PROBABLY_STIFF),
                                 _i32(Status.RUNNING)))

    log_facold_floor = math.log(1e-4)
    ms_new = ERKState(
        h=h_next,
        k1=jnp.where(advance, k7, k1),
        facold=jnp.where(accepted, jnp.maximum(log_err, log_facold_floor),
                         ms.facold),
        reject=~accepted,
        iasti=iasti, nonstiff=nonstiff, hlamb=hlamb, posneg=posneg,
    )
    return StepProposal(
        accepted=accepted, advance=advance, finished=advance & last,
        status=status,
        t_new=jnp.where(advance, t_new, t), y_new=jnp.where(advance, ynew, y),
        xold=t, h_used=h, cont=cont,
        nfev_inc=_i32(6), njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=~too_small, count_reject=(~accepted) & (naccpt > 1) & ~too_small,
        ms=ms_new,
    )


def dopri5_interp(cont, xold, h, ti):
    # Time ratio in time precision (f64 under the hybrid), state math in
    # the cont dtype.
    theta = ((ti - xold) / h).astype(cont.dtype)
    theta1 = 1.0 - theta
    return cont[0] + theta * (
        cont[1] + theta1 * (cont[2] + theta * (cont[3] + theta1 * cont[4]))
    )


# =============================================================================
# DOP853
# =============================================================================

def dop853_attempt(rhs, t, y, naccpt, ms: ERKState, ra: RunArgs, p: ERKParams):
    C = tab.DOP853_C
    h, posneg = ms.h, ms.posneg
    facc1 = 1.0 / p.scale_min
    facc2 = 1.0 / p.scale_max
    expo1 = 1.0 / 8.0 - p.beta * 0.2
    n = y.shape[-1]

    too_small = 0.1 * jnp.abs(h) <= jnp.abs(t) * p.uround
    last = (t + 1.01 * h - ra.tend) * posneg > 0.0
    h = jnp.where(last, ra.tend - t, h)
    hy = h.astype(y.dtype)  # state-space h (f64-time/f32-state hybrid)

    ks = [ms.k1]
    for i, row in enumerate(tab.DOP853_A):
        ks.append(rhs(t + C[i + 1] * h, y + hy * dotk(row, ks)))
    y12 = y + hy * dotk(tab.DOP853_A[-1], ks[:-1])  # stage-12 state (stiffness test)

    kb = dotk(tab.DOP853_B, ks)
    ynew = y + hy * kb

    cdt = jnp.float32 if p.controller_precision == "float32" else y.dtype
    sk = (ra.atol.astype(cdt)
          + ra.rtol.astype(cdt)
          * jnp.maximum(jnp.abs(y.astype(cdt)), jnp.abs(ynew.astype(cdt))))
    bh1, bh2, bh3 = tab.DOP853_BH
    err2_vec = (kb - bh1 * ks[0] - bh2 * ks[8] - bh3 * ks[11]).astype(cdt)
    err5_vec = dotk(tab.DOP853_ER, ks).astype(cdt)
    err2 = jnp.sum((err2_vec / sk) ** 2)
    err5 = jnp.sum((err5_vec / sk) ** 2)
    deno = err5 + 0.01 * err2
    deno = jnp.where(deno <= 0.0, 1.0, deno)
    err = jnp.abs(hy).astype(cdt) * err5 * jnp.sqrt(1.0 / (n * deno))

    accepted = (err <= 1.0) & ~too_small

    # FSAL-style derivative at the new point plus (optionally) the 3 extra
    # dense stages — the reference computes these on accept only
    # (dop853.rs:521-560); gate them behind the accept flag so rejected
    # attempts skip ~4 RHS evals in the single-trajectory path (under vmap
    # cond lowers to both-branches select, same cost as before).
    def _post_accept():
        f_new = rhs(t + h, ynew)
        if p.need_cont:
            k_ext = ks + [f_new]
            k14 = rhs(t + tab.DOP853_C14 * h, y + hy * dotk(tab.DOP853_A14, k_ext))
            k15 = rhs(t + tab.DOP853_C15 * h,
                      y + hy * dotk(tab.DOP853_A15, k_ext + [k14]))
            k16 = rhs(t + tab.DOP853_C16 * h,
                      y + hy * dotk(tab.DOP853_A16, k_ext + [k14, k15]))
            return f_new, k14, k15, k16
        z = jnp.zeros_like(y)
        return f_new, z, z, z

    def _post_reject():
        z = jnp.zeros_like(y)
        return z, z, z, z

    f_new, k14, k15, k16 = lax.cond(accepted, _post_accept, _post_reject)
    nfev = _i32(11) + jnp.where(accepted, 4 if p.need_cont else 1, 0).astype(jnp.int32)

    # --- Stiffness detection (reference dop853.rs:447-472; square-sums,
    #     divide and sqrt in controller precision — see the DOPRI5 note) ---
    do_stiff = accepted & (((naccpt + 1) % p.stiff_test == 0) | (ms.iasti > 0))
    stnum = jnp.sum((f_new - ks[11]).astype(cdt) ** 2)
    stden = jnp.sum((ynew - y12).astype(cdt) ** 2)
    hlamb = jnp.where(do_stiff & (stden > 0.0),
                      jnp.abs(hy).astype(cdt) * jnp.sqrt(stnum / stden),
                      ms.hlamb)
    is_stiff = hlamb > p.stiff_threshold
    iasti = jnp.where(do_stiff, jnp.where(is_stiff, ms.iasti + 1, ms.iasti), ms.iasti)
    nonstiff = jnp.where(do_stiff,
                         jnp.where(is_stiff, _i32(0), ms.nonstiff + 1), ms.nonstiff)
    iasti = jnp.where(do_stiff & ~is_stiff & (nonstiff == 6), _i32(0), iasti)
    stiff_fail = do_stiff & is_stiff & (iasti == 15)
    advance = accepted & ~stiff_fail

    # --- Dense output: 8 coefficients from the 3 extra stages above
    #     (dop853.rs:474-591) ---
    if p.need_cont:
        k_all = ks + [f_new, k14, k15, k16]
        ydiff = ynew - y
        bspl = hy * ks[0] - ydiff
        rows = [y, ydiff, bspl, ydiff - hy * f_new - bspl]
        for r in range(4, 8):
            rows.append(hy * dotk(tab.DOP853_D[r], k_all))
        cont = jnp.stack(rows)
    else:
        cont = jnp.zeros((0,) + y.shape, y.dtype)

    # --- Controller (dop853.rs:431-652) ---
    if p.beta == 0.0 and expo1 == 0.125:
        # Default DOP853 (beta=0): err^(1/8) is a pure sqrt chain and the
        # facold memory is unused — no transcendentals at all.
        fac11 = jnp.sqrt(jnp.sqrt(jnp.sqrt(err)))
        fac = fac11
        facold_new = ms.facold
    else:
        log_err = jnp.log(jnp.maximum(err, 1e-35))
        fac11 = jnp.exp(expo1 * log_err)
        fac = jnp.exp(expo1 * log_err - p.beta * ms.facold)
        facold_new = jnp.where(accepted,
                               jnp.maximum(log_err, math.log(1e-4)),
                               ms.facold)
    fac = jnp.maximum(facc2, jnp.minimum(facc1, fac / p.safety))
    hnew_acc = h / fac
    hnew_acc = jnp.where(jnp.abs(hnew_acc) > ra.hmax, posneg * ra.hmax, hnew_acc)
    hnew_acc = jnp.where(ms.reject, posneg * jnp.minimum(jnp.abs(hnew_acc), jnp.abs(h)),
                         hnew_acc)
    hnew_rej = h / jnp.minimum(facc1, fac11 / p.safety)
    h_next = jnp.where(accepted, hnew_acc, hnew_rej)

    t_new = jnp.where(last, ra.tend, t + h)
    status = jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                       jnp.where(stiff_fail, _i32(Status.PROBABLY_STIFF),
                                 _i32(Status.RUNNING)))

    ms_new = ERKState(
        h=h_next,
        k1=jnp.where(advance, f_new, ms.k1),
        facold=facold_new,
        reject=~accepted,
        iasti=iasti, nonstiff=nonstiff, hlamb=hlamb, posneg=posneg,
    )
    return StepProposal(
        accepted=accepted, advance=advance, finished=advance & last,
        status=status,
        t_new=jnp.where(advance, t_new, t), y_new=jnp.where(advance, ynew, y),
        xold=t, h_used=h, cont=cont,
        nfev_inc=nfev, njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=~too_small, count_reject=(~accepted) & (naccpt > 1) & ~too_small,
        ms=ms_new,
    )


def dop853_interp(cont, xold, h, ti):
    s = ((ti - xold) / h).astype(cont.dtype)
    s1 = 1.0 - s
    conpar = cont[4] + s * (cont[5] + s1 * (cont[6] + s * cont[7]))
    return cont[0] + s * (cont[1] + s1 * (cont[2] + s * (cont[3] + s1 * conpar)))


# =============================================================================
# RK23 (Bogacki–Shampine)
# =============================================================================

def rk23_attempt(rhs, t, y, naccpt, ms: ERKState, ra: RunArgs, p: ERKParams):
    h, posneg = ms.h, ms.posneg

    # Step-underflow guard (parity with the other adaptive engines; a lane
    # stuck at err>1 with h -> 0 must terminate with a status, not loop
    # until max_steps).
    too_small = 0.1 * jnp.abs(h) <= jnp.abs(t) * p.uround

    last = (t + h - ra.tend) * posneg > 0.0
    h = jnp.where(last, ra.tend - t, h)
    hy = h.astype(y.dtype)  # state-space h (f64-time/f32-state hybrid)

    k1 = ms.k1
    k2 = rhs(t + 0.5 * h, y + hy * 0.5 * k1)
    k3 = rhs(t + 0.75 * h, y + hy * 0.75 * k2)
    ynew = y + hy * dotk(tab.RK23_B, [k1, k2, k3])
    k4 = rhs(t + h, ynew)
    ks = [k1, k2, k3, k4]

    cdt = jnp.float32 if p.controller_precision == "float32" else y.dtype
    err_vec = hy * dotk(tab.RK23_E, ks)
    sk = (ra.atol.astype(cdt)
          + ra.rtol.astype(cdt)
          * jnp.maximum(jnp.abs(ynew), jnp.abs(y)).astype(cdt))
    err = scaled_rms(err_vec.astype(cdt), sk)

    accepted = (err <= 1.0) & ~too_small
    t_new = jnp.where(last, ra.tend, t + h)
    finished = accepted & (last | (t_new == ra.tend))

    if p.need_cont:
        cont = jnp.stack([y, k1, dotk(tab.RK23_D2, ks), dotk(tab.RK23_D3, ks)])
    else:
        cont = jnp.zeros((0,) + y.shape, y.dtype)

    err_pow = safe_pow(err, -1.0 / 3.0)
    factor = jnp.clip(p.safety * err_pow, p.scale_min, p.scale_max)
    h_acc = h * factor
    h_acc = jnp.where(jnp.abs(h_acc) > ra.hmax, ra.hmax * posneg, h_acc)
    h_rej = h * jnp.clip(p.safety * err_pow, p.scale_min, 1.0)
    h_next = jnp.where(accepted, h_acc, h_rej)

    ms_new = ERKState(
        h=h_next, k1=jnp.where(accepted, k4, k1),
        facold=ms.facold, reject=~accepted,
        iasti=ms.iasti, nonstiff=ms.nonstiff, hlamb=ms.hlamb, posneg=posneg,
    )
    return StepProposal(
        accepted=accepted, advance=accepted, finished=finished,
        status=jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                         _i32(Status.RUNNING)),
        t_new=jnp.where(accepted, t_new, t), y_new=jnp.where(accepted, ynew, y),
        xold=t, h_used=h, cont=cont,
        nfev_inc=_i32(3), njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=accepted, count_reject=(~accepted) & ~too_small,
        ms=ms_new,
    )


def rk23_interp(cont, xold, h, ti):
    s = ((ti - xold) / h).astype(cont.dtype)
    hy = jnp.asarray(h).astype(cont.dtype)
    return cont[0] + hy * (cont[1] * s + cont[2] * s * s + cont[3] * s * s * s)


# =============================================================================
# RK4 (classic, fixed step)
# =============================================================================

def rk4_attempt(rhs, t, y, naccpt, ms: ERKState, ra: RunArgs, p: ERKParams):
    h, posneg = ms.h, ms.posneg
    # 'last' decided before stepping (reference rk4.rs:149-152); the step is
    # always taken with the full fixed h.
    last = (t + 1.01 * h - ra.tend) * jnp.sign(h) > 0.0

    hy = jnp.asarray(h).astype(y.dtype)  # state-space h (hybrid-aware)
    k1 = ms.k1
    k2 = rhs(t + 0.5 * h, y + 0.5 * hy * k1)
    k3 = rhs(t + 0.5 * h, y + 0.5 * hy * k2)
    k4 = rhs(t + h, y + hy * k3)
    ynew = y + hy * dotk(tab.RK4_B, [k1, k2, k3, k4])
    t_new = t + h
    k1_new = rhs(t_new, ynew)

    if p.need_cont:
        # Cubic Hermite: [y0, f0, f1, y1] (correct start slope; cf.
        # reference rk4.rs:185-192 which stores k4 as the start slope).
        cont = jnp.stack([y, k1, k1_new, ynew])
    else:
        cont = jnp.zeros((0,) + y.shape, y.dtype)

    true_ = jnp.ones((), bool)
    ms_new = ms._replace(k1=k1_new)
    return StepProposal(
        accepted=true_, advance=true_, finished=last,
        status=_i32(Status.RUNNING),
        t_new=t_new, y_new=ynew, xold=t, h_used=h, cont=cont,
        nfev_inc=_i32(4), njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=true_, count_reject=jnp.zeros((), bool),
        ms=ms_new,
    )


def rk4_interp(cont, xold, h, ti):
    s = ((ti - xold) / h).astype(cont.dtype)
    hy = jnp.asarray(h).astype(cont.dtype)
    s2 = s * s
    s3 = s2 * s
    h00 = 2.0 * s3 - 3.0 * s2 + 1.0
    h10 = s3 - 2.0 * s2 + s
    h01 = -2.0 * s3 + 3.0 * s2
    h11 = s3 - s2
    return h00 * cont[0] + h10 * hy * cont[1] + h01 * cont[3] + h11 * hy * cont[2]


# =============================================================================
# Engine registry
# =============================================================================

def make_engine(method: str, need_cont: bool, **overrides) -> tuple[Engine, ERKParams]:
    method = method.upper()
    if method == "DOPRI5":
        cfg = dict(DOPRI5_DEFAULTS)
        attempt, interp, ncoeff = dopri5_attempt, dopri5_interp, 5
    elif method == "DOP853":
        cfg = dict(DOP853_DEFAULTS)
        attempt, interp, ncoeff = dop853_attempt, dop853_interp, 8
    elif method == "RK23":
        cfg = dict(RK23_DEFAULTS)
        attempt, interp, ncoeff = rk23_attempt, rk23_interp, 4
    elif method == "RK4":
        cfg = {}
        attempt, interp, ncoeff = rk4_attempt, rk4_interp, 4
    else:
        raise ValueError(f"unknown explicit method {method!r}")
    cfg.update(overrides)
    p = ERKParams(method=method, need_cont=need_cont, **cfg)
    eng = Engine(name=method, ncoeff=ncoeff if need_cont else 0,
                 init=erk_init, attempt=attempt, interp=interp)
    return eng, p
