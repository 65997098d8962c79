"""Explicit RK engines over the framework's own double-float arithmetic.

``dtype="dd"`` runs the *state* arithmetic in hand-rolled double-f32
(core/ddmath.py) instead of the platform's f64 emulation: same precision
class (this TPU's "f64" is itself a range-limited double-float — see
docs/TPU_NOTES.md #14), at a fraction of the instruction count, because the
ODE hot loop needs none of the emulation's NaN/inf special-case plumbing
and can estimate errors in plain f32 off the hi words (the proven
``controller_precision="float32"`` design, methods/erk.py).

Precision split per attempt:
* stage states / increments / ynew : dd        (the solution path)
* time axis t, h, tend             : platform f64 (exact accumulation; for
                                     autonomous systems XLA dead-code
                                     eliminates the unused stage times)
* error norm, controller, stiffness: f32       (chooses h only)
* dense coefficients               : dd, packed as (hi, lo) row pairs
                                     (ddtier.dd_pack_cont) and interpolated
                                     in f64 — dense samples, event states
                                     and event times are f64-grade

Algorithmic parity with methods/erk.py (itself at formula parity with
reference src/methods/dopri5.rs:266-478, rk23.rs:188-321): identical
controllers, counters and status logic — only the arithmetic carrier of the
state differs.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .. import tableaus as tab
from ..types import Status
from ..core import ddmath as ddm
from ..core.ddmath import DD
from .base import Engine, RunArgs, StepProposal
from .erk import ERKParams, ERKState, DOPRI5_DEFAULTS, RK23_DEFAULTS


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _exact_state() -> bool:
    """Accumulation mode for solution-bearing stage/B sums, resolved at
    trace time per backend: the fused ddot (ddmath.dot_const default) is
    bit-clean on TPU (measured: DOP853 rtol=1e-9 step counts match the
    f64 engine to 0.01%, +6-9% throughput), but on the CPU backend LLVM's
    in-kernel FMA contraction perturbs the f32 residue stream enough to
    raise the stage-state noise floor above tight tolerances (measured:
    DOP853 reject-storms at rtol <= 1e-9, 6.5x step count).  Off-TPU the
    per-term renormalized chain (exact=True) restores the clean floor.
    Error-vector sums are consumed through .hi only and stay fused on
    every backend (bisect-verified healthy)."""
    import jax
    return jax.default_backend() != "tpu"


def _stage_renorm() -> bool:
    """Renormalization policy for the stage chain dot -> (*h) -> (+y):
    the intermediate renorms are cosmetic (every Dekker formula is exact
    for unnormalized pairs; the closing add renormalizes the stored
    state), so the TPU fused path skips them — fewer barrier-pinned
    quick_two_sums per stage.  CPU keeps full renormalization (its exact
    per-term chains never produce unnormalized intermediates anyway).
    Override with IVP_TPU_DD_RENORM=full / =lean."""
    import os
    mode = os.environ.get("IVP_TPU_DD_RENORM")
    if mode == "full":
        return True
    if mode == "lean":
        return False
    return _exact_state()  # True (full renorm) off-TPU, False (lean) on TPU


def _hinit_f32(rhs, t, y: DD, posneg, f0: DD, iord, hmax, atol, rtol):
    """Hairer HINIT with the norms in f32 off the hi words (the heuristic
    chooses an order of magnitude; cf. core/common.py::hinit)."""
    sk = atol + rtol * jnp.abs(y.hi)
    dnf = jnp.sum((f0.hi / sk) ** 2)
    dny = jnp.sum((y.hi / sk) ** 2)
    h = jnp.where((dnf <= 1e-10) | (dny <= 1e-10), 1.0e-6,
                  jnp.sqrt(dny / dnf) * 0.01)
    h = jnp.minimum(h, jnp.abs(hmax).astype(jnp.float32))
    h = h * posneg

    y1 = y + ddm.mul_f32(f0, h)
    f1 = rhs(t + h.astype(hmax.dtype), y1)

    df = (f1.hi - f0.hi) / sk
    der2 = jnp.sqrt(jnp.sum(df * df)) / jnp.abs(h)
    der12 = jnp.maximum(jnp.abs(der2), jnp.sqrt(dnf))
    h1 = jnp.where(der12 <= 1.0e-15,
                   jnp.maximum(1.0e-6, jnp.abs(h) * 1.0e-3),
                   (0.01 / der12) ** (1.0 / iord))
    h_final = jnp.minimum(jnp.minimum(jnp.abs(h), h1),
                          jnp.abs(hmax).astype(jnp.float32))
    return h_final * posneg, f1


def dd_erk_init(rhs, t0, y0: DD, first_step, ra: RunArgs, p: ERKParams):
    """dd method state.  The step size ``h`` is carried in *f32* (a step size
    is a controller choice, good to a few digits by construction) while ``t``
    accumulates in platform f64 — this leaves exactly two emulated-f64 ops
    per attempt (``tend - t`` and ``t + h``)."""
    posneg = jnp.sign(ra.tend - t0).astype(jnp.float32)
    k1 = rhs(t0, y0)
    if first_step is not None:
        h = jnp.abs(jnp.asarray(first_step, jnp.float32)) * posneg
        nfev = 1
    else:
        h, _ = _hinit_f32(rhs, t0, y0, posneg, k1, p.iord, ra.hmax,
                          ra.atol, ra.rtol)
        nfev = 2
    ms = ERKState(
        h=h, k1=k1, facold=jnp.log(jnp.full((), 1e-4, jnp.float32)),
        reject=jnp.zeros((), bool), iasti=_i32(0), nonstiff=_i32(0),
        hlamb=jnp.zeros((), jnp.float32), posneg=posneg,
    )
    return ms, nfev


def dd_dopri5_attempt(rhs, t, y: DD, naccpt, ms: ERKState, ra: RunArgs,
                      p: ERKParams):
    A, C, E, D = tab.DOPRI5_A, tab.DOPRI5_C, tab.DOPRI5_E, tab.DOPRI5_D
    h, posneg = ms.h, ms.posneg  # h, posneg: f32 (see dd_erk_init)
    facc1 = 1.0 / p.scale_min
    facc2 = 1.0 / p.scale_max
    expo1 = 0.2 - p.beta * 0.75

    too_small = 0.1 * jnp.abs(h) <= jnp.abs(t).astype(jnp.float32) * p.uround
    # Landing test in f32 on the *remaining interval* (tend - t is the only
    # place t-resolution matters; its f64 subtraction is one of the few
    # emulated-f64 ops per attempt).
    dtl64 = ra.tend - t
    dt_left = dtl64.astype(jnp.float32)
    last = (1.01 * h - dt_left) * posneg > 0.0
    h = jnp.where(last, dt_left, h)
    h64 = h.astype(t.dtype)  # stage times (DCE'd for autonomous systems)
    # The landing step must cover tend - t *exactly* in the state arithmetic
    # (t_new is forced to tend below): carry the f32-truncated remainder as
    # the step's dd low word — without it every solve ends with a silent
    # |y'|*2^-24*h state error (measured 2e-9 on VdP, 100x the dd floor).
    h_lo = jnp.where(last, (dtl64 - h64).astype(jnp.float32),
                     jnp.zeros((), jnp.float32))
    hdd = DD(h, h_lo)

    k1 = ms.k1
    xs = _exact_state()  # solution-path accumulation mode (see _exact_state)
    rn = _stage_renorm()  # intermediate renorm policy (see _stage_renorm)
    hsp = ddm.presplit(hdd)  # one barrier-pinned split shared by all stages

    def stage(row, kl):
        s = ddm.dot_const(row, kl, exact=xs, renorm=rn)
        return y + ddm.mul_presplit(s, hsp, renorm=rn)

    k2 = rhs(t + C[1] * h64, stage(A[0], [k1]))
    k3 = rhs(t + C[2] * h64, stage(A[1], [k1, k2]))
    k4 = rhs(t + C[3] * h64, stage(A[2], [k1, k2, k3]))
    k5 = rhs(t + C[4] * h64, stage(A[3], [k1, k2, k3, k4]))
    ysti = stage(A[4], [k1, k2, k3, k4, k5])
    k6 = rhs(t + h64, ysti)
    ynew = stage(A[5], [k1, k2, k3, k4, k5, k6])
    k7 = rhs(t + h64, ynew)
    ks = [k1, k2, k3, k4, k5, k6, k7]

    # Error vector in dd (the E-weighted stage sum cancels from O(|k|) down
    # to O(err) — f32 terms would leave a ~2^-24|hk| noise floor that stalls
    # the controller at tight tolerances); the scalar |h| factor and the norm
    # run in f32 off the hi word, exactly like controller_precision="float32"
    # in methods/erk.py.
    err_vec = ddm.dot_const(E, ks).hi
    sk = (ra.atol + ra.rtol * jnp.maximum(jnp.abs(y.hi), jnp.abs(ynew.hi)))
    r = err_vec / sk
    err = jnp.abs(h) * jnp.sqrt(jnp.mean(r * r))

    accepted = (err <= 1.0) & ~too_small

    # --- Stiffness detection (f32; reference dopri5.rs:363-391) ---
    do_stiff = accepted & (((naccpt + 1) % p.stiff_test == 0) | (ms.iasti > 0))
    stnum = jnp.sum((k7.hi - k6.hi) ** 2)
    stden = jnp.sum((ynew.hi - ysti.hi) ** 2)
    hlamb = jnp.where(do_stiff & (stden > 0.0),
                      jnp.abs(h) * jnp.sqrt(stnum / stden), ms.hlamb)
    is_stiff = hlamb > p.stiff_threshold
    iasti = jnp.where(do_stiff, jnp.where(is_stiff, ms.iasti + 1, ms.iasti),
                      ms.iasti)
    nonstiff = jnp.where(do_stiff,
                         jnp.where(is_stiff, _i32(0), ms.nonstiff + 1),
                         ms.nonstiff)
    iasti = jnp.where(do_stiff & ~is_stiff & (nonstiff == 6), _i32(0), iasti)
    stiff_fail = do_stiff & is_stiff & (iasti == 15)

    advance = accepted & ~stiff_fail

    # --- Dense output: full-dd coefficients packed as (hi, lo) row pairs
    #     (ddtier.dd_pack_cont) — dense samples / event states / event times
    #     are f64-grade, matching the reference's full-Float cont buffers
    #     (reference src/dense.rs:9-157; dopri5.rs:327-334,393-403) ---
    if p.need_cont:
        from .ddtier import dd_pack_cont
        ydiff = ynew - y
        bspl = k1 * hdd - ydiff
        cont = dd_pack_cont(ddm.stack([
            y, ydiff, bspl, ydiff - k7 * hdd - bspl,
            ddm.dot_const(D, ks) * hdd]))
    else:
        cont = jnp.zeros((0,) + y.shape, jnp.float32)

    # --- Controller (identical f32 math to methods/erk.py; all h updates
    #     are plain f32 ops — no emulated divisions) ---
    log_err = jnp.log(jnp.maximum(err, 1e-35))
    fac11 = jnp.exp(expo1 * log_err)
    fac = jnp.exp(expo1 * log_err - p.beta * ms.facold)
    fac = jnp.maximum(facc2, jnp.minimum(facc1, fac / p.safety))
    hmaxf = ra.hmax.astype(jnp.float32)
    hnew_acc = h / fac
    hnew_acc = jnp.where(jnp.abs(hnew_acc) > hmaxf, posneg * hmaxf, hnew_acc)
    hnew_acc = jnp.where(ms.reject,
                         posneg * jnp.minimum(jnp.abs(hnew_acc), jnp.abs(h)),
                         hnew_acc)
    hnew_rej = h / jnp.minimum(facc1, fac11 / p.safety)
    h_next = jnp.where(accepted, hnew_acc, hnew_rej)

    t_new = jnp.where(last, ra.tend, t + h64)
    status = jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                       jnp.where(stiff_fail, _i32(Status.PROBABLY_STIFF),
                                 _i32(Status.RUNNING)))

    ms_new = ERKState(
        h=h_next,
        k1=ddm.where(advance, k7, k1),
        facold=jnp.where(accepted, jnp.maximum(log_err, math.log(1e-4)),
                         ms.facold),
        reject=~accepted,
        iasti=iasti, nonstiff=nonstiff, hlamb=hlamb, posneg=posneg,
    )
    return StepProposal(
        accepted=accepted, advance=advance, finished=advance & last,
        status=status,
        t_new=jnp.where(advance, t_new, t),
        y_new=ddm.where(advance, ynew, y),
        xold=t, h_used=h, cont=cont,
        nfev_inc=_i32(6), njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=~too_small,
        count_reject=(~accepted) & (naccpt > 1) & ~too_small,
        ms=ms_new,
    )


def dd_dop853_attempt(rhs, t, y: DD, naccpt, ms: ERKState, ra: RunArgs,
                      p: ERKParams):
    from jax import lax
    C = tab.DOP853_C
    h, posneg = ms.h, ms.posneg  # h, posneg: f32 (see dd_erk_init)
    facc1 = 1.0 / p.scale_min
    facc2 = 1.0 / p.scale_max
    expo1 = 1.0 / 8.0 - p.beta * 0.2
    n = y.shape[-1]

    too_small = 0.1 * jnp.abs(h) <= jnp.abs(t).astype(jnp.float32) * p.uround
    dtl64 = ra.tend - t
    dt_left = dtl64.astype(jnp.float32)
    last = (1.01 * h - dt_left) * posneg > 0.0
    h = jnp.where(last, dt_left, h)
    h64 = h.astype(t.dtype)
    # Exact landing step (see dd_dopri5_attempt).
    h_lo = jnp.where(last, (dtl64 - h64).astype(jnp.float32),
                     jnp.zeros((), jnp.float32))
    hdd = DD(h, h_lo)

    ks = [ms.k1]
    xs = _exact_state()  # solution-path accumulation mode (see _exact_state)
    rn = _stage_renorm()  # intermediate renorm policy (see _stage_renorm)
    hsp = ddm.presplit(hdd)  # one barrier-pinned split shared by all stages

    def stage(row, kl):
        s = ddm.dot_const(row, kl, exact=xs, renorm=rn)
        return y + ddm.mul_presplit(s, hsp, renorm=rn)

    for i, row in enumerate(tab.DOP853_A):
        ks.append(rhs(t + C[i + 1] * h64, stage(row, ks)))
    y12 = stage(tab.DOP853_A[-1], ks[:-1])

    # kb stays renormalized: its words enter the cancelling 8(5,3) err2
    # subtraction below, where tight word bounds keep the dropped-term
    # budget at the proven level.
    kb = ddm.dot_const(tab.DOP853_B, ks, exact=xs)
    ynew = y + ddm.mul_presplit(kb, hsp, renorm=rn)

    # Dual 8(5,3) error norm: both error sums cancel from O(|k|) to O(err),
    # so the dots run in dd; the norms run in f32 off the hi words
    # (reference dop853.rs:404-445).
    sk = ra.atol + ra.rtol * jnp.maximum(jnp.abs(y.hi), jnp.abs(ynew.hi))
    bh1, bh2, bh3 = tab.DOP853_BH
    err2_vec = (kb - ks[0] * bh1 - ks[8] * bh2 - ks[11] * bh3).hi
    err5_vec = ddm.dot_const(tab.DOP853_ER, ks).hi
    err2 = jnp.sum((err2_vec / sk) ** 2)
    err5 = jnp.sum((err5_vec / sk) ** 2)
    deno = err5 + 0.01 * err2
    deno = jnp.where(deno <= 0.0, 1.0, deno)
    err = jnp.abs(h) * err5 * jnp.sqrt(1.0 / (n * deno))

    accepted = (err <= 1.0) & ~too_small

    # Accept-gated FSAL derivative + 3 extra dense stages (dop853.rs:521-560;
    # under vmap the cond lowers to both-branches select, same as the f64
    # engine).
    def _post_accept():
        f_new = rhs(t + h64, ynew)
        if p.need_cont:
            k_ext = ks + [f_new]
            k14 = rhs(t + tab.DOP853_C14 * h64,
                      y + ddm.mul_f32(ddm.dot_const(tab.DOP853_A14, k_ext), h))
            k15 = rhs(t + tab.DOP853_C15 * h64,
                      y + ddm.mul_f32(
                          ddm.dot_const(tab.DOP853_A15, k_ext + [k14]), h))
            k16 = rhs(t + tab.DOP853_C16 * h64,
                      y + ddm.mul_f32(
                          ddm.dot_const(tab.DOP853_A16, k_ext + [k14, k15]),
                          h))
            return f_new, k14, k15, k16
        z = ddm.zeros(y.shape)
        return f_new, z, z, z

    def _post_reject():
        z = ddm.zeros(y.shape)
        return z, z, z, z

    f_new, k14, k15, k16 = lax.cond(accepted, _post_accept, _post_reject)
    nfev = _i32(11) + jnp.where(accepted, 4 if p.need_cont else 1,
                                0).astype(jnp.int32)

    # --- Stiffness detection (f32; reference dop853.rs:447-472) ---
    do_stiff = accepted & (((naccpt + 1) % p.stiff_test == 0) | (ms.iasti > 0))
    stnum = jnp.sum((f_new.hi - ks[11].hi) ** 2)
    stden = jnp.sum((ynew.hi - y12.hi) ** 2)
    hlamb = jnp.where(do_stiff & (stden > 0.0),
                      jnp.abs(h) * jnp.sqrt(stnum / stden), ms.hlamb)
    is_stiff = hlamb > p.stiff_threshold
    iasti = jnp.where(do_stiff, jnp.where(is_stiff, ms.iasti + 1, ms.iasti),
                      ms.iasti)
    nonstiff = jnp.where(do_stiff,
                         jnp.where(is_stiff, _i32(0), ms.nonstiff + 1),
                         ms.nonstiff)
    iasti = jnp.where(do_stiff & ~is_stiff & (nonstiff == 6), _i32(0), iasti)
    stiff_fail = do_stiff & is_stiff & (iasti == 15)
    advance = accepted & ~stiff_fail

    # --- Dense output: 8 full-dd coefficients packed as (hi, lo) row pairs
    #     (ddtier.dd_pack_cont; reference dop853.rs:474-591) ---
    if p.need_cont:
        from .ddtier import dd_pack_cont
        k_all = ks + [f_new, k14, k15, k16]
        ydiff = ynew - y
        bspl = ks[0] * hdd - ydiff
        rows = [y, ydiff, bspl, ydiff - f_new * hdd - bspl]
        for r in range(4, 8):
            rows.append(ddm.dot_const(tab.DOP853_D[r], k_all) * hdd)
        cont = dd_pack_cont(ddm.stack(rows))
    else:
        cont = jnp.zeros((0,) + y.shape, jnp.float32)

    # --- Controller (f32; default beta=0 -> pure sqrt chain) ---
    if p.beta == 0.0 and expo1 == 0.125:
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
    hmaxf = ra.hmax.astype(jnp.float32)
    hnew_acc = h / fac
    hnew_acc = jnp.where(jnp.abs(hnew_acc) > hmaxf, posneg * hmaxf, hnew_acc)
    hnew_acc = jnp.where(ms.reject,
                         posneg * jnp.minimum(jnp.abs(hnew_acc), jnp.abs(h)),
                         hnew_acc)
    hnew_rej = h / jnp.minimum(facc1, fac11 / p.safety)
    h_next = jnp.where(accepted, hnew_acc, hnew_rej)

    t_new = jnp.where(last, ra.tend, t + h64)
    status = jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                       jnp.where(stiff_fail, _i32(Status.PROBABLY_STIFF),
                                 _i32(Status.RUNNING)))

    ms_new = ERKState(
        h=h_next,
        k1=ddm.where(advance, f_new, ms.k1),
        facold=facold_new,
        reject=~accepted,
        iasti=iasti, nonstiff=nonstiff, hlamb=hlamb, posneg=posneg,
    )
    return StepProposal(
        accepted=accepted, advance=advance, finished=advance & last,
        status=status,
        t_new=jnp.where(advance, t_new, t),
        y_new=ddm.where(advance, ynew, y),
        xold=t, h_used=h, cont=cont,
        nfev_inc=nfev, njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=~too_small,
        count_reject=(~accepted) & (naccpt > 1) & ~too_small,
        ms=ms_new,
    )


def dd_rk23_attempt(rhs, t, y: DD, naccpt, ms: ERKState, ra: RunArgs,
                    p: ERKParams):
    h, posneg = ms.h, ms.posneg  # h, posneg: f32 (see dd_erk_init)
    too_small = 0.1 * jnp.abs(h) <= jnp.abs(t).astype(jnp.float32) * p.uround
    dtl64 = ra.tend - t
    dt_left = dtl64.astype(jnp.float32)
    last = (h - dt_left) * posneg > 0.0
    h = jnp.where(last, dt_left, h)
    h64 = h.astype(t.dtype)
    # Exact landing step (see dd_dopri5_attempt).
    h_lo = jnp.where(last, (dtl64 - h64).astype(jnp.float32),
                     jnp.zeros((), jnp.float32))
    hdd = DD(h, h_lo)

    k1 = ms.k1
    xs = _exact_state()
    rn = _stage_renorm()
    k2 = rhs(t + 0.5 * h64,
             y + ddm.mul(ddm.mul_const(k1, 0.5), hdd, renorm=rn))
    k3 = rhs(t + 0.75 * h64,
             y + ddm.mul(ddm.mul_const(k2, 0.75), hdd, renorm=rn))
    ynew = y + ddm.mul(ddm.dot_const(tab.RK23_B, [k1, k2, k3], exact=xs,
                                     renorm=rn), hdd, renorm=rn)
    k4 = rhs(t + h64, ynew)
    ks = [k1, k2, k3, k4]

    err_vec = ddm.dot_const(tab.RK23_E, ks).hi
    sk = ra.atol + ra.rtol * jnp.maximum(jnp.abs(ynew.hi), jnp.abs(y.hi))
    r = err_vec / sk
    err = jnp.abs(h) * jnp.sqrt(jnp.mean(r * r))

    accepted = (err <= 1.0) & ~too_small
    t_new = jnp.where(last, ra.tend, t + h64)
    finished = accepted & (last | (t_new == ra.tend))

    if p.need_cont:
        from .ddtier import dd_pack_cont
        cont = dd_pack_cont(ddm.stack([
            y, k1, ddm.dot_const(tab.RK23_D2, ks),
            ddm.dot_const(tab.RK23_D3, ks)]))
    else:
        cont = jnp.zeros((0,) + y.shape, jnp.float32)

    err_pow = jnp.exp(jnp.log(jnp.maximum(err, 1e-35)) * (-1.0 / 3.0))
    factor = jnp.clip(p.safety * err_pow, p.scale_min, p.scale_max)
    hmaxf = ra.hmax.astype(jnp.float32)
    h_acc = h * factor
    h_acc = jnp.where(jnp.abs(h_acc) > hmaxf, hmaxf * posneg, h_acc)
    h_rej = h * jnp.clip(p.safety * err_pow, p.scale_min, 1.0)
    h_next = jnp.where(accepted, h_acc, h_rej)

    ms_new = ERKState(
        h=h_next, k1=ddm.where(accepted, k4, k1),
        facold=ms.facold, reject=~accepted,
        iasti=ms.iasti, nonstiff=ms.nonstiff, hlamb=ms.hlamb, posneg=posneg,
    )
    return StepProposal(
        accepted=accepted, advance=accepted, finished=finished,
        status=jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                         _i32(Status.RUNNING)),
        t_new=jnp.where(accepted, t_new, t),
        y_new=ddm.where(accepted, ynew, y),
        xold=t, h_used=h, cont=cont,
        nfev_inc=_i32(3), njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=accepted, count_reject=(~accepted) & ~too_small,
        ms=ms_new,
    )


def dd_rk4_init(rhs, t0, y0: DD, first_step, ra: RunArgs, p: ERKParams):
    """RK4 keeps the step size in the *time* dtype: a fixed step is a user
    choice, not a controller choice — rounding 1e-2 to f32 would change the
    step count and the tend-overshoot point vs the f64 engine (the adaptive
    dd engines carry h in f32 by design, dd_erk_init)."""
    ms, nfev = dd_erk_init(rhs, t0, y0, first_step, ra, p)
    if first_step is not None:
        h64 = (jnp.abs(jnp.asarray(first_step, ra.tend.dtype))
               * jnp.sign(ra.tend - jnp.asarray(t0, ra.tend.dtype)))
    else:
        h64 = ms.h.astype(ra.tend.dtype)  # auto-chosen step: f32-grade is fine
    return ms._replace(h=h64), nfev


def dd_rk4_attempt(rhs, t, y: DD, naccpt, ms: ERKState, ra: RunArgs,
                   p: ERKParams):
    """Fixed-step classical RK4 over dd state (cf. methods/erk.py::
    rk4_attempt, reference rk4.rs:149-192): the step is always taken with
    the full fixed h — h lives in the time dtype (dd_rk4_init) and enters
    the state arithmetic as its exact dd split, so step counts and overshoot
    match the f64 engine exactly."""
    h = ms.h  # time-dtype (see dd_rk4_init)
    last = ((t + 1.01 * h) - ra.tend) * jnp.sign(h) > 0.0
    h32 = h.astype(jnp.float32)
    hdd = DD(h32, (h - h32.astype(h.dtype)).astype(jnp.float32))

    k1 = ms.k1
    k2 = rhs(t + 0.5 * h, y + (k1 * 0.5) * hdd)
    k3 = rhs(t + 0.5 * h, y + (k2 * 0.5) * hdd)
    k4 = rhs(t + h, y + k3 * hdd)
    ynew = y + ddm.dot_const(tab.RK4_B, [k1, k2, k3, k4],
                             exact=_exact_state()) * hdd
    t_new = t + h
    k1_new = rhs(t_new, ynew)

    if p.need_cont:
        from .ddtier import dd_pack_cont
        cont = dd_pack_cont(ddm.stack([y, k1, k1_new, ynew]))
    else:
        cont = jnp.zeros((0,) + y.shape, jnp.float32)

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


def make_engine(method: str, need_cont: bool, **overrides):
    from . import erk
    from .ddtier import dd_wrap_interp
    method = method.upper()
    init = dd_erk_init
    if method in ("DOPRI5", "RK45"):
        cfg = dict(DOPRI5_DEFAULTS)
        attempt, interp, ncoeff = dd_dopri5_attempt, erk.dopri5_interp, 5
        name = "DOPRI5"
    elif method == "DOP853":
        from .erk import DOP853_DEFAULTS
        cfg = dict(DOP853_DEFAULTS)
        attempt, interp, ncoeff = dd_dop853_attempt, erk.dop853_interp, 8
        name = "DOP853"
    elif method == "RK23":
        cfg = dict(RK23_DEFAULTS)
        attempt, interp, ncoeff = dd_rk23_attempt, erk.rk23_interp, 4
        name = "RK23"
    elif method == "RK4":
        cfg = {}
        attempt, interp, ncoeff = dd_rk4_attempt, erk.rk4_interp, 4
        name = "RK4"
        init = dd_rk4_init
    else:
        raise ValueError(
            f"unknown explicit dd method {method!r}; the stiff dd engines "
            f"live in methods/dd_radau.py and methods/dd_bdf.py")
    cfg.update(overrides)
    cfg.setdefault("controller_precision", "float32")
    p = ERKParams(method=name, need_cont=need_cont, **cfg)
    eng = Engine(name=name, ncoeff=2 * ncoeff if need_cont else 0,
                 init=init, attempt=attempt,
                 # Dense coefficients are dd-packed (hi, lo) row pairs
                 # (ddtier.dd_pack_cont) evaluated through the platform-f64
                 # interpolant formula — dense samples, event states and
                 # event times are f64-grade (reference src/dense.rs:9-157).
                 interp=dd_wrap_interp(interp),
                 # Event/interp boundary adapters (base.py): event functions,
                 # restart maps and event buffers see f64 views of the dd
                 # state; a restart's (possibly modified) f64 state re-enters
                 # the dd path with its exact split — full precision across
                 # restarts.
                 lower=ddm.to_f64,
                 lift=ddm.from_f64)
    return eng, p
