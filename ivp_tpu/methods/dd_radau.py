"""RADAU over the framework's own double-float arithmetic (``dtype="dd"``).

The stiff counterpart of methods/dd_erk.py: the *solution-bearing* state
arithmetic (stage increments, Newton residuals, dense coefficients, the
accepted state) runs in hand-rolled double-f32 (core/ddmath.py) instead of
the platform's software-f64 emulation, while

* the **linear algebra is f32 by construction** — the proven
  ``newton_precision="mixed"`` design of methods/radau.py: an inexact Newton
  whose correction solves only need a few digits, because each iteration's
  residual is re-assembled from the (dd-accurate) state;
* **norms, rates and the step controller are f32** off the hi words
  (``controller_precision="float32"``);
* the **time axis** (t, h, hold) stays in platform f64 — a handful of scalar
  emulated ops per attempt, negligible next to the stage work.

Precision structure of one Newton iteration (cf. radau.rs:477-618):

    g_i   = rhs(t + c_i h, y + z_i)          dd   (residual accuracy)
    r_i   = TI·g − (U1/h or (α±iβ)/h)·f_i    dd   (the cancelling subtraction)
    Δ_i   = E_i⁻¹ r_i.hi                     f32  (sloppy correction solve)
    f_i  += Δ_i                              dd   (exact: f32 + zero low word)
    z     = T·f                              dd

Convergence is governed by the correction norm exactly as in the reference
(radau.rs:561-596), so iteration counts match the f64 engine; the converged
state is residual-accurate at the dd level (~2^-48 relative per step).

Scope: ODE systems with identity mass (the dd tier targets the ensemble hot
path; mass matrices / index-2/3 DAE remain on the platform-f64 engine).

Algorithmic parity with methods/radau.py — itself at formula parity with
reference src/methods/radau.rs:114-843 — for the tolerance transform, Newton
theta/divergence control, predictive Gustafsson controller, jac/LU reuse
flags and the shared consecutive-failure counter.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import tableaus as tab
from ..types import Status
from ..core import ddmath as ddm
from ..core.ddmath import DD
from .base import Engine, RunArgs, StepProposal
from .radau import (RadauParams, RadauState, make_linear_backend,
                    _transform_tols, _i32, _CONTINUE, _CONVERGED, _DIVERGED,
                    _BAD_THETA, _MAXITER, radau_interp)


def _exact_state() -> bool:
    """Per-backend accumulation mode for dd constant-dots (see
    methods/dd_erk.py::_exact_state: fused is bit-clean on TPU, the CPU
    backend's LLVM FMA contraction needs the per-term renormalized chain)."""
    import jax
    return jax.default_backend() != "tpu"


def _residual_renorm() -> bool:
    """Renorm policy for the Newton residual chain (TI-dots and fac·f
    products feeding the r = TI·g − fac·f subtractions): intermediates may
    stay unnormalized — the closing dd add renormalizes before .hi is
    consumed by the f32 solve (see methods/dd_erk.py::_stage_renorm)."""
    from .dd_erk import _stage_renorm
    return _stage_renorm()


def _sc(x) -> DD:
    """Runtime f64 scalar -> dd scalar (exact split)."""
    return ddm.from_f64(x)


def make_dd_radau_init(jac_fn, p: RadauParams):
    n = p.n
    _, _, _, zero_lin = make_linear_backend(p)

    def init(rhs, t0, y0: DD, first_step, ra: RunArgs, p_):
        tdt = ra.tend.dtype
        posneg = jnp.sign(ra.tend - t0)
        if first_step is not None:
            h = (jnp.abs(jnp.asarray(first_step, tdt)) * posneg)
        else:
            h = (1.0e-6 * posneg).astype(tdt)  # reference radau.rs:250-255
        h = jnp.clip(h, -ra.hmax, ra.hmax)
        f0 = rhs(t0, y0)
        rtol_t, atol_t = _transform_tols(ra)
        scal = atol_t + rtol_t * jnp.abs(y0.hi)
        cdt = jnp.float32
        ms = RadauState(
            h=h, hold=h, posneg=posneg, f0=f0,
            cont=ddm.zeros((4, n)), scal=scal,
            first=jnp.ones((), bool), reject=jnp.zeros((), bool),
            last=jnp.zeros((), bool),
            faccon=jnp.ones((), cdt), theta=jnp.full((), p.thet, cdt),
            hhfac=h, h_acc=jnp.zeros((), tdt), err_acc=jnp.zeros((), cdt),
            call_jac=jnp.ones((), bool), call_decomp=jnp.ones((), bool),
            singular=_i32(0),
            jac=jnp.zeros((n, n), jnp.float32),
            lin=zero_lin(jnp.float32),
        )
        return ms, 1

    return init


def make_dd_radau_attempt(jac_fn, p: RadauParams):
    n = p.n
    factor, solve1, solve2, _ = make_linear_backend(p)
    TIr = [[float(v) for v in row] for row in np.asarray(tab.RADAU_TI)]
    Tr = [[float(v) for v in row] for row in np.asarray(tab.RADAU_T)]
    DDc = [float(v) for v in np.asarray(tab.RADAU_DD)]
    C1, C2 = float(tab.RADAU_C1), float(tab.RADAU_C2)
    C1M1, C2M1 = float(tab.RADAU_C1M1), float(tab.RADAU_C2M1)
    C1MC2 = float(tab.RADAU_C1MC2)
    U1, ALPH, BETA = (float(tab.RADAU_U1), float(tab.RADAU_ALPH),
                      float(tab.RADAU_BETA))
    facl = 1.0 / p.scale_min
    facr = 1.0 / p.scale_max
    cfac = p.safety * (1.0 + 2.0 * p.newton_maxiter)
    f32 = jnp.float32

    def lc3(row, vs, exact):
        """Constant 3-term linear combination in dd."""
        return ddm.dot_const(row, vs, exact=exact)

    def attempt(rhs, t, y: DD, naccpt, ms: RadauState, ra: RunArgs, p_):
        xs = _exact_state()
        rn = _residual_renorm()
        cdt = f32
        rtol_t, atol_t = _transform_tols(ra)
        if p.newton_tol is not None:
            newton_tol = jnp.asarray(p.newton_tol, cdt)
        else:
            tolst = rtol_t[0]
            newton_tol = jnp.maximum(10.0 * p.uround / tolst,
                                     jnp.minimum(0.03,
                                                 jnp.sqrt(tolst))).astype(cdt)

        h = ms.h
        posneg = ms.posneg
        nfev = _i32(0)

        # ---- Jacobian (f32; reused while theta stays small) ----
        jac = lax.cond(ms.call_jac, lambda: jac_fn(t, y), lambda: ms.jac)
        njev = jnp.where(ms.call_jac & (not p.const_jac), 1, 0).astype(jnp.int32)

        # ---- Decompositions (f32 build + factor; reused when step ~1) ----
        def do_decomp():
            fac1_32 = (U1 / h).astype(f32)
            alphn_32 = (ALPH / h).astype(f32)
            betan_32 = (BETA / h).astype(f32)
            eye = jnp.eye(n, dtype=f32)
            e1 = fac1_32 * eye - jac
            e2r = alphn_32 * eye - jac
            e2i = betan_32 * eye
            return factor(e1, e2r, e2i)

        def keep_decomp():
            return ms.lin, jnp.zeros((), bool)

        lin, sing = lax.cond(ms.call_decomp, do_decomp, keep_decomp)
        nlu = jnp.where(ms.call_decomp, 2, 0).astype(jnp.int32)

        too_small = 0.1 * jnp.abs(h) <= jnp.abs(t) * p.uround
        scal = ms.scal  # f32 (no DAE partition in the dd tier)

        # ---- Newton starting values: extrapolate the previous collocation
        #      polynomial in dd (radau.rs:447-475) ----
        c3q = _sc(h / ms.hold)
        c1q = c3q * C1
        c2q = c3q * C2
        ak1, ak2, ak3 = ms.cont[1], ms.cont[2], ms.cont[3]

        def extrap(cq: DD) -> DD:
            return cq * (ak1 + (cq - C2M1) * (ak2 + (cq - C1M1) * ak3))

        zdd = ddm.zeros((n,))
        first = ms.first
        z1_0 = ddm.where(first, zdd, extrap(c1q))
        z2_0 = ddm.where(first, zdd, extrap(c2q))
        z3_0 = ddm.where(first, zdd, extrap(c3q))
        f1_0 = ddm.where(first, zdd, lc3(TIr[0], [z1_0, z2_0, z3_0], xs))
        f2_0 = ddm.where(first, zdd, lc3(TIr[1], [z1_0, z2_0, z3_0], xs))
        f3_0 = ddm.where(first, zdd, lc3(TIr[2], [z1_0, z2_0, z3_0], xs))

        # (U1, alpha, beta)/h as dd scalars: the residual's fac·f terms must
        # carry dd accuracy (they cancel against TI·g), so the one emulated
        # f64 division each is paid once per attempt.
        fac1 = _sc(U1 / h)
        alphn = _sc(ALPH / h)
        betan = _sc(BETA / h)

        faccon0 = jnp.maximum(ms.faccon, p.uround) ** 0.8
        inv_scal_c = (1.0 / scal).astype(cdt)

        nst = dict(
            z1=z1_0, z2=z2_0, z3=z3_0, f1=f1_0, f2=f2_0, f3=f3_0,
            it=_i32(0), dyno=jnp.zeros((), cdt), dynold=jnp.zeros((), cdt),
            thqold=jnp.zeros((), cdt), theta=jnp.full((), abs(p.thet), cdt),
            faccon=faccon0, hhfac=ms.hhfac,
            code=jnp.where(sing | too_small, _MAXITER,
                           _CONTINUE).astype(jnp.int32),
            nfev=_i32(0),
        )

        def newton_cond(s):
            return s["code"] == _CONTINUE

        def newton_body(s):
            maxed = s["it"] >= p.newton_maxiter

            # Stage RHS evaluations in dd (residual accuracy).
            g1 = rhs(t + C1 * h, y + s["z1"])
            g2 = rhs(t + C2 * h, y + s["z2"])
            g3 = rhs(t + h, y + s["z3"])

            # TI-transform + (fac/alph/beta)·f subtractions, all dd — this
            # difference is the Newton residual; it cancels toward zero as
            # the iteration converges, which is exactly where f32 assembly
            # would bias the converged state (see module docstring).  The
            # chain intermediates run lean (renorm=rn): the closing dd adds
            # renormalize before the .hi words feed the f32 solves.
            ti1 = ddm.dot_const(TIr[0], [g1, g2, g3], exact=xs, renorm=rn)
            ti2 = ddm.dot_const(TIr[1], [g1, g2, g3], exact=xs, renorm=rn)
            ti3 = ddm.dot_const(TIr[2], [g1, g2, g3], exact=xs, renorm=rn)
            r1 = ti1 - ddm.mul(fac1, s["f1"], renorm=rn)
            r2 = (ti2 - ddm.mul(alphn, s["f2"], renorm=rn)
                  + ddm.mul(betan, s["f3"], renorm=rn))
            r3 = (ti3 - ddm.mul(alphn, s["f3"], renorm=rn)
                  - ddm.mul(betan, s["f2"], renorm=rn))

            # f32 correction solves against the factored E1 / E2.
            d1 = solve1(lin, r1.hi)
            d2, d3 = solve2(lin, r2.hi, r3.hi)

            it = s["it"] + 1
            z1c = d1 * inv_scal_c
            z2c = d2 * inv_scal_c
            z3c = d3 * inv_scal_c
            dyno = jnp.sqrt(
                (jnp.sum(z1c * z1c) + jnp.sum(z2c * z2c)
                 + jnp.sum(z3c * z3c)) / (3.0 * n))

            # Convergence-rate control (radau.rs:561-596), f32.
            check = (it > 1) & (it < p.newton_maxiter)
            thq = dyno / jnp.maximum(s["dynold"], 1e-300)
            theta = jnp.where(it == 2, thq,
                              jnp.sqrt(thq * jnp.maximum(s["thqold"], 1e-300)))
            theta = jnp.where(check, theta, s["theta"])
            thqold = jnp.where(check, thq, s["thqold"])

            ok_theta = theta < 0.99
            faccon = jnp.where(check & ok_theta, theta / (1.0 - theta),
                               s["faccon"])
            rem = jnp.asarray(p.newton_maxiter - 1, cdt) - it.astype(cdt)
            rem_i = p.newton_maxiter - 1 - it
            theta_rem = jnp.ones_like(theta)
            pw = jnp.ones_like(theta)
            for k in range(1, max(p.newton_maxiter - 1, 1)):
                pw = pw * theta
                theta_rem = jnp.where(rem_i >= k, pw, theta_rem)
            dyth = faccon * dyno * theta_rem / newton_tol
            diverged = check & ok_theta & (dyth >= 1.0)
            qnewt = jnp.clip(dyth, 1e-4, 20.0)
            hhfac_div = (0.8 * qnewt ** (-1.0 / (4.0 + rem))).astype(
                s["hhfac"].dtype)
            hhfac = jnp.where(diverged, hhfac_div, s["hhfac"])
            bad_theta = check & ~ok_theta

            dynold = jnp.maximum(dyno, p.uround)

            # Accumulate corrections into F (exact: f32 + zero low word) and
            # back-transform to Z in dd (radau.rs:599-610).
            f1 = s["f1"] + DD(d1, jnp.zeros_like(d1))
            f2 = s["f2"] + DD(d2, jnp.zeros_like(d2))
            f3 = s["f3"] + DD(d3, jnp.zeros_like(d3))
            z1n = lc3(Tr[0], [f1, f2, f3], xs)
            z2n = lc3(Tr[1], [f1, f2, f3], xs)
            z3n = f1 * Tr[2][0] + f2

            converged = faccon * dyno <= newton_tol

            code = jnp.where(maxed, _MAXITER,
                             jnp.where(bad_theta, _BAD_THETA,
                                       jnp.where(diverged, _DIVERGED,
                                                 jnp.where(converged,
                                                           _CONVERGED,
                                                           _CONTINUE)))
                             ).astype(jnp.int32)
            ran = ~maxed
            sel = lambda new, old: jnp.where(ran, new, old)
            dsel = lambda new, old: ddm.where(ran, new, old)
            return dict(
                z1=dsel(z1n, s["z1"]), z2=dsel(z2n, s["z2"]),
                z3=dsel(z3n, s["z3"]),
                f1=dsel(f1, s["f1"]), f2=dsel(f2, s["f2"]),
                f3=dsel(f3, s["f3"]),
                it=jnp.where(ran, it, s["it"]), dyno=sel(dyno, s["dyno"]),
                dynold=sel(dynold, s["dynold"]),
                thqold=sel(thqold, s["thqold"]),
                theta=sel(theta, s["theta"]), faccon=sel(faccon, s["faccon"]),
                hhfac=sel(hhfac, s["hhfac"]),
                code=code,
                nfev=s["nfev"] + jnp.where(ran, 3, 0).astype(jnp.int32),
            )

        nres = lax.while_loop(newton_cond, newton_body, nst)
        nfev = nfev + nres["nfev"]
        newt = nres["it"].astype(cdt)
        theta_new = nres["theta"]
        faccon_new = nres["faccon"]
        converged = nres["code"] == _CONVERGED
        z1, z2, z3 = nres["z1"], nres["z2"], nres["z3"]

        # ---- Error estimation (radau.rs:620-667): the (DD/h)·z sum and its
        #      addition to f0 cancel, so they run in dd; the solve and the
        #      norm are controller-grade f32 ----
        hee0, hee1, hee2 = _sc(DDc[0] / h), _sc(DDc[1] / h), _sc(DDc[2] / h)
        f1e = (ddm.mul(hee0, z1, renorm=rn) + ddm.mul(hee1, z2, renorm=rn)
               + ddm.mul(hee2, z3, renorm=rn))
        err_rhs = (f1e + ms.f0).hi
        err_vec = solve1(lin, err_rhs)

        def rms(v):
            vc = v * inv_scal_c
            return jnp.maximum(jnp.sqrt(jnp.mean(vc * vc)), 1e-10)

        err0 = rms(err_vec)

        def refine():
            fr = rhs(t, DD(err_vec, jnp.zeros_like(err_vec)) + y)
            ev2 = solve1(lin, (fr + f1e).hi)
            return rms(ev2), _i32(1)

        do_refine = converged & (err0 >= 1.0) & (ms.first | ms.reject)
        err, extra_fev = lax.cond(do_refine, refine, lambda: (err0, _i32(0)))
        nfev = nfev + extra_fev

        # ---- Step-size controller (radau.rs:669-691), f32 + f64 h ----
        fac = jnp.minimum(p.safety, cfac / (newt + 2.0 * p.newton_maxiter))
        quot = jnp.maximum(facr, jnp.minimum(facl,
                                             jnp.sqrt(jnp.sqrt(err)) / fac))
        hnew = h / quot.astype(h.dtype)

        accepted = converged & (err <= 1.0) & ~sing & ~too_small

        if p.predictive:
            can_pred = accepted & (naccpt + 1 > 1)
            ratio = jnp.minimum(err * err / jnp.maximum(ms.err_acc, 1e-30),
                                1e30)
            facgus = ((ms.h_acc / h).astype(err.dtype)
                      * jnp.sqrt(jnp.sqrt(ratio)) / p.safety)
            facgus = jnp.maximum(facr, jnp.minimum(facl, facgus))
            quot = jnp.where(can_pred, jnp.maximum(quot, facgus), quot)
            hnew = h / quot.astype(h.dtype)
            h_acc = jnp.where(accepted, h, ms.h_acc)
            err_acc = jnp.where(accepted, jnp.maximum(err, 1e-2), ms.err_acc)
        else:
            h_acc, err_acc = ms.h_acc, ms.err_acc

        # ---- Accept path (dense coefficients in dd; constant divisions as
        #      reciprocal multiplies — the ~2^-53 reciprocal rounding is far
        #      below the dd noise floor) ----
        y_new = y + z3
        t_new = jnp.where(ms.last, ra.tend, t + h)
        ak = (z1 - z2) * (1.0 / C1MC2)
        acont3 = (ak - z1 * (1.0 / C1)) * (1.0 / C2)
        c1r = (z2 - z3) * (1.0 / C2M1)
        c2r = (ak - c1r) * (1.0 / C1M1)
        c3r = c2r - acont3
        cont_state = ddm.stack([y_new, c1r, c2r, c3r])
        if p.need_cont:
            # Full-dd dense coefficients packed as (hi, lo) row pairs
            # (ddtier.dd_pack_cont): dense samples / event states are
            # f64-grade (reference src/dense.rs:9-157, radau.rs:697-705).
            from .ddtier import dd_pack_cont
            cont_out = dd_pack_cont(cont_state)
        else:
            cont_out = jnp.zeros((0, n), f32)

        f0_new = rhs(t_new, y_new)
        nfev = nfev + jnp.where(accepted, 1, 0).astype(jnp.int32)
        scal_acc = atol_t + rtol_t * jnp.abs(y_new.hi)

        hnew_acc = jnp.clip(jnp.abs(hnew), ra.hmin, ra.hmax) * posneg
        hnew_acc = jnp.where(ms.reject,
                             posneg * jnp.minimum(jnp.abs(hnew_acc),
                                                  jnp.abs(h)),
                             hnew_acc)
        hit_end = (t_new + hnew_acc / p.quot1 - ra.tend) * posneg >= 0.0
        qt = hnew_acc / h
        reuse = ((~hit_end) & (theta_new < p.thet)
                 & (qt > p.quot1) & (qt < p.quot2))
        h_acc_next = jnp.where(hit_end, ra.tend - t_new,
                               jnp.where(reuse, h, hnew_acc))
        hhfac_acc = jnp.where(reuse, ms.hhfac, h_acc_next)
        call_decomp_acc = ~reuse
        call_jac_acc = (~reuse) & (theta_new >= p.thet)

        # ---- Reject paths (radau.rs:777-792) ----
        tdt = h.dtype
        h_rej = jnp.where(ms.first, h * 0.1, hnew)
        hhfac_rej = jnp.where(ms.first, jnp.full((), 0.1, tdt), hnew / h)
        h_div = h * nres["hhfac"]
        h_half = h * 0.5

        diverged = nres["code"] == _DIVERGED
        broke = (nres["code"] == _MAXITER) | (nres["code"] == _BAD_THETA) | sing

        h_next = jnp.where(accepted, h_acc_next,
                           jnp.where(diverged, h_div,
                                     jnp.where(broke, h_half, h_rej)))
        hhfac_next = jnp.where(accepted, hhfac_acc,
                               jnp.where(diverged, nres["hhfac"],
                                         jnp.where(broke,
                                                   jnp.full((), 0.5, tdt),
                                                   hhfac_rej)))
        call_decomp_next = jnp.where(accepted, call_decomp_acc, True)
        call_jac_next = jnp.where(accepted, call_jac_acc, ms.call_jac)

        singular_next = jnp.where(accepted, _i32(0),
                                  jnp.where(broke, ms.singular + 1,
                                            ms.singular))
        status = jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                           jnp.where(broke & (singular_next > 5),
                                     _i32(Status.SINGULAR_MATRIX),
                                     _i32(Status.RUNNING)))

        advance = accepted
        finished = accepted & ms.last

        ms_new = RadauState(
            h=h_next, hold=jnp.where(accepted, h, ms.hold), posneg=posneg,
            f0=ddm.where(accepted, f0_new, ms.f0),
            cont=ddm.where(accepted, cont_state, ms.cont),
            scal=jnp.where(accepted, scal_acc, scal),
            first=ms.first & ~accepted,
            reject=jnp.where(accepted, False,
                             ms.reject | diverged | (err > 1.0) | broke),
            last=jnp.where(accepted, hit_end, False),
            faccon=faccon_new, theta=theta_new,
            hhfac=hhfac_next, h_acc=h_acc, err_acc=err_acc,
            call_jac=call_jac_next, call_decomp=call_decomp_next,
            singular=singular_next,
            jac=jac, lin=lin,
        )

        count_step = ~sing
        count_reject = (~accepted) & ~sing & (
            diverged | (converged & (err > 1.0) & ~ms.first))

        return StepProposal(
            accepted=accepted, advance=advance, finished=finished,
            status=status,
            t_new=jnp.where(advance, t_new, t),
            y_new=ddm.where(advance, y_new, y),
            xold=t, h_used=h, cont=cont_out,
            nfev_inc=nfev, njev_inc=njev, nlu_inc=nlu,
            count_step=count_step, count_reject=count_reject,
            ms=ms_new,
        )

    return attempt


def make_engine(need_cont: bool, *, jac_fn, const_jac=False, mass=None,
                nind=(None, None, None), n=0, **overrides):
    if jac_fn is None:
        raise ValueError("RADAU requires a Jacobian function")
    if mass is not None:
        raise ValueError(
            "dtype='dd' RADAU supports identity mass only; use dtype=float64 "
            "for mass-matrix problems")
    if any(v is not None for v in nind):
        raise ValueError(
            "dtype='dd' RADAU does not support DAE index partitions; use "
            "dtype=float64")
    overrides.pop("newton_precision", None)   # f32 solves by construction
    overrides.pop("controller_precision", None)  # f32 by construction
    overrides.pop("factor_f32", None)
    p = RadauParams(need_cont=need_cont, n=n, nind=(None, None, None),
                    has_mass=False, const_jac=const_jac,
                    newton_precision="full",
                    controller_precision="float32", factor_f32=True,
                    **overrides)
    init = make_dd_radau_init(jac_fn, p)
    attempt = make_dd_radau_attempt(jac_fn, p)
    from .ddtier import dd_wrap_interp
    eng = Engine(name="RADAU", ncoeff=8 if need_cont else 0,
                 init=init, attempt=attempt,
                 # dd-packed cont rows, f64-grade interpolation and
                 # event/restart boundary views (see methods/dd_erk.py).
                 interp=dd_wrap_interp(radau_interp),
                 lower=ddm.to_f64,
                 lift=ddm.from_f64)
    return eng, p
