"""BDF over the framework's double-float arithmetic (``dtype="dd"``).

Completes the dd stiff tier (with methods/dd_radau.py): the variable-order
BDF(1-5) engine with its solution-bearing state — the difference array D,
the predictor/psi sums, Newton residuals and accumulated corrections — in
hand-rolled double-f32 (core/ddmath.py), while

* the iteration matrix I - cJ is **built, factored and solved in f32** (the
  inexact-Newton split proven by ``newton_precision="mixed"``: residuals are
  re-assembled from the dd state each iteration, so sloppy correction solves
  cost iterations at worst, never accuracy);
* norms, rates, error estimation and order/step adaptation run in **f32**
  (``controller_precision="float32"`` — decisions only);
* the time axis (t, h_abs, c drift tracking) stays in platform f64; the few
  per-attempt scalars that must enter dd arithmetic exactly (c = h/alpha,
  the change_d step factor) are split with ``ddmath.from_f64`` (exact).

Why D must be dd: D0 is the solution and D1..Dk its scaled differences —
rescaling or summing them at f32 would inject ~2^-24 · h·|f| per step,
i.e. an f32-integrator-sized perturbation.  The change_d polynomial
transform (see methods/bdf.py::change_d) therefore runs in dd with the
factor powers as dd scalars.

Algorithmic parity with methods/bdf.py — itself at parity with reference
src/methods/bdf.rs:86-732 — for the predictor, c-drift LU reuse, rate-test
Newton, error/order adaptation and the folded end-of-attempt rescale.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import tableaus as tab
from ..types import Status
from ..core import ddmath as ddm
from ..core.ddmath import DD
from .base import Engine, RunArgs, StepProposal
from .bdf import (BDFParams, BDFState, make_linear_backend, bdf_interp,
                  _CHANGE_D_C, MAX_ORDER, MIN_FACTOR, MAX_FACTOR, SAFETY,
                  EPS, _i32)
from .dd_erk import _hinit_f32


def _exact_state() -> bool:
    import jax
    return jax.default_backend() != "tpu"


def _f32_const_pair(x: float):
    """(hi, lo) f32 words of a Python float (trace-time Dekker split)."""
    hi = np.float32(x)
    lo = np.float32(x - float(hi))
    return hi, lo


def _dd_where_row(cond, new: DD, old: DD) -> DD:
    return ddm.where(cond, new, old)


def _dd_row_sum(rows):
    """Renormalized dd chain sum of a list of DD arrays."""
    acc = rows[0]
    for r in rows[1:]:
        acc = ddm.add(acc, r)
    return acc


def _dd_masked_sum(D: DD, lo, hi):
    """sum_{k=lo..hi} D[k] in dd with traced bounds (unrolled rows)."""
    zero = ddm.zeros(D.shape[1:])
    rows = []
    for k in range(MAX_ORDER + 3):
        m = (k >= lo) & (k <= hi)
        rows.append(ddm.where(m, D[k], zero))
    return _dd_row_sum(rows)


def dd_change_d(D: DD, order, factor_dd: DD) -> DD:
    """dd counterpart of methods/bdf.py::change_d: D <- (R(f) R(1))^T D with
    the degree-5 polynomial form; factor powers and the row transform run in
    dd so the rescale does not inject f32-level noise into the solution-
    bearing difference rows."""
    size = MAX_ORDER + 1  # 6
    C = _CHANGE_D_C  # (6, 6, 6) numpy float64

    # dd powers of the factor: f^1..f^5
    pw = [None, factor_dd]
    for d in range(2, size):
        pw.append(ddm.mul(pw[-1], factor_dd))

    # P rows: acc_i = C[0,i,:] + sum_d f^d * C[d,i,:]  (dd (6,) per row)
    P_rows = []
    for i in range(size):
        acc = ddm.from_f64(jnp.asarray(C[0, i], jnp.float64))
        for d in range(1, i + 1):
            cd = ddm.from_f64(jnp.asarray(C[d, i], jnp.float64))
            acc = ddm.add(acc, ddm.mul(pw[d], cd))
        P_rows.append(acc)  # DD (6,)

    k = jnp.arange(size)
    eye = jnp.eye(size, dtype=jnp.float32)
    new_rows = []
    for j in range(size):  # output row j of D6 = sum_m T[m, j] * D[m]
        acc = None
        for m in range(size):
            # T[m, j] = P[m, j] inside the order block, eye outside
            in_blk = (m <= order) & (j <= order)
            tm = ddm.where(in_blk, P_rows[m][j],
                           DD(eye[m, j], jnp.zeros((), jnp.float32)))
            term = ddm.mul(tm, D[m])
            acc = term if acc is None else ddm.add(acc, term)
        new_rows.append(acc)
    for j in range(size, MAX_ORDER + 3):
        new_rows.append(D[j])
    D_new = ddm.stack(new_rows)
    one = (factor_dd.hi == 1.0) & (factor_dd.lo == 0.0)
    return ddm.where(one, D, D_new)


# change_d carrier for the dd engine, A/B-able via env:
#   "dd" (default): the native dd polynomial transform (dd_change_d below).
#   "roundtrip": exact to_f64 -> platform-f64 change_d -> from_f64 (f64
#     rounding 2^-53 is tighter than dd's 2^-48, so both are correct).
# Interleaved in-process A/B on a v5e (the only trustworthy comparison —
# chip-state drift between processes swamps 10-20% deltas, TPU_NOTES #24):
# native 57.0-57.4k vs roundtrip 48.8-51.4k IVPs/s on the stiff VdP
# ensemble — the conversions cost more than the barrier stalls they avoid.
_CHANGE_D_IMPL = os.environ.get("IVP_TPU_DD_CHANGE_D", "dd")


def dd_change_d_v3(D: DD, order, factor_dd: DD) -> DD:
    """change_d with two dd op-count cuts over :func:`dd_change_d` (same
    math, same summation order):

    * each difference row D[m].hi is Dekker-split ONCE and reused by all 6
      output rows (ddmath.presplit — was 36 row splits, now 6);
    * the 6-term accumulation per output row runs as a fused two_sum chain
      with an f32 residue stream and ONE closing renormalization (the
      dot_const pattern with runtime coefficients — was 5 renormalized dd
      adds per row).

    The residue-stream rounding (~2^-45|D|) matches the proven stage-sum
    budget; the transform's inputs/outputs stay renormalized dd rows."""
    size = MAX_ORDER + 1  # 6
    C = _CHANGE_D_C  # (6, 6, 6) numpy float64

    pw = [None, factor_dd]
    for d in range(2, size):
        pw.append(ddm.mul(pw[-1], factor_dd))
    P_rows = []
    for i in range(size):
        acc = ddm.from_f64(jnp.asarray(C[0, i], jnp.float64))
        for d in range(1, i + 1):
            cd = ddm.from_f64(jnp.asarray(C[d, i], jnp.float64))
            acc = ddm.add(acc, ddm.mul(pw[d], cd))
        P_rows.append(acc)  # DD (6,)

    eye = jnp.eye(size, dtype=jnp.float32)
    D_splits = [ddm.presplit(D[m]) for m in range(size)]
    new_rows = []
    for j in range(size):  # output row j of D6 = sum_m T[m, j] * D[m]
        s = None
        err = None
        for m in range(size):
            in_blk = (m <= order) & (j <= order)
            tm = ddm.where(in_blk, P_rows[m][j],
                           DD(eye[m, j], jnp.zeros((), jnp.float32)))
            # term = tm * D[m], unrenormalized (p, e), D[m].hi pre-split
            p_t, e_t = ddm.mul_presplit(tm, D_splits[m], renorm=False)
            if s is None:
                s, err = p_t, e_t
            else:
                s, e2 = ddm._two_sum(s, p_t)
                err = err + (e2 + e_t)
        new_rows.append(DD(*ddm._quick_two_sum(s, err)))
    for j in range(size, MAX_ORDER + 3):
        new_rows.append(D[j])
    D_new = ddm.stack(new_rows)
    one = (factor_dd.hi == 1.0) & (factor_dd.lo == 0.0)
    return ddm.where(one, D, D_new)


def _rescale_d(D_in: DD, ord_in, f_total, impl: str = "v1"):
    if _CHANGE_D_IMPL != "dd":
        from .bdf import change_d as change_d64
        D64 = ddm.to_f64(D_in)
        return ddm.from_f64(change_d64(D64, ord_in, f_total))
    fn = dd_change_d_v3 if impl == "v3" else dd_change_d
    return fn(D_in, ord_in, ddm.from_f64(f_total))


def make_dd_bdf_init(jac_fn, p: BDFParams):
    n = p.n

    def init(rhs, t0, y0: DD, first_step, ra: RunArgs, p_):
        tdt = ra.tend.dtype
        posneg = jnp.sign(ra.tend - t0)
        f0 = rhs(t0, y0)
        jac = jac_fn(t0, y0)
        if first_step is not None:
            h_abs = jnp.abs(jnp.asarray(first_step, tdt))
            nfev = 1
        else:
            h32, _ = _hinit_f32(rhs, t0, y0, posneg.astype(jnp.float32), f0,
                                1, ra.hmax, ra.atol, ra.rtol)
            h_abs = jnp.abs(h32).astype(tdt)
            nfev = 2
        h_abs = jnp.minimum(jnp.minimum(h_abs, jnp.abs(ra.tend - t0)),
                            ra.hmax)

        zero = ddm.zeros((n,))
        d1 = ddm.mul(f0, ddm.from_f64(h_abs * posneg))
        D = ddm.stack([y0, d1] + [zero] * (MAX_ORDER + 1))
        lin0 = make_linear_backend(p)[2](jnp.float32)
        ms = BDFState(
            h_abs=h_abs, posneg=posneg, D=D, order=_i32(1), n_equal=_i32(0),
            jac=jac, lin=lin0,
            lu_current=jnp.zeros((), bool), current_c=jnp.zeros((), tdt),
        )
        return ms, nfev

    return init


def make_dd_bdf_attempt(jac_fn, p: BDFParams, impl: str = "v1"):
    n = p.n
    factor, solve, _ = make_linear_backend(p)
    gamma = np.asarray(tab.BDF_GAMMA, float)        # (MAX_ORDER+1,)
    alpha = np.asarray(tab.BDF_ALPHA, float)
    error_const = np.asarray(tab.BDF_ERROR_CONST, float)
    ia_pairs = [_f32_const_pair(1.0 / a) if a != 0.0 else (np.float32(0), np.float32(0))
                for a in alpha]
    IA_HI = jnp.asarray([h for h, _ in ia_pairs], jnp.float32)
    IA_LO = jnp.asarray([l for _, l in ia_pairs], jnp.float32)
    f32 = jnp.float32

    def attempt(rhs, t, y: DD, naccpt, ms: BDFState, ra: RunArgs, p_):
        cdt = f32
        rtol_min = jnp.maximum(jnp.min(ra.rtol), EPS)
        if p.newton_tol > 0.0:
            newton_tol = jnp.asarray(p.newton_tol, cdt)
        else:
            newton_tol = jnp.maximum(10.0 * EPS / rtol_min,
                                     jnp.minimum(jnp.sqrt(rtol_min),
                                                 0.03)).astype(cdt)

        posneg = ms.posneg
        order = ms.order
        D = ms.D
        h_abs = ms.h_abs
        n_equal = ms.n_equal
        lu_current = ms.lu_current

        h_signed = posneg * h_abs
        last = posneg * (t + h_signed - ra.tend) >= 0.0
        x_new = jnp.where(last, ra.tend, t + h_signed)

        too_small = (h_abs < 1e-30) | ((t + 0.1 * jnp.abs(h_signed)) == t)

        # ---- Predictor and psi in dd (bdf.rs:333-354) ----
        y_predict = _dd_masked_sum(D, 0, order)
        scale = ra.atol + ra.rtol * jnp.abs(y_predict.hi)
        scale = jnp.where(scale == 0.0, EPS, scale)
        inv_scale = (1.0 / scale).astype(cdt)

        zero = ddm.zeros((n,))
        psi_rows = []
        for k in range(1, MAX_ORDER + 1):
            m = k <= order
            psi_rows.append(ddm.where(m, ddm.mul_const(D[k], float(gamma[k])),
                                      zero))
        psi_raw = _dd_row_sum(psi_rows)

        k6 = jnp.arange(MAX_ORDER + 1)
        sel = lambda vec, idx: jnp.sum(jnp.where(k6 == idx, vec, 0.0))
        alpha_ord = sel(jnp.asarray(alpha, h_abs.dtype), order)
        ia = DD(sel(IA_HI, order), sel(IA_LO, order))  # 1/alpha[order] (dd)
        psi = ddm.mul(psi_raw, ia)

        c = h_signed / alpha_ord            # f64 (drift tracking, matrix)
        cy_dd = ddm.from_f64(c)             # exact split for the residual
        c32 = c.astype(f32)                 # matrix build (preconditioner)

        # ---- f32 iteration-matrix (re)build (bdf.rs:356-383) ----
        drift = jnp.abs(c - ms.current_c) / jnp.maximum(jnp.abs(c), 1.0) > 0.1
        rebuild = (~lu_current) | drift

        def build():
            m = jnp.eye(n, dtype=f32) - c32 * ms.jac
            return factor(m)

        lin, sing = lax.cond(rebuild, build,
                             lambda: (ms.lin, jnp.zeros((), bool)))
        nlu = jnp.where(rebuild, 1, 0).astype(jnp.int32)
        lu_current = lu_current | rebuild
        current_c = jnp.where(rebuild, c, ms.current_c)

        # ---- Simplified Newton: dd residual, f32 solve (bdf.rs:385-459) ----
        nst = dict(
            y_new=y_predict, delta=zero,
            prev=jnp.full((), -1.0, cdt),
            it=_i32(0), done=_i32(0),
            nfev=_i32(0),
        )
        nst["done"] = jnp.where(sing | too_small, 2, 0).astype(jnp.int32)

        def ncond(s):
            return s["done"] == 0

        def nbody(s):
            maxed = s["it"] >= p.newton_maxiter
            f = rhs(x_new, s["y_new"])
            # residual c·f − psi − delta: cancels toward zero as Newton
            # converges — the dd assembly is what the tier buys.  The c·f
            # product runs lean (the closing subtractions renormalize; see
            # methods/dd_erk.py::_stage_renorm).
            from .dd_erk import _stage_renorm
            rhs_dd = ddm.mul(f, cy_dd, renorm=_stage_renorm()) \
                - psi - s["delta"]
            dy = solve(lin, rhs_dd.hi)
            dyc = dy * inv_scale
            dy_norm = jnp.sqrt(jnp.mean(dyc * dyc))

            has_prev = s["prev"] >= 0.0
            rate = dy_norm / jnp.maximum(s["prev"], 1e-30)
            rem_i = p.newton_maxiter - s["it"]
            pw = rate
            rate_rem = rate
            for k in range(2, p.newton_maxiter + 1):
                pw = pw * rate
                rate_rem = jnp.where(rem_i >= k, pw, rate_rem)
            estimate_full = rate_rem / jnp.maximum(1.0 - rate,
                                                   1e-30) * dy_norm
            rate_bad = has_prev & (s["prev"] > 0.0) & (
                (rate >= 1.0) | (estimate_full > newton_tol))

            dy_dd = DD(dy, jnp.zeros_like(dy))
            y_new = s["y_new"] + dy_dd
            delta = s["delta"] + dy_dd

            est1 = rate / jnp.maximum(1.0 - rate, 1e-30) * dy_norm
            converged = (dy_norm == 0.0) | (
                has_prev & (s["prev"] > 0.0) & (rate < 1.0)
                & (est1 < newton_tol))

            done = jnp.where(maxed, 2,
                             jnp.where(converged, 1,
                                       jnp.where(rate_bad, 2,
                                                 0))).astype(jnp.int32)
            ran = ~maxed
            selw = lambda new, old: jnp.where(ran, new, old)
            dsel = lambda new, old: ddm.where(ran, new, old)
            return dict(
                y_new=dsel(y_new, s["y_new"]), delta=dsel(delta, s["delta"]),
                prev=selw(dy_norm, s["prev"]),
                it=jnp.where(ran & (done == 0), s["it"] + 1, s["it"]),
                done=done,
                nfev=s["nfev"] + jnp.where(ran, 1, 0).astype(jnp.int32),
            )

        nres = lax.while_loop(ncond, nbody, nst)
        converged = nres["done"] == 1
        newton_fail = ~converged
        nfev = nres["nfev"]
        y_new = nres["y_new"]
        delta = nres["delta"]
        n_iter = nres["it"].astype(cdt)

        jac_new = lax.cond(newton_fail & ~too_small,
                           lambda: jac_fn(x_new, y_predict), lambda: ms.jac)
        njev = jnp.where(newton_fail & ~too_small & (not p.const_jac), 1,
                         0).astype(jnp.int32)

        safety = SAFETY * (2.0 * p.newton_maxiter + 1.0) / (
            2.0 * p.newton_maxiter + n_iter + 1.0)

        scale2 = ra.atol + ra.rtol * jnp.abs(y_new.hi)
        scale2 = jnp.where(scale2 == 0.0, EPS, scale2)
        inv_scale2 = (1.0 / scale2).astype(cdt)
        ec = jnp.asarray(error_const, cdt)
        ec_ord = sel(ec, order)
        errc = ec_ord * delta.hi * inv_scale2
        error_norm = jnp.sqrt(jnp.mean(errc * errc))

        accepted = converged & (error_norm <= 1.0)
        err_reject = converged & (error_norm > 1.0)

        # ---- Accept: update the difference array in dd (bdf.rs:491-503) ----
        # row order+1 of the OLD array (for D[order+2] = delta - D[order+1])
        row_op1 = zero
        for k in range(MAX_ORDER + 3):
            row_op1 = ddm.where(k == order + 1, D[k], row_op1)
        rows_acc = []
        for k in range(MAX_ORDER + 3):
            r = D[k]
            r = ddm.where(k == order + 2, delta - row_op1, r)
            r = ddm.where(k == order + 1, delta, r)
            rows_acc.append(r)
        # downward suffix sweep D[k] <- sum_{j=k}^{order+1} D[j], k <= order
        contrib = [ddm.where(k <= order + 1, rows_acc[k], zero)
                   for k in range(MAX_ORDER + 3)]
        suffix = contrib[MAX_ORDER + 2]
        suffixes = [suffix]
        for k in range(MAX_ORDER + 1, -1, -1):
            suffix = ddm.add(contrib[k], suffix)
            suffixes.append(suffix)
        suffixes = suffixes[::-1]  # suffixes[k] = sum_{j>=k}
        rows_final = [ddm.where(k <= order, suffixes[k], rows_acc[k])
                      for k in range(MAX_ORDER + 3)]
        D_acc = ddm.stack(rows_final)

        # Dense coefficients: full-dd (hi, lo) row pairs packed by
        # ddtier.dd_pack_cont — rows [D0, D1..D5, order] like the platform
        # engine (bdf.rs:505-514), the order row carried in hi with a zero
        # lo word.  Dense samples / event states are f64-grade.
        if p.need_cont:
            from .ddtier import dd_pack_cont
            kk = jnp.arange(MAX_ORDER)[:, None]
            sel_rows = kk + 1 <= order
            dcoef_hi = jnp.where(sel_rows, D_acc.hi[1:MAX_ORDER + 1], 0.0)
            dcoef_lo = jnp.where(sel_rows, D_acc.lo[1:MAX_ORDER + 1], 0.0)
            cont_dd = ddm.DD(
                jnp.concatenate([D_acc.hi[0][None, :], dcoef_hi,
                                 jnp.full((1, n), order.astype(f32))], axis=0),
                jnp.concatenate([D_acc.lo[0][None, :], dcoef_lo,
                                 jnp.zeros((1, n), f32)], axis=0))
            cont = dd_pack_cont(cont_dd)
        else:
            cont = jnp.zeros((0, n), f32)

        # ---- Order & step adaptation (f32 decisions; bdf.rs:552-606) ----
        n_equal_acc = n_equal + 1
        finished = accepted & last
        adapt = accepted & (n_equal_acc >= order + 1) & ~finished

        ec_m = sel(ec, order - 1)
        ec_p = sel(ec, order + 1)
        row_ord_hi = jnp.zeros((n,), f32)
        for k in range(MAX_ORDER + 3):
            row_ord_hi = jnp.where(k == order, D.hi[k], row_ord_hi)
        row_ord_hi = row_ord_hi + delta.hi
        row_op2_hi = delta.hi - row_op1.hi
        emc = ec_m * row_ord_hi * inv_scale2
        epc = ec_p * row_op2_hi * inv_scale2
        err_m = jnp.where(order > 1, jnp.sqrt(jnp.mean(emc * emc)), jnp.inf)
        err_p = jnp.where(order < MAX_ORDER,
                          jnp.sqrt(jnp.mean(epc * epc)), jnp.inf)
        errs3 = jnp.clip(jnp.stack([err_m, error_norm, err_p]), 1e-30, 1e30)
        log_errs = jnp.log(errs3)
        exponents = -1.0 / (order.astype(cdt) + jnp.arange(3, dtype=cdt))
        log_factors = exponents * log_errs
        best = jnp.argmax(log_factors)
        delta_order = jnp.clip(best.astype(jnp.int32) - 1, -1, 1)
        new_order = jnp.clip(order + delta_order, 1, MAX_ORDER)
        step_factor = jnp.minimum(MAX_FACTOR,
                                  safety * jnp.exp(jnp.max(log_factors)))

        order_next = jnp.where(adapt, new_order, order)
        order_changed = adapt & (new_order != order)
        jac_after = lax.cond(order_changed,
                             lambda: jac_fn(x_new, y_new), lambda: jac_new)
        njev = njev + jnp.where(order_changed & (not p.const_jac), 1,
                                0).astype(jnp.int32)

        # ---- Merged end-of-attempt rescale (one dd change_d) ----
        fac_fail = jnp.full((), 0.5, cdt)
        fac_rej = jnp.maximum(safety * jnp.exp(log_factors[1]), MIN_FACTOR)
        fac_case = jnp.where(adapt, step_factor,
                             jnp.where(accepted, 1.0,
                                       jnp.where(newton_fail, fac_fail,
                                                 fac_rej)))
        t_next = jnp.where(accepted, x_new, t)
        h_des = h_abs * fac_case.astype(h_abs.dtype)
        h1 = jnp.minimum(h_des, ra.hmax)
        h1 = jnp.where((h1 < ra.hmin) & (ra.hmin > 0.0), ra.hmin, h1)
        overshoot = posneg * (t_next + posneg * h1 - ra.tend) > 0.0
        h1 = jnp.where(overshoot, jnp.abs(ra.tend - t_next), h1)
        clamp_changed = h1 != h_des

        D_in = ddm.where(accepted, D_acc, D)
        ord_in = jnp.where(adapt, new_order, order)
        f_total = h1 / jnp.maximum(h_abs, 1e-300)
        D_next = _rescale_d(D_in, ord_in, f_total, impl)
        h_next = h1
        n_equal_next = jnp.where(accepted & ~adapt & ~clamp_changed,
                                 n_equal_acc, 0)
        lu_next = lu_current & ~newton_fail & ~adapt & ~clamp_changed

        dead = (~jnp.isfinite(h_next)
                | (accepted & ~jnp.all(jnp.isfinite(y_new.hi))))
        status = jnp.where(too_small | dead,
                           _i32(Status.STEP_SIZE_TOO_SMALL),
                           _i32(Status.RUNNING))

        ms_new = BDFState(
            h_abs=h_next, posneg=posneg, D=D_next,
            order=order_next, n_equal=n_equal_next,
            jac=jac_after, lin=lin,
            lu_current=lu_next, current_c=current_c,
        )
        return StepProposal(
            accepted=accepted, advance=accepted, finished=finished,
            status=status,
            t_new=jnp.where(accepted, x_new, t),
            y_new=ddm.where(accepted, y_new, y),
            xold=t, h_used=h_signed, cont=cont,
            nfev_inc=nfev, njev_inc=njev, nlu_inc=nlu,
            count_step=~too_small,
            count_reject=(newton_fail | err_reject) & ~too_small,
            ms=ms_new,
        )

    return attempt


def make_engine(need_cont: bool, *, jac_fn, const_jac=False, n=0, **overrides):
    if jac_fn is None:
        raise ValueError("BDF requires a Jacobian function")
    overrides.pop("newton_precision", None)      # f32 by construction
    overrides.pop("controller_precision", None)  # f32 by construction
    overrides.pop("factor_f32", None)
    # change_d variant: "v1" (per-row renormalized chains, the default) or
    # "v3" (presplit rows + fused accumulation) — A/B-able via
    # solver_options={"dd_impl": ...}.  KEEP RATIONALE (round-5 VERDICT
    # weak #3): v3 measured neutral on the v5e (change_d is ~3% of the
    # BDF attempt; the op-count cut is real but barrier-stall-bound), and
    # it is the variant expected to win on hardware where XLA exposes a
    # single-rounding FMA or cheaper barriers — 50 LoC of re-measurable
    # experiment, cheaper to keep than to rediscover (benches ref:
    # docs/TPU_NOTES.md #34).
    impl = overrides.pop("dd_impl", os.environ.get("IVP_TPU_DD_BDF_IMPL",
                                                   "v1"))
    p = BDFParams(need_cont=need_cont, n=n, const_jac=const_jac,
                  newton_precision="full", controller_precision="float32",
                  factor_f32=True, **overrides)
    init = make_dd_bdf_init(jac_fn, p)
    attempt = make_dd_bdf_attempt(jac_fn, p, impl)
    from .ddtier import dd_wrap_interp
    eng = Engine(name="BDF", ncoeff=2 * (MAX_ORDER + 2) if need_cont else 0,
                 init=init, attempt=attempt,
                 # dd-packed cont rows, f64-grade interpolation and
                 # event/restart boundary views (see methods/dd_erk.py).
                 interp=dd_wrap_interp(bdf_interp),
                 init_njev=0 if const_jac else 1,
                 lower=ddm.to_f64,
                 lift=ddm.from_f64)
    return eng, p
