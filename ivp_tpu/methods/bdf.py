"""BDF — variable-order (1..5) Backward Differentiation Formula engine.

SciPy-style quasi-constant-step BDF with a Nordsieck-like difference array D,
LU reuse keyed on drift of c = h/alpha[order], rate-controlled simplified
Newton, and post-hoc order adaptation — algorithmic parity with the reference
(src/methods/bdf.rs:86-732), restructured for XLA:

* the order is a traced int32 in the carried state; all order-dependent sums
  (predictor, psi, error constants) are masked reductions over the fixed
  MAX_ORDER+3 difference-array rows (SURVEY.md hard part #3);
* the step/order rescaling D <- (R(factor) @ R(1))^T D runs as unrolled
  broadcasted outer-product sums (bdf.rs:669-713; tiny batched matmuls are
  pathological on TPU under vmap — docs/TPU_NOTES.md #13);
* the Newton iteration is a bounded ``lax.while_loop``; LU factorization is
  the gather/scatter-free pure-JAX LU (core/linalg.py) that vmaps over
  ensembles.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import tableaus as tab
from ..types import Status
from ..core.common import hinit
from ..core.block_tridiag import (blocks_from_dense, btd_factor, btd_solve,
                                  pad_rhs)
from ..core.linalg import inv, lu_factor, lu_solve, matvec
from .base import Engine, RunArgs, StepProposal

MAX_ORDER = tab.BDF_MAX_ORDER
NEWTON_MAXITER = 4
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0
SAFETY = 0.9
EPS = 2.220446049250313e-16


class BDFState(NamedTuple):
    h_abs: Any      # positive step size
    posneg: Any     # integration direction
    D: Any          # (MAX_ORDER+3, n) difference array
    order: Any      # int32 in [1, 5]
    n_equal: Any    # int32 steps taken at current (h, order)
    jac: Any        # (n, n)
    lin: Any        # linear-solver rep: ((lu, P),) or (inv_mat,)
    lu_current: Any  # bool
    current_c: Any


@dataclasses.dataclass(frozen=True)
class BDFParams:
    need_cont: bool
    n: int
    const_jac: bool = False
    newton_maxiter: int = NEWTON_MAXITER
    newton_tol: float = 0.0  # 0 => derived from tolerances
    # "auto" uses the explicit inverse of (I - cJ) for small n so each Newton
    # solve is a fused matvec (see radau.py linear_mode for rationale);
    # "banded" uses block-tridiagonal cyclic reduction (requires ``band``).
    linear_mode: str = "auto"
    # (ml, mu) Jacobian bandwidths (from jac_sparsity).
    band: Any = None
    # "mixed": f32 factor/solves with f64 state/residuals (see radau.py).
    newton_precision: str = "full"
    # Unroll the Newton iteration to exactly newton_maxiter masked steps
    # instead of a lax.while_loop.  Semantics identical; measured
    # throughput-neutral on TPU (33.9k vs 34.7k IVPs/s on the stiff VdP
    # ensemble, within run noise), so the while form stays the default.
    newton_unroll: bool = False
    # Norm / rate / step-controller arithmetic precision (see erk.py): f32
    # by default under emulated f64; "state" restores dtype arithmetic.
    controller_precision: str = "float32"
    # Ensemble-facade hint: batched f32 factorizations (mixed Newton, f32
    # state, or dd under vmap) — "auto" skips banded where dense scan-LU
    # wins (see radau.RadauParams.factor_f32).
    factor_f32: bool = False
    # Jacobian storage/build precision ("auto" => f32 when the
    # factorization is f32; see radau.RadauParams.jac_precision).
    jac_precision: str = "auto"


# n at or below which "auto" uses the explicit-inverse linear path.
INV_AUTO_N = 8

# f32-factorization window where the explicit inverse beats scan-LU in the
# real hot loop (benches/inverse_midsize_ab.py: BDF mixed n=32 1.13x,
# 1365 vs 1204 IVPs/s, identical step counts; Radau 1.22x — and Radau
# loses 1.8x by n=64, so the window closes there).  See
# radau.INV_AUTO_N_F32.
INV_AUTO_N_F32 = 32

# n below which "auto" prefers dense LU over the banded cyclic-reduction
# backend even when a narrow band is known (see radau.BANDED_AUTO_MIN_N:
# scan-based dense substitutions moved the measured ensemble crossover
# past n=32, docs/BENCH.md mid-size table).
BANDED_AUTO_MIN_N = 48


def _backend_kind(p) -> str:
    if p.linear_mode not in ("auto", "lu", "inverse", "banded"):
        raise ValueError(
            f"linear_mode must be one of 'auto', 'lu', 'inverse', 'banded'; "
            f"got {p.linear_mode!r}")
    if p.linear_mode in ("inverse", "lu"):
        return p.linear_mode
    if p.linear_mode == "banded":
        if p.band is None:
            raise ValueError("linear_mode='banded' requires band=(ml, mu)")
        return "banded"
    if p.n <= (INV_AUTO_N_F32 if p.factor_f32 else INV_AUTO_N):
        return "inverse"
    if (p.band is not None and p.n >= BANDED_AUTO_MIN_N
            and not p.factor_f32
            and 3 * (p.band[0] + p.band[1] + 1) <= p.n):
        return "banded"
    return "lu"


def make_linear_backend(p):
    """(factor, solve, zero_lin) for the iteration matrix I - cJ."""
    n = p.n
    kind = _backend_kind(p)
    if kind == "inverse":
        def factor(m):
            ainv, s = inv(m)
            return (ainv,), s

        def solve(lin, b):
            return matvec(lin[0], b)

        def zero_lin(dtype):
            return (jnp.zeros((n, n), dtype),)
    elif kind == "banded":
        bsz = max(p.band[0], p.band[1], 1)

        def factor(m):
            fac, s = btd_factor(*blocks_from_dense(m, bsz))
            return (fac,), s

        def solve(lin, b):
            return btd_solve(lin[0], pad_rhs(b, bsz)).reshape(-1)[:n]

        def zero_lin(dtype):
            return factor(jnp.eye(n, dtype=dtype))[0]
    else:
        def factor(m):
            lu_piv, s = lu_factor(m)
            return (lu_piv,), s

        def solve(lin, b):
            return lu_solve(lin[0], b)

        def zero_lin(dtype):
            return ((jnp.zeros((n, n), dtype), jnp.eye(n, dtype=dtype)),)

    if p.newton_precision == "mixed":
        f32 = jnp.float32
        base_factor, base_solve, base_zero = factor, solve, zero_lin

        def factor(m):  # noqa: F811
            return base_factor(m.astype(f32))

        def solve(lin, b):  # noqa: F811
            return base_solve(lin, b.astype(f32)).astype(b.dtype)

        def zero_lin(dtype):  # noqa: F811
            return base_zero(f32)
    elif p.newton_precision != "full":
        raise ValueError("newton_precision must be 'full' or 'mixed'")
    return factor, solve, zero_lin


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _rows(dtype=jnp.int32):
    return jnp.arange(MAX_ORDER + 3, dtype=dtype)


def _masked_sum(D, lo, hi):
    """sum_{k=lo..hi} D[k] with traced bounds."""
    r = _rows()
    m = (r >= lo) & (r <= hi)
    return jnp.sum(jnp.where(m[:, None], D, 0.0), axis=0)


def _change_d_poly_coeffs():
    """Constant coefficient matrices C_d with R(f) @ R(1) = sum_d f^d C_d.

    R(f)_{im} = prod_{k=1..i} (k-1 - f*m)/k is a degree-i polynomial in f
    with fixed coefficients, so the runtime 6x6 transform collapses to a
    polynomial in the step factor with precomputed constant matrices —
    no R build or R@U product in the hot loop.

    NOTE (masking correctness): C_d[i, m] is nonzero only for d <= i, and
    R(f)_{im} = 0 for m = 0 < i; combined with U's upper-left structure this
    preserves the reference's order-block masking when the caller masks
    P's rows/cols beyond ``order``.
    """
    size = MAX_ORDER + 1
    # Rcoef[d, i, m] = coefficient of f^d in R_{im}
    Rcoef = np.zeros((size, size, size))
    for m in range(size):
        for i in range(size):
            poly = np.array([1.0])  # coefficients, ascending degree
            for k in range(1, i + 1):
                # multiply by ((k-1) - f*m)/k
                lin = np.array([(k - 1.0) / k, -m / k])
                poly = np.convolve(poly, lin)
            if i > 0 and m == 0:
                # (k-1 - 0)/k includes k=1 factor = 0 => R_{i0} = 0 for i>0
                pass
            Rcoef[: poly.shape[0], i, m] = poly
    U = np.ones((size, size))
    for i in range(1, size):
        mi = np.where(np.arange(size) == 0, 0.0,
                      (i - 1.0 - np.arange(size)) / float(i))
        U[i] = U[i - 1] * mi
    C = np.einsum("dim,mj->dij", Rcoef, U)
    return C


_CHANGE_D_C = _change_d_poly_coeffs()  # (6, 6, 6)


def change_d(D, order, factor):
    """Rescale D[0..order] for a step-size change by ``factor``
    (bdf.rs:669-713 / SciPy BDF): D <- (R(factor) @ R(1))^T D, where R is the
    cumulative-product matrix; rows/cols beyond ``order`` are untouched.

    ``order`` and ``factor`` are traced.  P = R(factor) @ R(1) is evaluated
    as a degree-5 matrix polynomial sum_d factor^d C_d with precomputed
    constant C_d (see _change_d_poly_coeffs) — everything is elementwise /
    broadcast arithmetic (tiny batched dot_generals under vmap measured
    ~20x slower than the whole rest of the BDF step on TPU, and cumprod
    miscompiles for f64 on some TPU runtimes).  Row i of P is a degree-i
    polynomial (C[d,i,:] == 0 for d > i), so the evaluation is row-sparse:
    90 multiplies instead of a dense 180-multiply Horner — this runs every
    attempt of every lane, and emulated-f64 multiplies dominate the BDF
    ensemble's step cost.

    Rescaling is compositional — change_d(change_d(D, o, f1), o, f2) ==
    change_d(D, o, f1*f2) — because rows 0..order of D are a linear image of
    one interpolating polynomial and the rescale depends only on the final
    spacing; callers fold consecutive rescales into one call.
    """
    size = MAX_ORDER + 1  # 6
    dtype = D.dtype
    C = jnp.asarray(_CHANGE_D_C, dtype)

    f2 = factor * factor
    f3 = f2 * factor
    pw = (None, factor, f2, f3, f2 * f2, f3 * f2)
    rows = []
    for i in range(size):
        acc = C[0, i]
        for d in range(1, i + 1):
            acc = acc + pw[d] * C[d, i]
        rows.append(acc)
    P = jnp.stack(rows)

    k = jnp.arange(size)
    in_blk = (k[:, None] <= order) & (k[None, :] <= order)
    T = jnp.where(in_blk, P, jnp.eye(size, dtype=dtype))
    # D6 = T^T @ D[:6], unrolled as broadcasted outer sums.
    D6 = sum(T[m][:, None] * D[m][None, :] for m in range(size))
    D_new = D.at[:size].set(D6)
    return jnp.where(factor == 1.0, D, D_new)


def make_bdf_init(jac_fn, p: BDFParams):
    n = p.n
    from .radau import jac_dtype_of

    def init(rhs, t0, y0, first_step, ra: RunArgs, p_):
        dtype = y0.dtype
        tdt = ra.tend.dtype  # time dtype (f64-time/f32-state hybrid aware)
        posneg = jnp.sign(ra.tend - t0)
        f0 = rhs(t0, y0)
        jac = jac_fn(t0, y0).astype(jac_dtype_of(p, dtype))
        if first_step is not None:
            h_abs = jnp.abs(first_step).astype(tdt)
            nfev = 1
        else:
            h, _ = hinit(rhs, t0, y0, posneg, f0, 1, ra.hmax, ra.atol, ra.rtol)
            h_abs = jnp.abs(h).astype(tdt)
            nfev = 2
        # Establish the attempt invariant: h_abs feasible (no tend overshoot,
        # <= hmax) so D is built consistent and attempts skip start clamping.
        h_abs = jnp.minimum(jnp.minimum(h_abs, jnp.abs(ra.tend - t0)), ra.hmax)

        D = jnp.zeros((MAX_ORDER + 3, n), dtype)
        D = D.at[0].set(y0)
        D = D.at[1].set(f0 * (h_abs * posneg).astype(dtype))
        lin0 = make_linear_backend(p)[2](dtype)
        ms = BDFState(
            h_abs=h_abs, posneg=posneg, D=D, order=_i32(1), n_equal=_i32(0),
            jac=jac, lin=lin0,
            lu_current=jnp.zeros((), bool), current_c=jnp.zeros((), tdt),
        )
        return ms, nfev

    return init


def make_bdf_attempt(jac_fn, p: BDFParams):
    n = p.n
    factor, solve, _ = make_linear_backend(p)
    gamma = tab.BDF_GAMMA
    alpha = tab.BDF_ALPHA
    error_const = tab.BDF_ERROR_CONST
    from .radau import jac_dtype_of

    def attempt(rhs, t, y, naccpt, ms: BDFState, ra: RunArgs, p_):
        dtype = y.dtype
        jdt = jac_dtype_of(p, dtype)
        cdt = jnp.float32 if p.controller_precision == "float32" else dtype
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

        # h/D clamping (bdf.rs:287-322) happens at the END of the previous
        # attempt, folded into its outcome rescale — h_abs and D arrive here
        # already consistent and feasible (<= hmax, >= hmin, no tend
        # overshoot), so each attempt runs exactly ONE change_d instead of
        # two (change_d dominates the emulated-f64 multiply count of the
        # whole attempt for small n).  ``init`` establishes the invariant.
        h_signed = posneg * h_abs
        last = posneg * (t + h_signed - ra.tend) >= 0.0
        x_new = jnp.where(last, ra.tend, t + h_signed)

        too_small = (h_abs < 1e-290) | ((t + 0.1 * jnp.abs(h_signed)) == t)

        # ---- Predictor and psi (bdf.rs:333-354) ----
        y_predict = _masked_sum(D, 0, order)
        scale = ra.atol + ra.rtol * jnp.abs(y_predict)
        scale = jnp.where(scale == 0.0, EPS, scale)
        # Hoisted reciprocal in controller precision: the Newton norm only
        # drives convergence decisions (see ERKParams rationale).
        inv_scale = (1.0 / scale).astype(cdt)
        r = _rows()
        gmask = ((r >= 1) & (r <= order))[:, None]
        gfull = jnp.concatenate([jnp.asarray(gamma, dtype),
                                 jnp.zeros((2,), dtype)])  # pad to MAX_ORDER+3 rows
        psi = jnp.sum(jnp.where(gmask, gfull[:, None] * D, 0.0), axis=0)
        # masked selection instead of dynamic gathers (TPU-safe in loops)
        k6 = jnp.arange(MAX_ORDER + 1)
        sel = lambda vec, idx: jnp.sum(jnp.where(k6 == idx, vec, 0.0))
        alpha_ord = sel(jnp.asarray(alpha, dtype), order)
        psi = psi / alpha_ord

        c = h_signed / alpha_ord  # time precision (hybrid-aware)
        cy = c.astype(dtype)      # state-space c for matrix build / Newton

        # ---- LU (re)build (bdf.rs:356-383) ----
        drift = jnp.abs(c - ms.current_c) / jnp.maximum(jnp.abs(c), 1.0) > 0.1
        rebuild = (~lu_current) | drift

        def build():
            # Matrix build in the Jacobian dtype (f32 under jac_precision;
            # the mixed factor boundary rounds to f32 anyway).
            m = jnp.eye(n, dtype=jdt) - cy.astype(jdt) * ms.jac
            return factor(m)

        lin, sing = lax.cond(rebuild, build,
                             lambda: (ms.lin, jnp.zeros((), bool)))
        nlu = jnp.where(rebuild, 1, 0).astype(jnp.int32)
        lu_current = lu_current | rebuild
        current_c = jnp.where(rebuild, c, ms.current_c)

        # ---- Simplified Newton (bdf.rs:385-459) ----
        nst = dict(
            y_new=y_predict, delta=jnp.zeros_like(y),
            prev=jnp.full((), -1.0, cdt),  # <0 means "no previous norm"
            it=_i32(0), done=_i32(0),  # 0 running, 1 converged, 2 failed
            nfev=_i32(0),
        )

        def ncond(s):
            return s["done"] == 0

        def nbody(s):
            maxed = s["it"] >= p.newton_maxiter
            f = rhs(x_new, s["y_new"])
            rhs_v = cy * f - psi - s["delta"]
            dy = solve(lin, rhs_v)
            dyc = dy.astype(cdt) * inv_scale
            dy_norm = jnp.sqrt(jnp.mean(dyc * dyc))

            has_prev = s["prev"] >= 0.0
            rate = dy_norm / jnp.maximum(s["prev"], 1e-300)
            # rate ** rem with rem = maxiter - it an integer in
            # [1, maxiter]: an emulated-f64 pow per Newton iteration per
            # lane is one of the costliest ops in the attempt — build the
            # integer powers by multiplication and select instead.
            rem_i = p.newton_maxiter - s["it"]
            pw = rate
            rate_rem = rate
            for k in range(2, p.newton_maxiter + 1):
                pw = pw * rate
                rate_rem = jnp.where(rem_i >= k, pw, rate_rem)
            estimate_full = rate_rem / jnp.maximum(1.0 - rate, 1e-300) * dy_norm
            rate_bad = has_prev & (s["prev"] > 0.0) & (
                (rate >= 1.0) | (estimate_full > newton_tol))

            y_new = s["y_new"] + dy
            delta = s["delta"] + dy

            est1 = rate / jnp.maximum(1.0 - rate, 1e-300) * dy_norm
            converged = (dy_norm == 0.0) | (
                has_prev & (s["prev"] > 0.0) & (rate < 1.0) & (est1 < newton_tol))

            done = jnp.where(maxed, 2,
                             jnp.where(converged, 1,
                                       jnp.where(rate_bad, 2, 0))).astype(jnp.int32)
            ran = ~maxed
            sel = lambda new, old: jnp.where(ran, new, old)
            return dict(
                y_new=sel(y_new, s["y_new"]), delta=sel(delta, s["delta"]),
                prev=sel(dy_norm, s["prev"]),
                it=jnp.where(ran & (done == 0), s["it"] + 1, s["it"]),
                done=done,
                nfev=s["nfev"] + jnp.where(ran, 1, 0).astype(jnp.int32),
            )

        # Skip Newton entirely on a singular iteration matrix.
        nst["done"] = jnp.where(sing | too_small, 2, 0).astype(jnp.int32)
        if p.newton_unroll:
            # Exactly maxiter masked iterations (maxed is never hit inside:
            # `it` <= trip index < maxiter); lanes still running afterwards
            # are the maxed failures.
            s = nst
            for _ in range(p.newton_maxiter):
                s2 = nbody(s)
                frozen = s["done"] != 0
                s = {k: jnp.where(frozen, s[k], s2[k]) for k in s}
            nres = dict(s)
            nres["done"] = jnp.where(nres["done"] == 0, 2,
                                     nres["done"]).astype(jnp.int32)
        else:
            nres = lax.while_loop(ncond, nbody, nst)
        converged = nres["done"] == 1
        newton_fail = ~converged
        nfev = nres["nfev"]
        y_new = nres["y_new"]
        delta = nres["delta"]
        n_iter = nres["it"].astype(cdt)

        # Newton failure: refresh Jacobian, halve the step (bdf.rs:448-459).
        jac_new = lax.cond(newton_fail & ~too_small,
                           lambda: jac_fn(x_new, y_predict).astype(jdt),
                           lambda: ms.jac)
        njev = jnp.where(newton_fail & ~too_small & (not p.const_jac), 1, 0).astype(jnp.int32)

        safety = SAFETY * (2.0 * p.newton_maxiter + 1.0) / (
            2.0 * p.newton_maxiter + n_iter + 1.0)

        scale2 = ra.atol + ra.rtol * jnp.abs(y_new)
        scale2 = jnp.where(scale2 == 0.0, EPS, scale2)
        inv_scale2 = (1.0 / scale2).astype(cdt)
        ec = jnp.asarray(error_const, cdt)
        ec_ord = sel(ec, order)
        errc = ec_ord * delta.astype(cdt) * inv_scale2
        error_norm = jnp.sqrt(jnp.mean(errc * errc))

        accepted = converged & (error_norm <= 1.0)
        err_reject = converged & (error_norm > 1.0)

        # ---- Accept: update difference array (bdf.rs:491-503) ----
        rcol = _rows()[:, None]
        row_op1 = jnp.sum(jnp.where((_rows() == order + 1)[:, None], D, 0.0),
                          axis=0)  # D[order+1]
        D_acc = jnp.where(rcol == order + 2, delta[None, :] - row_op1[None, :], D)
        D_acc = jnp.where(rcol == order + 1, delta[None, :], D_acc)
        # downward sweep: D[k] <- sum_{j=k}^{order+1} D[j] for k <= order,
        # as unrolled suffix sums (static 8 rows; no tiny batched matmul).
        contrib = jnp.where(rcol <= order + 1, D_acc, 0.0)
        srows = [contrib[MAX_ORDER + 2]]
        for kk in range(MAX_ORDER + 1, -1, -1):
            srows.append(contrib[kk] + srows[-1])
        S = jnp.stack(srows[::-1])
        D_acc = jnp.where(rcol <= order, S, D_acc)

        # Dense coefficients: [D0, D1..D5 (masked), order] (bdf.rs:505-514).
        if p.need_cont:
            kk = jnp.arange(MAX_ORDER)[:, None]
            dcoef = jnp.where(kk + 1 <= order, D_acc[1:MAX_ORDER + 1], 0.0)
            cont = jnp.concatenate([
                D_acc[0][None, :], dcoef,
                jnp.full((1, n), order.astype(dtype)),
            ], axis=0)
        else:
            cont = jnp.zeros((0, n), dtype)

        # ---- Order & step adaptation after order+1 equal steps
        #      (bdf.rs:552-606) ----
        n_equal_acc = n_equal + 1
        finished = accepted & last
        adapt = accepted & (n_equal_acc >= order + 1) & ~finished

        ec_m = sel(ec, order - 1)
        ec_p = sel(ec, order + 1)
        # Rows of the UPDATED array by identity instead of masked extraction:
        # D_acc[order]   = D[order] + delta   (suffix sweep, rows <= order+1)
        # D_acc[order+2] = delta - D[order+1]
        row_ord = jnp.sum(jnp.where((_rows() == order)[:, None], D, 0.0),
                          axis=0) + delta
        row_op2 = delta - row_op1
        emc = ec_m * row_ord.astype(cdt) * inv_scale2
        epc = ec_p * row_op2.astype(cdt) * inv_scale2
        err_m = jnp.where(order > 1, jnp.sqrt(jnp.mean(emc * emc)), jnp.inf)
        err_p = jnp.where(order < MAX_ORDER,
                          jnp.sqrt(jnp.mean(epc * epc)), jnp.inf)
        # Order selection in log space: argmax of err_k^(-1/(order+k))
        # equals argmax of -log(err_k)/(order+k), so only the WINNING factor
        # is exponentiated — 3 logs + 1 exp instead of 3 emulated-f64 pows.
        # Errors are clamped to [1e-30, 1e30] first: the TPU's emulated-f64
        # log returns NaN for inf (err_m/err_p are inf at the order
        # boundaries — docs/TPU_NOTES.md f64-range quirks), and the clamped
        # values produce factor ~1e30/~1e-30, preserving the safe_pow
        # 0**neg=inf / inf**neg=0 selection behavior.
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
                             lambda: jac_fn(x_new, y_new).astype(jdt),
                             lambda: jac_new)
        njev = njev + jnp.where(order_changed & (not p.const_jac), 1, 0).astype(jnp.int32)

        # ---- Next-step bookkeeping across the outcome cases ----
        fac_fail = jnp.full((), 0.5, cdt)
        # error_norm^(-1/(order+1)) is exactly exp(log_factors[1]) — reuse
        # the log computed for order selection instead of another pow.
        fac_rej = jnp.maximum(safety * jnp.exp(log_factors[1]), MIN_FACTOR)

        # One merged rescaling for ALL outcome cases AND the next step's
        # hmax/hmin/tend clamping (bdf.rs:287-322), composed into a single
        # change_d (rescaling by f1 then f2 equals rescaling by f1*f2):
        #   adapt:          step_factor        (bdf.rs:552-606)
        #   accept, !adapt: 1.0
        #   newton fail:    0.5                (bdf.rs:448-459)
        #   error reject:   fac_rej            (bdf.rs:471-489)
        # times the clamp correction h1/h_des.
        fac_case = jnp.where(adapt, step_factor,
                             jnp.where(accepted, 1.0,
                                       jnp.where(newton_fail, fac_fail,
                                                 fac_rej)))
        t_next = jnp.where(accepted, x_new, t)
        h_des = h_abs * fac_case
        h1 = jnp.minimum(h_des, ra.hmax)
        h1 = jnp.where((h1 < ra.hmin) & (ra.hmin > 0.0), ra.hmin, h1)
        overshoot = posneg * (t_next + posneg * h1 - ra.tend) > 0.0
        h1 = jnp.where(overshoot, jnp.abs(ra.tend - t_next), h1)
        clamp_changed = h1 != h_des

        D_in = jnp.where(accepted, D_acc, D)
        ord_in = jnp.where(adapt, new_order, order)
        f_total = h1 / jnp.maximum(h_abs, 1e-300)
        D_next = change_d(D_in, ord_in, f_total.astype(dtype))
        h_next = h1
        n_equal_next = jnp.where(accepted & ~adapt & ~clamp_changed,
                                 n_equal_acc, 0)
        lu_next = lu_current & ~newton_fail & ~adapt & ~clamp_changed

        # NaN backstop: a non-finite step size or state means the
        # integration is irrecoverable; stop instead of looping.
        dead = ~jnp.isfinite(h_next) | (accepted & ~jnp.all(jnp.isfinite(y_new)))
        status = jnp.where(too_small | dead, _i32(Status.STEP_SIZE_TOO_SMALL),
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
            y_new=jnp.where(accepted, y_new, y),
            xold=t, h_used=h_signed, cont=cont,
            nfev_inc=nfev, njev_inc=njev, nlu_inc=nlu,
            count_step=~too_small,
            count_reject=(newton_fail | err_reject) & ~too_small,
            ms=ms_new,
        )

    return attempt


def bdf_interp(cont, xold, h, ti):
    """Newton-form dense evaluation (bdf.rs:618-656).

    cont rows: [D0, D1..D5, order]; valid on the step [xold, xold+h].
    """
    order_f = cont[MAX_ORDER + 1, 0]
    x_new = xold + h
    tdt = jnp.result_type(xold, h)
    k = jnp.arange(MAX_ORDER, dtype=tdt)
    denom = h * (k + 1.0)
    t_shift = x_new - h * k
    x_factors = ((ti - t_shift) / denom).astype(cont.dtype)
    pk = jnp.cumprod(x_factors)
    mask = k < order_f
    return cont[0] + jnp.sum(
        jnp.where(mask[:, None], cont[1:MAX_ORDER + 1] * pk[:, None], 0.0), axis=0)


def make_engine(need_cont: bool, *, jac_fn, const_jac=False, n=0, **overrides):
    if jac_fn is None:
        raise ValueError("BDF requires a Jacobian function")
    p = BDFParams(need_cont=need_cont, n=n, const_jac=const_jac, **overrides)
    init = make_bdf_init(jac_fn, p)
    attempt = make_bdf_attempt(jac_fn, p)
    eng = Engine(name="BDF", ncoeff=MAX_ORDER + 2 if need_cont else 0,
                 init=init, attempt=attempt, interp=bdf_interp,
                 init_njev=0 if const_jac else 1)
    return eng, p
