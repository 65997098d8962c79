"""RADAU — 3-stage Radau IIA order-5 implicit Runge–Kutta engine.

Stiff ODE / index-1/2/3 DAE solver ``M y' = f(t, y)`` with simplified Newton
iterations, Jacobian/decomposition reuse, the theta convergence-rate
divergence predictor, and the predictive Gustafsson step controller —
algorithmic parity with the reference (src/methods/radau.rs:114-843, itself
Hairer & Wanner's RADAU5), restructured as a branchless masked step-attempt
function:

* the variable-length Newton iteration is a bounded ``lax.while_loop`` whose
  exit reason (converged / predicted divergence / theta blow-up / maxiter) is
  carried as a code instead of Rust's labelled breaks;
* the per-step real LU of E1=(u1/h)M - J and complex LU of E2=((a+ib)/h)M - J
  run on the gather/scatter-free pure-JAX LU (split-real form,
  core/linalg.py) and batch over vmapped ensembles;
* jac/LU reuse flags (call_jac/call_decomp) are booleans in the carried state
  so reuse works per-trajectory under vmap (SURVEY.md hard part #1/#2).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import tableaus as tab
from ..types import Status
from ..core.common import safe_pow
from ..core.block_tridiag import (blocks_from_dense, btd_factor,
                                  btd_factor_complex, btd_solve,
                                  btd_solve_complex, pad_rhs)
from ..core.linalg import (inv, inv_complex, lu_factor, lu_factor_cpair,
                           lu_solve, lu_solve_cpair, matvec,
                           solve_complex_inv)
from .base import Engine, RunArgs, StepProposal


class RadauState(NamedTuple):
    h: Any          # signed step size for the next attempt
    hold: Any       # h of the last accepted step (Newton extrapolation)
    posneg: Any
    f0: Any         # (n,) rhs at (t, y)
    cont: Any       # (4, n) dense coefficients of the previous accepted step
    scal: Any       # (n,) error scale (persistently mutated for DAE vars)
    first: Any      # bool
    reject: Any     # bool
    last: Any       # bool — next accepted step lands on tend
    faccon: Any
    theta: Any
    hhfac: Any
    h_acc: Any      # Gustafsson memory
    err_acc: Any
    call_jac: Any   # bool
    call_decomp: Any
    singular: Any   # int32 consecutive-failure counter
    jac: Any        # (n, n)
    lin: Any        # linear-solver rep: ((lu1,P1),(lu2,P2)) or (inv1, Br, Bi)


@dataclasses.dataclass(frozen=True)
class RadauParams:
    need_cont: bool
    n: int
    uround: float = 2.3e-16
    safety: float = 0.9
    scale_min: float = 0.2
    scale_max: float = 8.0
    newton_maxiter: int = 7
    newton_tol: Optional[float] = None
    predictive: bool = True
    thet: float = 0.001
    quot1: float = 1.0
    quot2: float = 1.2
    nind: Tuple[Optional[int], Optional[int], Optional[int]] = (None, None, None)
    has_mass: bool = False
    const_jac: bool = False
    # Linear-solver mode: "auto" picks the explicit-inverse path for small n
    # (each Newton solve becomes a fused matvec — the stiff-ensemble hot-loop
    # optimization; under vmap the cond-gated LU reuse of the reference
    # radau.rs:761-776 cannot skip work, so the decomposition must be cheap
    # instead), "lu" forces factored substitution, "inverse" forces inverses,
    # "banded" forces block-tridiagonal cyclic reduction (requires ``band``).
    linear_mode: str = "auto"
    # (ml, mu) Jacobian bandwidths (from jac_sparsity); enables the banded
    # backend for large narrow-band systems (reference matrix/base.rs:6-16).
    band: Optional[Tuple[int, int]] = None
    # "mixed": factor + linear solves in float32 while the state, RHS and
    # Newton residuals stay float64 — an inexact Newton whose ~1e-7-relative
    # solves are far below the Newton tolerance (max(10u/tol, sqrt(tol)),
    # radau.rs:199-205), halving the linear-algebra HBM traffic on TPU.
    newton_precision: str = "full"
    # Norm / rate / step-controller arithmetic precision (see erk.py): the
    # convergence-rate and error norms only drive decisions, so under
    # emulated f64 they run in f32 by default.  "state" restores dtype
    # arithmetic.
    controller_precision: str = "float32"
    # Ensemble-facade hint: the factorizations run in f32 (mixed Newton,
    # f32 state, or the dd tier) AND the solve is batched under vmap.
    # Batched lanes already saturate the VPU, so the CR backend's log-depth
    # parallelism doesn't pay and dense scan-LU wins through n=192
    # (docs/BENCH.md) — "auto" skips banded.  Single IVPs are the opposite:
    # CR wins from n≈48 even with f32 factors, so the single-IVP facade
    # never sets this.
    factor_f32: bool = False
    # Jacobian storage/build precision.  "auto" keeps the Jacobian (and the
    # E1/E2 matrix builds) in f32 whenever the factorization is f32
    # (newton_precision="mixed") — J only enters the iteration matrices,
    # which are rounded to f32 at the factor boundary anyway, so an f32 J
    # perturbs the factored operator by no more than the cast it replaces.
    # The facade additionally builds the jac_fn itself in f32 arithmetic
    # then (solve.py::_normalize_jac), eliminating the emulated-f64
    # Jacobian evaluation — measured 33% of the n=32 mixed ensemble
    # attempt (benches/radau_phases.py).  "state" restores state-dtype
    # Jacobians; "float32" forces f32 (requires a f32 factorization).
    jac_precision: str = "auto"


# n at or below which "auto" uses the explicit-inverse linear path.
INV_AUTO_N = 8

# With f32 factorizations (mixed Newton / f32 state / dd — the factor_f32
# hint) the explicit inverse stays ahead of scan-LU further: one n-RHS
# substitution sweep at factor time turns every Newton solve into a fused
# broadcast matvec.  Measured in the real hot loop (interleaved A/B,
# benches/inverse_midsize_ab.py, Brusselator mixed ensembles): 1.22x at
# n=32 (3654 vs 2987 IVPs/s, identical step counts) but 0.56x by n=64 —
# the O(n^3) inverse build overtakes the per-solve savings.
INV_AUTO_N_F32 = 32

# n below which "auto" prefers dense LU over the banded cyclic-reduction
# backend even when a narrow band is known: with scan-based substitutions
# dense LU wins the bw-2 Brusselator ensemble at n=32 (1064 vs 845-901
# IVPs/s, interleaved in-process A/B) while CR wins 3.1-3.7x at n=64
# (interleaved; docs/BENCH.md mid-size table).
BANDED_AUTO_MIN_N = 48


# Newton-loop exit codes.
_CONTINUE, _CONVERGED, _DIVERGED, _BAD_THETA, _MAXITER = 0, 1, 2, 3, 4


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _transform_tols(ra: RunArgs):
    """rtol <- 0.1 rtol^(2/3), atol scaled to keep the ratio
    (reference radau.rs:188-196)."""
    quot = ra.atol / ra.rtol
    rtol_t = 0.1 * ra.rtol ** (2.0 / 3.0)
    return rtol_t, rtol_t * quot


def _dae_partition(p: RadauParams, n: int):
    n1, n2, n3 = p.nind
    if n1 is None and n2 is None and n3 is None:
        return n, 0, 0
    n2 = n2 or 0
    n3 = n3 or 0
    if n1 is None:
        n1 = n - n2 - n3
    if n1 + n2 + n3 != n or min(n1, n2, n3) < 0:
        raise ValueError(f"invalid DAE partition ({n1},{n2},{n3}) for n={n}")
    return n1, n2, n3


def jac_dtype_of(p, dtype):
    """Effective Jacobian dtype for params ``p`` and state dtype ``dtype``
    (shared by RADAU and BDF; see RadauParams.jac_precision)."""
    jp = p.jac_precision
    if jp not in ("auto", "state", "float32"):
        raise ValueError(
            f"jac_precision must be 'auto', 'state' or 'float32'; got {jp!r}")
    if jp == "state":
        return dtype
    if p.newton_precision == "mixed":
        return jnp.float32
    if jp == "float32" and jnp.dtype(dtype) != jnp.float32:
        raise ValueError(
            "jac_precision='float32' requires an f32 factorization "
            "(newton_precision='mixed' or float32 state)")
    return dtype


def _backend_kind(p: RadauParams) -> str:
    if p.linear_mode not in ("auto", "lu", "inverse", "banded"):
        raise ValueError(
            f"linear_mode must be one of 'auto', 'lu', 'inverse', 'banded'; "
            f"got {p.linear_mode!r}")
    if p.linear_mode in ("inverse", "lu"):
        return p.linear_mode
    if p.linear_mode == "banded":
        if p.band is None:
            raise ValueError("linear_mode='banded' requires band=(ml, mu)")
        if p.has_mass:
            # blocks_from_dense would silently drop mass-matrix entries
            # outside the Jacobian band; refuse instead of truncating.
            raise ValueError(
                "linear_mode='banded' does not support a mass matrix (its "
                "band is not tracked); use 'lu', 'inverse' or 'auto'")
        return "banded"
    # auto: small systems invert outright; large narrow-band systems (no
    # mass matrix — its band is not tracked) use cyclic reduction; else LU.
    if p.n <= (INV_AUTO_N_F32 if p.factor_f32 else INV_AUTO_N):
        return "inverse"
    if (p.band is not None and not p.has_mass
            and p.n >= BANDED_AUTO_MIN_N
            and not p.factor_f32
            and 3 * (p.band[0] + p.band[1] + 1) <= p.n):
        # Batched f32 factorizations (factor_f32 hint) never auto-pick
        # banded: under vmap, dense scan-LU wins 1.7x at n=64 through 2.2x
        # at n=192 over mixed+CR (docs/BENCH.md mid-size table); for single
        # IVPs CR wins from n>=48 at every precision, so the hint is only
        # set by the ensemble builders.  'banded' still forces CR.
        return "banded"
    return "lu"


def make_linear_backend(p: RadauParams):
    """Returns (factor, solve1, solve2, zero_lin) for the E1/E2 systems.

    factor(e1, e2r, e2i) -> (lin, singular); solve1(lin, b) solves E1 x = b;
    solve2(lin, br, bi) solves E2 (xr + i xi) = br + i bi; zero_lin(dtype)
    builds a structure-matching placeholder for the initial engine state.
    """
    n = p.n
    kind = _backend_kind(p)
    if kind == "inverse":
        def factor(e1, e2r, e2i):
            inv1, s1 = inv(e1)
            binv, s2 = inv_complex(e2r, e2i)
            return (inv1, binv[0], binv[1]), s1 | s2

        def solve1(lin, b):
            return matvec(lin[0], b)

        def solve2(lin, br_, bi_):
            return solve_complex_inv((lin[1], lin[2]), br_, bi_)

        def zero_lin(dtype):
            z = jnp.zeros((n, n), dtype)
            return (z, z, z)
    elif kind == "banded":
        bsz = max(p.band[0], p.band[1], 1)

        def _pad(v):
            return pad_rhs(v, bsz)

        def _unpad(x):
            return x.reshape(-1)[:n]

        def factor(e1, e2r, e2i):
            fac1, s1 = btd_factor(*blocks_from_dense(e1, bsz))
            Dr, Lr, Ur = blocks_from_dense(e2r, bsz)
            Di, Li, Ui = blocks_from_dense(e2i, bsz)
            fac2, s2 = btd_factor_complex((Dr, Di), (Lr, Li), (Ur, Ui))
            return (fac1, fac2), s1 | s2

        def solve1(lin, b):
            return _unpad(btd_solve(lin[0], _pad(b)))

        def solve2(lin, br_, bi_):
            xr, xi = btd_solve_complex(lin[1], _pad(br_), _pad(bi_))
            return _unpad(xr), _unpad(xi)

        def zero_lin(dtype):
            eye = jnp.eye(n, dtype=dtype)
            return factor(eye, eye, jnp.zeros((n, n), dtype))[0]
    else:
        # Complex-pair LU for E2: half the flops and half the sequential
        # depth of the former split-real 2n x 2n embedding (linalg.py) —
        # the dominant cost of mid-size dense Radau ensembles.
        def factor(e1, e2r, e2i):
            lu1_piv, s1 = lu_factor(e1)
            lu2_rep, s2 = lu_factor_cpair(e2r, e2i)
            return (lu1_piv, lu2_rep), s1 | s2

        def solve1(lin, b):
            return lu_solve(lin[0], b)

        def solve2(lin, br_, bi_):
            return lu_solve_cpair(lin[1], br_, bi_)

        def zero_lin(dtype):
            z = jnp.zeros((n, n), dtype)
            return ((z, jnp.eye(n, dtype=dtype)),
                    (z, z, jnp.eye(n, dtype=dtype)))

    if p.newton_precision == "mixed":
        f32 = jnp.float32
        base_factor, base_s1, base_s2, base_zero = (factor, solve1, solve2,
                                                    zero_lin)

        def factor(e1, e2r, e2i):  # noqa: F811
            return base_factor(e1.astype(f32), e2r.astype(f32),
                               e2i.astype(f32))

        def solve1(lin, b):  # noqa: F811
            return base_s1(lin, b.astype(f32)).astype(b.dtype)

        def solve2(lin, br_, bi_):  # noqa: F811
            xr, xi = base_s2(lin, br_.astype(f32), bi_.astype(f32))
            return xr.astype(br_.dtype), xi.astype(bi_.dtype)

        def zero_lin(dtype):  # noqa: F811
            return base_zero(f32)
    elif p.newton_precision != "full":
        raise ValueError("newton_precision must be 'full' or 'mixed'")
    return factor, solve1, solve2, zero_lin


def make_radau_init(jac_fn, mass_mat, p: RadauParams):
    n = p.n
    _, _, _, zero_lin = make_linear_backend(p)

    def init(rhs, t0, y0, first_step, ra: RunArgs, p_):
        dtype = y0.dtype
        tdt = ra.tend.dtype  # time dtype (f64-time/f32-state hybrid aware)
        posneg = jnp.sign(ra.tend - t0)
        if first_step is not None:
            h = (jnp.abs(first_step) * posneg).astype(tdt)
        else:
            h = (1.0e-6 * posneg).astype(tdt)  # reference radau.rs:250-255
        h = jnp.clip(h, -ra.hmax, ra.hmax)
        f0 = rhs(t0, y0)
        rtol_t, atol_t = _transform_tols(ra)
        scal = atol_t + rtol_t * jnp.abs(y0)
        cdt = jnp.float32 if p.controller_precision == "float32" else dtype
        ms = RadauState(
            h=h, hold=h, posneg=posneg, f0=f0,
            cont=jnp.zeros((4, n), dtype), scal=scal,
            first=jnp.ones((), bool), reject=jnp.zeros((), bool),
            last=jnp.zeros((), bool),
            faccon=jnp.ones((), cdt), theta=jnp.full((), p.thet, cdt),
            hhfac=h, h_acc=jnp.zeros((), tdt), err_acc=jnp.zeros((), cdt),
            call_jac=jnp.ones((), bool), call_decomp=jnp.ones((), bool),
            singular=_i32(0),
            jac=jnp.zeros((n, n), jac_dtype_of(p, dtype)),
            lin=zero_lin(dtype),
        )
        return ms, 1

    return init


def make_radau_attempt(jac_fn, mass_mat, p: RadauParams):
    n = p.n
    factor, solve1, solve2, _ = make_linear_backend(p)
    n1, n2, n3 = _dae_partition(p, n)
    T = tab.RADAU_T
    TI = tab.RADAU_TI
    C1, C2 = tab.RADAU_C1, tab.RADAU_C2
    C1M1, C2M1, C1MC2 = tab.RADAU_C1M1, tab.RADAU_C2M1, tab.RADAU_C1MC2
    DD = tab.RADAU_DD
    U1, ALPH, BETA = tab.RADAU_U1, tab.RADAU_ALPH, tab.RADAU_BETA
    facl = 1.0 / p.scale_min
    facr = 1.0 / p.scale_max
    cfac = p.safety * (1.0 + 2.0 * p.newton_maxiter)

    if p.has_mass:
        M = jnp.asarray(mass_mat)

        def mdot(v):
            return M @ v
    else:
        def mdot(v):
            return v

    def build_matrices(h, jac):
        # 1/h terms computed in time precision, cast to the JACOBIAN dtype
        # for the matrix build (f32 under jac_precision; hybrid-aware).
        fac1 = (U1 / h).astype(jac.dtype)
        alphn = (ALPH / h).astype(jac.dtype)
        betan = (BETA / h).astype(jac.dtype)
        if p.has_mass:
            Mj = M.astype(jac.dtype)
            e1 = fac1 * Mj - jac
            e2r = alphn * Mj - jac
            e2i = betan * Mj
        else:
            eye = jnp.eye(n, dtype=jac.dtype)
            e1 = fac1 * eye - jac
            e2r = alphn * eye - jac
            e2i = betan * eye
        return e1, e2r, e2i

    def attempt(rhs, t, y, naccpt, ms: RadauState, ra: RunArgs, p_):
        dtype = y.dtype
        # The tableau arrays are strong-typed float64 numpy constants; cast
        # to the working dtype so f32 runs don't silently promote (and then
        # fail the while-loop carry type check).
        T = jnp.asarray(tab.RADAU_T, dtype)
        TI = jnp.asarray(tab.RADAU_TI, dtype)
        DD = jnp.asarray(tab.RADAU_DD, dtype)
        C1, C2 = float(tab.RADAU_C1), float(tab.RADAU_C2)
        C1M1, C2M1 = float(tab.RADAU_C1M1), float(tab.RADAU_C2M1)
        C1MC2 = float(tab.RADAU_C1MC2)
        rtol_t, atol_t = _transform_tols(ra)
        cdt = jnp.float32 if p.controller_precision == "float32" else dtype
        if p.newton_tol is not None:
            newton_tol = jnp.asarray(p.newton_tol, cdt)
        else:
            tolst = rtol_t[0]
            newton_tol = jnp.maximum(10.0 * p.uround / tolst,
                                     jnp.minimum(0.03, jnp.sqrt(tolst))).astype(cdt)

        h = ms.h
        posneg = ms.posneg
        nfev = _i32(0)

        # ---- Jacobian (reused while theta stays small; radau.rs:368-371) ----
        jdt = jac_dtype_of(p, dtype)
        jac = lax.cond(ms.call_jac, lambda: jac_fn(t, y).astype(jdt),
                       lambda: ms.jac)
        njev = jnp.where(ms.call_jac & (not p.const_jac), 1, 0).astype(jnp.int32)

        # ---- Decompositions (reused when step ratio ~1; radau.rs:374-417) ----
        def do_decomp():
            e1, e2r, e2i = build_matrices(h, jac)
            return factor(e1, e2r, e2i)

        def keep_decomp():
            return ms.lin, jnp.zeros((), bool)

        lin, sing = lax.cond(ms.call_decomp, do_decomp, keep_decomp)
        nlu = jnp.where(ms.call_decomp, 2, 0).astype(jnp.int32)

        # ---- Step guards (radau.rs:423-431) ----
        too_small = 0.1 * jnp.abs(h) <= jnp.abs(t) * p.uround

        # ---- DAE scaling of algebraic components (radau.rs:434-444) ----
        # (skipped on singular-decomposition retries, which in the reference
        # restart before this point)
        scal = ms.scal
        if n2 > 0 or n3 > 0:
            hf = ms.hhfac.astype(dtype)
        if n2 > 0:
            scal = scal.at[n1:n1 + n2].set(
                jnp.where(sing, scal[n1:n1 + n2], scal[n1:n1 + n2] / hf))
        if n3 > 0:
            scal = scal.at[n1 + n2:].set(
                jnp.where(sing, scal[n1 + n2:], scal[n1 + n2:] / (hf ** 2)))

        # ---- Newton starting values (extrapolate previous collocation
        #      polynomial; radau.rs:447-475) ----
        c3q = (h / ms.hold).astype(dtype)
        c1q = C1 * c3q
        c2q = C2 * c3q
        ak1, ak2, ak3 = ms.cont[1], ms.cont[2], ms.cont[3]

        def extrap(cq):
            return cq * (ak1 + (cq - C2M1) * (ak2 + (cq - C1M1) * ak3))

        z1_0 = jnp.where(ms.first, 0.0, extrap(c1q))
        z2_0 = jnp.where(ms.first, 0.0, extrap(c2q))
        z3_0 = jnp.where(ms.first, 0.0, extrap(c3q))
        f1_0 = TI[0, 0] * z1_0 + TI[0, 1] * z2_0 + TI[0, 2] * z3_0
        f2_0 = TI[1, 0] * z1_0 + TI[1, 1] * z2_0 + TI[1, 2] * z3_0
        f3_0 = TI[2, 0] * z1_0 + TI[2, 1] * z2_0 + TI[2, 2] * z3_0
        f1_0 = jnp.where(ms.first, 0.0, f1_0)
        f2_0 = jnp.where(ms.first, 0.0, f2_0)
        f3_0 = jnp.where(ms.first, 0.0, f3_0)

        fac1 = (U1 / h).astype(dtype)
        alphn = (ALPH / h).astype(dtype)
        betan = (BETA / h).astype(dtype)

        # ---- Simplified Newton iteration (radau.rs:477-618) ----
        # Rate/norm arithmetic in controller precision (f32 by default —
        # it only drives convergence decisions; see ERKParams rationale).
        faccon0 = jnp.maximum(ms.faccon, p.uround) ** 0.8
        inv_scal_c = (1.0 / scal).astype(cdt)

        nst = dict(
            z1=z1_0, z2=z2_0, z3=z3_0, f1=f1_0, f2=f2_0, f3=f3_0,
            it=_i32(0), dyno=jnp.zeros((), cdt), dynold=jnp.zeros((), cdt),
            thqold=jnp.zeros((), cdt), theta=jnp.full((), abs(p.thet), cdt),
            faccon=faccon0, hhfac=ms.hhfac,
            # Singular decomposition or step-underflow: skip Newton entirely
            # (the reference restarts the main loop before the iteration).
            code=jnp.where(sing | too_small, _MAXITER, _CONTINUE).astype(jnp.int32),
            nfev=_i32(0),
        )

        def newton_cond(s):
            return s["code"] == _CONTINUE

        def newton_body(s):
            maxed = s["it"] >= p.newton_maxiter

            # Stage RHS evaluations.
            g1 = rhs(t + C1 * h, y + s["z1"])
            g2 = rhs(t + C2 * h, y + s["z2"])
            g3 = rhs(t + h, y + s["z3"])

            # TI-transform.
            z1 = TI[0, 0] * g1 + TI[0, 1] * g2 + TI[0, 2] * g3
            z2 = TI[1, 0] * g1 + TI[1, 1] * g2 + TI[1, 2] * g3
            z3 = TI[2, 0] * g1 + TI[2, 1] * g2 + TI[2, 2] * g3

            # Mass contributions (identity fast path).
            mf1, mf2, mf3 = mdot(s["f1"]), mdot(s["f2"]), mdot(s["f3"])
            z1 = z1 - fac1 * mf1
            z2 = z2 - alphn * mf2 + betan * mf3
            z3 = z3 - alphn * mf3 - betan * mf2

            # Linear solves against the factored E1 / E2.
            z1 = solve1(lin, z1)
            z2, z3 = solve2(lin, z2, z3)

            it = s["it"] + 1
            z1c = z1.astype(cdt) * inv_scal_c
            z2c = z2.astype(cdt) * inv_scal_c
            z3c = z3.astype(cdt) * inv_scal_c
            dyno = jnp.sqrt(
                (jnp.sum(z1c * z1c) + jnp.sum(z2c * z2c)
                 + jnp.sum(z3c * z3c)) / (3.0 * n))

            # Convergence-rate control (radau.rs:561-596).
            check = (it > 1) & (it < p.newton_maxiter)
            thq = dyno / jnp.maximum(s["dynold"], 1e-300)
            theta = jnp.where(it == 2, thq, jnp.sqrt(thq * jnp.maximum(s["thqold"], 1e-300)))
            theta = jnp.where(check, theta, s["theta"])
            thqold = jnp.where(check, thq, s["thqold"])

            ok_theta = theta < 0.99
            faccon = jnp.where(check & ok_theta, theta / (1.0 - theta), s["faccon"])
            rem = jnp.asarray(p.newton_maxiter - 1, cdt) - it.astype(cdt)
            # theta ** rem with integer rem in [0, maxiter-2] over the
            # region where it is used (checked iterations): integer powers
            # by multiply+select instead of an emulated-f64 pow per
            # iteration per lane (rem < 0 iterations are masked out by
            # `check`, any finite placeholder is fine).
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

            # Update F and back-transform to Z (radau.rs:599-610).
            f1 = s["f1"] + z1
            f2 = s["f2"] + z2
            f3 = s["f3"] + z3
            z1n = T[0, 0] * f1 + T[0, 1] * f2 + T[0, 2] * f3
            z2n = T[1, 0] * f1 + T[1, 1] * f2 + T[1, 2] * f3
            z3n = T[2, 0] * f1 + f2

            converged = faccon * dyno <= newton_tol

            code = jnp.where(maxed, _MAXITER,
                             jnp.where(bad_theta, _BAD_THETA,
                                       jnp.where(diverged, _DIVERGED,
                                                 jnp.where(converged, _CONVERGED,
                                                           _CONTINUE)))).astype(jnp.int32)
            # A maxed-out attempt performs no evaluations this round.
            ran = ~maxed
            sel = lambda new, old: jnp.where(ran, new, old)
            return dict(
                z1=sel(z1n, s["z1"]), z2=sel(z2n, s["z2"]), z3=sel(z3n, s["z3"]),
                f1=sel(f1, s["f1"]), f2=sel(f2, s["f2"]), f3=sel(f3, s["f3"]),
                it=jnp.where(ran, it, s["it"]), dyno=sel(dyno, s["dyno"]),
                dynold=sel(dynold, s["dynold"]), thqold=sel(thqold, s["thqold"]),
                theta=sel(theta, s["theta"]), faccon=sel(faccon, s["faccon"]),
                hhfac=sel(hhfac, s["hhfac"]),
                code=code, nfev=s["nfev"] + jnp.where(ran, 3, 0).astype(jnp.int32),
            )

        nres = lax.while_loop(newton_cond, newton_body, nst)
        nfev = nfev + nres["nfev"]
        newt = nres["it"].astype(cdt)
        theta_new = nres["theta"]
        faccon_new = nres["faccon"]
        converged = nres["code"] == _CONVERGED
        z1, z2, z3 = nres["z1"], nres["z2"], nres["z3"]

        # ---- Error estimation (radau.rs:620-667) ----
        hee = (DD / h).astype(dtype)
        f1e = hee[0] * z1 + hee[1] * z2 + hee[2] * z3
        f2e = mdot(f1e)
        err_vec = solve1(lin, f2e + ms.f0)

        def rms(v):
            vc = v.astype(cdt) * inv_scal_c
            return jnp.maximum(jnp.sqrt(jnp.mean(vc * vc)), 1e-10)

        err0 = rms(err_vec)

        def refine():
            fr = rhs(t, err_vec + y)
            ev2 = solve1(lin, fr + f2e)
            return rms(ev2), _i32(1)

        do_refine = converged & (err0 >= 1.0) & (ms.first | ms.reject)
        err, extra_fev = lax.cond(do_refine, refine, lambda: (err0, _i32(0)))
        nfev = nfev + extra_fev

        # ---- Step-size controller (radau.rs:669-691) ----
        fac = jnp.minimum(p.safety, cfac / (newt + 2.0 * p.newton_maxiter))
        # err^0.25 as two sqrts: far cheaper than an emulated-f64 pow (err
        # is floored at 1e-10 by rms, so always positive; NaN propagates).
        quot = jnp.maximum(facr, jnp.minimum(facl,
                                             jnp.sqrt(jnp.sqrt(err)) / fac))
        hnew = h / quot

        accepted = converged & (err <= 1.0) & ~sing & ~too_small

        # Predictive Gustafsson controller.
        if p.predictive:
            can_pred = accepted & (naccpt + 1 > 1)
            # err_acc floor must not underflow the controller dtype: in f32
            # a 1e-300 guard becomes 0, err^2/0 = inf, and the first
            # post-restart accepted step (h_acc = 0 from re-init while the
            # cumulative naccpt enables prediction) computed 0 * inf = NaN
            # for the next h.  1e-30 is f32-safe and keeps the f64 ratio
            # finite too (err_acc is floored at 1e-2 on every accept, so
            # the guard only matters for the init/restart zero).
            ratio = jnp.minimum(err * err / jnp.maximum(ms.err_acc, 1e-30),
                                1e30)  # finite: err^2 may overflow f32
            facgus = ((ms.h_acc / h).astype(err.dtype)
                      * jnp.sqrt(jnp.sqrt(ratio)) / p.safety)
            facgus = jnp.maximum(facr, jnp.minimum(facl, facgus))
            quot = jnp.where(can_pred, jnp.maximum(quot, facgus), quot)
            hnew = h / quot
            h_acc = jnp.where(accepted, h, ms.h_acc)
            err_acc = jnp.where(accepted, jnp.maximum(err, 1e-2), ms.err_acc)
        else:
            h_acc, err_acc = ms.h_acc, ms.err_acc

        # ---- Accept path ----
        y_new = y + z3
        t_new = jnp.where(ms.last, ra.tend, t + h)
        ak = (z1 - z2) / C1MC2
        acont3 = (ak - z1 / C1) / C2
        c1r = (z2 - z3) / C2M1
        c2r = (ak - c1r) / C1M1
        c3r = c2r - acont3
        if p.need_cont:
            cont_out = jnp.stack([y_new, c1r, c2r, c3r])
        else:
            cont_out = jnp.zeros((0, n), dtype)
        cont_state = jnp.stack([y_new, c1r, c2r, c3r])

        f0_new = rhs(t_new, y_new)
        nfev = nfev + jnp.where(accepted, 1, 0).astype(jnp.int32)
        scal_acc = atol_t + rtol_t * jnp.abs(y_new)

        hnew_acc = jnp.clip(jnp.abs(hnew), ra.hmin, ra.hmax) * posneg
        hnew_acc = jnp.where(ms.reject,
                             posneg * jnp.minimum(jnp.abs(hnew_acc), jnp.abs(h)),
                             hnew_acc)
        # Land exactly on tend / decomposition reuse (radau.rs:761-776).
        hit_end = (t_new + hnew_acc / p.quot1 - ra.tend) * posneg >= 0.0
        qt = hnew_acc / h
        reuse = (~hit_end) & (theta_new < p.thet) & (qt > p.quot1) & (qt < p.quot2)
        h_acc_next = jnp.where(hit_end, ra.tend - t_new,
                               jnp.where(reuse, h, hnew_acc))
        hhfac_acc = jnp.where(reuse, ms.hhfac, h_acc_next)
        call_decomp_acc = ~reuse
        call_jac_acc = (~reuse) & (theta_new >= p.thet)

        # ---- Reject paths ----
        # err > 1 (radau.rs:777-792)
        tdt = h.dtype
        h_rej = jnp.where(ms.first, h * 0.1, hnew)
        hhfac_rej = jnp.where(ms.first, jnp.full((), 0.1, tdt), hnew / h)
        # Newton divergence (code DIVERGED): h *= hhfac from the loop.
        h_div = h * nres["hhfac"]
        # Newton maxiter / theta blow-up / singular decomposition: halve.
        h_half = h * 0.5

        diverged = nres["code"] == _DIVERGED
        broke = (nres["code"] == _MAXITER) | (nres["code"] == _BAD_THETA) | sing

        h_next = jnp.where(accepted, h_acc_next,
                           jnp.where(diverged, h_div,
                                     jnp.where(broke, h_half, h_rej)))
        hhfac_next = jnp.where(accepted, hhfac_acc,
                               jnp.where(diverged, nres["hhfac"],
                                         jnp.where(broke, jnp.full((), 0.5, tdt),
                                                   hhfac_rej)))
        call_decomp_next = jnp.where(accepted, call_decomp_acc, True)
        call_jac_next = jnp.where(accepted, call_jac_acc, ms.call_jac)

        # Consecutive-failure counter: increments on singular decompositions
        # AND on Newton maxiter / theta blow-up, and resets on accept — the
        # reference uses one shared counter for all three break reasons
        # (radau.rs:391-416 singular LU, :483-495 maxiter, :584-595
        # unexpected rejection; reset radau.rs:749), so >5 consecutive
        # non-convergences reporting SINGULAR_MATRIX is reference parity.
        singular_next = jnp.where(accepted, _i32(0),
                                  jnp.where(broke, ms.singular + 1, ms.singular))
        status = jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                           jnp.where(broke & (singular_next > 5),
                                     _i32(Status.SINGULAR_MATRIX),
                                     _i32(Status.RUNNING)))

        advance = accepted
        finished = accepted & ms.last

        ms_new = RadauState(
            h=h_next, hold=jnp.where(accepted, h, ms.hold), posneg=posneg,
            f0=jnp.where(accepted, f0_new, ms.f0),
            cont=jnp.where(accepted, cont_state, ms.cont),
            scal=jnp.where(accepted, scal_acc, scal),
            first=ms.first & ~accepted,
            reject=jnp.where(accepted, False, ms.reject | diverged | (err > 1.0) | broke),
            last=jnp.where(accepted, hit_end, False),
            faccon=faccon_new, theta=theta_new,
            hhfac=hhfac_next, h_acc=h_acc, err_acc=err_acc,
            call_jac=call_jac_next, call_decomp=call_decomp_next,
            singular=singular_next,
            jac=jac, lin=lin,
        )

        count_step = ~sing  # singular decomposition retries are not steps
        # Rejections counted: error rejections after the first step, and
        # Newton divergence (radau.rs:578, 788).
        count_reject = (~accepted) & ~sing & (
            diverged | (converged & (err > 1.0) & ~ms.first))

        return StepProposal(
            accepted=accepted, advance=advance, finished=finished,
            status=status,
            t_new=jnp.where(advance, t_new, t),
            y_new=jnp.where(advance, y_new, y),
            xold=t, h_used=h, cont=cont_out,
            nfev_inc=nfev, njev_inc=njev, nlu_inc=nlu,
            count_step=count_step, count_reject=count_reject,
            ms=ms_new,
        )

    return attempt


def radau_interp(cont, xold, h, ti):
    """Collocation interpolant in s = (t - (xold+h))/h (radau.rs:798-809)."""
    s = ((ti - (xold + h)) / h).astype(cont.dtype)
    return cont[0] + s * (cont[1] + (s - float(tab.RADAU_C2M1)) *
                          (cont[2] + (s - float(tab.RADAU_C1M1)) * cont[3]))


def make_engine(need_cont: bool, *, jac_fn, const_jac=False, mass=None,
                nind=(None, None, None), n=0, **overrides):
    if jac_fn is None:
        raise ValueError("RADAU requires a Jacobian function")
    mass_mat = None
    if mass is not None:
        mass_mat = np.asarray(mass, dtype=float)
    p = RadauParams(need_cont=need_cont, n=n, nind=tuple(nind),
                    has_mass=mass_mat is not None, const_jac=const_jac,
                    **overrides)
    init = make_radau_init(jac_fn, mass_mat, p)
    attempt = make_radau_attempt(jac_fn, mass_mat, p)
    eng = Engine(name="RADAU", ncoeff=4 if need_cont else 0,
                 init=init, attempt=attempt, interp=radau_interp)
    return eng, p
