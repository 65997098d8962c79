"""Compensated-f32 tier experiment (round-5 VERDICT #6).

Hypothesis: between plain f32 and the dd tier there is a cheaper
precision point — run ALL stage arithmetic in single-word f32 (k evals,
stage sums, error norm, controller: identical to the f32 engine) and
compensate ONLY the state accumulation y_{n+1} = y_n + dy with a 2Sum
carry word (a Kahan/Moller accumulator per state component):

    s, e = TwoSum(y.hi, dy)        # dy computed in plain f32
    y'   = QuickTwoSum(s, y.lo + e)

Cost: ~11 extra f32 flops per accepted step per component (vs ~21+ per dd
*multiply* — the dd tier pays hundreds per step).  Expected throughput:
within a few % of the f32 engine, i.e. ~2x the 755k dd bandwidth ceiling.

Accuracy model: the compensation removes the O(N)*2^-24 accumulation
drift that dominates long f32 integrations, leaving the per-step f32
rounding of dy itself (random-walk ~sqrt(N)*2^-24*|dy| ~ 1e-6 relative
at N ~ 1e3-1e4) plus the h-quantization of the landing step.  So cf32 is
NOT an f64-class tier — the experiment measures where its envelope
actually lands in the rtol 1e-5..1e-8 window and what it costs.

Protocol: interleaved same-process timing rounds (chip drift swamps <2x
ratios otherwise — docs/TPU_NOTES.md #24) for f32 / cf32 / dd on the
benchmark VdP ensemble; accuracy = final-state max relative deviation
from the dd tier (known ~5e-14-grade on TPU) on the same lanes, at
rtol 1e-5, 1e-6, 1e-7, 1e-8.

Results + verdict land in docs/TPU_NOTES.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ivp_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import ivp_tpu  # noqa: F401  (enables x64)
from ivp_tpu import tableaus as tab
from ivp_tpu.batch import build_ensemble_solver
from ivp_tpu.core import ddmath as ddm
from ivp_tpu.core.ddmath import DD
from ivp_tpu.core.driver import DriverConfig, make_driver, run_args
from ivp_tpu.methods.base import Engine, StepProposal, dotk
from ivp_tpu.methods.erk import DOPRI5_DEFAULTS, ERKParams, ERKState
from ivp_tpu.types import Status


def _i32(v):
    return jnp.asarray(v, jnp.int32)


# =============================================================================
# cf32 DOPRI5 engine: f32 stages, 2Sum-compensated state accumulation
# =============================================================================

def cf32_init(rhs, t0, y0: DD, first_step, ra, p: ERKParams):
    """f32 hinit off the working (hi) words; h carried in f32, t in f64
    (same time split as the dd engines, methods/dd_erk.py)."""
    posneg = jnp.sign(ra.tend - t0).astype(jnp.float32)
    k1 = rhs(t0, y0.hi)
    if first_step is not None:
        h = jnp.abs(jnp.asarray(first_step, jnp.float32)) * posneg
        nfev = 1
    else:
        sk = ra.atol + ra.rtol * jnp.abs(y0.hi)
        dnf = jnp.sum((k1 / sk) ** 2)
        dny = jnp.sum((y0.hi / sk) ** 2)
        h = jnp.where((dnf <= 1e-10) | (dny <= 1e-10), 1e-6,
                      jnp.sqrt(dny / dnf) * 0.01)
        h = jnp.minimum(h, jnp.abs(ra.hmax).astype(jnp.float32)) * posneg
        f1 = rhs(t0 + h.astype(ra.tend.dtype), y0.hi + h * k1)
        der2 = jnp.sqrt(jnp.sum(((f1 - k1) / sk) ** 2)) / jnp.abs(h)
        der12 = jnp.maximum(jnp.abs(der2), jnp.sqrt(dnf))
        h1 = jnp.where(der12 <= 1e-15,
                       jnp.maximum(1e-6, jnp.abs(h) * 1e-3),
                       (0.01 / der12) ** (1.0 / p.iord))
        h = (jnp.minimum(jnp.minimum(jnp.abs(h), h1),
                         jnp.abs(ra.hmax).astype(jnp.float32)) * posneg)
        nfev = 2
    ms = ERKState(h=h, k1=k1, facold=jnp.log(jnp.full((), 1e-4, jnp.float32)),
                  reject=jnp.zeros((), bool), iasti=_i32(0), nonstiff=_i32(0),
                  hlamb=jnp.zeros((), jnp.float32), posneg=posneg)
    return ms, nfev


def cf32_dopri5_attempt(rhs, t, y: DD, naccpt, ms: ERKState, ra,
                        p: ERKParams):
    """Identical control flow to the f32 engine (methods/erk.py:104-207);
    the ONLY difference is the compensated state add at the end."""
    A, C, E = tab.DOPRI5_A, tab.DOPRI5_C, tab.DOPRI5_E
    h, posneg = ms.h, ms.posneg
    facc1, facc2 = 1.0 / p.scale_min, 1.0 / p.scale_max
    expo1 = 0.2 - p.beta * 0.75

    too_small = 0.1 * jnp.abs(h) <= jnp.abs(t).astype(jnp.float32) * p.uround
    dt_left = (ra.tend - t).astype(jnp.float32)
    last = (1.01 * h - dt_left) * posneg > 0.0
    h = jnp.where(last, dt_left, h)
    h64 = h.astype(t.dtype)

    yh = y.hi
    k1 = ms.k1
    k2 = rhs(t + C[1] * h64, yh + h * dotk(A[0], [k1]))
    k3 = rhs(t + C[2] * h64, yh + h * dotk(A[1], [k1, k2]))
    k4 = rhs(t + C[3] * h64, yh + h * dotk(A[2], [k1, k2, k3]))
    k5 = rhs(t + C[4] * h64, yh + h * dotk(A[3], [k1, k2, k3, k4]))
    ysti = yh + h * dotk(A[4], [k1, k2, k3, k4, k5])
    k6 = rhs(t + h64, ysti)
    dy = h * dotk(A[5], [k1, k2, k3, k4, k5, k6])  # plain f32 increment
    ynew_hi_view = yh + dy                          # for FSAL/error scaling
    k7 = rhs(t + h64, ynew_hi_view)
    ks = [k1, k2, k3, k4, k5, k6, k7]

    err_vec = h * dotk(E, ks)
    sk = ra.atol + ra.rtol * jnp.maximum(jnp.abs(yh), jnp.abs(ynew_hi_view))
    r = err_vec / sk
    err = jnp.sqrt(jnp.mean(r * r))
    accepted = (err <= 1.0) & ~too_small

    # --- THE experiment: 2Sum-compensated accumulation of the increment ---
    ynew = ddm.add(y, DD(dy, jnp.zeros_like(dy)))

    # Stiffness detector (same thresholds as the f32/dd engines).
    do_stiff = accepted & (((naccpt + 1) % p.stiff_test == 0) | (ms.iasti > 0))
    stnum = jnp.sum((k7 - k6) ** 2)
    stden = jnp.sum((ynew.hi - ysti) ** 2)
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
    h_next = jnp.where(accepted, hnew_acc,
                       h / jnp.minimum(facc1, fac11 / p.safety))

    t_new = jnp.where(last, ra.tend, t + h64)
    status = jnp.where(too_small, _i32(Status.STEP_SIZE_TOO_SMALL),
                       jnp.where(stiff_fail, _i32(Status.PROBABLY_STIFF),
                                 _i32(Status.RUNNING)))
    import math
    ms_new = ERKState(
        h=h_next, k1=jnp.where(advance, k7, k1),
        facold=jnp.where(accepted, jnp.maximum(log_err, math.log(1e-4)),
                         ms.facold),
        reject=~accepted, iasti=iasti, nonstiff=nonstiff, hlamb=hlamb,
        posneg=posneg)
    return StepProposal(
        accepted=accepted, advance=advance, finished=advance & last,
        status=status,
        t_new=jnp.where(advance, t_new, t),
        y_new=ddm.where(advance, ynew, y),
        xold=t, h_used=h,
        cont=jnp.zeros((0,) + y.shape, jnp.float32),
        nfev_inc=_i32(6), njev_inc=_i32(0), nlu_inc=_i32(0),
        count_step=~too_small,
        count_reject=(~accepted) & (naccpt > 1) & ~too_small,
        ms=ms_new)


def build_cf32_solver(f32_rhs, n, unroll=4, max_steps=100_000):
    p = ERKParams(method="DOPRI5", need_cont=False, **DOPRI5_DEFAULTS,
                  controller_precision="float32")
    eng = Engine(name="DOPRI5", ncoeff=0, init=cf32_init,
                 attempt=cf32_dopri5_attempt, interp=None,
                 lower=lambda y: y.hi,
                 lift=lambda a: DD(a, jnp.zeros_like(a)))
    cfg = DriverConfig(rec_cap=0, unroll=unroll)
    init_carry, run_chunk, _, _ = make_driver(eng, p, cfg, f32_rhs)

    def solve_one(y0dd, t0, tf, rtol, atol):
        ra = run_args(tf, jnp.broadcast_to(jnp.asarray(rtol, jnp.float32), (n,)),
                      jnp.broadcast_to(jnp.asarray(atol, jnp.float32), (n,)),
                      jnp.abs(tf - t0), 0.0, max_steps, jnp.float32,
                      time_dtype=jnp.float64)
        c = init_carry(t0, y0dd, None, ra)
        c = run_chunk(c, ra)
        return c.y, c.status, c.nstep, c.nfev

    @jax.jit
    def solver(y0_batch, t0, tf, rtol, atol):
        y0dd = ddm.from_f64(jnp.asarray(y0_batch, jnp.float64))
        B = y0_batch.shape[0]
        t0b = jnp.broadcast_to(jnp.asarray(t0, jnp.float64), (B,))
        tfb = jnp.broadcast_to(jnp.asarray(tf, jnp.float64), (B,))
        y, st, ns, nf = jax.vmap(solve_one, in_axes=(0, 0, 0, None, None))(
            y0dd, t0b, tfb, rtol, atol)
        return ddm.to_f64(y), st, ns, nf

    return solver


# =============================================================================
# Experiment harness
# =============================================================================

def vdp64(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def vdp_dd(t, y):
    return ddm.stack([y[1], (1.0 - y[0] * y[0]) * y[1] - y[0]])


def vdp32(t, y):
    return jnp.stack([y[1], (1.0 - y[0] * y[0]) * y[1] - y[0]])


def main():
    B = int(os.environ.get("IVP_TPU_CF32_B", "262144"))
    rounds = int(os.environ.get("IVP_TPU_CF32_ROUNDS", "3"))
    rng = np.random.default_rng(0)
    y0 = np.array([2.0, 0.0]) + 0.05 * rng.standard_normal((B, 2))

    cf32 = build_cf32_solver(lambda t, y: vdp32(t, y), n=2)
    f32 = jax.jit(build_ensemble_solver(vdp64, "RK45", n=2,
                                        dtype=jnp.float32))
    dd = jax.jit(build_ensemble_solver(vdp_dd, "RK45", n=2, dtype="dd"))

    def run_cf32(eps):
        y, st, ns, nf = cf32(y0 + eps, 0.0, 100.0, 1e-6, 1e-8)
        return int(np.asarray(nf[0])), y, st, ns

    def run_f32(eps):
        r = f32(jnp.asarray(y0 + eps, jnp.float32), 0.0, 100.0, 1e-6, 1e-8)
        return int(np.asarray(r.nfev[0])), r.y, r.status, r.nstep

    def run_dd(eps):
        r = dd(y0 + eps, 0.0, 100.0, 1e-6, 1e-8)
        return int(np.asarray(r.nfev[0])), r.y, r.status, r.nstep

    runners = [("f32", run_f32), ("cf32", run_cf32), ("dd", run_dd)]
    for _, r in runners:
        r(0.0)  # compile + warm

    walls = {k: [] for k, _ in runners}
    for rd in range(rounds):
        for k, r in runners:
            r((2 * rd + 1) * 1e-9)  # staging run (program-switch overhead)
            t0 = time.perf_counter()
            r((2 * rd + 2) * 1e-9)
            walls[k].append(time.perf_counter() - t0)
    out = {"bench": "cf32_experiment", "B": B, "rounds": rounds,
           "config": "VdP mu=1, t=[0,100], DOPRI5, rtol=1e-6"}
    for k, _ in runners:
        out[f"{k}_ivps_per_sec"] = round(B / min(walls[k]), 1)

    # Accuracy envelope: final-state max relative deviation from the dd
    # tier on the same (small) lane set, across the rtol window.
    Bacc = 4096
    acc = {}
    for rtol in (1e-5, 1e-6, 1e-7, 1e-8):
        atol = rtol * 1e-2
        ydd, _, nsdd, _ = (lambda r: (r.y, r.status, r.nstep, r.nfev))(
            dd(y0[:Bacc], 0.0, 100.0, rtol, atol))
        ycf, _, nscf, _ = cf32(y0[:Bacc], 0.0, 100.0, rtol, atol)
        rf32 = f32(jnp.asarray(y0[:Bacc], jnp.float32), 0.0, 100.0,
                   rtol, atol)
        scale = np.maximum(np.abs(np.asarray(ydd)), 1e-3)
        acc[f"rtol_{rtol:g}"] = {
            "cf32_vs_dd_maxrel": float(
                (np.abs(np.asarray(ycf) - np.asarray(ydd)) / scale).max()),
            "f32_vs_dd_maxrel": float(
                (np.abs(np.asarray(rf32.y) - np.asarray(ydd)) / scale).max()),
            "cf32_vs_dd_medrel": float(np.median(
                np.abs(np.asarray(ycf) - np.asarray(ydd)) / scale)),
            "f32_vs_dd_medrel": float(np.median(
                np.abs(np.asarray(rf32.y) - np.asarray(ydd)) / scale)),
            "mean_nstep_cf32": float(np.mean(np.asarray(nscf))),
            "mean_nstep_dd": float(np.mean(np.asarray(nsdd))),
        }
    out["accuracy"] = acc
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
