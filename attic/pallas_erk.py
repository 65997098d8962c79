"""Pallas fused ensemble integrator (DOPRI5, final-state mode) — ARCHIVED.

ROUND-3 DECISION (measured): archived out of the package per the round-2
verdict's "one honest shot or archive".  Fresh v5e numbers (f32, VdP mu=1,
rtol 1e-6, B=32768, lanes_per_block=512, warm): this kernel 57.4k IVPs/s vs
the XLA vmapped while-loop driver 587.5k — a 10x loss, consistent with the
round-2 measurement (0.2M vs 1.1M at B=131072).  Mosaic compilation of the
full-loop kernel also takes >>5 minutes on the remote chip at large block
counts.  XLA's fusion + software pipelining of elementwise step bodies is
already excellent; no configuration was found where VMEM residency of the
carry wins back the codegen gap.  The kernel below remains a correct,
formerly-tested implementation (its controller matches methods/erk.py's
log-facold form bit-for-bit) and the starting point if a future workload
genuinely needs in-kernel scheduling XLA cannot express.
"""
_ORIGINAL_DOC = """Pallas fused ensemble integrator (DOPRI5, final-state mode) — EXPERIMENTAL.

Runs the *entire adaptive integration loop inside one Pallas program* with the
carry resident in VMEM: lanes are laid out (sublane, 128-lane) VPU-shaped, the
grid tiles the ensemble into independent blocks, and each block iterates until
all of its lanes are done — HBM sees exactly one read of y0 and one write of
the results.

Measured status (v5e, VdP mu=1 rtol=1e-6, B=131072, f32): this kernel reaches
~0.2M IVPs/s while the XLA-compiled vmapped while_loop reaches ~1.1M IVPs/s —
XLA's fusion + software pipelining of the elementwise step body beats Mosaic's
per-op codegen here, and the carry HBM traffic it was designed to remove turns
out to overlap with compute.  The XLA path therefore remains the default; this
kernel is kept as a correct, tested alternative backend (it reproduces the
driver's step sequences exactly — see tests/test_pallas.py) and as the
starting point for future in-kernel fusions where XLA genuinely falls short
(e.g. event-driven restarts or per-block data-dependent work).

Scope: DOPRI5, scalar tolerances, float32 (Mosaic has no f64), final-state
output, no events/dense/stiffness-detector.  The RHS must be an elementwise
jnp function of ``(t, y)`` with ``y`` shaped (n, ...) — true for typical small
ODE systems (Van der Pol, Lorenz, decay, ...).

Controller formulas are identical to methods/erk.py (reference
src/methods/dopri5.rs:266-460).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tableaus as tab
from ..types import Status

LANE = 128


class PallasEnsembleResult(NamedTuple):
    t: jax.Array       # (B,)
    y: jax.Array       # (B, n)
    status: jax.Array  # (B,) int32
    nstep: jax.Array   # (B,) int32
    naccpt: jax.Array  # (B,) int32


def _dopri5_block_loop(rhs, n, t0, tf, rtol, atol, hmax, max_steps,
                       safety=0.9, scale_min=0.2, scale_max=10.0, beta=0.04,
                       uround=2.3e-16):
    """Build the in-kernel integration loop over one (n, S, LANE) block."""
    # Python-float constants: numpy f64 scalars would promote f32 arrays.
    A = [[float(v) for v in row] for row in tab.DOPRI5_A]
    C = [float(v) for v in tab.DOPRI5_C]
    E = [float(v) for v in tab.DOPRI5_E]
    facc1 = 1.0 / scale_min
    facc2 = 1.0 / scale_max
    expo1 = 0.2 - beta * 0.75

    def loop(y0):
        dtype = y0.dtype
        shape = y0.shape[1:]  # (S, LANE)
        posneg = float(np.sign(tf - t0))  # python float: avoids f64 promotion

        def err_norm(e, sk):
            return jnp.sqrt(jnp.mean((e / sk) ** 2, axis=0))

        c = lambda v: jnp.asarray(v, dtype)  # typed scalar literals (Mosaic
        # rejects f64-typed weak constants inside where/select)

        t = jnp.full(shape, t0, dtype)
        k1 = rhs(t, y0)

        # hinit (reference methods/mod.rs:216-281), per lane.
        sk0 = atol + rtol * jnp.abs(y0)
        dnf = jnp.sum((k1 / sk0) ** 2, axis=0)
        dny = jnp.sum((y0 / sk0) ** 2, axis=0)
        h = jnp.where((dnf <= 1e-10) | (dny <= 1e-10), c(1e-6),
                      0.01 * jnp.sqrt(dny / dnf))
        h = jnp.minimum(h, abs(hmax)) * posneg
        f1 = rhs(t + h, y0 + h * k1)
        der2 = jnp.sqrt(jnp.sum(((f1 - k1) / sk0) ** 2, axis=0)) / jnp.abs(h)
        der12 = jnp.maximum(der2, jnp.sqrt(dnf))
        h1 = jnp.where(der12 <= 1e-15,
                       jnp.maximum(c(1e-6), jnp.abs(h) * 1e-3),
                       (0.01 / der12) ** (1.0 / 5.0))
        h = jnp.minimum(jnp.minimum(jnp.abs(h), h1), abs(hmax)) * posneg

        # Flags are int32 masks: Mosaic stores i1 while-carries as i8 and
        # cannot truncate them back, so booleans stay out of the carry.
        state = dict(
            t=t, y=y0, h=h, k1=k1,
            # log(facold) — matches the XLA driver's log-space controller
            # (methods/erk.py) so step sequences stay bit-identical.
            facold=jnp.full(shape, float(np.log(1e-4)), dtype),
            reject=jnp.zeros(shape, jnp.int32),
            done=jnp.zeros(shape, jnp.int32),
            status=jnp.full(shape, Status.RUNNING, jnp.int32),
            nstep=jnp.zeros(shape, jnp.int32),
            naccpt=jnp.zeros(shape, jnp.int32),
        )

        def cond(s):
            # f32 reduction: Mosaic's boolean/int reduce proxies introduce
            # 64-bit intermediates when x64 is enabled, which TPU rejects.
            return jnp.max((1 - s["done"]).astype(jnp.float32)) > 0.5

        def body(s):
            act = s["done"] == 0
            t, y, h = s["t"], s["y"], s["h"]

            too_small = 0.1 * jnp.abs(h) <= jnp.abs(t) * uround
            last = (t + 1.01 * h - tf) * posneg > 0.0
            h = jnp.where(last, tf - t, h)

            k1 = s["k1"]
            k2 = rhs(t + C[1] * h, y + h * (A[0][0] * k1))
            k3 = rhs(t + C[2] * h, y + h * (A[1][0] * k1 + A[1][1] * k2))
            k4 = rhs(t + C[3] * h,
                     y + h * (A[2][0] * k1 + A[2][1] * k2 + A[2][2] * k3))
            k5 = rhs(t + C[4] * h,
                     y + h * (A[3][0] * k1 + A[3][1] * k2 + A[3][2] * k3
                              + A[3][3] * k4))
            k6 = rhs(t + h,
                     y + h * (A[4][0] * k1 + A[4][1] * k2 + A[4][2] * k3
                              + A[4][3] * k4 + A[4][4] * k5))
            ynew = y + h * (A[5][0] * k1 + A[5][2] * k3 + A[5][3] * k4
                            + A[5][4] * k5 + A[5][5] * k6)
            k7 = rhs(t + h, ynew)

            e = h * (E[0] * k1 + E[2] * k3 + E[3] * k4 + E[4] * k5
                     + E[5] * k6 + E[6] * k7)
            sk = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(ynew))
            err = err_norm(e, sk)

            accepted = (err <= 1.0) & ~too_small & act

            log_err = jnp.log(jnp.maximum(err, 1e-35))
            fac11 = jnp.exp(expo1 * log_err)
            fac = jnp.exp(expo1 * log_err - beta * s["facold"])
            fac = jnp.maximum(facc2, jnp.minimum(facc1, fac / safety))
            hnew_acc = h / fac
            hnew_acc = jnp.where(jnp.abs(hnew_acc) > abs(hmax),
                                 c(posneg * abs(hmax)), hnew_acc)
            hnew_acc = jnp.where((s["reject"] == 1) & accepted,
                                 posneg * jnp.minimum(jnp.abs(hnew_acc),
                                                      jnp.abs(h)), hnew_acc)
            hnew_rej = h / jnp.minimum(facc1, fac11 / safety)
            h_next = jnp.where(accepted, hnew_acc, hnew_rej)

            t_new = jnp.where(last, c(tf), t + h)
            nstep = s["nstep"] + (act & ~too_small).astype(jnp.int32)

            finished = accepted & last
            status = jnp.where(act & too_small,
                               jnp.int32(Status.STEP_SIZE_TOO_SMALL),
                               s["status"])
            status = jnp.where(finished, jnp.int32(Status.SUCCESS), status)
            status = jnp.where(act & (nstep > max_steps)
                               & (status == Status.RUNNING),
                               jnp.int32(Status.NEED_LARGER_NMAX), status)
            done = jnp.maximum(s["done"],
                               (status != Status.RUNNING).astype(jnp.int32))

            upd = lambda new, old: jnp.where(act & accepted, new, old)
            return dict(
                t=upd(t_new, t), y=upd(ynew, y),
                h=jnp.where(act, h_next, s["h"]),
                k1=upd(k7, k1),
                facold=jnp.where(accepted,
                                 jnp.maximum(log_err, float(np.log(1e-4))),
                                 s["facold"]),
                reject=jnp.where(act, (~accepted).astype(jnp.int32), s["reject"]),
                done=done, status=status, nstep=nstep,
                naccpt=s["naccpt"] + accepted.astype(jnp.int32),
            )

        out = lax.while_loop(cond, body, state)
        status = jnp.where(out["status"] == Status.RUNNING,
                           jnp.int32(Status.SUCCESS), out["status"])
        return out["t"], out["y"], status, out["nstep"], out["naccpt"]

    return loop


def dopri5_ensemble_pallas(fun, y0_batch, t0, tf, *, rtol=1e-6, atol=1e-8,
                           args=(), max_steps: int = 100_000,
                           lanes_per_block: int = 8192, max_step=None,
                           interpret: bool = False) -> PallasEnsembleResult:
    """Integrate a (B, n) ensemble to tf with the fused VMEM-resident kernel.

    t0/tf/rtol/atol/max_step are compile-time constants of the kernel (the
    fast path trades retrace-on-change for peak throughput).
    """
    y0_batch = jnp.asarray(y0_batch)
    B, n = y0_batch.shape
    dtype = y0_batch.dtype
    t0 = float(t0)
    tf = float(tf)
    hmax = float(abs(tf - t0) if max_step is None else max_step)

    LB = min(lanes_per_block, max(LANE, B))
    LB = (LB // LANE) * LANE
    S = LB // LANE
    pad = (-B) % LB
    Bp = B + pad
    G = Bp // LB

    if pad:
        y0_batch = jnp.concatenate(
            [y0_batch, jnp.broadcast_to(y0_batch[-1:], (pad, n))], axis=0)

    # (Bp, n) -> (G, n, S, LANE): lane index = g*LB + s*LANE + l.
    yg = y0_batch.T.reshape(n, G, S, LANE).transpose(1, 0, 2, 3)

    def rhs(t, y):
        out = fun(t, y, *args)
        if isinstance(out, (tuple, list)):
            out = jnp.stack(out)
        return out

    loop = _dopri5_block_loop(rhs, n, t0, tf, float(rtol), float(atol),
                              hmax, max_steps)

    def kernel(y0_ref, t_ref, y_ref, st_ref, ns_ref, na_ref):
        t, y, status, nstep, naccpt = loop(y0_ref[0])
        t_ref[0] = t
        y_ref[0] = y
        st_ref[0] = status
        ns_ref[0] = nstep
        na_ref[0] = naccpt

    out_shapes = (
        jax.ShapeDtypeStruct((G, S, LANE), dtype),          # t
        jax.ShapeDtypeStruct((G, n, S, LANE), dtype),       # y
        jax.ShapeDtypeStruct((G, S, LANE), jnp.int32),      # status
        jax.ShapeDtypeStruct((G, S, LANE), jnp.int32),      # nstep
        jax.ShapeDtypeStruct((G, S, LANE), jnp.int32),      # naccpt
    )
    def block(*shape):
        nd = len(shape)

        def index_map(i):
            # int32 zeros: x64 would make literal 0s i64, which Mosaic rejects
            z = jnp.zeros((), jnp.int32)
            return (i,) + (z,) * nd

        return pl.BlockSpec((1,) + shape, index_map, memory_space=pltpu.VMEM)
    t_out, y_out, st, ns, na = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[block(n, S, LANE)],
        out_specs=(block(S, LANE), block(n, S, LANE), block(S, LANE),
                   block(S, LANE), block(S, LANE)),
        out_shape=out_shapes,
        interpret=interpret,
    )(yg)

    # (G, n, S, LANE) -> (Bp, n) -> (B, n)
    y_flat = y_out.transpose(1, 0, 2, 3).reshape(n, Bp).T[:B]
    flat = lambda a: a.reshape(Bp)[:B]
    return PallasEnsembleResult(t=flat(t_out), y=y_flat, status=flat(st),
                                nstep=flat(ns), naccpt=flat(na))
