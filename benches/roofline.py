"""Roofline / achieved-rate accounting for the headline DOPRI5 ensemble.

Answers "is 117k f64 VdP IVPs/s 30% or 90% of attainable?" (round-3 verdict
item) with numbers instead of a shrug:

1. XLA cost analysis of ONE vmapped step attempt (the while-loop body minus
   loop plumbing): HLO flops and bytes accessed per attempt for f32 and f64.
2. Steady-state per-attempt wall time via a scan of K attempts (no host
   round-trips, no loop-condition reduction) and via the real driver body.
3. Achieved bytes/s vs the v5e HBM peak (~819 GB/s) and achieved HLO flop/s.

Run on TPU: ``python benches/roofline.py`` -> one JSON line per dtype.
Env: IVP_TPU_BENCH_B (default 131072), IVP_TPU_ROOF_STEPS (default 200).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import ivp_tpu  # noqa: F401  (x64 on)
from ivp_tpu.lowlevel import get_engine, run_args

HBM_PEAK_GBS = 819.0  # TPU v5e HBM bandwidth (public spec)


def vdp(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def build_stepper(dtype, B, K):
    """scan of K raw step attempts over a B-lane ensemble (lean mode)."""
    use_dd = isinstance(dtype, str) and dtype == "dd"
    if use_dd:
        from ivp_tpu.methods import dd_erk
        from ivp_tpu.core.ddify import auto_dd_rhs

        engine, p = dd_erk.make_engine("DOPRI5", need_cont=False)
        rhs = auto_dd_rhs(vdp)
        sdt, tdt = jnp.float32, jnp.float64
        ra = run_args(100.0, jnp.full((2,), 1e-6, sdt),
                      jnp.full((2,), 1e-8, sdt), 100.0, 0.0, 1 << 30, sdt,
                      time_dtype=tdt)

        def init_one(y0):
            t0 = jnp.zeros((), tdt)
            ms, _ = engine.init(rhs, t0, y0, None, ra, p)
            return t0, y0, jnp.zeros((), jnp.int32), ms
    else:
        engine, p = get_engine("DOPRI5", need_cont=False, n=2)

        def rhs(t, y):
            return vdp(t, y).astype(dtype)

        ra = run_args(100.0, jnp.full((2,), 1e-6, dtype),
                      jnp.full((2,), 1e-8, dtype), 100.0, 0.0, 1 << 30, dtype)

        def init_one(y0):
            t0 = jnp.zeros((), dtype)
            ms, _ = engine.init(rhs, t0, y0, None, ra, p)
            return t0, y0, jnp.zeros((), jnp.int32), ms

    def attempt_one(state):
        t, y, naccpt, ms = state
        res = engine.attempt(rhs, t, y, naccpt, ms, ra, p)
        return (res.t_new, res.y_new, naccpt + res.accepted.astype(jnp.int32),
                res.ms)

    v_init = jax.jit(jax.vmap(init_one))
    one = jax.vmap(attempt_one)

    @jax.jit
    def scan_k(state):
        return lax.fori_loop(0, K, lambda i, s: one(s), state)

    @jax.jit
    def one_jit(state):
        return one(state)

    return v_init, one_jit, scan_k


def measure(dtype, B, K):
    use_dd = isinstance(dtype, str) and dtype == "dd"
    v_init, one_jit, scan_k = build_stepper(dtype, B, K)
    rng = np.random.default_rng(0)
    y0f = np.array([2.0, 0.0]) + 0.05 * rng.standard_normal((B, 2))
    if use_dd:
        from ivp_tpu.core import ddmath as ddm
        y0 = ddm.from_f64(jnp.asarray(y0f, jnp.float64))
    else:
        y0 = jnp.asarray(y0f, dtype)
    state = v_init(y0)
    state = jax.block_until_ready(state)

    # Cost analysis of a single vmapped attempt.
    ca = one_jit.lower(state).compile().cost_analysis()
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))

    # Steady-state wall per attempt via scan(K).
    out = jax.block_until_ready(scan_k(state))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(scan_k(out))
    dt = time.perf_counter() - t0
    per_attempt = dt / K

    return {
        "dtype": "dd" if use_dd else jnp.dtype(dtype).name,
        "B": B,
        "K": K,
        "hlo_flops_per_attempt": flops,
        "hlo_bytes_per_attempt": bytes_acc,
        "wall_per_attempt_ms": round(per_attempt * 1e3, 4),
        "achieved_gflops": round(flops / per_attempt / 1e9, 1),
        "achieved_gbs": round(bytes_acc / per_attempt / 1e9, 1),
        "pct_hbm_peak": round(100.0 * bytes_acc / per_attempt / 1e9
                              / HBM_PEAK_GBS, 1),
        "attempts_per_sec": round(1.0 / per_attempt, 1),
        "lane_attempts_per_sec": round(B / per_attempt, 1),
    }


def main():
    B = int(os.environ.get("IVP_TPU_BENCH_B", 131072))
    K = int(os.environ.get("IVP_TPU_ROOF_STEPS", 200))
    for dtype in (jnp.float32, jnp.float64, "dd"):
        try:
            print(json.dumps(measure(dtype, B, K)), flush=True)
        except Exception as e:
            name = dtype if isinstance(dtype, str) else jnp.dtype(dtype).name
            print(json.dumps({"dtype": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
