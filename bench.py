"""Benchmark: batched Van der Pol IVPs/sec per chip (BASELINE.md primary metric).

Config mirrors the reference harness problem (reference benches/benchmark.py:
107-115): Van der Pol mu=1 (non-stiff), t in [0, 100], y0 ~ [2, 0], DOPRI5
(RK45), rtol=1e-6, atol=1e-8 — but integrated as a vmapped ensemble on one
chip instead of one IVP at a time through a Python-callback boundary.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north star of 1e5
independent Van der Pol IVPs/sec/chip.

Env knobs: IVP_TPU_BENCH_B (batch size), IVP_TPU_BENCH_DTYPE (f64|f32).
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import ivp_tpu  # noqa: F401  (enables x64)
from ivp_tpu.batch import build_ensemble_solver

NORTH_STAR = 1.0e5  # IVPs/sec/chip (BASELINE.json)


def main():
    B = int(os.environ.get("IVP_TPU_BENCH_B", 32768))
    dtype = jnp.float32 if os.environ.get("IVP_TPU_BENCH_DTYPE") == "f32" else jnp.float64
    t0, tf = 0.0, 100.0
    rtol, atol = 1e-6, 1e-8

    def vdp(t, y):
        return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])

    solver = build_ensemble_solver(vdp, "RK45", n=2, dtype=dtype)
    run = jax.jit(solver)

    rng = np.random.default_rng(0)
    y0 = np.array([2.0, 0.0]) + 0.05 * rng.standard_normal((B, 2))
    y0 = jnp.asarray(y0, dtype)

    # Warmup / compile.
    res = run(y0, t0, tf, rtol, atol)
    jax.block_until_ready(res.y)
    ok = np.mean(np.asarray(res.status) == 0)

    times = []
    for _ in range(3):
        start = time.perf_counter()
        res = run(y0, t0, tf, rtol, atol)
        jax.block_until_ready(res.y)
        times.append(time.perf_counter() - start)
    dt = float(np.median(times))

    ivps_per_sec = B / dt
    nfev_total = int(np.sum(np.asarray(res.nfev)))
    out = {
        "metric": "vdp_ivps_per_sec_per_chip",
        "value": round(ivps_per_sec, 2),
        "unit": "IVPs/s",
        "vs_baseline": round(ivps_per_sec / NORTH_STAR, 4),
        "extra": {
            "batch": B,
            "median_wall_s": round(dt, 4),
            "rhs_evals_per_sec": round(nfev_total / dt, 1),
            "success_fraction": float(ok),
            "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
