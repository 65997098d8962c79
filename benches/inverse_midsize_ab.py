"""Interleaved in-process A/B: scan-LU vs explicit inverse for mid-size
mixed-Newton stiff ensembles (production config).

Motivated by benches/native_linalg_ab.py: in isolation the explicit-inverse
f32 unit (factor + 3 solves) beats scan-LU by ~15% at n=32 and the XLA-LU
inverse wins ~5-8% at n=64/128.  This script measures the same choice in the
real Radau/BDF hot loop (Brusselator ensembles, mixed Newton), where Newton
iteration counts can move if the inverse is less accurate.

Run: python benches/inverse_midsize_ab.py  (env: IVP_TPU_INV_B)
"""
import json
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ivp_tpu  # noqa: F401  (x64 on)
from ivp_tpu.batch import build_resumable_solver

from midsize_stiff import make_brusselator


def build(method, N, solver_options):
    n = 2 * N
    rhs, jac, y0f = make_brusselator(N)
    start, resume, extract = build_resumable_solver(
        rhs, method, n=n, jac=jac, chunk_steps=2048,
        solver_options=solver_options, dtype=jnp.float64)
    return start, resume, extract, y0f


def run_once(builders, y0, tf=10.0, rtol=1e-4, atol=1e-6):
    start, resume, extract, _ = builders
    carry, ra = start(y0, 0.0, tf, rtol, atol)
    while True:
        carry = resume(carry, ra)
        if bool(np.all(np.asarray(carry.done))):
            break
    return extract(carry)


def main():
    B = int(os.environ.get("IVP_TPU_INV_B", 4096))
    methods = os.environ.get("IVP_TPU_INV_METHODS", "Radau,BDF").split(",")
    sizes = [int(s) for s in
             os.environ.get("IVP_TPU_INV_NS", "16,32").split(",")]
    configs = []
    for method in methods:
        for N, b in ((16, B), (32, B // 4)):
            if N not in sizes:
                continue
            for mode in ("lu", "inverse"):
                configs.append((method, N, b, mode))

    built = {}
    for method, N, b, mode in configs:
        so = {"newton_precision": "mixed", "linear_mode": mode}
        built[(method, N, mode)] = build(method, N, so)

    rng = np.random.default_rng(0)
    y0s = {}
    for method, N, b, mode in configs:
        if (N, b) not in y0s:
            y0s[(N, b)] = built[(method, N, mode)][3](b, rng)

    # compile + warm each
    stats = {}
    for method, N, b, mode in configs:
        res = run_once(built[(method, N, mode)], y0s[(N, b)])
        stats[(method, N, mode)] = (
            float(np.mean(np.asarray(res.status) == 0)),
            float(np.mean(np.asarray(res.nstep))))

    times = {k: [] for k in built}
    for rnd in range(3):
        for method, N, b, mode in configs:
            y0 = y0s[(N, b)] + 1e-9 * (rnd + 1)
            t0 = time.perf_counter()
            run_once(built[(method, N, mode)], y0)
            times[(method, N, mode)].append(time.perf_counter() - t0)

    for method, N, b, mode in configs:
        k = (method, N, mode)
        dt = min(times[k])
        print(json.dumps({
            "config": f"Brusselator n={2*N} {method} mixed/{mode} B={b}",
            "ivps_per_sec": round(b / dt, 1),
            "wall_s": round(dt, 3),
            "success_fraction": stats[k][0],
            "mean_nstep": round(stats[k][1], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
