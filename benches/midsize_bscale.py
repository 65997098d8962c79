"""Batch-size scaling of mid-size stiff ensembles (occupancy probe).

Hypothesis: at n=32 the vmapped Radau attempt runs far below both the FLOP
and HBM roofs (see docs/BENCH.md roofline), so throughput should scale with
batch size until the VPU is occupied.  Measures Radau n=32 mixed-Newton
Brusselator IVPs/s at a sweep of B, interleaved in ONE process
(TPU_NOTES #24 discipline: cross-process A/Bs are invalid on this chip).

Run on TPU: ``python benches/midsize_bscale.py``.
Env: IVP_TPU_BSCALE (comma list, default "2048,4096,8192,16384,32768").
"""
import json
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

import jax  # noqa: F401

jax.config.update("jax_compilation_cache_dir", "/tmp/ivp_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import ivp_tpu  # noqa: F401,E402  (x64 on)
from ivp_tpu.batch import build_resumable_solver  # noqa: E402
from midsize_stiff import make_brusselator  # noqa: E402


def build(N, B):
    n = 2 * N
    rhs, jac, y0f = make_brusselator(N)
    start, resume, extract = build_resumable_solver(
        rhs, "Radau", n=n, jac=jac, chunk_steps=2048,
        solver_options={"newton_precision": "mixed"}, dtype=jnp.float64)
    y0 = y0f(B, np.random.default_rng(0))

    def run(eps):
        carry, ra = start(y0 + eps, 0.0, 10.0, 1e-4, 1e-6)
        while True:
            carry = resume(carry, ra)
            if bool(np.all(np.asarray(carry.done))):
                break
        return extract(carry)

    return run


def main():
    N = int(os.environ.get("IVP_TPU_BSCALE_N", 16))
    Bs = [int(b) for b in os.environ.get(
        "IVP_TPU_BSCALE", "2048,4096,8192,16384,32768").split(",")]
    runs = {B: build(N, B) for B in Bs}
    for B, run in runs.items():
        run(0.0)  # compile + warm every config before any timing
    results = {B: [] for B in Bs}
    for rep in range(3):          # interleaved: B1,B2,...,B1,B2,...
        for B, run in runs.items():
            t0 = time.perf_counter()
            res = run(1e-9 * (rep + 1))
            dt = time.perf_counter() - t0
            results[B].append(B / dt)
            del res
    for B in Bs:
        r = results[B]
        print(json.dumps({
            "config": f"Brusselator N={N} (n={2*N}) Radau/mixed B={B}",
            "ivps_per_sec": [round(x, 1) for x in r],
            "best": round(max(r), 1),
            "per_lane_norm": round(max(r) / B, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
