"""Interleaved in-process A/B: f32 Jacobian (jac_precision="auto") vs
state-dtype Jacobian ("state") under mixed-precision Newton, mid-size
Brusselator ensembles (the recorded experiment behind docs/STATUS.md
continuation-session-5 numbers).

Protocol per docs/TPU_NOTES.md #24: every config compiled+warmed first,
then timing rounds interleave all configs inside ONE process with an
unmeasured staging pass before each timed run.

Run on TPU: ``python benches/jac_precision_ab.py``.
Env: AB_N (half the state size, default 16 -> n=32), AB_B (default 4096),
AB_METHODS ("Radau,BDF"), AB_JAC ("analytic" | "jacfwd"), AB_ROUNDS (2).

Measured (v5e, n=32, B=4096, rtol 1e-4): analytic jac is
throughput-neutral (state 3294-3544 vs auto 3254-3400 IVPs/s); the
default jacfwd jac wins 1.1-1.2x (auto 3468/3474 vs state 2791/3237).
Step counts identical in every pair.
"""
import json
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ivp_tpu  # noqa: F401  (x64 on)
from ivp_tpu.batch import build_resumable_solver
from midsize_stiff import make_brusselator

N = int(os.environ.get("AB_N", 16))
B = int(os.environ.get("AB_B", 4096))
METHODS = os.environ.get("AB_METHODS", "Radau,BDF").split(",")
USE_JAC = os.environ.get("AB_JAC", "analytic") == "analytic"
ROUNDS = int(os.environ.get("AB_ROUNDS", 2))

n = 2 * N
rhs, jac, y0f = make_brusselator(N)
y0 = y0f(B, np.random.default_rng(0))

runs = {}
stats = {}
for method in METHODS:
    for jp in ("state", "auto"):
        so = {"newton_precision": "mixed", "jac_precision": jp}
        start, resume, extract = build_resumable_solver(
            rhs, method, n=n, jac=jac if USE_JAC else None,
            chunk_steps=2048, solver_options=so, dtype=jnp.float64)

        def run(start=start, resume=resume, extract=extract):
            carry, ra = start(y0, 0.0, 10.0, 1e-4, 1e-6)
            while True:
                carry = resume(carry, ra)
                if bool(np.all(np.asarray(carry.done))):
                    break
            return extract(carry)

        res = run()  # compile + warm
        runs[(method, jp)] = run
        stats[(method, jp)] = (float(np.mean(np.asarray(res.status) == 0)),
                               float(np.mean(np.asarray(res.nstep))))

results = {k: [] for k in runs}
for r in range(ROUNDS):
    for k, run in runs.items():
        run()  # staging pass (program-switch overhead off the timed run)
        t0 = time.perf_counter()
        run()
        results[k].append(B / (time.perf_counter() - t0))

for k in runs:
    sf, ns = stats[k]
    print(json.dumps({
        "config": f"{k[0]} mixed jac={k[1]}"
                  f"/{'analytic' if USE_JAC else 'jacfwd'} n={n} B={B}",
        "ivps_per_sec": [round(x, 1) for x in results[k]],
        "success_fraction": sf, "mean_nstep": round(ns, 2),
    }), flush=True)
