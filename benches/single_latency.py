"""Single-IVP warm-cache latency vs SciPy on the reference's own harness.

The reference's value proposition is per-problem speed over SciPy
(/root/reference/benches/benchmark.py:100-148: VdP non-stiff RK45/DOP853,
VdP stiff BDF/Radau, Lorenz RK45/DOP853, linear N=100 RK45).  ivp_tpu's
product is the batch axis, but this script publishes the honest
single-problem numbers the batch story is traded against: median warm
wall time per solve (compile cached via core/cache.py; the first call per
config is excluded), same host, same problems, same tolerances.

``run_rows()`` is importable (bench.py embeds the rows in its detail JSON
so every round's BENCH artifact carries them).

Accuracy columns (advisor round 4): both solvers' success flags are
checked before a row is published; the final-state delta is reported at a
short horizon (t=2) for the chaotic Lorenz rows (at t=100 the Lyapunov
divergence makes solver-vs-SciPy end states O(state) regardless of
correctness); step counts compare accepted steps on both sides
(scipy's ``t.size-1`` vs our ``naccpt`` — ``nstep`` counts rejects too).

Run:  python benches/single_latency.py            (device = whatever JAX picks)
      JAX_PLATFORMS=cpu python benches/single_latency.py
Env:  IVP_TPU_LAT_REPS=7 (median-of reps), IVP_TPU_LAT_DTYPE=auto|float64
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS
# (see tests/conftest.py): honor an explicit CPU request by pinning the
# platform through jax.config too.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")
    _CACHE = "/tmp/ivp_tpu_jax_cache"
else:
    _CACHE = "/tmp/ivp_tpu_jax_cache_tpu"
# Same persistent compile cache as bench.py: the 7 configs cost ~minutes of
# compiles otherwise, and compile time is excluded from the latency numbers.
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPS = int(os.environ.get("IVP_TPU_LAT_REPS", "7"))
DTYPE = os.environ.get("IVP_TPU_LAT_DTYPE", "auto")


def vdp(mu):
    def f(t, y):
        return np.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])
    return f


def vdp_jax(mu):
    import jax.numpy as jnp

    def f(t, y):
        return jnp.stack([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])
    return f


def lorenz_np(t, y):
    s, r, b = 10.0, 28.0, 8.0 / 3.0
    return np.array([s * (y[1] - y[0]), y[0] * (r - y[2]) - y[1],
                     y[0] * y[1] - b * y[2]])


def lorenz_jax(t, y):
    import jax.numpy as jnp
    s, r, b = 10.0, 28.0, 8.0 / 3.0
    return jnp.stack([s * (y[1] - y[0]), y[0] * (r - y[2]) - y[1],
                      y[0] * y[1] - b * y[2]])


def linear(t, y):
    return -y


# (name, np_fun, jax_fun, t_span, y0, methods, rtol, atol, accuracy_t_span)
# accuracy_t_span: horizon for the final-state-delta column — equals t_span
# except for the chaotic Lorenz rows, where a short horizon (t=2, well
# inside the Lyapunov time budget at rtol 1e-8) keeps the column meaningful.
PROBLEMS = [
    ("vdp_nonstiff", vdp(1.0), vdp_jax(1.0), (0.0, 100.0), [2.0, 0.0],
     ["RK45", "DOP853"], 1e-6, 1e-8, None),
    ("vdp_stiff", vdp(1000.0), vdp_jax(1000.0), (0.0, 3000.0), [2.0, 0.0],
     ["BDF", "Radau"], 1e-4, 1e-6, None),
    ("lorenz", lorenz_np, lorenz_jax, (0.0, 100.0), [1.0, 1.0, 1.0],
     ["RK45", "DOP853"], 1e-8, 1e-10, (0.0, 2.0)),
    ("linear_n100", linear, linear, (0.0, 10.0), list(np.ones(100)),
     ["RK45"], 1e-6, 1e-8, None),
]


def median_wall(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), r


def run_rows(reps=REPS, dtype=DTYPE, problems=None):
    """Measure all (problem, method) rows; returns a list of row dicts."""
    from scipy.integrate import solve_ivp as scipy_solve
    import ivp_tpu

    rows = []
    for (name, f_np, f_jax, t_span, y0, methods, rtol, atol,
         acc_span) in (problems or PROBLEMS):
        y0 = np.asarray(y0, dtype=np.float64)
        for method in methods:
            # scipy (python-callback RHS, its native habitat)
            sp_t, sp_res = median_wall(
                lambda: scipy_solve(f_np, t_span, y0, method=method,
                                    rtol=rtol, atol=atol), reps)
            # ivp_tpu: warm the compile cache first (excluded), then time.
            kw = dict(method=method, rtol=rtol, atol=atol, dtype=dtype)
            ivp_tpu.solve_ivp(f_jax, t_span, y0, **kw)  # compile (excluded)
            us_t, us_res = median_wall(
                lambda: ivp_tpu.solve_ivp(f_jax, t_span, y0, **kw), reps)
            row = {
                "problem": name, "method": method,
                "scipy_ms": round(sp_t * 1e3, 2),
                "ivp_tpu_ms": round(us_t * 1e3, 2),
                "ratio_vs_scipy": round(us_t / sp_t, 2),
                # Accepted steps on BOTH sides (scipy reports accepted
                # points; our nstep would also count rejected attempts).
                "scipy_naccpt": int(sp_res.t.size - 1),
                "ivp_tpu_naccpt": int(us_res.naccpt),
                "scipy_success": bool(sp_res.success),
                "ivp_tpu_success": bool(us_res.success),
            }
            # Final-state delta only when both solves succeeded, at the
            # accuracy horizon (short for chaotic problems).
            if not (sp_res.success and us_res.success):
                row["final_state_delta"] = "n/a (solve failed)"
            elif acc_span is None:
                err = float(np.max(np.abs(us_res.y[:, -1] - sp_res.y[:, -1])))
                row["final_state_delta"] = f"{err:.1e}"
            else:
                sp_a = scipy_solve(f_np, acc_span, y0, method=method,
                                   rtol=rtol, atol=atol)
                us_a = ivp_tpu.solve_ivp(f_jax, acc_span, y0, **kw)
                err = float(np.max(np.abs(us_a.y[:, -1] - sp_a.y[:, -1])))
                row["final_state_delta"] = (
                    f"{err:.1e} (at t={acc_span[1]:g}; full-horizon delta "
                    "is Lyapunov-dominated)")
            rows.append(row)
    return rows


def main():
    rows = run_rows()
    for row in rows:
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "bench": "single_ivp_latency", "device": jax.devices()[0].platform,
        "dtype": DTYPE, "reps": REPS,
        "median_ratio": round(float(np.median(
            [r["ratio_vs_scipy"] for r in rows])), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
