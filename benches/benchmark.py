"""Benchmark: ivp_tpu vs SciPy's solve_ivp.

Counterpart of the reference harness (reference benches/benchmark.py): the
same four problems, wall-clock medians.  Two extra columns show what the
batched TPU-native path buys: the single-IVP comparison is dominated by fixed
dispatch cost, while `solve_ivp_ensemble` amortizes it over thousands of
trajectories.

Run on CPU:  JAX_PLATFORMS=cpu python benches/benchmark.py
Run on TPU:  python benches/benchmark.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp
from scipy.integrate import solve_ivp as scipy_solve_ivp

import ivp_tpu
from ivp_tpu import solve_ivp, solve_ivp_ensemble


def van_der_pol(t, y, mu):
    return [y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]]


def van_der_pol_jnp(t, y, mu):
    return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])


def lorenz(t, y, sigma, rho, beta):
    x, yv, z = y
    return [sigma * (yv - x), x * (rho - z) - yv, x * yv - beta * z]


def lorenz_jnp(t, y, sigma, rho, beta):
    x, yv, z = y
    return jnp.array([sigma * (yv - x), x * (rho - z) - yv, x * yv - beta * z])


def linear(t, y):
    return -y


def linear_jnp(t, y):
    return -y


def median_time(f, n_runs=5):
    times = []
    for _ in range(n_runs):
        start = time.perf_counter()
        f()
        times.append(time.perf_counter() - start)
    return float(np.median(times))


def run(name, fun_np, fun_jx, t_span, y0, args, methods, rtol, atol,
        ensemble_b=4096):
    print(f"\n{'=' * 64}\n{name}\n{'=' * 64}")
    print(f"t_span={t_span}, dim={len(y0)}, rtol={rtol}, atol={atol}")
    for method in methods:
        # warmup/compile
        sol = solve_ivp(fun_jx, t_span, y0, method=method, args=args,
                        rtol=rtol, atol=atol)
        ssol = scipy_solve_ivp(fun_np, t_span, y0, method=method, args=args,
                               rtol=rtol, atol=atol)
        t_us = median_time(lambda: solve_ivp(fun_jx, t_span, y0, method=method,
                                             args=args, rtol=rtol, atol=atol))
        t_sp = median_time(lambda: scipy_solve_ivp(fun_np, t_span, y0,
                                                   method=method, args=args,
                                                   rtol=rtol, atol=atol))
        line = (f"{method:8s} ivp_tpu {t_us * 1e3:9.2f} ms (nfev={sol.nfev}) | "
                f"scipy {t_sp * 1e3:9.2f} ms (nfev={ssol.nfev}) | "
                f"single-IVP speedup {t_sp / t_us:6.2f}x")
        # batched throughput (the metric that matters on TPU)
        if method in ("RK45", "DOP853"):
            y0b = np.tile(np.asarray(y0, float), (ensemble_b, 1))
            y0b += 0.01 * np.random.default_rng(0).standard_normal(y0b.shape)
            fn = (lambda t, y: fun_jx(t, y, *args)) if args else fun_jx
            res = solve_ivp_ensemble(fn, t_span, y0b, method=method,
                                     rtol=rtol, atol=atol)
            jax.block_until_ready(res.y)
            tb = median_time(lambda: jax.block_until_ready(
                solve_ivp_ensemble(fn, t_span, y0b, method=method,
                                   rtol=rtol, atol=atol).y), n_runs=3)
            line += (f" | batched {ensemble_b / tb:12.0f} IVPs/s "
                     f"(={t_sp * ensemble_b / tb:8.0f}x scipy-rate)")
        print(line)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    run("Van der Pol (non-stiff, mu=1)", van_der_pol, van_der_pol_jnp,
        (0, 100.0), [2.0, 0.0], (1.0,), ["RK45", "DOP853"], 1e-6, 1e-8)
    run("Van der Pol (stiff, mu=1000)", van_der_pol, van_der_pol_jnp,
        (0, 3000.0), [2.0, 0.0], (1000.0,), ["BDF", "Radau"], 1e-4, 1e-6)
    run("Lorenz (chaotic)", lorenz, lorenz_jnp, (0, 100.0), [1.0, 1.0, 1.0],
        (10.0, 28.0, 8.0 / 3.0), ["RK45", "DOP853"], 1e-8, 1e-10)
    run("Linear decay N=100", linear, linear_jnp, (0, 10.0),
        list(np.linspace(1, 2, 100)), None and (), ["RK45"], 1e-6, 1e-8)
