"""The double-float precision tier: f64-class ensembles at ~1.7x the speed
of the TPU's f64 emulation (explicit methods; ~2.1x for Radau).

``dtype="dd"`` carries the solver state as the framework's own double-f32
(Dekker) pairs (ivp_tpu/core/ddmath.py) instead of the platform's software
f64.  The RHS can be a *plain jnp function* (auto-lifted to dd arithmetic
by jaxpr reinterpretation, ivp_tpu.ddify) or hand-written with DD
operators — everything else (tolerances, events, t_eval, dense output,
sharding, stiff Radau/BDF) works like any other dtype, and final states
come back as f64.

No counterpart exists in the reference (native-f64 CPU Rust); this tier is
TPU-first design: the ODE hot loop needs none of the general emulation's
NaN/inf plumbing and estimates errors in plain f32 off the hi words.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu import solve_ivp_ensemble, ddmath as ddm


def vdp_dd(t, y):
    # DD in, DD out: build the derivative with DD operators + ddmath.stack.
    return ddm.stack([y[1], (1.0 - y[0] * y[0]) * y[1] - y[0]])


def vdp_f64(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def main():
    # TPU-sized by default; CPU runs (demos/tests) use a small batch — the
    # tier exists for chip-scale ensembles.
    B = 100_000 if jax.default_backend() == "tpu" else 2048
    rng = np.random.default_rng(0)
    y0 = np.array([2.0, 0.0]) + 0.1 * rng.standard_normal((B, 2))

    # Note the third row: the PLAIN f64 RHS passed straight to dtype="dd" —
    # it auto-lifts via ivp_tpu.ddify, no DD-operator rewrite needed.
    for name, fun, dtype in [("platform f64", vdp_f64, jnp.float64),
                             ("dd (double-f32)", vdp_dd, "dd"),
                             ("dd (auto-lifted)", vdp_f64, "dd")]:
        t0 = time.perf_counter()
        res = solve_ivp_ensemble(fun, (0.0, 100.0), y0, method="RK45",
                                 rtol=1e-8, atol=1e-10, dtype=dtype)
        wall = time.perf_counter() - t0
        y = np.asarray(res.y)
        print(f"{name:16s}: {B/wall:9.0f} IVPs/s (incl. compile), "
              f"success {float(np.mean(np.asarray(res.status) == 0)):.3f}, "
              f"y[0] = {y[0]}")

    # Events + in-device restarts work in dd too: event/restart functions
    # see plain f32 views of the state; event times keep f64 resolution.
    g, cor = 9.81, 0.8

    def ball(t, y):
        return ddm.stack([y[1], -g])

    def ground(t, y):       # y: plain f32 array (lowered view)
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -cor * y[1]])

    Bb = 4096 if jax.default_backend() == "tpu" else 512
    heights = np.linspace(1.0, 20.0, Bb)
    y0b = np.stack([heights, np.zeros(Bb)], axis=1)
    res = solve_ivp_ensemble(ball, (0.0, 10.0), y0b, method="RK45",
                             rtol=1e-9, atol=1e-9, dtype="dd",
                             events=[ground], event_capacity=16,
                             max_restarts=8)
    t1 = np.asarray(res.t_events)[:, 0, 0]
    err = np.max(np.abs(t1 - np.sqrt(2 * heights / g)))
    print(f"bouncing balls (dd): first-bounce time error vs analytic: "
          f"{err:.2e} (f64 time axis, f32-grade interpolation)")

    # Stiff dd: Radau over dd state with f32 Newton solves
    # (methods/dd_radau.py) — ~2.1x the plain-f64 Radau ensemble on chip.
    def vdp_stiff(t, y):  # plain RHS, auto-lifted
        return jnp.array([y[1], 1000.0 * (1.0 - y[0] ** 2) * y[1] - y[0]])

    Bs = 16384 if jax.default_backend() == "tpu" else 256
    y0s = np.array([2.0, 0.0]) + 0.02 * rng.standard_normal((Bs, 2))
    t0 = time.perf_counter()
    res = solve_ivp_ensemble(vdp_stiff, (0.0, 3000.0), y0s, method="Radau",
                             rtol=1e-4, atol=1e-6, dtype="dd")
    wall = time.perf_counter() - t0
    print(f"stiff VdP mu=1000 (dd Radau): {Bs/wall:8.0f} IVPs/s "
          f"(incl. compile), success "
          f"{float(np.mean(np.asarray(res.status) == 0)):.3f}")


if __name__ == "__main__":
    main()
