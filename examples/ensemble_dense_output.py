"""Batched dense output: per-lane trajectories + a batched evaluator.

Round-3 headline feature: `solve_ivp_ensemble(dense_output=True)` records
every accepted step of every lane (bounded device buffers, host-drained) and
returns a `BatchOdeSolution` whose per-lane interpolants match the
single-IVP `OdeResult.sol` (reference src/solve/cont.rs:79-153 — per-step
dense output, here across a vmapped ensemble).
"""
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu.batch import solve_ivp_ensemble


def vdp(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def main():
    # 8 lanes with different initial conditions AND different tolerances —
    # every lane takes its own adaptive step sequence.
    B = 8
    rng = np.random.default_rng(0)
    y0 = np.array([2.0, 0.0]) + 0.3 * rng.standard_normal((B, 2))
    rtols = np.logspace(-9, -5, B)

    res = solve_ivp_ensemble(vdp, (0.0, 10.0), y0, method="RK45",
                             rtol=rtols, atol=1e-10, dense_output=True)
    counts = np.asarray(res.n_steps_rec)
    print("per-lane accepted steps:", counts.tolist())

    # Batched evaluation on a shared grid -> (B, n, m).
    ts = np.linspace(0.0, 10.0, 201)
    traj = res.sol(ts)
    print("trajectory tensor:", traj.shape)

    # Scalar query -> (B, n); per-lane grids -> (B, n, m).
    mid = res.sol(5.0)
    print("state at t=5 per lane:", np.round(mid[:, 0], 4).tolist())

    per_lane = np.stack([np.linspace(0.0, 2.0 + b, 5) for b in range(B)])
    print("per-lane-grid eval:", res.sol(per_lane).shape)

    # Raw step records (ragged, padded with validity counts).
    b = int(np.argmax(counts))
    print(f"lane {b} recorded t[:5] =",
          np.round(res.ts[b, :5], 4).tolist())


if __name__ == "__main__":
    main()
