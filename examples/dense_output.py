"""Dense output on the Lorenz system.

(Parity with reference examples/dense_output.py.)
"""
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu import solve_ivp

SIGMA, RHO, BETA = 10.0, 28.0, 8.0 / 3.0


def lorenz(t, y):
    x, yv, z = y
    return jnp.array([
        SIGMA * (yv - x),
        x * (RHO - z) - yv,
        x * yv - BETA * z,
    ])


def main():
    sol = solve_ivp(lorenz, (0.0, 20.0), [1.0, 1.0, 1.0], method="DOP853",
                    rtol=1e-10, atol=1e-12, dense_output=True)
    print(f"status: {sol.message}; accepted steps: {sol.naccpt}")
    ts = np.linspace(0.0, 20.0, 11)
    traj = sol.sol(ts)
    for t, col in zip(ts, traj.T):
        print(f"t = {t:5.2f}   y = {np.array2string(col, precision=5)}")


if __name__ == "__main__":
    main()
