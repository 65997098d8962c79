"""Exponential decay — the minimal ivp_tpu example.

(Parity with reference examples/exponential_decay.{rs,py}.)
"""
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu import solve_ivp


def decay(t, y):
    return -0.5 * y


def main():
    sol = solve_ivp(decay, (0.0, 10.0), [2.0, 4.0, 8.0], method="RK45",
                    rtol=1e-8, atol=1e-10, dense_output=True)
    print(f"status: {sol.message}")
    print(f"nfev={sol.nfev}, accepted steps={sol.naccpt}")
    for t, y in zip(sol.t[::4], sol.y.T[::4]):
        print(f"t = {t:8.4f}   y = {np.array2string(y, precision=6)}")
    exact = np.array([2.0, 4.0, 8.0]) * np.exp(-5.0)
    print("final error:", np.abs(sol.y[:, -1] - exact).max())


if __name__ == "__main__":
    main()
