"""Stiff Van der Pol oscillator with the implicit solvers.

(Parity with reference examples/van_der_pol.{rs,py}: eps=1e-3 formulation,
BDF and Radau vs DOP853.)
"""
import time

import jax.numpy as jnp

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu import solve_ivp

EPS = 1e-3  # stiffness parameter (mu = 1/eps)


def vdp(t, y):
    return jnp.array([y[1], ((1.0 - y[0] ** 2) * y[1] - y[0]) / EPS])


def main():
    t_span = (0.0, 2.0)
    y0 = [2.0, 0.0]
    for method in ("BDF", "Radau", "DOP853"):
        start = time.perf_counter()
        sol = solve_ivp(vdp, t_span, y0, method=method, rtol=1e-8, atol=1e-8)
        wall = time.perf_counter() - start
        print(f"{method:8s} status={sol.status} nfev={sol.nfev:6d} "
              f"njev={sol.njev:4d} nlu={sol.nlu:4d} steps={sol.naccpt:6d} "
              f"y(T)={sol.y[:, -1]} ({wall:.2f}s incl. compile)")


if __name__ == "__main__":
    main()
