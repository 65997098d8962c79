"""Index-3 DAE: Cartesian pendulum solved by RADAU (M y' = f, singular M).

Beyond the reference's examples: demonstrates the DAE surface the reference
implements in radau.rs:210-246 (nind1/2/3 variable partition, mass matrix)
on Hairer & Wanner's canonical index-3 test problem.  The pendulum is
modelled by positions (x, y), velocities (vx, vy) and the Lagrange
multiplier lam enforcing x^2 + y^2 = 1:

    x'  = vx                    M = diag(1, 1, 1, 1, 0)
    y'  = vy
    vx' = -lam x
    vy' = -lam y - g
    0   = (x^2 + y^2 - 1)/2     <- index-3 algebraic constraint

Partition (RADAU5 convention): positions index-1, velocities index-2,
lam index-3.
"""
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu import solve_ivp

G = 9.81
THETA0 = 1.0  # release angle from vertical


def pendulum(t, s):
    x, y, vx, vy, lam = s
    return jnp.array([vx, vy, -lam * x, -lam * y - G,
                      0.5 * (x * x + y * y - 1.0)])


def main():
    x0, y0 = np.sin(THETA0), -np.cos(THETA0)
    # Consistent initialization: lam = |v|^2 - g*y at rest.
    s0 = np.array([x0, y0, 0.0, 0.0, -G * y0])
    M = np.diag([1.0, 1.0, 1.0, 1.0, 0.0])

    res = solve_ivp(pendulum, (0.0, 3.0), s0, method="Radau",
                    mass=M, nind1=2, nind2=2, nind3=1,
                    rtol=1e-7, atol=1e-7, dense_output=True)
    print(f"status={res.status}  steps={res.nstep}  nfev={res.nfev}  "
          f"nlu={res.nlu}")

    ts = np.linspace(0.0, 3.0, 7)
    traj = res.sol(ts)
    drift = np.abs(traj[0] ** 2 + traj[1] ** 2 - 1.0)
    print("t      x        y        |constraint drift|")
    for k, t in enumerate(ts):
        print(f"{t:4.1f}  {traj[0, k]: .5f}  {traj[1, k]: .5f}  "
              f"{drift[k]:.2e}")
    assert drift.max() < 1e-6, "constraint violated"
    print("constraint held to", f"{drift.max():.2e}")


if __name__ == "__main__":
    main()
