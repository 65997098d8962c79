"""Arenstorf orbit in the Circular Restricted Three-Body Problem.

(Parity with reference examples/cr3bp.{rs,py}: DOP853 at rtol=1e-12 with
dense output; the classic Hairer/Norsett/Wanner benchmark orbit.)
"""
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu import solve_ivp

MU = 0.012277471  # Earth-Moon mass ratio


def cr3bp(t, state, mu):
    x, y, z, vx, vy, vz = state
    r1 = jnp.sqrt((x + mu) ** 2 + y ** 2 + z ** 2)
    r2 = jnp.sqrt((x - 1 + mu) ** 2 + y ** 2 + z ** 2)
    ax = x + 2 * vy - (1 - mu) * (x + mu) / r1 ** 3 - mu * (x - 1 + mu) / r2 ** 3
    ay = y - 2 * vx - (1 - mu) * y / r1 ** 3 - mu * y / r2 ** 3
    az = -(1 - mu) * z / r1 ** 3 - mu * z / r2 ** 3
    return jnp.array([vx, vy, vz, ax, ay, az])


def jacobi_constant(state, mu):
    x, y, z, vx, vy, vz = state
    r1 = np.sqrt((x + mu) ** 2 + y ** 2 + z ** 2)
    r2 = np.sqrt((x - 1 + mu) ** 2 + y ** 2 + z ** 2)
    U = 0.5 * (x ** 2 + y ** 2) + (1 - mu) / r1 + mu / r2
    return 2 * U - (vx ** 2 + vy ** 2 + vz ** 2)


def main():
    state0 = [0.994, 0, 0, 0, -2.00158510637908252240537862224, 0]
    period = 17.0652165601579625588917206249

    sol = solve_ivp(cr3bp, (0, period), state0, method="DOP853", args=(MU,),
                    rtol=1e-12, atol=1e-14, dense_output=True)

    C0 = jacobi_constant(state0, MU)
    Cf = jacobi_constant(sol.y[:, -1], MU)
    print("Arenstorf Orbit (Earth-Moon CR3BP)")
    print(f"Status: {sol.message}")
    print(f"nfev: {sol.nfev}, steps: {len(sol.t)}")
    print(f"Jacobi constant error: {abs(Cf - C0):.2e}")
    print(f"Position error at T: dx={abs(sol.y[0, -1] - state0[0]):.2e}, "
          f"dy={abs(sol.y[1, -1] - state0[1]):.2e}")


if __name__ == "__main__":
    main()
