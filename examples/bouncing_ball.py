"""Bouncing ball: terminal event + host-level restart loop.

(Parity with reference examples/bouncing_ball.{rs,py}.)  The integration is
restarted after each terminal event with the post-impact velocity; the
while-loop carry is the checkpoint (SURVEY.md §5, checkpoint/resume).
"""
import jax.numpy as jnp

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu import solve_ivp

G = 9.81
RESTITUTION = 0.8


def ball(t, y):
    return jnp.array([y[1], -G])


def ground(t, y):
    return y[0]


ground.terminal = True
ground.direction = -1


def main():
    t0, y = 0.0, [10.0, 0.0]
    print("bounce  time        impact speed")
    for k in range(6):
        sol = solve_ivp(ball, (t0, t0 + 30.0), y, method="RK45",
                        rtol=1e-9, atol=1e-9, events=ground)
        if sol.status != 1:
            break
        t0 = float(sol.t_events[0][0])
        v_impact = float(sol.y_events[0][0][1])
        print(f"{k + 1:5d}  {t0:10.6f}  {abs(v_impact):10.6f}")
        y = [0.0, -RESTITUTION * v_impact]


def main_in_device():
    """The same physics as an ENSEMBLE, with every bounce handled inside the
    compiled loop: the event's ``restart`` attribute is the reference's
    ModifiedSolution control flag (src/solout.rs:73-78) fused on-device —
    thousands of balls bounce with zero host round-trips."""
    import numpy as np
    import jax
    from ivp_tpu.batch import build_ensemble_solver

    ground.restart = lambda t, y: jnp.array([0.0, -RESTITUTION * y[1]])
    B = 1024
    heights = np.linspace(2.0, 20.0, B)
    y0 = np.stack([heights, np.zeros(B)], axis=1)
    solver = jax.jit(build_ensemble_solver(
        ball, "RK45", n=2, events=[ground], event_capacity=16,
        max_restarts=8))
    res = solver(y0, 0.0, 15.0, 1e-9, 1e-9)
    nb = np.asarray(res.n_events)[:, 0]
    print(f"\nin-device ensemble: {B} balls, "
          f"bounces per ball {nb.min()}..{nb.max()}, "
          f"restarts {np.asarray(res.n_restarts).min()}.."
          f"{np.asarray(res.n_restarts).max()}")


if __name__ == "__main__":
    main()
    main_in_device()
