"""Bouncing ball: terminal event + host-level restart loop.

(Parity with reference examples/bouncing_ball.{rs,py}.)  The integration is
restarted after each terminal event with the post-impact velocity; the
while-loop carry is the checkpoint (SURVEY.md §5, checkpoint/resume).
"""
import jax.numpy as jnp

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


if __name__ == "__main__":
    main()
