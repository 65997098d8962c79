"""Higher-index DAE tests for RADAU (reference radau.rs:210-246, 434-444).

The index-2/3 machinery (scal division by hhfac / hhfac^2 for the algebraic
components) was implemented in round 1 but only index-1 was exercised; these
tests back the README's "index-1/2/3 DAE" claim with Hairer's Cartesian
pendulum (Hairer & Wanner VII.7, the canonical index-3 test problem),
validated against an independent angle-coordinate ODE solution.

Pendulum (unit length, unit mass), state (x, y, vx, vy, lam):

    x'  = vx                     M = diag(1, 1, 1, 1, 0)
    y'  = vy
    vx' = -lam * x
    vy' = -lam * y - g
    0   = constraint             index-3: (x^2 + y^2 - 1) / 2
                                 index-2: x*vx + y*vy

Variable partition per Hairer's RADAU5 convention: positions are index-1,
velocities index-2, lam index-3 (index-3 form); in the index-2 form all four
differential variables are index-1 and lam is index-2.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp

G = 9.81
THETA0 = 1.0  # initial angle from vertical (radians)


def _angle_reference(tf):
    """Trusted solution: theta'' = -g sin(theta), solved by DOP853 at tight
    tolerance; returns (x, y, vx, vy) at tf."""
    def f(t, s):
        return jnp.array([s[1], -G * jnp.sin(s[0])])

    res = solve_ivp(f, (0.0, tf), [THETA0, 0.0], method="DOP853",
                    rtol=1e-12, atol=1e-14)
    th, om = res.y[:, -1]
    return (np.sin(th), -np.cos(th), om * np.cos(th), om * np.sin(th))


def _y0():
    x0, y0 = np.sin(THETA0), -np.cos(THETA0)
    # Consistent lam from the acceleration-level constraint at rest:
    # lam = |v|^2 - g*y = -g*y0.
    return np.array([x0, y0, 0.0, 0.0, -G * y0])


MASS = np.diag([1.0, 1.0, 1.0, 1.0, 0.0])


def test_pendulum_index3_radau():
    def f(t, s):
        x, y, vx, vy, lam = s
        return jnp.array([vx, vy, -lam * x, -lam * y - G,
                          0.5 * (x * x + y * y - 1.0)])

    tf = 1.5
    res = solve_ivp(f, (0.0, tf), _y0(), method="Radau",
                    mass=MASS, nind1=2, nind2=2, nind3=1,
                    rtol=1e-7, atol=1e-7)
    assert res.success, res.message
    xr, yr, vxr, vyr = _angle_reference(tf)
    np.testing.assert_allclose(res.y[:4, -1], [xr, yr, vxr, vyr], atol=2e-5)
    # The position constraint holds along the whole trajectory.
    cons = res.y[0] ** 2 + res.y[1] ** 2 - 1.0
    assert np.max(np.abs(cons)) < 1e-7
    # lam tracks |v|^2 - g*y (acceleration-level consistency).  Index-3
    # algebraic variables suffer order reduction in RADAU5 (Hairer & Wanner
    # VII.7: O(h) accuracy for the index-3 component), so lam is only
    # percent-level accurate at these tolerances while positions are ~1e-6.
    lam_expect = res.y[2] ** 2 + res.y[3] ** 2 - G * res.y[1]
    np.testing.assert_allclose(res.y[4], lam_expect, atol=0.05)


def test_pendulum_index2_radau():
    def f(t, s):
        x, y, vx, vy, lam = s
        return jnp.array([vx, vy, -lam * x, -lam * y - G,
                          x * vx + y * vy])

    tf = 1.5
    res = solve_ivp(f, (0.0, tf), _y0(), method="Radau",
                    mass=MASS, nind1=4, nind2=1,
                    rtol=1e-8, atol=1e-8)
    assert res.success, res.message
    xr, yr, vxr, vyr = _angle_reference(tf)
    np.testing.assert_allclose(res.y[:4, -1], [xr, yr, vxr, vyr], atol=2e-5)
    # The velocity-level constraint holds; position drift stays tiny over
    # this span (index-2 formulations drift at O(tol) rates).
    vcons = res.y[0] * res.y[2] + res.y[1] * res.y[3]
    assert np.max(np.abs(vcons)) < 1e-6
    pcons = res.y[0] ** 2 + res.y[1] ** 2 - 1.0
    assert np.max(np.abs(pcons)) < 1e-5


def test_pendulum_index3_dense_and_events():
    """Index-3 DAE composes with the rest of the surface: dense output and
    an event on the swing-through (x crossing zero upward)."""
    def f(t, s):
        x, y, vx, vy, lam = s
        return jnp.array([vx, vy, -lam * x, -lam * y - G,
                          0.5 * (x * x + y * y - 1.0)])

    def crossing(t, s):
        return s[0]
    crossing.direction = -1

    tf = 1.5
    res = solve_ivp(f, (0.0, tf), _y0(), method="Radau",
                    mass=MASS, nind1=2, nind2=2, nind3=1,
                    rtol=1e-7, atol=1e-7, dense_output=True,
                    events=[crossing])
    assert res.success
    # Dense output keeps the constraint on a fine grid.
    ts = np.linspace(0.0, tf, 101)
    traj = res.sol(ts)
    cons = traj[0] ** 2 + traj[1] ** 2 - 1.0
    assert np.max(np.abs(cons)) < 1e-6
    # The pendulum released at theta0=1 swings through the vertical (x=0,
    # moving in -x) at the quarter period of the nonlinear pendulum.
    assert len(res.t_events[0]) >= 1
    t_cross = res.t_events[0][0]

    def fth(t, s):
        return jnp.array([s[1], -G * jnp.sin(s[0])])

    def vertical(t, s):
        return s[0]
    vertical.direction = -1
    ref = solve_ivp(fth, (0.0, tf), [THETA0, 0.0], method="DOP853",
                    rtol=1e-12, atol=1e-14, events=[vertical])
    np.testing.assert_allclose(t_cross, ref.t_events[0][0], atol=1e-6)
