"""Event detection tests — ported from the reference suite
(reference tests/test_events.py, tests/ivp.rs:151-275)."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_, assert_allclose, assert_equal

from ivp_tpu import solve_ivp

ALL = ["RK23", "RK45", "DOP853", "Radau", "BDF"]


def fun_rational(t, y):
    return jnp.array([y[1] / t, y[1] * (y[0] + 2 * y[1] - 1) / (t * (y[0] - 1))])


def sol_rational(t):
    t = np.asarray(t)
    return np.asarray((t / (t + 10), 10 * t / (t + 10) ** 2))


@pytest.mark.parametrize("method", ALL)
def test_events_two_functions(method):
    def event_rational_1(t, y):
        return y[0] - y[1] ** 0.7

    def event_rational_2(t, y):
        return y[1] ** 0.6 - y[0]

    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(event_rational_1, event_rational_2))
    assert_equal(res.status, 0)
    assert_equal(len(res.t_events[0]), 1)
    assert_equal(len(res.t_events[1]), 1)
    assert_(5.3 < res.t_events[0][0] < 5.7)
    assert_(7.3 < res.t_events[1][0] < 7.7)
    # y_events should satisfy the event equations at the roots
    assert_allclose(res.y_events[0][0][0] - res.y_events[0][0][1] ** 0.7,
                    0.0, atol=1e-10)


def test_terminal_event():
    def event_rational_3(t, y):
        return t - 7.4

    event_rational_3.terminal = True

    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method='RK45',
                    events=event_rational_3, dense_output=True)
    assert_equal(res.status, 1)
    assert res.success
    assert_equal(len(res.t_events[0]), 1)
    assert_(7.3 < res.t_events[0][0] < 7.5)
    # integration truncated at the event
    assert_allclose(res.t[-1], res.t_events[0][0], rtol=0, atol=1e-10)


def test_event_direction_positive():
    def ev(t, y):
        return y[0] - y[1] ** 0.7

    ev.direction = 1
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method='RK45',
                    events=ev)
    assert_equal(res.status, 0)
    assert_equal(len(res.t_events[0]), 1)
    assert_(5.3 < res.t_events[0][0] < 5.7)


def test_event_direction_negative():
    def ev(t, y):
        return y[0] - y[1] ** 0.7

    ev.direction = -1
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method='RK45',
                    events=ev)
    assert_equal(res.status, 0)
    assert_equal(len(res.t_events[0]), 0)


@pytest.mark.parametrize("method", ["RK45", "DOP853", "Radau"])
def test_sho_zero_crossings_terminal_count(method):
    """SHO y0=cos crosses zero at pi/2, 3pi/2; terminate at the second
    crossing (reference tests/ivp.rs:151-275)."""

    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    def crossing(t, y):
        return y[0]

    crossing.terminal = 2  # scipy >= 1.11 integer terminal count
    res = solve_ivp(sho, (0.0, 4 * np.pi), [1.0, 0.0], method=method,
                    rtol=1e-9, atol=1e-9, events=crossing)
    assert_equal(res.status, 1)
    assert_equal(len(res.t_events[0]), 2)
    assert_allclose(res.t_events[0], [np.pi / 2, 3 * np.pi / 2], rtol=1e-6)
    assert_allclose(res.t[-1], 3 * np.pi / 2, rtol=1e-6)


def test_sho_direction_filtering():
    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    def crossing(t, y):
        return y[0]

    def pos(t, y):
        return y[0]

    pos.direction = 1

    def neg(t, y):
        return y[0]

    neg.direction = -1

    res = solve_ivp(sho, (0.0, 2 * np.pi), [1.0, 0.0], method="RK45",
                    rtol=1e-9, atol=1e-9, events=[crossing, pos, neg])
    assert_allclose(res.t_events[0], [np.pi / 2, 3 * np.pi / 2], rtol=1e-6)
    assert_allclose(res.t_events[1], [3 * np.pi / 2], rtol=1e-6)
    assert_allclose(res.t_events[2], [np.pi / 2], rtol=1e-6)


def test_duplicate_timestamps():
    """Upward cannon with tiny max_step (reference tests/test_events.py:144-160,
    from scipy)."""

    def upward_cannon(t, y):
        return jnp.array([y[1], -9.80665])

    def hit_ground(t, y):
        return y[0]

    hit_ground.terminal = True
    hit_ground.direction = -1

    sol = solve_ivp(upward_cannon, [0, np.inf], [0, 0.01],
                    max_step=0.05 * 0.001 / 9.80665,
                    events=hit_ground, dense_output=True)
    assert_allclose(sol.sol(0.01), np.asarray([-0.00039033, -0.08806632]),
                    rtol=1e-5, atol=1e-8)
    assert_allclose(sol.t_events[0], np.asarray([0.00203943]), rtol=1e-5,
                    atol=1e-8)
    assert sol.success
    assert_equal(sol.status, 1)


def test_bouncing_ball_restart():
    """Terminal event + host-level restart loop (reference
    examples/bouncing_ball.py): the while-loop carry is the checkpoint."""
    g = 9.81

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1

    t0, y = 0.0, [10.0, 0.0]
    bounce_times = []
    for _ in range(3):
        res = solve_ivp(ball, (t0, t0 + 20.0), y, method="RK45",
                        rtol=1e-9, atol=1e-9, events=ground)
        assert res.status == 1
        t0 = float(res.t_events[0][0])
        bounce_times.append(t0)
        yf = res.y_events[0][0]
        y = [0.0, -0.8 * float(yf[1])]  # restitution

    # First impact at sqrt(2*h/g)
    t1 = np.sqrt(2 * 10.0 / g)
    assert_allclose(bounce_times[0], t1, rtol=1e-6)
    # Subsequent flight times scale by the restitution factor (0.8)
    dt1 = bounce_times[1] - bounce_times[0]
    dt2 = bounce_times[2] - bounce_times[1]
    assert_allclose(dt1, 2 * 0.8 * t1, rtol=1e-5)
    assert_allclose(dt2 / dt1, 0.8, rtol=1e-5)


def test_backward_events():
    """Events during backward integration (scipy test_ivp.py backward event
    matrix)."""

    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    def crossing(t, y):
        return y[0]

    res = solve_ivp(sho, (2 * np.pi, 0.0), [1.0, 0.0], method="RK45",
                    rtol=1e-9, atol=1e-9, events=crossing)
    assert res.success
    assert_allclose(np.sort(res.t_events[0]), [np.pi / 2, 3 * np.pi / 2],
                    rtol=1e-6)


def test_solve_ivp_in_device_restart():
    """solve_ivp max_restarts: bouncing ball integrated in ONE compiled
    call — every bounce handled by the event's .restart map in-loop
    (ModifiedSolution analog; cf. the host-loop variant in
    examples/bouncing_ball.py)."""
    g = 9.81
    cor = 0.8

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -cor * y[1]])

    r = solve_ivp(ball, (0.0, 12.0), [10.0, 0.0], method="RK45", rtol=1e-9,
                  atol=1e-9, events=[ground], max_restarts=10)
    assert r.n_restarts == 10
    t1 = np.sqrt(2 * 10.0 / g)
    v0 = np.sqrt(2 * g * 10.0)
    tb = np.asarray(r.t_events[0])
    np.testing.assert_allclose(tb[0], t1, atol=1e-9)
    np.testing.assert_allclose(tb[1], t1 + 2 * cor * v0 / g, atol=1e-9)
    # budget exhausted before tf => interrupt at the 11th bounce
    assert r.status == 1


def test_restart_dense_output_segments():
    """Regression: dense output / t_eval across an in-device restart must
    evaluate the post-restart segments, not the truncated step's interpolant
    extended past the event point (segment edges come from the recorded
    endpoints)."""
    g = 9.81
    cor = 0.8

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -cor * y[1]])

    t1 = np.sqrt(2 * 10.0 / g)     # first bounce
    v1 = cor * np.sqrt(2 * g * 10.0)
    grid = np.linspace(t1 + 0.01, t1 + 0.5, 9)  # shortly AFTER the bounce
    r = solve_ivp(ball, (0.0, 5.0), [10.0, 0.0], method="RK45", rtol=1e-9,
                  atol=1e-9, events=[ground], max_restarts=4,
                  dense_output=True, t_eval=grid)
    # exact post-bounce arc: y = v1*(t-t1) - g/2 (t-t1)^2  (positive!)
    dt = grid - t1
    exact = v1 * dt - 0.5 * g * dt ** 2
    np.testing.assert_allclose(r.y[0], exact, rtol=1e-7, atol=1e-9)
    assert np.all(r.y[0] > 0)  # the pre-bounce parabola would be negative
    np.testing.assert_allclose(np.asarray(r.sol(grid))[0], exact,
                               rtol=1e-7, atol=1e-9)


def test_restart_preserves_other_event_counters():
    """Regression: a restart resets only the restarting event's hit counter;
    another event's accumulated terminal count survives bounces."""
    g = 9.81

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -0.8 * y[1]])

    def apex(t, y):           # velocity zero-crossing going down
        return y[1]

    apex.terminal = 3          # stop at the 3rd apex
    apex.direction = -1

    r = solve_ivp(ball, (0.0, 30.0), [10.0, 0.0], method="RK45", rtol=1e-9,
                  atol=1e-9, events=[ground, apex], max_restarts=10)
    # one apex per bounce arc: the 3rd apex terminates the run even though
    # ground restarts keep resetting their own counter in between
    assert r.status == 1
    assert len(np.asarray(r.t_events[1])) == 3
    assert r.n_restarts < 10


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_in_device_restart_stiff_engines(method):
    """In-device restarts through the implicit engines: the cond-gated
    re-init rebuilds the Jacobian/difference-array state at the restart
    point (sawtooth relaxation: y' = -k y, replenish to 1 at y = 0.5)."""
    k = 50.0

    def decay(t, y):
        return -k * y

    def low(t, y):
        return y[0] - 0.5

    low.terminal = True
    low.direction = -1
    low.restart = lambda t, y: jnp.ones_like(y)

    period = np.log(2.0) / k
    r = solve_ivp(decay, (0.0, 10 * period * 1.01), [1.0], method=method,
                  rtol=1e-8, atol=1e-10, events=[low], max_restarts=20)
    tb = np.asarray(r.t_events[0])
    assert tb.size >= 5
    # crossings are equally spaced by ln(2)/k
    np.testing.assert_allclose(np.diff(tb[:5]), period, rtol=1e-6)
    np.testing.assert_allclose(tb[0], period, rtol=1e-6)
