"""SciPy-derived compatibility suite.

Port of the reference's tests/test_ivp.py (itself adapted from SciPy v1.16.2's
test_ivp.py) — the compatibility contract (SURVEY.md §4).  Adaptations for the
JAX-native framework:

* RHS / jac / event callables are written with jnp (they are traced into the
  compiled loop); the scipy-sparse analytic-jac variant returns a dense jnp
  array (sparse *constant* jacs still go through scipy's .toarray()).
* The "RHS raises outside t-span" regression tests (gh-17341/8848/9198) can't
  raise inside a traced function; they are ported as NaN-poisoning tests: any
  evaluation outside the bound would contaminate the (finite) result.
"""
from itertools import product

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_, assert_allclose, assert_equal
from scipy.sparse import csc_matrix

from ivp_tpu import solve_ivp

METHODS = ['RK23', 'RK45', 'DOP853', 'Radau', 'BDF']


def fun_zero(t, y):
    return jnp.zeros_like(y)


def fun_linear(t, y):
    return jnp.array([-y[0] - 5 * y[1], y[0] + y[1]])


def jac_linear():
    return np.array([[-1, -5], [1, 1]])


def sol_linear(t):
    return np.vstack((-5 * np.sin(2 * t), 2 * np.cos(2 * t) + np.sin(2 * t)))


def fun_rational(t, y):
    return jnp.array([y[1] / t,
                      y[1] * (y[0] + 2 * y[1] - 1) / (t * (y[0] - 1))])


def fun_rational_vectorized(t, y):
    y0, y1 = y[0], y[1]
    return jnp.vstack((y1 / t, y1 * (y0 + 2 * y1 - 1) / (t * (y0 - 1))))


def jac_rational(t, y):
    return jnp.array([
        [0 * t, 1 / t],
        [-2 * y[1] ** 2 / (t * (y[0] - 1) ** 2),
         (y[0] + 4 * y[1] - 1) / (t * (y[0] - 1))]
    ])


def sol_rational(t):
    t = np.asarray(t)
    return np.asarray((t / (t + 10), 10 * t / (t + 10) ** 2))


def compute_error(y, y_true, rtol, atol):
    e = (y - y_true) / (atol + rtol * np.abs(y_true))
    return np.linalg.norm(e, axis=0) / np.sqrt(e.shape[0])


@pytest.mark.parametrize("vectorized", [False, True])
@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("t_span", [[5, 9], [5, 1]])
@pytest.mark.parametrize("jac", [None, jac_rational])
def test_integration(vectorized, method, t_span, jac):
    rtol = 1e-3
    atol = 1e-6
    y0 = [1 / 3, 2 / 9]
    fun = fun_rational_vectorized if vectorized else fun_rational

    res = solve_ivp(fun, t_span, y0, rtol=rtol, atol=atol, method=method,
                    dense_output=True, jac=jac, vectorized=vectorized)
    assert_equal(res.t[0], t_span[0])
    assert_(res.t_events is None)
    assert_(res.y_events is None)
    assert_(res.success)
    assert_equal(res.status, 0)

    if method == 'DOP853':
        assert_(res.nfev < 50)

    if method in ['RK23', 'RK45', 'DOP853']:
        assert_equal(res.njev, 0)
        assert_equal(res.nlu, 0)
    else:
        assert_(0 < res.njev)
        assert_(0 < res.nlu)

    y_true = sol_rational(res.t)
    e = compute_error(res.y, y_true, rtol, atol)
    assert_(np.all(e < 5))

    tc = np.linspace(*t_span)
    yc_true = sol_rational(tc)
    yc = res.sol(tc)
    e = compute_error(yc, yc_true, rtol, atol)
    assert_(np.all(e < 5))

    tc = (t_span[0] + t_span[-1]) / 2
    yc_true = sol_rational(tc)
    yc = res.sol(tc)
    e = compute_error(yc, yc_true, rtol, atol)
    assert_(np.all(e < 5))

    assert_allclose(res.sol(res.t), res.y, rtol=1e-13, atol=1e-13)


def test_integration_const_jac():
    rtol = 1e-3
    atol = 1e-6
    y0 = [0, 2]
    t_span = [0, 2]
    J = jac_linear()
    J_sparse = csc_matrix(J)

    for method, jac in product(['Radau', 'BDF'], [J, J_sparse]):
        res = solve_ivp(fun_linear, t_span, y0, rtol=rtol, atol=atol,
                        method=method, dense_output=True, jac=jac)
        assert_equal(res.t[0], t_span[0])
        assert_(res.t_events is None)
        assert_(res.success)
        assert_equal(res.status, 0)
        assert_(res.nfev < 100)
        assert_equal(res.njev, 0)

        y_true = sol_linear(res.t)
        e = compute_error(res.y, y_true, rtol, atol)
        assert_(np.all(e < 10))

        tc = np.linspace(*t_span)
        yc_true = sol_linear(tc)
        yc = res.sol(tc)
        e = compute_error(yc, yc_true, rtol, atol)
        if method == 'BDF':
            assert_(np.all(e < 60))
        else:
            assert_(np.all(e < 15))

        assert_allclose(res.sol(res.t), res.y, rtol=1e-13, atol=1e-13)


def _ev1(t, y):
    return y[0] - y[1] ** 0.7


def _ev2(t, y):
    return y[1] ** 0.6 - y[0]


def _ev3(t, y):
    return t - 7.4


@pytest.mark.parametrize("method", METHODS)
def test_events_full_matrix(method):
    """The full forward event matrix (reference test_ivp.py:345-518)."""
    def e1(t, y):
        return _ev1(t, y)

    def e2(t, y):
        return _ev2(t, y)

    def e3(t, y):
        return _ev3(t, y)

    e3.terminal = True

    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(e1, e2))
    assert_equal(res.status, 0)
    assert_equal(len(res.t_events[0]), 1)
    assert_equal(len(res.t_events[1]), 1)
    assert_(5.3 < res.t_events[0][0] < 5.7)
    assert_(7.3 < res.t_events[1][0] < 7.7)
    assert_equal(res.y_events[0].shape, (1, 2))
    assert_equal(res.y_events[1].shape, (1, 2))
    assert np.isclose(_ev1(res.t_events[0][0], res.y_events[0][0]), 0, atol=1e-5)
    assert np.isclose(_ev2(res.t_events[1][0], res.y_events[1][0]), 0, atol=1e-5)

    e1.direction = 1
    e2.direction = 1
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(e1, e2))
    assert_equal(res.status, 0)
    assert_equal(len(res.t_events[0]), 1)
    assert_equal(len(res.t_events[1]), 0)
    assert_(5.3 < res.t_events[0][0] < 5.7)

    e1.direction = -1
    e2.direction = -1
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(e1, e2))
    assert_equal(res.status, 0)
    assert_equal(len(res.t_events[0]), 0)
    assert_equal(len(res.t_events[1]), 1)
    assert_(7.3 < res.t_events[1][0] < 7.7)

    e1.direction = 0
    e2.direction = 0
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(e1, e2, e3), dense_output=True)
    assert_equal(res.status, 1)
    assert_equal(len(res.t_events[0]), 1)
    assert_equal(len(res.t_events[1]), 0)
    assert_equal(len(res.t_events[2]), 1)
    assert_(5.3 < res.t_events[0][0] < 5.7)
    assert_(7.3 < res.t_events[2][0] < 7.5)

    # termination by event doesn't break interpolants
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=e1, dense_output=True)
    assert_equal(res.status, 0)
    tc = np.linspace(res.t[0], res.t[-1])
    yc = res.sol(tc)
    e = compute_error(yc, sol_rational(tc), 1e-3, 1e-6)
    assert_(np.all(e < 5))
    assert np.allclose(sol_rational(res.t_events[0][0]), res.y_events[0][0],
                       rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("method", METHODS)
def test_events_backward(method):
    def e1(t, y):
        return _ev1(t, y)

    def e2(t, y):
        return _ev2(t, y)

    def e3(t, y):
        return _ev3(t, y)

    e3.terminal = True

    res = solve_ivp(fun_rational, [8, 5], [4 / 9, 20 / 81], method=method,
                    events=(e1, e2))
    assert_equal(res.status, 0)
    assert_equal(len(res.t_events[0]), 1)
    assert_equal(len(res.t_events[1]), 1)
    assert_(5.3 < res.t_events[0][0] < 5.7)
    assert_(7.3 < res.t_events[1][0] < 7.7)

    e1.direction = -1
    e2.direction = -1
    res = solve_ivp(fun_rational, [8, 5], [4 / 9, 20 / 81], method=method,
                    events=(e1, e2))
    assert_equal(len(res.t_events[0]), 1)
    assert_equal(len(res.t_events[1]), 0)
    assert_(5.3 < res.t_events[0][0] < 5.7)

    e1.direction = 1
    e2.direction = 1
    res = solve_ivp(fun_rational, [8, 5], [4 / 9, 20 / 81], method=method,
                    events=(e1, e2))
    assert_equal(len(res.t_events[0]), 0)
    assert_equal(len(res.t_events[1]), 1)
    assert_(7.3 < res.t_events[1][0] < 7.7)

    e1.direction = 0
    e2.direction = 0
    res = solve_ivp(fun_rational, [8, 5], [4 / 9, 20 / 81], method=method,
                    events=(e1, e2, e3), dense_output=True)
    assert_equal(res.status, 1)
    assert_equal(len(res.t_events[0]), 0)
    assert_equal(len(res.t_events[1]), 1)
    assert_equal(len(res.t_events[2]), 1)
    assert_(7.3 < res.t_events[1][0] < 7.7)
    assert_(7.3 < res.t_events[2][0] < 7.5)

    tc = np.linspace(res.t[-1], res.t[0])
    yc = res.sol(tc)
    e = compute_error(yc, sol_rational(tc), 1e-3, 1e-6)
    assert_(np.all(e < 5))


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("t_span", [[5, 9], [5, 1]])
def test_max_step(method, t_span):
    rtol, atol = 1e-3, 1e-6
    y0 = [1 / 3, 2 / 9]
    res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, max_step=0.5,
                    atol=atol, method=method, dense_output=True)
    assert_equal(res.t[0], t_span[0])
    assert_equal(res.t[-1], t_span[-1])
    assert_(np.all(np.abs(np.diff(res.t)) <= 0.5 + 1e-15))
    assert_(res.t_events is None)
    assert_(res.success)
    assert_equal(res.status, 0)

    y_true = sol_rational(res.t)
    e = compute_error(res.y, y_true, rtol, atol)
    assert_(np.all(e < 5))

    tc = np.linspace(*t_span)
    yc = res.sol(tc)
    e = compute_error(yc, sol_rational(tc), rtol, atol)
    assert_(np.all(e < 5))
    assert_allclose(res.sol(res.t), res.y, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("t_span", [[5, 9], [5, 1]])
def test_first_step(method, t_span):
    rtol, atol = 1e-3, 1e-6
    y0 = [1 / 3, 2 / 9]
    first_step = 0.1
    res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, max_step=0.5,
                    atol=atol, method=method, dense_output=True,
                    first_step=first_step)
    assert_equal(res.t[0], t_span[0])
    assert_equal(res.t[-1], t_span[-1])
    assert_allclose(first_step, np.abs(res.t[1] - 5))
    assert_(res.success)
    assert_equal(res.status, 0)

    y_true = sol_rational(res.t)
    e = compute_error(res.y, y_true, rtol, atol)
    assert_(np.all(e < 5))

    tc = np.linspace(*t_span)
    yc = res.sol(tc)
    e = compute_error(yc, sol_rational(tc), rtol, atol)
    assert_(np.all(e < 5))
    assert_allclose(res.sol(res.t), res.y, rtol=1e-13, atol=1e-13)


def test_t_eval():
    rtol, atol = 1e-3, 1e-6
    y0 = [1 / 3, 2 / 9]
    for t_span in ([5, 9], [5, 1]):
        t_eval = np.linspace(t_span[0], t_span[1], 10)
        res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                        t_eval=t_eval)
        assert_equal(res.t, t_eval)
        assert_(res.t_events is None)
        assert_(res.success)
        assert_equal(res.status, 0)
        e = compute_error(res.y, sol_rational(res.t), rtol, atol)
        assert_(np.all(e < 5))

    t_eval = [5, 5.01, 7, 8, 8.01, 9]
    res = solve_ivp(fun_rational, [5, 9], y0, rtol=rtol, atol=atol,
                    t_eval=t_eval)
    assert_equal(res.t, t_eval)
    assert_(res.success)
    e = compute_error(res.y, sol_rational(res.t), rtol, atol)
    assert_(np.all(e < 5))

    t_eval = [5, 4.99, 3, 1.5, 1.1, 1.01, 1]
    res = solve_ivp(fun_rational, [5, 1], y0, rtol=rtol, atol=atol,
                    t_eval=t_eval)
    assert_equal(res.t, t_eval)
    assert_(res.success)

    t_eval = [5.01, 7, 8, 8.01]
    res = solve_ivp(fun_rational, [5, 9], y0, rtol=rtol, atol=atol,
                    t_eval=t_eval)
    assert_equal(res.t, t_eval)
    assert_(res.success)
    e = compute_error(res.y, sol_rational(res.t), rtol, atol)
    assert_(np.all(e < 5))

    t_eval = [4.99, 3, 1.5, 1.1, 1.01]
    res = solve_ivp(fun_rational, [5, 1], y0, rtol=rtol, atol=atol,
                    t_eval=t_eval)
    assert_equal(res.t, t_eval)
    assert_(res.success)

    with pytest.raises(ValueError):
        solve_ivp(fun_rational, [5, 9], y0, rtol=rtol, atol=atol,
                  t_eval=[4, 6])


def test_t_eval_dense_output():
    rtol, atol = 1e-3, 1e-6
    y0 = [1 / 3, 2 / 9]
    t_span = [5, 9]
    t_eval = np.linspace(t_span[0], t_span[1], 10)
    res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                    t_eval=t_eval)
    res_d = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                      t_eval=t_eval, dense_output=True)
    assert_equal(res.t, t_eval)
    assert_equal(res.t, res_d.t)
    assert_equal(res.y, res_d.y)
    assert_(res_d.success)
    assert_equal(res_d.status, 0)
    e = compute_error(res.y, sol_rational(res.t), rtol, atol)
    assert_(np.all(e < 5))


@pytest.mark.parametrize("method", METHODS)
def test_t_eval_early_event(method):
    def early_event(t, y):
        return t - 7

    early_event.terminal = True

    res = solve_ivp(fun_rational, [5, 9], [1 / 3, 2 / 9], rtol=1e-3,
                    atol=1e-6, method=method, t_eval=np.linspace(7.5, 9, 16),
                    events=early_event, jac=jac_rational)
    assert res.success
    assert res.status == 1
    assert len(res.t_events) == 1
    assert res.t_events[0].size == 1
    assert_allclose(res.t_events[0][0], 7, rtol=0, atol=1e-11)


@pytest.mark.parametrize("method", METHODS)
def test_no_integration(method):
    sol = solve_ivp(lambda t, y: -y, [4, 4], [2, 3],
                    method=method, dense_output=True)
    assert_equal(sol.sol(4), [2, 3])
    assert_equal(sol.sol([4, 5, 6]), [[2, 2, 2], [3, 3, 3]])


@pytest.mark.parametrize("method", METHODS)
def test_empty(method):
    def fun(t, y):
        return jnp.zeros((0,))

    y0 = np.zeros((0,))
    sol = solve_ivp(fun, [0, 10], y0, method=method, dense_output=True)
    assert_equal(sol.sol(10), np.zeros((0,)))
    assert_equal(sol.sol([1, 2, 3]), np.zeros((0, 3)))

    sol = solve_ivp(fun, [0, np.inf], y0, method=method, dense_output=True)
    assert_equal(sol.sol(10), np.zeros((0,)))
    assert_equal(sol.sol([1, 2, 3]), np.zeros((0, 3)))


def test_args():
    # (x, y) linear oscillator; z nonlinear first-order system
    # (reference test_ivp.py:731-821)
    def sys3(t, w, omega, k, zfinal):
        x, y, z = w
        return jnp.array([-omega * y, omega * x, k * z * (1 - z)])

    def sys3_jac(t, w, omega, k, zfinal):
        x, y, z = w
        return jnp.array([[0.0 * t, -omega + 0.0 * t, 0.0 * t],
                          [omega + 0.0 * t, 0.0 * t, 0.0 * t],
                          [0.0 * t, 0.0 * t, k * (1 - 2 * z)]])

    def sys3_x0decreasing(t, w, omega, k, zfinal):
        return w[0]

    def sys3_y0increasing(t, w, omega, k, zfinal):
        return w[1]

    def sys3_zfinal(t, w, omega, k, zfinal):
        return w[2] - zfinal

    sys3_x0decreasing.direction = -1
    sys3_y0increasing.direction = 1
    sys3_zfinal.terminal = True

    omega = 2
    k = 4
    tfinal = 5
    zfinal = 0.99
    z0 = np.exp(-k * tfinal) / ((1 - zfinal) / zfinal + np.exp(-k * tfinal))
    w0 = [0, -1, z0]
    tend = 2 * tfinal

    sol = solve_ivp(sys3, [0, tend], w0,
                    events=[sys3_x0decreasing, sys3_y0increasing, sys3_zfinal],
                    dense_output=True, args=(omega, k, zfinal),
                    method='Radau', jac=sys3_jac, rtol=1e-10, atol=1e-13)

    x0events_t = sol.t_events[0]
    y0events_t = sol.t_events[1]
    zfinalevents_t = sol.t_events[2]
    assert_allclose(x0events_t, [0.5 * np.pi, 1.5 * np.pi])
    assert_allclose(y0events_t, [0.25 * np.pi, 1.25 * np.pi])
    assert_allclose(zfinalevents_t, [tfinal], rtol=1e-5, atol=1e-5)

    t = np.linspace(0, float(zfinalevents_t[0]), 250)
    w = sol.sol(t)
    assert_allclose(w[0], np.sin(omega * t), rtol=1e-5, atol=1e-6)
    assert_allclose(w[1], -np.cos(omega * t), rtol=1e-5, atol=1e-6)
    assert_allclose(w[2], 1 / (((1 - z0) / z0) * np.exp(-k * t) + 1),
                    rtol=1e-5, atol=1e-6)

    x0events = sol.sol(x0events_t)
    y0events = sol.sol(y0events_t)
    zfinalevents = sol.sol(zfinalevents_t)
    assert_allclose(x0events[0], np.zeros_like(x0events[0]), atol=1e-13)
    assert_allclose(x0events[1], np.ones_like(x0events[1]), atol=1e-6)
    assert_allclose(y0events[0], np.ones_like(y0events[0]), atol=1e-6)
    assert_allclose(y0events[1], np.zeros_like(y0events[1]), atol=1e-13)
    assert_allclose(zfinalevents[2], [zfinal], atol=1e-6)


def test_array_rtol():
    def f(t, y):
        return jnp.array([y[0], y[1]])

    sol = solve_ivp(f, (0, 1), [1., 1.], rtol=[1e-1, 1e-1])
    err1 = np.abs(np.linalg.norm(sol.y[:, -1] - np.exp(1)))
    sol = solve_ivp(f, (0, 1), [1., 1.], rtol=[1e-1, 1e-16])
    err2 = np.abs(np.linalg.norm(sol.y[:, -1] - np.exp(1)))
    assert err2 < err1


@pytest.mark.parametrize('method', METHODS)
def test_integration_zero_rhs(method):
    result = solve_ivp(fun_zero, [0, 10], np.ones(3), method=method)
    assert_(result.success)
    assert_equal(result.status, 0)
    assert_allclose(result.y, 1.0, rtol=1e-15)


def test_args_single_value():
    def fun_with_arg(t, y, a):
        return a * y

    sol = solve_ivp(fun_with_arg, (0, 0.1), [1], args=(-1,))
    assert_allclose(sol.y[0, -1], np.exp(-0.1))


@pytest.mark.parametrize('method', METHODS)
def test_zero_interval(method):
    def f(t, y):
        return 2 * y

    res = solve_ivp(f, (0.0, 0.0), np.array([1.0]), method=method)
    assert res.success
    assert_allclose(res.y[0, -1], 1.0)


# --- t-bound regression tests (gh-17341 / gh-8848 / gh-9198), ported as
# NaN-poisoning: any RHS evaluation outside the interval contaminates the
# result irrecoverably under the branchless traced loop. ---

@pytest.mark.parametrize('method', METHODS)
def test_tbound_respected_small_interval(method):
    SMALL = 1e-4

    def f(t, y):
        return jnp.where(t > SMALL * (1 + 1e-12), jnp.nan, 2 * y)

    res = solve_ivp(f, (0.0, SMALL), np.array([1]), method=method)
    assert res.success
    assert np.all(np.isfinite(res.y))


@pytest.mark.parametrize('method', METHODS)
def test_tbound_respected_larger_interval(method):
    def V(r):
        return -11 / r + 10 * r / (0.05 + r ** 2)

    def func(t, p):
        bad = (t < -17.0000001) | (t > 2.0000001)
        P, Q = p[0], p[1]
        r = jnp.exp(t)
        dPdr = r * Q
        dQdr = -2.0 * r * ((-0.2 - V(r)) * P + 1 / r * Q)
        return jnp.where(bad, jnp.nan, jnp.array([dPdr, dQdr]))

    result = solve_ivp(func, (-17, 2), y0=np.array([1, -11]), max_step=0.03,
                       atol=1e-8, rtol=1e-5, method=method)
    assert result.success
    assert np.all(np.isfinite(result.y))


@pytest.mark.parametrize('method', METHODS)
def test_tbound_respected_oscillator(method):
    def reactions_func(t, y):
        yprime = jnp.array([1.73307544e-02, 6.49376470e-06, 0.0, 0.0])
        return jnp.where(t > 200.0000001, jnp.nan, yprime)

    init_state = np.array([134.08298555, 138.82348612, 100., 0.])
    result = solve_ivp(reactions_func, (100.0, 200.0), init_state,
                       dense_output=True, max_step=100.0, method=method)
    assert result.success
    assert np.all(np.isfinite(result.y))
