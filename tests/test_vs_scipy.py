"""Differential validation against scipy.integrate.solve_ivp itself.

The ported SciPy suite (test_scipy_suite.py) checks *semantics*; this file
checks *numbers*: the same problems solved by this framework and by SciPy's
own integrators must agree within the combined tolerance budget — an
external ground truth independent of our own formula ports.
"""
import numpy as np
import pytest
from scipy.integrate import solve_ivp as scipy_solve_ivp

import jax.numpy as jnp

import ivp_tpu
from ivp_tpu import solve_ivp


def _compare(fun_np, fun_jnp, t_span, y0, method, rtol, atol, comp_tol,
             scipy_method=None, jac_np=None, jac_jnp=None, points=()):
    ours = solve_ivp(fun_jnp, t_span, y0, method=method, rtol=rtol,
                     atol=atol, dense_output=bool(points), jac=jac_jnp)
    ref = scipy_solve_ivp(fun_np, t_span, y0, method=scipy_method or method,
                          rtol=rtol, atol=atol, dense_output=bool(points),
                          jac=jac_np)
    assert ours.success and ref.success
    np.testing.assert_allclose(np.asarray(ours.y[:, -1]), ref.y[:, -1],
                               rtol=0, atol=comp_tol)
    for tq in points:
        np.testing.assert_allclose(np.asarray(ours.sol(tq)), ref.sol(tq),
                                   rtol=0, atol=comp_tol * 10)
    return ours, ref


class TestAgainstSciPy:
    @pytest.mark.parametrize("method", ["RK23", "RK45", "DOP853"])
    def test_vdp_nonstiff(self, method):
        def f_np(t, y):
            return [y[1], (1.0 - y[0] ** 2) * y[1] - y[0]]

        def f_j(t, y):
            return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])

        _compare(f_np, f_j, (0.0, 20.0), [2.0, 0.0], method,
                 rtol=1e-9, atol=1e-11, comp_tol=1e-6,
                 points=(5.0, 13.7))

    @pytest.mark.parametrize("method", ["Radau", "BDF"])
    def test_robertson_stiff(self, method):
        def f_np(t, y):
            return [-0.04 * y[0] + 1e4 * y[1] * y[2],
                    0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                    3e7 * y[1] ** 2]

        def f_j(t, y):
            return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                              0.04 * y[0] - 1e4 * y[1] * y[2]
                              - 3e7 * y[1] ** 2,
                              3e7 * y[1] ** 2])

        ours, ref = _compare(f_np, f_j, (0.0, 100.0), [1.0, 0.0, 0.0],
                             method, rtol=1e-6, atol=1e-10, comp_tol=1e-6)
        # comparable work: within 2x of SciPy's RHS evaluations
        assert ours.nfev < 2 * ref.nfev + 100

    @pytest.mark.parametrize("method", ["RK45", "Radau"])
    def test_backward_linear(self, method):
        A = np.array([[-0.2, 1.0], [-1.0, -0.2]])

        def f_np(t, y):
            return A @ y

        def f_j(t, y):
            return jnp.asarray(A) @ y

        _compare(f_np, f_j, (5.0, 0.0), [0.3, -0.7], method,
                 rtol=1e-9, atol=1e-12, comp_tol=1e-7, points=(2.5,))

    def test_events_against_scipy(self):
        g = 9.81

        def f_np(t, y):
            return [y[1], -g]

        def f_j(t, y):
            return jnp.array([y[1], -g])

        def ev_np(t, y):
            return y[0]

        ev_np.terminal = True
        ev_np.direction = -1

        def ev_j(t, y):
            return y[0]

        ev_j.terminal = True
        ev_j.direction = -1

        ours = solve_ivp(f_j, (0.0, 10.0), [12.0, 3.0], method="RK45",
                         rtol=1e-10, atol=1e-12, events=[ev_j])
        ref = scipy_solve_ivp(f_np, (0.0, 10.0), [12.0, 3.0], method="RK45",
                              rtol=1e-10, atol=1e-12, events=[ev_np])
        np.testing.assert_allclose(np.asarray(ours.t_events[0]),
                                   ref.t_events[0], rtol=0, atol=1e-9)

    def test_stiff_with_jacobian(self):
        mu = 1000.0

        def f_np(t, y):
            return [y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]]

        def f_j(t, y):
            return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

        def j_np(t, y):
            return [[0.0, 1.0],
                    [-2.0 * mu * y[0] * y[1] - 1.0, mu * (1.0 - y[0] ** 2)]]

        def j_j(t, y):
            return jnp.array([[0.0, 1.0],
                              [-2.0 * mu * y[0] * y[1] - 1.0,
                               mu * (1.0 - y[0] ** 2)]])

        _compare(f_np, f_j, (0.0, 300.0), [2.0, 0.0], "Radau",
                 rtol=1e-6, atol=1e-8, comp_tol=2e-4,
                 jac_np=j_np, jac_jnp=j_j)
