"""End-state accuracy for all methods on problems with closed-form solutions.

Port of the reference Rust integration tests (reference tests/accuracy.rs,
tests/backward_and_bounds.rs) plus exponential-decay sanity checks.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp

PI = np.pi


def sho(t, y):
    """Simple harmonic oscillator: y'' = -y; y = [cos t, -sin t]."""
    return jnp.array([y[1], -y[0]])


def expdec(t, y):
    return -0.5 * y


ALL_METHODS = ["RK4", "RK23", "RK45", "DOP853", "Radau", "BDF"]
ADAPTIVE = ["RK23", "RK45", "DOP853", "Radau", "BDF"]

# end-state tolerance after one SHO period at rtol=atol=1e-9
# (reference tests/accuracy.rs:17-48; RK4 runs fixed-step)
TOLS = {"RK4": 1e-5, "RK23": 1e-5, "RK45": 1e-7, "DOP853": 1e-9,
        "Radau": 1e-6, "BDF": 1e-4}


@pytest.mark.parametrize("method", ALL_METHODS)
def test_sho_one_period(method):
    y0 = [1.0, 0.0]
    kwargs = dict(rtol=1e-9, atol=1e-9)
    if method == "RK4":
        kwargs = dict(first_step=2 * PI / 5000.0)
    res = solve_ivp(sho, (0.0, 2 * PI), y0, method=method, **kwargs)
    assert res.success, res.message
    yf = res.y[:, -1]
    assert abs(yf[0] - 1.0) < TOLS[method]
    assert abs(yf[1] - 0.0) < TOLS[method]
    assert np.isclose(res.t[-1], 2 * PI, atol=1e-12)


@pytest.mark.parametrize("method", ["RK45", "DOP853", "RK23"])
def test_exponential_decay(method):
    res = solve_ivp(expdec, (0.0, 10.0), [2.0, 4.0, 8.0], method=method,
                    rtol=1e-8, atol=1e-10)
    assert res.success
    expected = np.array([2.0, 4.0, 8.0]) * np.exp(-5.0)
    np.testing.assert_allclose(res.y[:, -1], expected, rtol=1e-6)


@pytest.mark.parametrize("method", ADAPTIVE)
def test_t_eval_exact_points(method):
    """Solver reports exactly the requested times (reference accuracy.rs:51-77)."""
    t_eval = np.linspace(0.0, 2 * PI, 17)
    res = solve_ivp(sho, (0.0, 2 * PI), [1.0, 0.0], method=method,
                    rtol=1e-9, atol=1e-9, t_eval=t_eval)
    assert res.success
    np.testing.assert_array_equal(res.t, t_eval)
    np.testing.assert_allclose(res.y[0], np.cos(t_eval), atol=2e-4)
    np.testing.assert_allclose(res.y[1], -np.sin(t_eval), atol=2e-4)


@pytest.mark.parametrize("method", ADAPTIVE)
def test_backward_integration(method):
    """Integrate SHO backward from 2*pi to 0 with dense mid-span evaluation
    (reference tests/backward_and_bounds.rs:6-32)."""
    res = solve_ivp(sho, (2 * PI, 0.0), [1.0, 0.0], method=method,
                    rtol=1e-9, atol=1e-9, dense_output=True)
    assert res.success
    assert res.t[0] == 2 * PI
    assert np.isclose(res.t[-1], 0.0, atol=1e-12)
    np.testing.assert_allclose(res.y[:, -1], [1.0, 0.0], atol=1e-4)
    tm = PI / 2
    ym = res.sol(tm)
    np.testing.assert_allclose(ym, [np.cos(tm), -np.sin(tm)], atol=1e-4)


def test_solution_stats_present():
    res = solve_ivp(expdec, (0.0, 1.0), [1.0], method="RK45")
    assert res.nfev > 0
    assert res.naccpt > 0
    assert res.nstep >= res.naccpt
    assert res.status == 0
