"""Additional parity/robustness tests: f32 path, singular-mass DAE,
per-component vector tolerances (reference tests/ivp.rs:299-334)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp, solve_ivp_ensemble


def test_f32_ensemble_accuracy():
    """float32 ensemble at rtol 1e-5 stays within tolerance of the exact
    solution (the high-throughput bench path)."""
    B = 64
    rng = np.random.default_rng(0)
    lam = rng.uniform(0.2, 1.0, (B, 1))

    def dec(t, y):
        return -y

    y0 = lam  # decay from lam
    res = solve_ivp_ensemble(dec, (0.0, 3.0), y0, method="RK45",
                             rtol=1e-5, atol=1e-7, dtype=jnp.float32)
    exact = lam[:, 0] * np.exp(-3.0)
    np.testing.assert_allclose(np.asarray(res.y)[:, 0], exact, rtol=1e-4)


def test_singular_mass_index1_dae():
    """Index-1 DAE via a singular mass matrix (Radau):
    y0' = y1 ;  0 = y0 + y1 - 1   =>   y0' = 1 - y0."""
    M = np.array([[1.0, 0.0], [0.0, 0.0]])

    def f(t, y):
        return jnp.array([y[1], y[0] + y[1] - 1.0])

    y0 = [0.0, 1.0]  # consistent: y1 = 1 - y0
    res = solve_ivp(f, (0.0, 2.0), y0, method="Radau", mass=M,
                    rtol=1e-8, atol=1e-10)
    assert res.success, res.message
    y0_exact = 1.0 - np.exp(-2.0)
    np.testing.assert_allclose(res.y[0, -1], y0_exact, rtol=1e-6)
    np.testing.assert_allclose(res.y[1, -1], 1.0 - y0_exact, rtol=1e-6)


@pytest.mark.parametrize("method", ["RK45", "DOP853", "Radau", "BDF"])
def test_vector_rtol_changes_component_error(method):
    """Component-wise vector rtol actually changes per-component error
    (reference tests/ivp.rs:299-334)."""

    def f(t, y):
        return jnp.array([y[0], y[1]])

    t_span = (0.0, 4.0)
    y0 = [1.0, 1.0]
    exact = np.exp(4.0)

    res_a = solve_ivp(f, t_span, y0, method=method,
                      rtol=[1e-10, 1e-3], atol=1e-12)
    res_b = solve_ivp(f, t_span, y0, method=method,
                      rtol=[1e-3, 1e-10], atol=1e-12)
    # Both components integrate the same ODE; the strictly-toleranced one
    # must be more accurate in each run.
    err_a = np.abs(res_a.y[:, -1] - exact) / exact
    err_b = np.abs(res_b.y[:, -1] - exact) / exact
    # tighter overall error for run a component0 vs run b component0
    assert err_a[0] <= err_b[0] * 10
    assert err_b[1] <= err_a[1] * 10
    # vector tolerances give success in both orders
    assert res_a.success and res_b.success


def test_method_aliases():
    def f(t, y):
        return -y

    for name in ["rk45", "DOPRI5", "Radau5", "BDF15", "nonsense-falls-back"]:
        res = solve_ivp(f, (0.0, 1.0), [1.0], method=name)
        assert res.success


def test_dense_extrapolation_matches_scipy_convention():
    """OdeSolution extrapolates outside the covered span
    (reference src/python/solution.rs:109-139)."""

    def f(t, y):
        return -y

    res = solve_ivp(f, (0.0, 1.0), [1.0], method="RK45", rtol=1e-10,
                    atol=1e-12, dense_output=True)
    # inside
    np.testing.assert_allclose(res.sol(0.5)[0], np.exp(-0.5), rtol=1e-8)
    # extrapolate a bit beyond both ends: finite and continuous-ish
    before = res.sol(-0.05)[0]
    after = res.sol(1.05)[0]
    assert np.isfinite(before) and np.isfinite(after)
    np.testing.assert_allclose(after, np.exp(-1.05), rtol=1e-4)
    np.testing.assert_allclose(before, np.exp(0.05), rtol=1e-4)
    assert res.sol.t_min == 0.0 and res.sol.t_max == 1.0
