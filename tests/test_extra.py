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


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_f32_stiff_robertson(method):
    """float32 stiff path (reference f32 feature, lib.rs:78-85): Robertson
    at rtol 1e-4 matches the f64 solution to f32-appropriate accuracy."""
    def rober(t, y):
        return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    r32 = solve_ivp(rober, (0.0, 100.0), [1.0, 0.0, 0.0], method=method,
                    rtol=1e-4, atol=1e-8, dtype=jnp.float32)
    assert r32.success
    ref = np.array([6.172350e-01, 6.153594e-06, 3.827588e-01])
    np.testing.assert_allclose(np.asarray(r32.y[:, -1]), ref, rtol=2e-4)


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_f32_stiff_vdp100(method):
    """float32 vs float64 on moderately stiff Van der Pol (mu=100).

    Note: extremely stiff problems at large t (VdP mu=1000, t~800) exceed
    f32 *time* resolution for BDF's small layer steps — the same limitation
    the reference's all-f32 build has; Radau's larger order-5 steps clear it.
    """
    def vdp(t, y):
        return jnp.array([y[1], 100.0 * (1.0 - y[0] ** 2) * y[1] - y[0]])

    r32 = solve_ivp(vdp, (0.0, 200.0), [2.0, 0.0], method=method,
                    rtol=1e-4, atol=1e-6, dtype=jnp.float32)
    r64 = solve_ivp(vdp, (0.0, 200.0), [2.0, 0.0], method=method,
                    rtol=1e-4, atol=1e-6)
    assert r32.success and r64.success
    np.testing.assert_allclose(np.asarray(r32.y[:, -1]),
                               np.asarray(r64.y[:, -1]), rtol=2e-3, atol=1e-5)


def test_f32_stiff_vdp1000_radau():
    """float32 Radau handles the reference harness's stiff benchmark config
    (VdP mu=1000, t=[0,3000]) and matches f64 closely."""
    def vdp(t, y):
        return jnp.array([y[1], 1000.0 * (1.0 - y[0] ** 2) * y[1] - y[0]])

    r32 = solve_ivp(vdp, (0.0, 3000.0), [2.0, 0.0], method="Radau",
                    rtol=1e-4, atol=1e-6, dtype=jnp.float32)
    assert r32.success
    np.testing.assert_allclose(np.asarray(r32.y[:, -1]),
                               np.array([-1.51059381, 1.17834991e-03]),
                               rtol=1e-3, atol=1e-6)


def test_strict_dense_evaluation():
    """Rust-tier strict evaluation (reference solution.rs:25-71,
    cont.rs:79-117): sol/sol_many/sol_span range-check, while the SciPy-style
    callable extrapolates."""
    r = solve_ivp(lambda t, y: -y, (0.0, 2.0), [1.0], method="RK45",
                  dense_output=True)
    s = r.sol
    assert s.t_span() == (s.t_min, s.t_max)
    np.testing.assert_allclose(s.sol(1.0), np.exp(-1.0), rtol=1e-3)
    ts, ys = s.sol_span(0.5, 1.5, 5)
    np.testing.assert_allclose(ys[0], np.exp(-ts), rtol=1e-3)
    np.testing.assert_allclose(s.sol_many([0.0, 2.0])[0],
                               [1.0, np.exp(-2.0)], rtol=1e-3)
    with pytest.raises(ValueError):
        s.sol(2.5)
    with pytest.raises(ValueError):
        s.sol_many([0.5, -0.1])
    with pytest.raises(ValueError):
        s.sol_span(1.0, 3.0, 4)
    # the SciPy-style callable still extrapolates (solution.rs:109-139)
    assert np.isfinite(s(2.5)[0])


def test_grouped_fd_eps_scales_with_dtype():
    """f32 grouped FD must perturb above the f32 ulp: the f64 eps constant
    (1.49e-8) rounds away under f32 arithmetic and returned an identically
    zero Jacobian (the dd tier's sparse-Jacobian path)."""
    from ivp_tpu.core.sparsity import make_grouped_fd_jac

    n = 6
    pat = np.eye(n) + np.eye(n, k=1) + np.eye(n, k=-1)

    def rhs32(t, y):
        return jnp.asarray(-2.0 * y + 0.5 * jnp.roll(y, 1), jnp.float32)

    jac_fn, _ = make_grouped_fd_jac(rhs32, pat, n, jnp.float32)
    J = np.asarray(jac_fn(0.0, 1.7 * jnp.ones((n,), jnp.float32)))
    np.testing.assert_allclose(J.diagonal()[1:], -2.0, rtol=1e-3)
    np.testing.assert_allclose(np.diag(J, -1), 0.5, rtol=1e-3)

    def rhs64(t, y):
        return -2.0 * y + 0.5 * jnp.roll(y, 1)

    jac64, _ = make_grouped_fd_jac(rhs64, pat, n, jnp.float64)
    J64 = np.asarray(jac64(0.0, 1.7 * jnp.ones((n,))))
    np.testing.assert_allclose(J, J64, atol=2e-3)
