"""Unit tests for the pure-JAX linear algebra layer (core/linalg.py).

Covers the LU used by the implicit engines' large-n path and the explicit
inverses used by their small-n ensemble hot loop (reference parity target:
src/matrix/lu.rs, linear.rs inline tests lu.rs:304-404, linear.rs:219-254).

Includes regression coverage for this runtime's f64-multiply range bug
(products beyond ~3.4e38 return NaN/inf): the inverses must pre-scale, so
iteration matrices with 1/h ~ 1e6..1e12 entries stay exact.
"""
import numpy as np
import pytest
import jax.numpy as jnp
from jax import vmap

from ivp_tpu.core.linalg import (
    inv, inv_complex, lu_factor, lu_factor_complex, lu_solve,
    lu_solve_complex, matvec, solve_complex_inv)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 12, 20])
def test_lu_roundtrip(n):
    rng = np.random.default_rng(n)
    a = rng.standard_normal((n, n)) + 2 * np.eye(n)
    b = rng.standard_normal(n)
    (lu, P), sing = lu_factor(jnp.asarray(a))
    assert not bool(sing)
    x = lu_solve((lu, P), jnp.asarray(b))
    np.testing.assert_allclose(a @ np.asarray(x), b, atol=1e-10)


def test_lu_singular_flag():
    a = jnp.asarray(np.array([[1.0, 2.0], [2.0, 4.0]]))
    _, sing = lu_factor(a)
    assert bool(sing)


@pytest.mark.parametrize("n", [1, 2, 3, 6])
def test_lu_complex_roundtrip(n):
    rng = np.random.default_rng(n + 100)
    ar = rng.standard_normal((n, n)) + 3 * np.eye(n)
    ai = rng.standard_normal((n, n))
    br = rng.standard_normal(n)
    bi = rng.standard_normal(n)
    lu_piv, sing = lu_factor_complex(jnp.asarray(ar), jnp.asarray(ai))
    assert not bool(sing)
    xr, xi = lu_solve_complex(lu_piv, jnp.asarray(br), jnp.asarray(bi))
    z = np.linalg.solve(ar + 1j * ai, br + 1j * bi)
    np.testing.assert_allclose(np.asarray(xr), z.real, atol=1e-10)
    np.testing.assert_allclose(np.asarray(xi), z.imag, atol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 3, 6, 17, 32])
def test_lu_cpair_matches_numpy(n):
    """Complex-pair LU (half the flops/depth of the split-real embedding;
    Radau's E2 backend for n > 8) vs numpy's complex solve, including a
    pivoting-required case and large 1/h-scale entries."""
    from ivp_tpu.core.linalg import lu_factor_cpair, lu_solve_cpair

    rng = np.random.default_rng(n + 7)
    ar = rng.standard_normal((n, n))
    ai = rng.standard_normal((n, n))
    if n >= 2:
        ar[0, 0] = 0.0  # force a pivot swap at k=0
        ai[0, 0] = 0.0
    br = rng.standard_normal(n)
    bi = rng.standard_normal(n)
    rep, sing = lu_factor_cpair(jnp.asarray(ar), jnp.asarray(ai))
    assert not bool(sing)
    xr, xi = lu_solve_cpair(rep, jnp.asarray(br), jnp.asarray(bi))
    z = np.linalg.solve(ar + 1j * ai, br + 1j * bi)
    np.testing.assert_allclose(np.asarray(xr), z.real, atol=1e-9)
    np.testing.assert_allclose(np.asarray(xi), z.imag, atol=1e-9)

    # Radau E2-like scales: (alpha + i*beta)/h with h ~ 1e-6.
    e2r = 3.0e6 * np.eye(n) - ar
    e2i = 2.5e6 * np.eye(n)
    rep, sing = lu_factor_cpair(jnp.asarray(e2r), jnp.asarray(e2i))
    assert not bool(sing)
    xr, xi = lu_solve_cpair(rep, jnp.asarray(br), jnp.asarray(bi))
    z = np.linalg.solve(e2r + 1j * e2i, br + 1j * bi)
    np.testing.assert_allclose(np.asarray(xr), z.real, rtol=1e-9, atol=1e-16)
    np.testing.assert_allclose(np.asarray(xi), z.imag, rtol=1e-9, atol=1e-16)


def test_lu_cpair_singular_flag():
    from ivp_tpu.core.linalg import lu_factor_cpair

    a = np.zeros((3, 3))
    _, sing = lu_factor_cpair(jnp.asarray(a), jnp.asarray(a))
    assert bool(sing)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 12])
@pytest.mark.parametrize("scale", [1.0, 1e9, 1e-9])
def test_inv_matches_numpy(n, scale):
    if n > 3 and scale != 1.0:
        pytest.skip("LU path scale-independence covered by roundtrip tests")
    rng = np.random.default_rng(n)
    a = scale * (rng.standard_normal((n, n)) + 2 * np.eye(n))
    ainv, sing = inv(jnp.asarray(a))
    assert not bool(sing)
    np.testing.assert_allclose(np.asarray(ainv), np.linalg.inv(a),
                               rtol=1e-10, atol=1e-10 / scale)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 24])
@pytest.mark.parametrize("scale", [1.0, 1e9])
def test_inv_complex_matches_numpy(n, scale):
    if n > 3 and scale != 1.0:
        pytest.skip("LU path covered separately")
    rng = np.random.default_rng(n + 7)
    ar = scale * (rng.standard_normal((n, n)) + 3 * np.eye(n))
    ai = scale * rng.standard_normal((n, n))
    (br, bi), sing = inv_complex(jnp.asarray(ar), jnp.asarray(ai))
    assert not bool(sing)
    c = np.linalg.inv(ar + 1j * ai)
    np.testing.assert_allclose(np.asarray(br), c.real, rtol=1e-9,
                               atol=1e-9 / scale)
    np.testing.assert_allclose(np.asarray(bi), c.imag, rtol=1e-9,
                               atol=1e-9 / scale)


def test_inv_radau_e2_large_entries():
    """Regression: (alpha+i*beta)/h iteration matrix at h=1e-6 — |det|^2
    exceeds the broken-f64-product range; pre-scaling must keep it exact."""
    from ivp_tpu import tableaus as tab
    h = 1e-6
    J = np.array([[-0.04, 0, 0], [0.04, 0, 0], [0, 0, 0.0]])
    e2r = (tab.RADAU_ALPH / h) * np.eye(3) - J
    e2i = (tab.RADAU_BETA / h) * np.eye(3)
    (br, bi), sing = inv_complex(jnp.asarray(e2r), jnp.asarray(e2i))
    assert not bool(sing)
    c = np.linalg.inv(e2r + 1j * e2i)
    np.testing.assert_allclose(np.asarray(br), c.real, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(np.asarray(bi), c.imag, rtol=1e-12, atol=1e-18)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_inv_singular_flag(n):
    _, sing = inv(jnp.zeros((n, n)))
    assert bool(sing)
    (_, _), csing = inv_complex(jnp.zeros((n, n)), jnp.zeros((n, n)))
    assert bool(csing)


def test_inv_vmaps():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 3, 3)) + 2 * np.eye(3)
    ainv, sing = vmap(inv)(jnp.asarray(a))
    assert not bool(np.any(np.asarray(sing)))
    np.testing.assert_allclose(np.asarray(ainv), np.linalg.inv(a), atol=1e-10)
    x = rng.standard_normal((64, 3))
    got = vmap(matvec)(ainv, jnp.asarray(x))
    want = np.linalg.solve(a, x[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_solve_complex_inv():
    rng = np.random.default_rng(9)
    ar = rng.standard_normal((3, 3)) + 3 * np.eye(3)
    ai = rng.standard_normal((3, 3))
    binv, _ = inv_complex(jnp.asarray(ar), jnp.asarray(ai))
    br = rng.standard_normal(3)
    bi = rng.standard_normal(3)
    xr, xi = solve_complex_inv(binv, jnp.asarray(br), jnp.asarray(bi))
    z = np.linalg.solve(ar + 1j * ai, br + 1j * bi)
    np.testing.assert_allclose(np.asarray(xr), z.real, atol=1e-10)
    np.testing.assert_allclose(np.asarray(xi), z.imag, atol=1e-10)


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_linear_mode_equivalence(method):
    """The inverse and LU linear paths must agree on a stiff problem —
    same solution and (for Radau) identical step/eval counts."""
    from ivp_tpu import solve_ivp

    def rober(t, y):
        return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    ri = solve_ivp(rober, (0.0, 100.0), [1.0, 0.0, 0.0], method=method,
                   rtol=1e-6, atol=1e-8,
                   solver_options={"linear_mode": "inverse"})
    rl = solve_ivp(rober, (0.0, 100.0), [1.0, 0.0, 0.0], method=method,
                   rtol=1e-6, atol=1e-8,
                   solver_options={"linear_mode": "lu"})
    assert ri.success and rl.success
    np.testing.assert_allclose(np.asarray(ri.y[:, -1]),
                               np.asarray(rl.y[:, -1]), rtol=1e-6, atol=1e-12)
    assert abs(int(ri.nstep) - int(rl.nstep)) <= 2


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_linear_mode_equivalence_midsize(method):
    """Same check at n=12 — past the closed-form adjugate window, so the
    inverse backend goes through the multi-RHS LU substitution path
    (real for BDF, complex-pair for Radau's E2)."""
    from ivp_tpu import solve_ivp

    n = 12
    rng = np.random.default_rng(3)
    A = np.diag(-np.linspace(1.0, 40.0, n))
    A += 0.5 * rng.standard_normal((n, n)) / n
    Aj = jnp.asarray(A)

    def rhs(t, y):
        return Aj @ y + 0.1 * jnp.sin(y)

    y0 = np.linspace(0.5, 1.5, n)
    ri = solve_ivp(rhs, (0.0, 5.0), y0, method=method, rtol=1e-7, atol=1e-9,
                   solver_options={"linear_mode": "inverse"})
    rl = solve_ivp(rhs, (0.0, 5.0), y0, method=method, rtol=1e-7, atol=1e-9,
                   solver_options={"linear_mode": "lu"})
    assert ri.success and rl.success
    np.testing.assert_allclose(np.asarray(ri.y[:, -1]),
                               np.asarray(rl.y[:, -1]), rtol=1e-7, atol=1e-12)
    assert abs(int(ri.nstep) - int(rl.nstep)) <= 2


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_mixed_precision_newton(method):
    """newton_precision='mixed' (f32 factor/solves, f64 state/residuals)
    matches the full-precision result far inside the solver tolerance and
    takes the same number of steps (inexact-Newton solves ~1e-7 relative,
    orders below the Newton tolerance)."""
    from ivp_tpu import solve_ivp

    def rober(t, y):
        return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    rf = solve_ivp(rober, (0.0, 100.0), [1.0, 0.0, 0.0], method=method,
                   rtol=1e-6, atol=1e-8)
    rm = solve_ivp(rober, (0.0, 100.0), [1.0, 0.0, 0.0], method=method,
                   rtol=1e-6, atol=1e-8,
                   solver_options={"newton_precision": "mixed"})
    assert rm.success
    np.testing.assert_allclose(np.asarray(rm.y[:, -1]),
                               np.asarray(rf.y[:, -1]), rtol=1e-7)
    assert abs(int(rm.nstep) - int(rf.nstep)) <= 2


@pytest.mark.parametrize("n", [24, 40])
def test_lu_scan_branch_f32(n):
    """f32 LU above the f32 unroll window (UNROLL_N_F32=32) and inside it
    (n=24, unrolled where f64 would already scan): the dtype-dependent
    policy must give correct solves on both sides of both windows."""
    rng = np.random.default_rng(n)
    a = (rng.standard_normal((n, n)) + 2 * np.eye(n)).astype(np.float32)
    a[0, 0] = 0.0  # force a pivot swap at k=0
    b = rng.standard_normal(n).astype(np.float32)
    (lu, P), sing = lu_factor(jnp.asarray(a))
    assert lu.dtype == jnp.float32
    assert not bool(sing)
    x = lu_solve((lu, P), jnp.asarray(b))
    np.testing.assert_allclose(a @ np.asarray(x), b, atol=5e-4)


@pytest.mark.parametrize("n", [20, 40])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_lu_multi_rhs_scan_branch(n, dtype):
    """Multi-RHS scan substitutions (_lu_solve_cols via inv) above the
    unroll windows: inv(a) @ a == I for both dtypes at scan sizes."""
    rng = np.random.default_rng(n + 3)
    a = (rng.standard_normal((n, n)) + 3 * np.eye(n)).astype(dtype)
    ainv, sing = inv(jnp.asarray(a))
    assert not bool(sing)
    tol = 1e-9 if dtype == np.float64 else 2e-3
    np.testing.assert_allclose(np.asarray(ainv) @ a, np.eye(n), atol=tol)


@pytest.mark.parametrize("n", [40])
def test_lu_cpair_scan_branch_f32(n):
    """f32 complex-pair LU above the f32 unroll window: scan-based complex
    substitutions vs numpy's complex solve."""
    from ivp_tpu.core.linalg import lu_factor_cpair, lu_solve_cpair

    rng = np.random.default_rng(n + 11)
    ar = (rng.standard_normal((n, n)) + 3 * np.eye(n)).astype(np.float32)
    ai = rng.standard_normal((n, n)).astype(np.float32)
    br = rng.standard_normal(n).astype(np.float32)
    bi = rng.standard_normal(n).astype(np.float32)
    rep, sing = lu_factor_cpair(jnp.asarray(ar), jnp.asarray(ai))
    assert not bool(sing)
    xr, xi = lu_solve_cpair(rep, jnp.asarray(br), jnp.asarray(bi))
    z = np.linalg.solve(ar.astype(np.float64) + 1j * ai.astype(np.float64),
                        br.astype(np.float64) + 1j * bi.astype(np.float64))
    np.testing.assert_allclose(np.asarray(xr), z.real, atol=5e-3)
    np.testing.assert_allclose(np.asarray(xi), z.imag, atol=5e-3)
