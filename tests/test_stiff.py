"""Stiff integration tests (Radau, BDF) — ported from the reference suite
(reference tests/test_stiff.py), with RHS written in JAX idiom (traced
``jnp.where`` instead of Python branches)."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_, assert_allclose, assert_equal

from ivp_tpu import solve_ivp


def fun_linear(t, y):
    return jnp.array([-y[0] - 5 * y[1], y[0] + y[1]])


def jac_linear():
    return np.array([[-1.0, -5.0], [1.0, 1.0]])


def sol_linear(t):
    return np.vstack((-5 * np.sin(2 * t), 2 * np.cos(2 * t) + np.sin(2 * t)))


def compute_error(y, y_true, rtol, atol):
    e = (y - y_true) / (atol + rtol * np.abs(y_true))
    return np.linalg.norm(e, axis=0) / np.sqrt(e.shape[0])


def fun_robertson(t, state):
    x, y, z = state
    return jnp.array([
        -0.04 * x + 1e4 * y * z,
        0.04 * x - 1e4 * y * z - 3e7 * y * y,
        3e7 * y * y,
    ])


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_integration_const_jac(method):
    rtol, atol = 1e-3, 1e-6
    res = solve_ivp(fun_linear, [0, 2], [0, 2], rtol=rtol, atol=atol,
                    method=method, dense_output=True, jac=jac_linear())
    assert_equal(res.t[0], 0)
    assert_(res.success)
    assert_equal(res.status, 0)
    assert_(res.nfev < 100)
    assert_equal(res.njev, 0)  # constant jacobian => no jac evals reported
    y_true = sol_linear(res.t)
    e = compute_error(res.y, y_true, rtol, atol)
    assert_(np.all(e < 10))


@pytest.mark.parametrize("method,njev_budget", [("Radau", 200), ("BDF", 600)])
def test_integration_stiff_robertson(method, njev_budget):
    """Robertson problem over [0, 1e8] — the stiff efficiency gate
    (reference tests/test_stiff.py:95-143): nfev < 5000, bounded njev."""
    res = solve_ivp(fun_robertson, [0, 1e8], [1e4, 0, 0], rtol=1e-6,
                    atol=1e-6, method=method)
    assert res.success, res.message
    assert res.nfev < 5000, res.nfev
    assert res.njev < njev_budget, res.njev
    # terminal composition: x+y+z conserved
    assert_allclose(np.sum(res.y[:, -1]), 1e4, rtol=1e-5)


def fun_medazko(t, y):
    """Medakzo diffusion-reaction problem, JAX form (reference
    tests/test_ivp.py:83-107, phi branch as a traced where)."""
    n = y.shape[0] // 2
    k = 100.0
    c = 4.0
    phi = jnp.where(t <= 5.0, 2.0, 0.0)
    y_ext = jnp.concatenate([jnp.stack([phi, jnp.zeros_like(phi)]), y, y[-2:-1]])

    d = 1.0 / n
    j = jnp.arange(1, n + 1)
    alpha = 2 * (j * d - 1) ** 3 / c ** 2
    beta = (j * d - 1) ** 4 / c ** 2

    j_2_p1 = 2 * j + 2
    j_2_m3 = 2 * j - 2
    j_2_m1 = 2 * j
    j_2 = 2 * j + 1

    f_even = (alpha * (y_ext[j_2_p1] - y_ext[j_2_m3]) / (2 * d)
              + beta * (y_ext[j_2_m3] - 2 * y_ext[j_2_m1] + y_ext[j_2_p1]) / d ** 2
              - k * y_ext[j_2_m1] * y_ext[j_2])
    f_odd = -k * y_ext[j_2] * y_ext[j_2_m1]
    return jnp.stack([f_even, f_odd], axis=1).reshape(-1)


def medazko_sparsity(n):
    """Jacobian sparsity pattern (reference tests/test_ivp.py:110-138)."""
    from scipy.sparse import coo_matrix
    cols, rows = [], []
    i = np.arange(n) * 2
    cols.append(i[1:]); rows.append(i[1:] - 2)
    cols.append(i); rows.append(i)
    cols.append(i); rows.append(i + 1)
    cols.append(i[:-1]); rows.append(i[:-1] + 2)
    i = np.arange(n) * 2 + 1
    cols.append(i); rows.append(i)
    cols.append(i); rows.append(i - 1)
    cols = np.hstack(cols)
    rows = np.hstack(rows)
    return coo_matrix((np.ones_like(cols), (cols, rows)))


@pytest.mark.parametrize("method", ["BDF", "Radau"])
def test_integration_sparse_difference(method):
    """Medakzo n=200 (400 states) with grouped-FD sparse Jacobian
    (reference tests/test_stiff.py:146-183; sparsity: src/python/sparsity.rs).

    The narrow-band pattern auto-selects the cyclic-reduction banded
    backend (core/block_tridiag.py): warm runtime 1.3 s vs 25 s for the
    dense LU path at n=200 on CPU (18.6x) — no longer marked slow."""
    n = 200
    y0 = np.zeros(2 * n)
    y0[1::2] = 1
    res = solve_ivp(fun_medazko, [0, 20], y0, method=method,
                    jac_sparsity=medazko_sparsity(n))
    assert_equal(res.t[0], 0)
    assert_(res.success)
    assert_equal(res.status, 0)
    assert_allclose(res.y[78, -1], 0.233994e-3, rtol=1e-2)
    assert_allclose(res.y[79, -1], 0, atol=1e-3)


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_van_der_pol_stiff(method):
    """Van der Pol mu=1000 over [0, 3000] (reference benches/benchmark.py:118-126
    config; examples/van_der_pol)."""
    mu = 1000.0

    def vdp(t, y):
        return jnp.array([y[1], mu * ((1.0 - y[0] ** 2) * y[1]) - y[0]])

    res = solve_ivp(vdp, [0, 3000.0], [2.0, 0.0], method=method,
                    rtol=1e-4, atol=1e-6)
    assert res.success, res.message
    # The limit cycle has amplitude ~2.00 in y0.
    assert 1.5 < abs(res.y[0, -1]) < 2.3
    assert res.nfev < 200_000


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_callable_jac(method):
    def jac(t, y):
        return jnp.array([[-1.0, -5.0], [1.0, 1.0]])

    res = solve_ivp(fun_linear, [0, 2], [0, 2], rtol=1e-3, atol=1e-6,
                    method=method, jac=jac)
    assert res.success
    assert res.njev > 0
    y_true = sol_linear(res.t)
    e = compute_error(res.y, y_true, 1e-3, 1e-6)
    assert_(np.all(e < 10))
