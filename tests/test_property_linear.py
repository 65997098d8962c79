"""Property-style correctness net: random linear systems with exact solutions.

For y' = A y the exact solution is expm(t A) y0 — a ground truth independent
of any integrator.  Random (seeded) stable systems are solved across every
method and precision tier and checked against the matrix exponential; this
catches silent formula/mask regressions that fixed test problems can miss.
"""
import numpy as np
import pytest
from scipy.linalg import expm

import jax.numpy as jnp

import ivp_tpu  # noqa: F401
from ivp_tpu import solve_ivp_ensemble

N = 4
TF = 2.0


def _random_stable(seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((N, N))
    # shift spectrum left for stability (keeps some oscillation)
    A = A - (np.max(np.linalg.eigvals(A).real) + 0.3) * np.eye(N)
    return A


def _solve(method, dtype, A, y0b, rtol, atol):
    Aj = jnp.asarray(A)

    def rhs(t, y):
        return Aj @ y

    return solve_ivp_ensemble(rhs, (0.0, TF), y0b, method=method, rtol=rtol,
                              atol=atol, dtype=dtype)


CASES = [
    ("RK23", jnp.float64, 1e-7, 1e-9, 1e-4),
    ("RK45", jnp.float64, 1e-9, 1e-11, 1e-6),
    ("DOP853", jnp.float64, 1e-10, 1e-12, 1e-7),
    ("Radau", jnp.float64, 1e-8, 1e-10, 1e-5),
    ("BDF", jnp.float64, 1e-8, 1e-10, 5e-5),
    ("RK45", "dd", 1e-9, 1e-11, 1e-6),
    ("Radau", "dd", 1e-8, 1e-10, 1e-5),
    ("BDF", "dd", 1e-8, 1e-10, 5e-5),
]


@pytest.mark.parametrize("method,dtype,rtol,atol,tol", CASES,
                         ids=[f"{m}-{d if isinstance(d, str) else 'f64'}"
                              for m, d, *_ in CASES])
def test_random_linear_vs_expm(method, dtype, rtol, atol, tol):
    A = _random_stable(7)
    rng = np.random.default_rng(11)
    y0b = rng.standard_normal((5, N))
    res = _solve(method, dtype, A, y0b, rtol, atol)
    assert np.all(np.asarray(res.status) == 0)
    exact = (expm(TF * A) @ y0b.T).T
    scale = np.max(np.abs(exact))
    np.testing.assert_allclose(np.asarray(res.y), exact, rtol=0,
                               atol=tol * max(scale, 1.0))


class TestLogisticClosedForm:
    """Nonlinear closed-form net: logistic growth y' = y(1-y) with
    y(t) = 1 / (1 + (1/y0 - 1) e^{-t}), across precision tiers including
    the f64-time/f32-state hybrid."""

    @pytest.mark.parametrize("method,dtype,kw,tol", [
        ("RK45", None, {}, 1e-8),              # default f64
        ("RK45", "dd", {}, 1e-8),
        ("BDF", None, {}, 1e-5),
        ("RK45", jnp.float32,
         {"time_dtype": jnp.float64}, 5e-5),   # hybrid
    ], ids=["f64", "dd", "bdf-f64", "hybrid-f32"])
    def test_logistic(self, method, dtype, kw, tol):
        def rhs(t, y):
            return y * (1.0 - y)

        y0 = np.array([[0.1], [0.5], [0.9]])
        tf = 4.0
        res = solve_ivp_ensemble(rhs, (0.0, tf), y0, method=method,
                                 rtol=1e-9 if tol < 1e-4 else 1e-7,
                                 atol=1e-12, dtype=dtype, **kw)
        assert np.all(np.asarray(res.status) == 0)
        exact = 1.0 / (1.0 + (1.0 / y0[:, 0] - 1.0) * np.exp(-tf))
        np.testing.assert_allclose(np.asarray(res.y)[:, 0], exact,
                                   rtol=0, atol=tol)
