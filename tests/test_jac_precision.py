"""f32 Jacobian under mixed-precision Newton (jac_precision).

When the stiff engines factor in f32 (newton_precision="mixed"), the
Jacobian build/evaluation drops to f32 too ("auto"): J only enters the
iteration matrices, which are rounded to f32 at the factor boundary anyway
(reference keeps one f64 tier throughout, src/methods/radau.rs:368-417 /
bdf.rs:356-383 — the precision split is the TPU redesign).  These tests pin
the contract: step-for-step parity with jac_precision="state" on the stiff
benchmarks, and strict validation of the option strings.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp
from ivp_tpu.batch import build_ensemble_solver


def _vdp(t, y):
    return jnp.array([y[1], 1000.0 * ((1 - y[0] ** 2) * y[1]) - y[0]])


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_mixed_f32_jac_matches_state_jac(method):
    """f32 Jacobian evaluation must not change the step sequence on the
    stiff VdP benchmark (the factored operator differs by < one f32 ulp
    from the state-jac mixed path)."""
    out = {}
    for jp in ("state", "auto"):
        r = solve_ivp(_vdp, (0.0, 60.0), [2.0, 0.0], method=method,
                      rtol=1e-4, atol=1e-6,
                      solver_options={"newton_precision": "mixed",
                                      "jac_precision": jp})
        assert r.success
        out[jp] = r
    assert out["auto"].nstep == out["state"].nstep
    np.testing.assert_allclose(np.asarray(out["auto"].y[:, -1]),
                               np.asarray(out["state"].y[:, -1]),
                               rtol=1e-3, atol=1e-6)


def test_mixed_f32_jac_ensemble_brusselator():
    """Mid-size mixed ensemble (the workload the lever targets): analytic
    jac evaluated in f32, results against the full-f64 engine."""
    N = 8
    n = 2 * N
    A, B, alpha = 1.0, 3.0, 0.02

    def rhs(t, y):
        u, v = y[:N], y[N:]
        lap = lambda w: jnp.roll(w, -1) - 2 * w + jnp.roll(w, 1)
        du = A + u * u * v - (B + 1) * u + alpha * lap(u)
        dv = B * u - u * u * v + alpha * lap(v)
        return jnp.concatenate([du, dv])

    y0 = jnp.concatenate([jnp.full((N,), 1.5), jnp.full((N,), 3.0)])
    y0b = jnp.tile(y0, (4, 1))
    ref = None
    for opts in ({}, {"newton_precision": "mixed"}):
        solver = build_ensemble_solver(rhs, "Radau", n=n,
                                       solver_options=opts or None)
        res = solver(y0b, 0.0, 2.0, 1e-5, 1e-7)
        assert bool(jnp.all(res.status == 0))
        if ref is None:
            ref = np.asarray(res.y)
        else:
            np.testing.assert_allclose(np.asarray(res.y), ref,
                                       rtol=1e-3, atol=1e-5)


def test_jac_precision_validation():
    with pytest.raises(ValueError, match="jac_precision"):
        solve_ivp(_vdp, (0.0, 1.0), [2.0, 0.0], method="Radau",
                  solver_options={"jac_precision": "Float32x"})
    # float32 jac requires an f32 factorization
    with pytest.raises(ValueError, match="factor"):
        solve_ivp(_vdp, (0.0, 1.0), [2.0, 0.0], method="Radau",
                  solver_options={"jac_precision": "float32"})


def test_state_jac_is_default_without_mixed():
    """Plain f64 stiff solves keep the f64 Jacobian (jac_precision='auto'
    only drops to f32 when the factorization is f32)."""
    r = solve_ivp(_vdp, (0.0, 100.0), [2.0, 0.0], method="Radau",
                  rtol=1e-6, atol=1e-9)
    r2 = solve_ivp(_vdp, (0.0, 100.0), [2.0, 0.0], method="Radau",
                   rtol=1e-6, atol=1e-9,
                   solver_options={"jac_precision": "state"})
    assert r.nstep == r2.nstep
    np.testing.assert_allclose(np.asarray(r.y[:, -1]),
                               np.asarray(r2.y[:, -1]), rtol=0, atol=0)
