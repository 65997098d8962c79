"""Forward-mode sensitivities through the compiled solvers.

The integration drivers are pure traced programs, so ``jax.jvp``/``jacfwd``
propagate tangents through the full adaptive ``lax.while_loop`` — initial-
condition and parameter sensitivities of the *numerical* solution map come
for free, with no variational equations written by hand.  (Reverse mode is
not supported through ``lax.while_loop``; use forward mode — state/param
dimensions are small for IVPs, so forward is the right direction anyway.)

No counterpart exists in the reference (a Rust library cannot differentiate
through its integrators); this is framework capability the TPU build gets
from the functional design.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ivp_tpu  # noqa: F401
from ivp_tpu.batch import build_ensemble_solver


def vdp(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


class TestForwardSensitivity:
    def test_ic_jacobian_matches_fd(self):
        solver = build_ensemble_solver(vdp, "RK45", n=2)

        def final_state(y0_lane):
            res = solver(y0_lane[None, :], 0.0, 5.0, 1e-9, 1e-12)
            return res.y[0]

        y0 = jnp.asarray([2.0, 0.0])
        J = np.asarray(jax.jacfwd(final_state)(y0))
        eps = 1e-6
        base = np.asarray(final_state(y0))
        Jfd = np.zeros((2, 2))
        for j in range(2):
            Jfd[:, j] = (np.asarray(final_state(y0 + eps * jnp.eye(2)[j]))
                         - base) / eps
        np.testing.assert_allclose(J, Jfd, rtol=0, atol=5e-5)

    def test_parameter_sensitivity_matches_fd(self):
        def vdp_mu(t, y, mu):
            return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

        solver = build_ensemble_solver(vdp_mu, "RK45", n=2,
                                       args=(jnp.ones(1),),
                                       args_batched=True)

        def final(mu_scalar):
            res = solver(jnp.asarray([[2.0, 0.0]]), 0.0, 5.0, 1e-10, 1e-12,
                         batched_args=(mu_scalar[None],))
            return res.y[0]

        mu0 = jnp.asarray(1.0)
        dy = np.asarray(jax.jacfwd(final)(mu0))
        eps = 1e-6
        fd = (np.asarray(final(mu0 + eps))
              - np.asarray(final(mu0 - eps))) / (2 * eps)
        np.testing.assert_allclose(dy, fd, rtol=0, atol=1e-6)

    def test_batched_sensitivities_vmap(self):
        # jacfwd composes with the ensemble batch axis: per-lane Jacobians.
        solver = build_ensemble_solver(vdp, "RK45", n=2)

        def final_state(y0_lane):
            res = solver(y0_lane[None, :], 0.0, 3.0, 1e-9, 1e-12)
            return res.y[0]

        y0s = jnp.asarray([[2.0, 0.0], [1.0, 0.5], [0.5, -0.2]])
        Js = jax.vmap(jax.jacfwd(final_state))(y0s)
        assert Js.shape == (3, 2, 2)
        # lane 0 equals the unbatched Jacobian
        J0 = jax.jacfwd(final_state)(y0s[0])
        np.testing.assert_allclose(np.asarray(Js[0]), np.asarray(J0),
                                   rtol=0, atol=1e-12)
        assert np.all(np.isfinite(np.asarray(Js)))


class TestTangentRangeSafety:
    """Regression tests for the TPU emulated-f64 range hazard in jvp paths.

    On the TPU runtime, f64 products beyond the f32 range (~3.4e38) are NaN
    (docs/TPU_NOTES.md #14).  The default jvp of ``a/b`` forms ``b**2``, so
    hinit's tangent NaN-poisoned every forward sensitivity at tight
    tolerances on chip (dnf ~ 1e22 -> dnf**2 ~ 1e45) while CPU stayed green.
    hinit now routes through custom-jvp helpers whose tangents use the
    log-derivative form (ratios only, no squared denominators); these tests
    pin the tangent *formulas* (exactness vs analytic), which CPU can check.
    """

    def test_ratio_sqrt_tangent_analytic(self):
        from ivp_tpu.core.common import _ratio_sqrt
        a, b = jnp.float64(9.9e17), jnp.float64(4.0e22)
        da, db = jnp.float64(3.0e17), jnp.float64(-2.0e22)
        r, dr = jax.jvp(_ratio_sqrt, (a, b), (da, db))
        expect = float(jnp.sqrt(a / b)) * 0.5 * (float(da / a) - float(db / b))
        np.testing.assert_allclose(float(r), float(jnp.sqrt(a / b)), rtol=0)
        np.testing.assert_allclose(float(dr), expect, rtol=1e-12)

    def test_inv_pow_tangent_analytic(self):
        from ivp_tpu.core.common import _inv_pow
        d = jnp.float64(2.0e21)  # d**2 would exceed the emulation range
        r, dr = jax.jvp(lambda d: _inv_pow(d, 0.01, 0.2), (d,),
                        (jnp.float64(1.0e21),))
        np.testing.assert_allclose(float(r), float((0.01 / d) ** 0.2), rtol=0)
        expect = -0.2 * float((0.01 / d) ** 0.2) * (1.0e21 / 2.0e21)
        np.testing.assert_allclose(float(dr), expect, rtol=1e-12)

    def test_tight_tolerance_jacfwd_finite(self):
        # The chip repro config (rtol 1e-9 NaN'd pre-fix); on CPU this pins
        # hinit's jvp path end-to-end against finite differences.
        solver = build_ensemble_solver(vdp, "RK45", n=2)

        def final_state(y0_lane):
            return solver(y0_lane[None, :], 0.0, 3.0, 1e-12, 1e-14).y[0]

        y0 = jnp.array([2.0, 0.0])
        J = jax.jacfwd(final_state)(y0)
        assert np.all(np.isfinite(np.asarray(J)))
        eps = 1e-7
        for j in range(2):
            e = np.zeros(2)
            e[j] = eps
            fd = (np.asarray(final_state(y0 + e))
                  - np.asarray(final_state(y0 - e))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[:, j]), fd,
                                       rtol=0, atol=1e-5)
