"""ddify: automatic double-float lifting of plain-JAX RHS functions.

Covers the jaxpr interpreter (core/ddify.py) at the op level and end-to-end
through ``solve_ivp_ensemble(dtype="dd")``: a plain-jnp RHS must integrate
identically (to the dd noise floor) to its hand-written DD-native twin, and
transcendental / matmul RHS terms must work via the exact f64 fallback.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ivp_tpu  # noqa: F401  (x64 on)
from ivp_tpu import ddify, solve_ivp_ensemble
from ivp_tpu.core import ddmath as ddm
from ivp_tpu.core.ddify import auto_dd_rhs


def vdp_plain(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def vdp_dd(t, y):
    return ddm.stack([y[1], (1.0 - y[0] * y[0]) * y[1] - y[0]])


def _dd_in(x):
    return ddm.from_f64(jnp.asarray(x, jnp.float64))


class TestInterpreter:
    def test_polynomial_rhs_exact(self):
        y = _dd_in(np.array([2.0, 0.1]) + 1e-9)
        out = ddify(vdp_plain)(jnp.float64(0.3), y)
        assert isinstance(out, ddm.DD)
        ref = np.asarray(vdp_plain(0.3, ddm.to_f64(y)))
        np.testing.assert_allclose(np.asarray(ddm.to_f64(out)), ref,
                                   rtol=1e-14, atol=0.0)

    def test_transcendental_fallback(self):
        def rhs(t, y):
            return jnp.sin(y) * jnp.exp(-0.1 * y) + jnp.cos(t) * jnp.log1p(
                y * y)

        yv = np.array([0.3, -1.2, 2.5])
        out = ddify(rhs)(jnp.float64(0.7), _dd_in(yv))
        ref = np.asarray(rhs(0.7, jnp.asarray(yv)))
        np.testing.assert_allclose(np.asarray(ddm.to_f64(out)), ref,
                                   rtol=1e-13, atol=1e-16)

    def test_matvec_and_reduce(self):
        A = np.random.default_rng(0).standard_normal((6, 6))
        lam = jnp.asarray(np.linspace(0.5, 2.0, 6))

        def rhs(t, y):
            return jnp.asarray(A) @ y - lam * jnp.sum(y * y) * y

        yv = np.random.default_rng(1).standard_normal(6)
        out = ddify(rhs)(jnp.float64(0.0), _dd_in(yv))
        ref = np.asarray(rhs(0.0, jnp.asarray(yv)))
        np.testing.assert_allclose(np.asarray(ddm.to_f64(out)), ref,
                                   rtol=1e-12, atol=1e-14)

    def test_select_abs_max_sign_pow(self):
        def rhs(t, y):
            g = jnp.where(y > 0.0, jnp.abs(y) ** 3, jnp.minimum(y, -0.5))
            return jnp.maximum(g, jnp.sign(y) * 0.25) / (1.0 + y * y)

        yv = np.array([-2.0, -0.1, 0.0, 0.4, 3.0])
        out = ddify(rhs)(jnp.float64(0.0), _dd_in(yv))
        ref = np.asarray(rhs(0.0, jnp.asarray(yv)))
        np.testing.assert_allclose(np.asarray(ddm.to_f64(out)), ref,
                                   rtol=1e-13, atol=1e-16)

    def test_dd_comparisons_resolve_low_word(self):
        # Two values equal in f32 but distinct in dd: the lifted comparison
        # must see the low-word difference.  y[0] = 1 + 1e-12 > y[1] =
        # 1 - 1e-12 holds only at dd resolution, so the where must return
        # y[0] (~ +1); an hi-word-only compare would return -y[1] (~ -1).
        a = ddm.DD(jnp.float32(1.0), jnp.float32(1e-12))
        b = ddm.DD(jnp.float32(1.0), jnp.float32(-1e-12))

        def pick(t, y):
            return jnp.where(y[0] > y[1], y[0], -y[1])

        y = ddm.stack([a, b])
        out = ddify(pick)(jnp.float64(0.0), y)
        assert float(ddm.to_f64(out)) == pytest.approx(1.0 + 1e-12,
                                                       abs=1e-15)

    def test_args_passthrough(self):
        def rhs(t, y, mu, k):
            return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - k * y[0]])

        y = _dd_in(np.array([1.5, -0.2]))
        out = ddify(rhs)(jnp.float64(0.0), y, jnp.float64(3.0),
                         jnp.float64(2.0))
        ref = np.asarray(rhs(0.0, ddm.to_f64(y), 3.0, 2.0))
        np.testing.assert_allclose(np.asarray(ddm.to_f64(out)), ref,
                                   rtol=1e-14)

    def test_auto_dd_rhs_native_and_lifted(self):
        y = _dd_in(np.array([2.0, 0.1]))
        r_native = auto_dd_rhs(vdp_dd)(jnp.float64(0.0), y)
        r_lifted = auto_dd_rhs(vdp_plain)(jnp.float64(0.0), y)
        assert isinstance(r_native, ddm.DD) and isinstance(r_lifted, ddm.DD)
        np.testing.assert_allclose(np.asarray(ddm.to_f64(r_native)),
                                   np.asarray(ddm.to_f64(r_lifted)),
                                   rtol=1e-14)

    def test_cond_scan_fallback(self):
        # Higher-order primitives (lax.cond / lax.scan) in the RHS take the
        # exact emulated-f64 fallback: correct, merely unaccelerated.
        from jax import lax

        def rhs(t, y):
            def pos(v):
                return -v

            def neg(v):
                return 2.0 * v

            branchy = lax.cond(y[0] > 0.0, pos, neg, y)
            acc, _ = lax.scan(lambda c, x: (c + x * x, None), 0.0, y)
            return branchy + acc

        yv = np.array([0.5, -1.5, 2.0])
        out = ddify(rhs)(jnp.float64(0.0), _dd_in(yv))
        ref = np.asarray(rhs(0.0, jnp.asarray(yv)))
        np.testing.assert_allclose(np.asarray(ddm.to_f64(out)), ref,
                                   rtol=1e-13, atol=1e-15)

    def test_jit_vmap_compose(self):
        f = jax.jit(jax.vmap(lambda y: ddify(vdp_plain)(jnp.float64(0.0), y)))
        yb = _dd_in(np.random.default_rng(2).standard_normal((16, 2)))
        out = f(yb)
        ref = jax.vmap(lambda y: vdp_plain(0.0, y))(ddm.to_f64(yb))
        np.testing.assert_allclose(np.asarray(ddm.to_f64(out)),
                                   np.asarray(ref), rtol=1e-13, atol=1e-15)


class TestEndToEnd:
    def test_plain_rhs_matches_dd_native(self):
        rng = np.random.default_rng(0)
        y0 = np.array([2.0, 0.0]) + 0.05 * rng.standard_normal((64, 2))
        r_plain = solve_ivp_ensemble(vdp_plain, (0.0, 20.0), y0,
                                     method="RK45", rtol=1e-6, atol=1e-8,
                                     dtype="dd")
        r_native = solve_ivp_ensemble(vdp_dd, (0.0, 20.0), y0,
                                      method="RK45", rtol=1e-6, atol=1e-8,
                                      dtype="dd")
        assert np.all(np.asarray(r_plain.status) == 0)
        # y[0]**2 lifts to the same dd multiply as the hand-written y*y, so
        # the trajectories agree to the dd floor (not merely the tolerance).
        np.testing.assert_allclose(np.asarray(r_plain.y),
                                   np.asarray(r_native.y), rtol=0, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(r_plain.nstep),
                                      np.asarray(r_native.nstep))

    def test_plain_rhs_dd_matches_f64(self):
        rng = np.random.default_rng(1)
        y0 = np.array([2.0, 0.0]) + 0.05 * rng.standard_normal((32, 2))
        r_dd = solve_ivp_ensemble(vdp_plain, (0.0, 20.0), y0, method="RK45",
                                  rtol=1e-9, atol=1e-11, dtype="dd")
        r_64 = solve_ivp_ensemble(vdp_plain, (0.0, 20.0), y0, method="RK45",
                                  rtol=1e-9, atol=1e-11, dtype=jnp.float64)
        assert np.all(np.asarray(r_dd.status) == 0)
        np.testing.assert_allclose(np.asarray(r_dd.y), np.asarray(r_64.y),
                                   rtol=0, atol=5e-6)

    def test_transcendental_rhs_end_to_end(self):
        # Forced oscillator with sin forcing: exercises the f64 fallback
        # inside the compiled dd hot loop.
        def rhs(t, y):
            return jnp.array([y[1], -y[0] + 0.3 * jnp.sin(2.0 * t)])

        y0 = np.tile(np.array([1.0, 0.0]), (8, 1))
        r_dd = solve_ivp_ensemble(rhs, (0.0, 10.0), y0, method="DOP853",
                                  rtol=1e-10, atol=1e-12, dtype="dd")
        r_64 = solve_ivp_ensemble(rhs, (0.0, 10.0), y0, method="DOP853",
                                  rtol=1e-10, atol=1e-12, dtype=jnp.float64)
        assert np.all(np.asarray(r_dd.status) == 0)
        np.testing.assert_allclose(np.asarray(r_dd.y), np.asarray(r_64.y),
                                   rtol=0, atol=1e-7)

    def test_dense_output_composition(self):
        # auto-lifted RHS + dense_output through the recording driver:
        # batched sol() matches the f64 tier at interpolation (f32) grade.
        y0 = (np.array([2.0, 0.0])
              + 0.05 * np.random.default_rng(0).standard_normal((4, 2)))
        r = solve_ivp_ensemble(vdp_plain, (0.0, 10.0), y0, method="RK45",
                               rtol=1e-8, atol=1e-10, dtype="dd",
                               dense_output=True)
        assert np.all(np.asarray(r.status) == 0)
        ts = np.linspace(0.0, 10.0, 13)
        r64 = solve_ivp_ensemble(vdp_plain, (0.0, 10.0), y0, method="RK45",
                                 rtol=1e-8, atol=1e-10, dtype=jnp.float64,
                                 dense_output=True)
        np.testing.assert_allclose(r.sol(ts), r64.sol(ts), rtol=0, atol=1e-5)

    def test_per_lane_args_lifted(self):
        def rhs(t, y, mu):
            return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

        from ivp_tpu.batch import build_ensemble_solver
        B = 16
        mus = np.linspace(0.5, 2.0, B)
        y0 = np.tile(np.array([2.0, 0.0]), (B, 1))
        solver = build_ensemble_solver(rhs, "RK45", n=2, dtype="dd",
                                       args=(jnp.asarray(mus),),
                                       args_batched=True)
        res = solver(y0, 0.0, 10.0, 1e-8, 1e-10)
        assert np.all(np.asarray(res.status) == 0)
        # spot-check two lanes against single-lane f64 solves
        for i in (0, B - 1):
            ref = solve_ivp_ensemble(rhs, (0.0, 10.0), y0[i:i + 1],
                                     method="RK45", rtol=1e-8, atol=1e-10,
                                     args=(float(mus[i]),))
            np.testing.assert_allclose(np.asarray(res.y[i]),
                                       np.asarray(ref.y[0]), rtol=0,
                                       atol=5e-6)
