"""dd-BDF: variable-order BDF over dd state (methods/dd_bdf.py).

The D-array, predictor/psi and Newton residuals run in dd with f32 factor/
solves; validated against the platform-f64 BDF engine.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import ivp_tpu  # noqa: F401
from ivp_tpu import solve_ivp_ensemble
from ivp_tpu.batch import build_ensemble_solver

MU = 50.0


def vdp_stiff(t, y):
    return jnp.array([y[1], MU * (1.0 - y[0] ** 2) * y[1] - y[0]])


class TestDDBDF:
    def test_matches_f64_bdf(self):
        rng = np.random.default_rng(0)
        y0 = np.array([2.0, 0.0]) + 0.02 * rng.standard_normal((16, 2))
        r_dd = solve_ivp_ensemble(vdp_stiff, (0.0, 20.0), y0, method="BDF",
                                  rtol=1e-6, atol=1e-8, dtype="dd")
        r_64 = solve_ivp_ensemble(vdp_stiff, (0.0, 20.0), y0, method="BDF",
                                  rtol=1e-6, atol=1e-8, dtype=jnp.float64)
        assert np.all(np.asarray(r_dd.status) == 0)
        np.testing.assert_allclose(np.asarray(r_dd.y), np.asarray(r_64.y),
                                   rtol=0, atol=1e-4)
        s_dd = np.asarray(r_dd.nstep, float)
        s_64 = np.asarray(r_64.nstep, float)
        assert np.all(np.abs(s_dd - s_64) <= 0.25 * s_64 + 3)

    def test_robertson_budget(self):
        def rober(t, y):
            return jnp.array([
                -0.04 * y[0] + 1e4 * y[1] * y[2],
                0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                3e7 * y[1] ** 2,
            ])

        y0 = np.tile(np.array([1.0, 0.0, 0.0]), (2, 1))
        r = solve_ivp_ensemble(rober, (0.0, 100.0), y0, method="BDF",
                               rtol=1e-4, atol=1e-8, dtype="dd")
        assert np.all(np.asarray(r.status) == 0)
        assert np.all(np.asarray(r.nfev) < 5000)
        y = np.asarray(r.y)
        np.testing.assert_allclose(y.sum(axis=1), 1.0, rtol=0, atol=1e-7)

    def test_backward_and_tight_tolerance(self):
        def decay_osc(t, y):
            return jnp.array([-0.5 * y[0] + 10.0 * y[1],
                              -10.0 * y[0] - 0.5 * y[1]])

        y0 = np.tile(np.array([1.0, 0.0]), (4, 1))
        r = solve_ivp_ensemble(decay_osc, (0.0, 5.0), y0, method="BDF",
                               rtol=1e-8, atol=1e-11, dtype="dd")
        assert np.all(np.asarray(r.status) == 0)
        tf = 5.0
        ref = np.exp(-0.5 * tf) * np.array([np.cos(10 * tf),
                                            -np.sin(10 * tf)])
        # BDF's own integration error at this rtol is ~2e-6 (the f64 engine
        # produces the same values to ~3e-13); the bound checks the dd tier
        # adds nothing on top.
        np.testing.assert_allclose(np.asarray(r.y), np.tile(ref, (4, 1)),
                                   rtol=0, atol=1e-5)
        # backward span
        rb = solve_ivp_ensemble(decay_osc, (5.0, 0.0),
                                np.tile(ref, (4, 1)), method="BDF",
                                rtol=1e-8, atol=1e-11, dtype="dd")
        assert np.all(np.asarray(rb.status) == 0)
        np.testing.assert_allclose(np.asarray(rb.y),
                                   np.tile([1.0, 0.0], (4, 1)),
                                   rtol=0, atol=1e-5)
        rb64 = solve_ivp_ensemble(decay_osc, (5.0, 0.0),
                                  np.tile(ref, (4, 1)), method="BDF",
                                  rtol=1e-8, atol=1e-11, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(rb.y), np.asarray(rb64.y),
                                   rtol=0, atol=1e-9)

    def test_events_terminal(self):
        mu = 5.0

        def rhs(t, y):
            return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

        def cross(t, y):
            return y[0]

        cross.terminal = 1
        cross.direction = -1

        y0 = np.tile(np.array([2.0, 0.0]), (3, 1))
        solver = build_ensemble_solver(rhs, "BDF", n=2, dtype="dd",
                                       events=[cross])
        res = solver(y0, 0.0, 30.0, 1e-6, 1e-8)
        assert np.all(np.asarray(res.n_events)[:, 0] == 1)
        te = np.asarray(res.t_events)[:, 0, 0]
        np.testing.assert_allclose(te, 5.12288, rtol=0, atol=2e-3)

    def test_dense_output(self):
        from ivp_tpu import solve_ivp_ensemble as sie
        y0 = np.tile(np.array([2.0, 0.0]), (3, 1))
        r = sie(vdp_stiff, (0.0, 10.0), y0, method="BDF", rtol=1e-6,
                atol=1e-8, dtype="dd", dense_output=True)
        assert np.all(np.asarray(r.status) == 0)
        ts = np.linspace(0.5, 9.5, 7)
        r64 = sie(vdp_stiff, (0.0, 10.0), y0, method="BDF", rtol=1e-6,
                  atol=1e-8, dtype=jnp.float64, dense_output=True)
        np.testing.assert_allclose(r.sol(ts), r64.sol(ts), rtol=0, atol=1e-3)

    def test_t_eval_sampling(self):
        grid = np.linspace(0.0, 10.0, 21)
        y0 = np.tile(np.array([2.0, 0.0]), (2, 1))
        solver = build_ensemble_solver(vdp_stiff, "BDF", n=2, dtype="dd",
                                       t_eval=grid)
        res = solver(y0, 0.0, 10.0, 1e-6, 1e-8)
        assert np.all(np.asarray(res.n_samples) == 21)
        r64 = build_ensemble_solver(vdp_stiff, "BDF", n=2,
                                    dtype=jnp.float64, t_eval=grid)(
            y0, 0.0, 10.0, 1e-6, 1e-8)
        np.testing.assert_allclose(np.asarray(res.y_samples),
                                   np.asarray(r64.y_samples), rtol=0,
                                   atol=1e-3)
