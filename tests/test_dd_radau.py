"""dd-Radau: the stiff tier of dtype="dd" (methods/dd_radau.py).

Validates that dd state + f32 Newton solves reproduce the platform-f64
Radau engine on stiff problems: final states, event composition, budgets.
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


def vdp_jac(t, y):
    return jnp.array([[0.0, 1.0],
                      [-2.0 * MU * y[0] * y[1] - 1.0,
                       MU * (1.0 - y[0] ** 2)]])


class TestDDRadau:
    def test_matches_f64_radau(self):
        rng = np.random.default_rng(0)
        y0 = np.array([2.0, 0.0]) + 0.02 * rng.standard_normal((16, 2))
        r_dd = solve_ivp_ensemble(vdp_stiff, (0.0, 20.0), y0, method="Radau",
                                  rtol=1e-6, atol=1e-8, dtype="dd")
        r_64 = solve_ivp_ensemble(vdp_stiff, (0.0, 20.0), y0, method="Radau",
                                  rtol=1e-6, atol=1e-8, dtype=jnp.float64)
        assert np.all(np.asarray(r_dd.status) == 0)
        # dd state resolves the solution at f64 class; the error budget is
        # set by rtol, so final states agree well inside it.
        np.testing.assert_allclose(np.asarray(r_dd.y), np.asarray(r_64.y),
                                   rtol=0, atol=2e-4)
        # comparable work: step counts within 25% lane-wise
        s_dd = np.asarray(r_dd.nstep, float)
        s_64 = np.asarray(r_64.nstep, float)
        assert np.all(np.abs(s_dd - s_64) <= 0.25 * s_64 + 3)

    def test_analytic_jacobian(self):
        y0 = np.tile(np.array([2.0, 0.0]), (4, 1))
        r = solve_ivp_ensemble(vdp_stiff, (0.0, 10.0), y0, method="Radau",
                               rtol=1e-6, atol=1e-8, dtype="dd", jac=vdp_jac)
        r_fd = solve_ivp_ensemble(vdp_stiff, (0.0, 10.0), y0, method="Radau",
                                  rtol=1e-6, atol=1e-8, dtype="dd")
        assert np.all(np.asarray(r.status) == 0)
        np.testing.assert_allclose(np.asarray(r.y), np.asarray(r_fd.y),
                                   rtol=0, atol=1e-5)

    def test_robertson_budget(self):
        # Robertson kinetics: the classic stiff budget problem
        # (reference tests/test_stiff.py:116-117 asserts nfev < 5000).
        def rober(t, y):
            return jnp.array([
                -0.04 * y[0] + 1e4 * y[1] * y[2],
                0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                3e7 * y[1] ** 2,
            ])

        y0 = np.tile(np.array([1.0, 0.0, 0.0]), (2, 1))
        r = solve_ivp_ensemble(rober, (0.0, 100.0), y0, method="Radau",
                               rtol=1e-4, atol=1e-8, dtype="dd")
        assert np.all(np.asarray(r.status) == 0)
        assert np.all(np.asarray(r.nfev) < 5000)
        y = np.asarray(r.y)
        # conservation: sum stays 1 at dd accuracy
        np.testing.assert_allclose(y.sum(axis=1), 1.0, rtol=0, atol=1e-7)
        r64 = solve_ivp_ensemble(rober, (0.0, 100.0), y0, method="Radau",
                                 rtol=1e-4, atol=1e-8, dtype=jnp.float64)
        np.testing.assert_allclose(y, np.asarray(r64.y), rtol=2e-3,
                                   atol=1e-10)

    def test_tight_tolerance_beats_f32(self):
        # At rtol 1e-9 an f32-state Radau cannot resolve the corrections;
        # the dd engine must track the f64 engine closely.
        def decay_osc(t, y):
            return jnp.array([-0.5 * y[0] + 10.0 * y[1],
                              -10.0 * y[0] - 0.5 * y[1]])

        y0 = np.tile(np.array([1.0, 0.0]), (4, 1))
        r_dd = solve_ivp_ensemble(decay_osc, (0.0, 5.0), y0, method="Radau",
                                  rtol=1e-9, atol=1e-12, dtype="dd")
        assert np.all(np.asarray(r_dd.status) == 0)
        # analytic: e^{-t/2} (cos 10t, -sin 10t)
        tf = 5.0
        ref = np.exp(-0.5 * tf) * np.array([np.cos(10 * tf),
                                            -np.sin(10 * tf)])
        np.testing.assert_allclose(np.asarray(r_dd.y),
                                   np.tile(ref, (4, 1)), rtol=0, atol=5e-8)

    def test_events_and_restart(self):
        # Terminal event through the dd Radau path.  VdP mu=5 downward
        # zero crossings (LSODA reference: 5.123, 16.735, 28.347, ...).
        mu = 5.0

        def rhs(t, y):
            return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

        def cross(t, y):
            return y[0]

        cross.terminal = 2
        cross.direction = -1

        y0 = np.tile(np.array([2.0, 0.0]), (3, 1))
        solver = build_ensemble_solver(rhs, "Radau", n=2, dtype="dd",
                                       events=[cross])
        res = solver(y0, 0.0, 30.0, 1e-6, 1e-8)
        assert np.all(np.asarray(res.n_events)[:, 0] == 2)
        te = np.asarray(res.t_events)[:, 0, :2]
        np.testing.assert_allclose(te[:, 0], 5.12288, rtol=0, atol=2e-3)
        np.testing.assert_allclose(te[:, 1], 16.73511, rtol=0, atol=5e-3)
        ye = np.asarray(res.y_events)[:, 0, :2, 0]
        assert np.all(np.abs(ye) < 1e-4)

    def test_backward_integration(self):
        def decay_osc(t, y):
            return jnp.array([-0.5 * y[0] + 10.0 * y[1],
                              -10.0 * y[0] - 0.5 * y[1]])

        tf = 3.0
        ref = np.exp(-0.5 * tf) * np.array([np.cos(10 * tf),
                                            -np.sin(10 * tf)])
        rb = solve_ivp_ensemble(decay_osc, (tf, 0.0), np.tile(ref, (3, 1)),
                                method="Radau", rtol=1e-8, atol=1e-11,
                                dtype="dd")
        assert np.all(np.asarray(rb.status) == 0)
        np.testing.assert_allclose(np.asarray(rb.y),
                                   np.tile([1.0, 0.0], (3, 1)),
                                   rtol=0, atol=1e-5)
        rb64 = solve_ivp_ensemble(decay_osc, (tf, 0.0), np.tile(ref, (3, 1)),
                                  method="Radau", rtol=1e-8, atol=1e-11,
                                  dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(rb.y), np.asarray(rb64.y),
                                   rtol=0, atol=1e-8)

    def test_banded_backend_matches_lu(self):
        # dd Radau over the f32 cyclic-reduction banded backend: a 1-D
        # reaction-diffusion chain with tridiagonal Jacobian.
        N = 12

        def rhs(t, y):
            yl = jnp.concatenate([jnp.zeros((1,), y.dtype), y[:-1]])
            yr = jnp.concatenate([y[1:], jnp.zeros((1,), y.dtype)])
            return 40.0 * (yl - 2.0 * y + yr) - y ** 3

        y0 = np.tile(np.sin(np.pi * np.arange(1, N + 1) / (N + 1)), (3, 1))
        r_band = solve_ivp_ensemble(
            rhs, (0.0, 1.0), y0, method="Radau", rtol=1e-6, atol=1e-9,
            dtype="dd",
            solver_options={"linear_mode": "banded", "band": (1, 1)})
        r_lu = solve_ivp_ensemble(
            rhs, (0.0, 1.0), y0, method="Radau", rtol=1e-6, atol=1e-9,
            dtype="dd", solver_options={"linear_mode": "lu"})
        assert np.all(np.asarray(r_band.status) == 0)
        np.testing.assert_allclose(np.asarray(r_band.y),
                                   np.asarray(r_lu.y), rtol=0, atol=1e-7)

    def test_rejects_mass_and_dae(self):
        with pytest.raises(ValueError, match="identity mass"):
            from ivp_tpu.methods import dd_radau
            dd_radau.make_engine(False, jac_fn=lambda t, y: None, n=2,
                                 mass=np.eye(2))
        with pytest.raises(ValueError, match="DAE"):
            from ivp_tpu.methods import dd_radau
            dd_radau.make_engine(False, jac_fn=lambda t, y: None, n=3,
                                 nind=(1, 1, 1))

    def test_resumable_dd_radau(self):
        from ivp_tpu.batch import build_resumable_solver
        y0 = np.tile(np.array([2.0, 0.0]), (4, 1))
        start, resume, extract = build_resumable_solver(
            vdp_stiff, "Radau", n=2, chunk_steps=64, dtype="dd")
        carry, ra = start(y0, 0.0, 10.0, 1e-6, 1e-8)
        while not bool(np.all(np.asarray(carry.done))):
            carry = resume(carry, ra)
        res = extract(carry)
        ref = solve_ivp_ensemble(vdp_stiff, (0.0, 10.0), y0, method="Radau",
                                 rtol=1e-6, atol=1e-8, dtype="dd")
        np.testing.assert_allclose(np.asarray(res.y), np.asarray(ref.y),
                                   rtol=0, atol=1e-10)


def test_dd_radau_per_lane_args():
    """Per-lane parameter sweep through the dd stiff tier (args_batched):
    each lane integrates its own stiffness mu with its own Jacobian."""
    import jax.numpy as jnp
    from ivp_tpu.batch import build_ensemble_solver

    def rhs(t, y, mu):
        return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

    B = 6
    mus = np.linspace(5.0, 40.0, B)
    y0 = np.tile([2.0, 0.0], (B, 1))
    solver = build_ensemble_solver(rhs, "Radau", n=2, dtype="dd",
                                   args=(jnp.asarray(mus),),
                                   args_batched=True)
    res = solver(y0, 0.0, 10.0, 1e-6, 1e-8)
    assert np.all(np.asarray(res.status) == 0)
    # spot-check ends against per-lane f64 solves
    for i in (0, B - 1):
        ref = solve_ivp_ensemble(rhs, (0.0, 10.0), y0[i:i + 1],
                                 method="Radau", rtol=1e-6, atol=1e-8,
                                 args=(float(mus[i]),))
        np.testing.assert_allclose(np.asarray(res.y[i]),
                                   np.asarray(ref.y[0]), rtol=0, atol=2e-4)
