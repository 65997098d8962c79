"""Robustness sweep: option validation and overflow reporting.

Covers the round-3 items: strict linear_mode validation, banded+mass
rejection, unsorted-t_eval rejection in the ensemble builder, and the
event-buffer overflow flag (the reference records every occurrence via Vec
growth, solout.rs:144-146; the fixed-cap TPU buffer flags truncation).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp
from ivp_tpu.batch import build_ensemble_solver, solve_ivp_ensemble


def test_linear_mode_typo_raises():
    for method in ("Radau", "BDF"):
        with pytest.raises(ValueError, match="linear_mode"):
            solve_ivp(lambda t, y: -y, (0.0, 1.0), [1.0], method=method,
                      solver_options={"linear_mode": "Banded"})


def test_banded_with_mass_raises():
    M = np.array([[2.0, 0.0], [0.0, 1.0]])
    with pytest.raises(ValueError, match="mass"):
        solve_ivp(lambda t, y: -y, (0.0, 1.0), [1.0, 1.0], method="Radau",
                  mass=M, solver_options={"linear_mode": "banded",
                                          "band": (1, 1)})


def test_ensemble_unsorted_t_eval_raises():
    with pytest.raises(ValueError, match="sorted"):
        build_ensemble_solver(lambda t, y: -y, "RK45", n=1,
                              t_eval=[0.0, 2.0, 1.0])
    # Per-lane grids: every lane must be monotone.
    with pytest.raises(ValueError, match="sorted"):
        build_ensemble_solver(lambda t, y: -y, "RK45", n=1,
                              t_eval=[[0.0, 1.0, 2.0], [0.0, 2.0, 1.0]])


def test_event_overflow_flag():
    """SHO with ~20 upward zero crossings and capacity 4: the buffer holds
    the first 4 and sets the overflow flag; a roomy buffer does not."""

    def ev(t, y):
        return y[0]
    ev.direction = 1

    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    res = solve_ivp(sho, (0.0, 40.0), [0.0, 1.0], events=[ev],
                    rtol=1e-8, atol=1e-10, event_capacity=4)
    assert res.success
    assert len(res.t_events[0]) == 4
    assert res.event_overflow is not None and bool(res.event_overflow[0])

    res2 = solve_ivp(sho, (0.0, 40.0), [0.0, 1.0], events=[ev],
                     rtol=1e-8, atol=1e-10, event_capacity=16)
    assert not bool(res2.event_overflow[0])
    # ~ 40 / 2pi upward crossings at t = 2*pi*k
    np.testing.assert_allclose(res2.t_events[0][:4],
                               2 * np.pi * np.arange(1, 5), atol=1e-6)


def test_controller_precision_state_option():
    """controller_precision='state' restores reference-precision control
    arithmetic; both paths converge to the same solution."""
    def vdp(t, y):
        return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])

    a = solve_ivp(vdp, (0.0, 10.0), [2.0, 0.0], method="RK45",
                  rtol=1e-8, atol=1e-10)
    b = solve_ivp(vdp, (0.0, 10.0), [2.0, 0.0], method="RK45",
                  rtol=1e-8, atol=1e-10,
                  solver_options={"controller_precision": "state"})
    np.testing.assert_allclose(a.y[:, -1], b.y[:, -1], rtol=1e-8)

    s = solve_ivp(vdp, (0.0, 5.0), [2.0, 0.0], method="Radau",
                  rtol=1e-6, atol=1e-8,
                  solver_options={"controller_precision": "state"})
    assert s.success


def test_bdf_newton_unroll_option():
    """newton_unroll=True is semantically identical to the while form."""
    def stiff(t, y):
        return jnp.array([y[1], 100.0 * (1.0 - y[0] ** 2) * y[1] - y[0]])

    a = solve_ivp(stiff, (0.0, 50.0), [2.0, 0.0], method="BDF",
                  rtol=1e-5, atol=1e-7)
    b = solve_ivp(stiff, (0.0, 50.0), [2.0, 0.0], method="BDF",
                  rtol=1e-5, atol=1e-7,
                  solver_options={"newton_unroll": True})
    assert a.nstep == b.nstep and a.nfev == b.nfev
    np.testing.assert_allclose(a.y[:, -1], b.y[:, -1], rtol=0, atol=0)


def test_event_overflow_flag_ensemble():
    def ev(t, y):
        return y[0]
    ev.direction = 1

    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    y0 = np.array([[0.0, 1.0], [0.0, 1.0]])
    res = solve_ivp_ensemble(sho, (0.0, 40.0), y0, method="RK45",
                             rtol=1e-6, atol=1e-9, events=[ev],
                             event_capacity=4)
    assert res.event_overflow.shape == (2, 1)
    assert bool(np.all(res.event_overflow))
    assert np.all(np.asarray(res.n_events) == 4)
