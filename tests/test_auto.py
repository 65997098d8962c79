"""method="auto": automatic nonstiff->stiff switching (ivp_tpu/auto.py).

The LSODA-analog the reference removed (reference tests/test_ivp.py:1-19):
the explicit phase runs Hairer's stiffness detector (reference
src/methods/dopri5.rs:363-391) and the facade resumes with an implicit
method from the exact reached state.

Robertson is the workhorse: DOPRI5 at rtol 1e-4 trips the detector at
t ~ 0.086 in ~66 steps, so every test switches early and runs fast.
(Stiffness is tolerance-relative: at rtol 1e-6 Van der Pol mu=500 is
error-limited, not stability-limited, and legitimately never trips.)
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ivp_tpu import solve_ivp
from ivp_tpu.types import Status


def rober(t, y):
    return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                      0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                      3e7 * y[1] ** 2])


Y0 = [1.0, 0.0, 0.0]
TOLS = dict(rtol=1e-4, atol=1e-8)


def test_auto_switches_and_matches_radau():
    r = solve_ivp(rober, (0.0, 100.0), Y0, method="auto", **TOLS)
    assert r.success
    assert r.methods == ["DOPRI5", "RADAU"]
    # Default detector cadence (stiff_test=1000) trips after ~1000 accepted
    # explicit steps, t ~ 1.5 on Robertson at these tolerances.
    assert r.t_switch is not None and 0.0 < r.t_switch < 5.0
    assert r.raw_status == Status.SUCCESS
    ref = solve_ivp(rober, (0.0, 100.0), Y0, method="Radau", **TOLS)
    np.testing.assert_allclose(np.asarray(r.y[:, -1]),
                               np.asarray(ref.y[:, -1]), rtol=5e-3,
                               atol=1e-10)
    # Orders of magnitude fewer steps than pure-explicit needs on [0, 100]
    # (~1015 explicit steps before the default-cadence detector trips, plus
    # a few hundred Radau steps).
    assert r.nstep < 2_000
    # t strictly monotone across the stitch (no duplicated switch point).
    assert np.all(np.diff(r.t) > 0)


def test_auto_vdp_loose_tol_switches():
    mu = 500.0

    def vdp(t, y):
        return jnp.array([y[1], mu * ((1.0 - y[0] ** 2) * y[1] - y[0])])

    r = solve_ivp(vdp, (0.0, 100.0), [2.0, 0.0], method="auto",
                  rtol=1e-4, atol=1e-6)
    assert r.success and r.methods == ["DOPRI5", "RADAU"]
    ref = solve_ivp(vdp, (0.0, 100.0), [2.0, 0.0], method="Radau",
                    rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.y[:, -1]),
                               np.asarray(ref.y[:, -1]), rtol=1e-2)


def test_auto_nonstiff_no_switch():
    r = solve_ivp(lambda t, y: -0.5 * y, (0.0, 10.0), [2.0], method="auto",
                  rtol=1e-8, atol=1e-10)
    assert r.success
    assert r.methods == ["DOPRI5"]
    assert r.t_switch is None
    np.testing.assert_allclose(float(r.y[0, -1]), 2.0 * np.exp(-5.0),
                               rtol=1e-7)


def test_auto_t_eval_and_dense_cross_switch():
    te = np.concatenate([np.linspace(0.0, 0.05, 6),
                         np.linspace(1.0, 100.0, 20)])
    r = solve_ivp(rober, (0.0, 100.0), Y0, method="auto",
                  t_eval=te, dense_output=True, **TOLS)
    assert r.success and r.methods == ["DOPRI5", "RADAU"]
    np.testing.assert_allclose(r.t, te, atol=1e-12)
    # Dense output agrees with the sampled output on both sides of the
    # switch, and is continuous at the switch point.
    ys = r.sol(te)
    np.testing.assert_allclose(ys, r.y, rtol=1e-4, atol=1e-10)
    ts = r.t_switch
    np.testing.assert_allclose(r.sol(ts - 1e-9), r.sol(ts + 1e-9),
                               rtol=1e-4, atol=1e-10)
    # Strict tier covers the whole stitched span.
    assert r.sol.t_span() == (0.0, 100.0)
    with pytest.raises(ValueError):
        r.sol.sol(101.0)


def test_auto_events_cross_switch():
    # y1 rises through 2e-5 during the fast transient (explicit phase) and
    # decays back through it late (stiff phase).
    def ev(t, y):
        return y[1] - 2e-5

    r = solve_ivp(rober, (0.0, 100.0), Y0, method="auto", events=ev,
                  dense_output=True, **TOLS)
    assert r.success and r.methods == ["DOPRI5", "RADAU"]
    te = r.t_events[0]
    assert len(te) == 2
    assert te[0] < r.t_switch < te[1]
    # Event residual vanishes at the refined roots (both phases' dense
    # interpolants).
    for tt in te:
        y_at = np.asarray(r.sol(float(tt)))
        assert abs(float(y_at[1]) - 2e-5) < 1e-9


def test_auto_terminal_event_in_stiff_phase():
    # Terminal on the 2nd crossing: the budget spans the switch (one
    # occurrence in each phase).
    def ev(t, y):
        return y[1] - 2e-5
    ev.terminal = 2

    r = solve_ivp(rober, (0.0, 100.0), Y0, method="auto", events=ev, **TOLS)
    assert r.status == 1  # terminated by event
    assert len(r.t_events[0]) == 2
    assert float(r.t[-1]) < 100.0


def test_auto_option_validation():
    with pytest.raises(ValueError, match="nonstiff_method"):
        solve_ivp(rober, (0.0, 1.0), Y0, method="auto",
                  solver_options={"nonstiff_method": "RK23"})
    with pytest.raises(ValueError, match="stiff_method"):
        solve_ivp(rober, (0.0, 1.0), Y0, method="auto",
                  solver_options={"stiff_method": "RK45"})
    with pytest.raises(ValueError, match="nonstiff_options"):
        solve_ivp(rober, (0.0, 1.0), Y0, method="auto",
                  solver_options={"stiff_test": 10})


def test_auto_bdf_stiff_phase():
    r = solve_ivp(rober, (0.0, 100.0), Y0, method="auto",
                  solver_options={"stiff_method": "BDF"}, **TOLS)
    assert r.success and r.methods == ["DOPRI5", "BDF"]
    ref = solve_ivp(rober, (0.0, 100.0), Y0, method="BDF", **TOLS)
    np.testing.assert_allclose(np.asarray(r.y[:, -1]),
                               np.asarray(ref.y[:, -1]), rtol=5e-3,
                               atol=1e-10)
