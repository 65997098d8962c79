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


# =============================================================================
# Ensemble tier: per-lane stiffness routing (solve_ivp_ensemble_auto)
# =============================================================================

def rober_k(t, y):
    """Robertson with the third rate carried as a constant 4th state —
    per-lane stiffness from y0 alone (k3' = 0)."""
    k3 = y[3]
    return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                      0.04 * y[0] - 1e4 * y[1] * y[2] - k3 * y[1] ** 2,
                      k3 * y[1] ** 2,
                      0.0 * y[3]])


def test_ensemble_auto_routes_only_tripped_lanes():
    """Mixed batch: stiff lanes (k3=3e7) trip and resume with Radau; benign
    lanes (k3=10) finish explicit-only — per-lane routing, not whole-batch."""
    from ivp_tpu.batch import solve_ivp_ensemble

    y0 = np.array([[1.0, 0.0, 0.0, 3e7]] * 3 + [[1.0, 0.0, 0.0, 10.0]] * 3)
    r = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0, method="auto",
                           rtol=1e-4, atol=1e-8)
    sw = np.asarray(r.switched)
    assert sw[:3].all() and not sw[3:].any()
    assert np.all(np.asarray(r.status) == 0)
    # Stiff lanes match Radau end states; benign lanes match plain DOPRI5.
    r_st = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0[:3], method="Radau",
                              rtol=1e-4, atol=1e-8)
    r_ns = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0[3:], method="RK45",
                              rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(r.y)[:3, :3],
                               np.asarray(r_st.y)[:, :3], rtol=5e-3,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.y)[3:, :3],
                               np.asarray(r_ns.y)[:, :3], rtol=1e-6)


def test_ensemble_auto_matches_per_lane_single_auto():
    from ivp_tpu.batch import solve_ivp_ensemble

    B = 6
    rng = np.random.default_rng(0)
    y0 = np.tile([1.0, 0.0, 0.0], (B, 1)) + 1e-3 * rng.random((B, 3))
    y0[:, 1:] = 0.0
    r = solve_ivp_ensemble(rober, (0.0, 50.0), y0, method="auto",
                           rtol=1e-4, atol=1e-8)
    assert np.all(np.asarray(r.status) == 0)
    assert np.all(np.asarray(r.switched))  # Robertson trips on every lane
    # Each lane agrees with the single-IVP auto result to solver accuracy.
    for i in range(B):
        ri = solve_ivp(rober, (0.0, 50.0), y0[i], method="auto",
                       rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(np.asarray(r.y[i]),
                                   np.asarray(ri.y[:, -1]),
                                   rtol=2e-3, atol=1e-9)
    # Counters continued across the switch: far more than the stiff phase
    # alone, and bounded by a pure-explicit integration budget.
    assert np.all(np.asarray(r.nstep) > 1000)      # explicit phase included
    assert np.all(np.asarray(r.nstep) < 3000)


def test_ensemble_auto_nonstiff_no_switch():
    from ivp_tpu.batch import solve_ivp_ensemble

    y0 = np.linspace(1.0, 2.0, 5)[:, None]
    r = solve_ivp_ensemble(lambda t, y: -0.5 * y, (0.0, 10.0), y0,
                           method="auto", rtol=1e-8, atol=1e-10)
    assert np.all(np.asarray(r.status) == 0)
    assert not np.any(np.asarray(r.switched))
    np.testing.assert_allclose(np.asarray(r.y[:, 0]),
                               y0[:, 0] * np.exp(-5.0), rtol=1e-7)


def test_ensemble_auto_samples_and_events_continue():
    """t_eval samples and event budgets span the switch per lane."""
    from ivp_tpu.batch import solve_ivp_ensemble

    B = 4
    y0 = np.tile([1.0, 0.0, 0.0], (B, 1))
    te = np.concatenate([np.linspace(0.01, 0.05, 3),
                         np.linspace(5.0, 50.0, 5)])

    def ev(t, y):
        return y[1] - 2e-5

    r = solve_ivp_ensemble(rober, (0.0, 50.0), y0, method="auto",
                           t_eval=te, events=[ev], rtol=1e-4, atol=1e-8)
    assert np.all(np.asarray(r.switched))
    assert np.all(np.asarray(r.n_samples) == len(te))
    # Sample values match the single-IVP auto dense output.
    ri = solve_ivp(rober, (0.0, 50.0), y0[0], method="auto", t_eval=te,
                   events=ev, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(r.y_samples[0]),
                               np.asarray(ri.y).T, rtol=2e-3, atol=1e-9)
    # Two crossings of y1=2e-5: one in the explicit phase (rise), one in
    # the stiff phase (decay) — the buffers continued across the switch.
    assert np.all(np.asarray(r.n_events)[:, 0] == 2)
    t_ev = np.asarray(r.t_events)[:, 0]
    assert np.all(t_ev[:, 0] < 1.0)
    assert np.all(t_ev[:, 1] > 1.0)
    np.testing.assert_allclose(t_ev[0, :2], np.asarray(ri.t_events[0]),
                               rtol=1e-2)


def test_ensemble_auto_terminal_budget_spans_switch():
    from ivp_tpu.batch import solve_ivp_ensemble

    B = 3
    y0 = np.tile([1.0, 0.0, 0.0], (B, 1))

    def ev(t, y):
        return y[1] - 2e-5
    ev.terminal = 2

    r = solve_ivp_ensemble(rober, (0.0, 50.0), y0, method="auto",
                           events=[ev], rtol=1e-4, atol=1e-8)
    assert np.all(np.asarray(r.switched))
    # Budget of 2 spans the switch: terminated in the stiff phase at the
    # 2nd crossing, not the 3rd-or-later.
    assert np.all(np.asarray(r.n_events)[:, 0] == 2)
    assert np.all(np.asarray(r.t) < 50.0)
    ref = solve_ivp(rober, (0.0, 50.0), y0[0], method="auto", events=ev,
                    rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(float(r.t[0]), float(ref.t[-1]), rtol=1e-2)


def test_ensemble_auto_record_trajectories():
    """Per-lane step records concatenate across the switch: stiff lanes
    carry explicit-phase records followed by stiff-phase records; benign
    lanes match a plain RK45 recording run."""
    from ivp_tpu.batch import solve_ivp_ensemble

    y0 = np.array([[1.0, 0.0, 0.0, 3e7]] * 2 + [[1.0, 0.0, 0.0, 10.0]] * 2)
    r = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0, method="auto",
                           rtol=1e-4, atol=1e-8, record_trajectories=True)
    sw = np.asarray(r.switched)
    assert sw[:2].all() and not sw[2:].any()
    cnt = np.asarray(r.n_steps_rec)
    ts = np.asarray(r.ts)
    ys = np.asarray(r.ys)
    for i in range(4):
        k = int(cnt[i])
        assert k > 0
        # Recorded times are strictly increasing and end at the final state.
        assert np.all(np.diff(ts[i, :k]) > 0)
        np.testing.assert_allclose(ts[i, k - 1], float(r.t[i]), rtol=1e-12)
        np.testing.assert_allclose(ys[i, k - 1], np.asarray(r.y)[i],
                                   rtol=1e-12)
    # Benign lanes are bit-identical to a plain RK45 recording run.
    r_ns = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0[2:], method="RK45",
                              rtol=1e-4, atol=1e-8, record_trajectories=True)
    k = int(np.asarray(r_ns.n_steps_rec)[0])
    assert int(cnt[2]) == k
    np.testing.assert_allclose(ts[2, :k], np.asarray(r_ns.ts)[0, :k])
    np.testing.assert_allclose(ys[2, :k], np.asarray(r_ns.ys)[0, :k])
    # Switched lanes recorded strictly more steps than the explicit phase
    # alone could have before tripping (the stiff tail is included).
    assert int(cnt[0]) > int(np.asarray(r.naccpt)[2]) // 10


def test_ensemble_auto_dense_output_matches_single():
    """Batched composite sol matches the single-IVP method='auto' dense
    output on queries spanning both phases."""
    from ivp_tpu.batch import solve_ivp_ensemble

    B = 3
    rng = np.random.default_rng(1)
    y0 = np.tile([1.0, 0.0, 0.0], (B, 1))
    y0[:, 0] += 1e-3 * rng.random(B)
    r = solve_ivp_ensemble(rober, (0.0, 50.0), y0, method="auto",
                           rtol=1e-4, atol=1e-8, dense_output=True)
    assert np.all(np.asarray(r.switched))
    tq = np.array([1e-3, 0.05, 0.5, 2.0, 10.0, 49.0])  # both phases
    yq = np.asarray(r.sol(tq))                          # (B, n, m)
    assert yq.shape == (B, 3, tq.size)
    for i in range(B):
        ri = solve_ivp(rober, (0.0, 50.0), y0[i], method="auto",
                       rtol=1e-4, atol=1e-8, dense_output=True)
        np.testing.assert_allclose(yq[i], np.asarray(ri.sol(tq)),
                                   rtol=5e-3, atol=1e-9)
    # Scalar and per-lane-grid query forms.
    ys = np.asarray(r.sol(0.5))
    assert ys.shape == (B, 3)
    tg = np.tile(tq, (B, 1)) * (1.0 + 1e-3 * rng.random((B, tq.size)))
    tg.sort(axis=1)
    yg = np.asarray(r.sol(tg))
    assert yg.shape == (B, 3, tq.size)
    # Per-lane spans cover [0, 50] after the switch.
    tmin, tmax = r.sol.t_span()
    assert np.all(tmin <= 1e-6) and np.all(tmax >= 50.0 - 1e-6)


def test_ensemble_auto_dense_unswitched_lanes():
    """dense_output with a mixed batch: unswitched lanes evaluate phase 1
    everywhere (no phase-2 segments exist for them)."""
    from ivp_tpu.batch import solve_ivp_ensemble

    y0 = np.array([[1.0, 0.0, 0.0, 3e7], [1.0, 0.0, 0.0, 10.0]])
    r = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0, method="auto",
                           rtol=1e-4, atol=1e-8, dense_output=True)
    assert np.asarray(r.switched)[0] and not np.asarray(r.switched)[1]
    tq = np.linspace(0.5, 49.5, 7)
    yq = np.asarray(r.sol(tq))
    r_ns = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0[1:], method="RK45",
                              rtol=1e-4, atol=1e-8, dense_output=True)
    np.testing.assert_allclose(yq[1], np.asarray(r_ns.sol(tq))[0],
                               rtol=1e-10)
    # The switched lane's queried states match a pure-Radau reference.
    ri = solve_ivp(rober_k, (0.0, 50.0), y0[0], method="Radau",
                   rtol=1e-4, atol=1e-8, dense_output=True)
    np.testing.assert_allclose(yq[0], np.asarray(ri.sol(tq)), rtol=5e-3,
                               atol=1e-9)


def test_composite_batch_sol_zero_step_phase2_lane():
    # Regression (ADVICE round 3): a switched lane whose stiff phase
    # recorded ZERO accepted steps must keep phase-1/extrapolated values
    # past its switch time instead of evaluating zeroed phase-2 dense
    # coefficients.
    from ivp_tpu.auto import CompositeBatchOdeSolution
    from ivp_tpu.batch import BatchOdeSolution

    interp = lambda cont, xold, h, t: cont[0]   # constant-per-segment

    def mksol(vals, xolds, hs, edges, counts, t0, y0):
        B = len(vals)
        conts = np.asarray(vals, float).reshape(B, 1, 1, 1)
        return BatchOdeSolution(
            "RK45", interp, np.asarray(xolds, float).reshape(B, 1),
            np.asarray(hs, float).reshape(B, 1),
            conts, np.asarray(edges, float).reshape(B, 1),
            np.asarray(counts), t0, np.asarray(y0, float).reshape(B, 1))

    # phase 1: 3 lanes, one segment [0, 1] each, constant values 1/2/3
    s1 = mksol([1.0, 2.0, 3.0], [0, 0, 0], [1, 1, 1], [1, 1, 1],
               [1, 1, 1], 0.0, [1.0, 2.0, 3.0])
    # phase 2 (switched lanes 1 and 2): lane 1 has a real segment [1, 2]
    # valued 20; lane 2 recorded zero steps (zeroed coefficients)
    s2 = mksol([20.0, 0.0], [1, 0], [1, 1], [2, 0], [1, 0],
               np.array([1.0, 1.0]), [20.0, 99.0])

    comp = CompositeBatchOdeSolution(s1, s2, idx=np.array([1, 2]),
                                     t_switch=np.array([1.0, 1.0]),
                                     forward=True)
    out = np.asarray(comp(1.5))                  # (B, n)
    assert out[0, 0] == 1.0                      # unswitched: phase 1
    assert out[1, 0] == 20.0                     # switched: phase 2 segment
    assert out[2, 0] == 3.0, "zero-step phase-2 lane must fall back to phase 1"
