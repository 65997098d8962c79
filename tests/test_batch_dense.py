"""Batched dense output / per-lane trajectory records (ensemble tier).

Round-3 top directive: the ensemble tier now records every accepted step per
lane (``ts``/``ys``/``n_steps_rec``) and exposes a batched dense evaluator
``sol`` whose per-lane interpolants match the single-IVP ``OdeResult.sol``
(reference src/solve/cont.rs:79-153, solout.rs:141-147).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp
from ivp_tpu.batch import solve_ivp_ensemble


def vdp(t, y):
    return jnp.array([y[1], ((1.0 - y[0] ** 2) * y[1] - y[0])])


def test_batched_dense_matches_single_ivp():
    """Lanes with different tolerances (=> different step sequences): the
    batched sol matches per-lane single-IVP sol to 1e-9."""
    y0 = np.array([[2.0, 0.0], [1.0, 1.0], [0.5, -0.5]])
    rtols = np.array([1e-6, 1e-8, 1e-4])
    res = solve_ivp_ensemble(vdp, (0.0, 8.0), y0, method="RK45",
                             rtol=rtols, atol=1e-9, dense_output=True)
    assert np.all(np.asarray(res.status) == 0)
    assert res.sol is not None and res.ts is not None
    counts = np.asarray(res.n_steps_rec)
    # Different tolerances must have produced different step counts.
    assert len(set(counts.tolist())) == 3

    ts_q = np.linspace(0.0, 8.0, 57)
    batched = res.sol(ts_q)  # (B, n, m)
    assert batched.shape == (3, 2, 57)
    for b in range(3):
        ref = solve_ivp(vdp, (0.0, 8.0), y0[b], method="RK45",
                        rtol=float(rtols[b]), atol=1e-9, dense_output=True)
        np.testing.assert_allclose(batched[b], ref.sol(ts_q), rtol=0,
                                   atol=1e-9)
        # Step records match the single-IVP accepted-step trajectory.
        np.testing.assert_allclose(res.ts[b, :counts[b]], ref.t[1:],
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(res.ys[b, :counts[b]], ref.y[:, 1:].T,
                                   rtol=0, atol=1e-12)


def test_batched_dense_chunk_drain():
    """rec_chunk smaller than the step count exercises the host drain loop
    (multiple chunks re-assembled in order)."""
    y0 = np.array([[2.0, 0.0], [1.5, 0.5]])
    res = solve_ivp_ensemble(vdp, (0.0, 10.0), y0, method="RK45",
                             rtol=1e-8, atol=1e-10, dense_output=True,
                             rec_chunk=16)
    ref = solve_ivp(vdp, (0.0, 10.0), y0[0], method="RK45",
                    rtol=1e-8, atol=1e-10, dense_output=True)
    counts = np.asarray(res.n_steps_rec)
    assert counts[0] > 16  # actually needed >1 chunk
    np.testing.assert_allclose(res.ts[0, :counts[0]], ref.t[1:],
                               rtol=0, atol=1e-12)
    ts_q = np.linspace(0.0, 10.0, 33)
    np.testing.assert_allclose(res.sol(ts_q)[0], ref.sol(ts_q), rtol=0,
                               atol=1e-9)


def test_batched_dense_query_shapes():
    y0 = np.array([[2.0, 0.0], [1.0, 1.0]])
    res = solve_ivp_ensemble(vdp, (0.0, 4.0), y0, method="RK45",
                             rtol=1e-6, atol=1e-9, dense_output=True)
    assert res.sol(2.0).shape == (2, 2)                    # scalar -> (B, n)
    assert res.sol(np.linspace(0, 4, 9)).shape == (2, 2, 9)
    per_lane = np.stack([np.linspace(0, 4, 9), np.linspace(1, 3, 9)])
    out = res.sol(per_lane)
    assert out.shape == (2, 2, 9)
    # Per-lane grids evaluate against each lane's own interpolant.
    ref = solve_ivp(vdp, (0.0, 4.0), y0[1], method="RK45",
                    rtol=1e-6, atol=1e-9, dense_output=True)
    np.testing.assert_allclose(out[1], ref.sol(per_lane[1]), rtol=0,
                               atol=1e-9)
    # Lane spans reported.
    np.testing.assert_allclose(res.sol.t_mins, [0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(res.sol.t_maxs, [4.0, 4.0], atol=1e-12)


def test_batched_dense_event_restart_lane():
    """A bouncing-ball lane with in-device restarts: the batched dense output
    matches the single-IVP solve with the same fused restart path (the
    restart-truncated segments must not shadow post-restart segments)."""

    def ball(t, y):
        return jnp.array([y[1], -9.81])

    def hit(t, y):
        return y[0]
    hit.terminal = True
    hit.direction = -1
    hit.restart = lambda t, y: jnp.array([0.0, -0.7 * y[1]])

    y0 = np.array([[10.0, 0.0], [5.0, 0.0]])
    res = solve_ivp_ensemble(ball, (0.0, 4.0), y0, method="RK45",
                             rtol=1e-9, atol=1e-11, events=[hit],
                             max_restarts=8, dense_output=True)
    assert np.all(np.asarray(res.n_restarts) >= 1)
    ts_q = np.linspace(0.0, 4.0, 101)
    batched = res.sol(ts_q)
    for b in range(2):
        ref = solve_ivp(ball, (0.0, 4.0), y0[b], method="RK45",
                        rtol=1e-9, atol=1e-11, events=[hit], max_restarts=8,
                        dense_output=True)
        assert ref.n_restarts == int(np.asarray(res.n_restarts)[b])
        np.testing.assert_allclose(batched[b], ref.sol(ts_q), rtol=0,
                                   atol=1e-9)
        # Height stays physical (restart segments correctly bounded).
        assert batched[b][0].min() > -1e-6


def test_batched_dense_backward_and_extrapolation():
    """Backward-time ensembles record descending edges; queries beyond the
    covered span extrapolate with the first/last segment (SciPy semantics,
    same as the single-IVP OdeSolution)."""
    y0 = np.array([[2.0, 0.0], [1.0, 1.0]])
    res = solve_ivp_ensemble(vdp, (8.0, 0.0), y0, method="RK45",
                             rtol=1e-7, atol=1e-9, dense_output=True)
    assert np.all(np.asarray(res.status) == 0)
    ts_q = np.linspace(8.0, 0.0, 33)
    batched = res.sol(ts_q)
    for b in range(2):
        ref = solve_ivp(vdp, (8.0, 0.0), y0[b], method="RK45",
                        rtol=1e-7, atol=1e-9, dense_output=True)
        np.testing.assert_allclose(batched[b], ref.sol(ts_q), rtol=0,
                                   atol=1e-8)
        # extrapolation beyond both ends matches the single-IVP evaluator
        np.testing.assert_allclose(res.sol(-0.3)[b], ref.sol(-0.3),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(res.sol(8.2)[b], ref.sol(8.2),
                                   rtol=0, atol=1e-6)


def test_record_trajectories_without_dense():
    """record_trajectories=True returns (ts, ys) step records but no sol."""
    y0 = np.array([[2.0, 0.0]])
    res = solve_ivp_ensemble(vdp, (0.0, 5.0), y0, method="DOP853",
                             rtol=1e-7, atol=1e-9, record_trajectories=True)
    assert res.sol is None
    c = int(np.asarray(res.n_steps_rec)[0])
    assert c > 0
    ref = solve_ivp(vdp, (0.0, 5.0), y0[0], method="DOP853",
                    rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res.ts[0, :c], ref.t[1:], rtol=0, atol=1e-12)
    np.testing.assert_allclose(res.ys[0, :c], ref.y[:, 1:].T, rtol=0,
                               atol=1e-12)


def test_batched_dense_stiff_radau():
    """Stiff lanes (Radau) with dense output under vmap."""
    def stiff(t, y):
        return jnp.array([y[1], 100.0 * ((1.0 - y[0] ** 2) * y[1] - y[0])])

    y0 = np.array([[2.0, 0.0], [1.0, 0.0]])
    res = solve_ivp_ensemble(stiff, (0.0, 3.0), y0, method="Radau",
                             rtol=1e-6, atol=1e-8, dense_output=True)
    ts_q = np.linspace(0.0, 3.0, 31)
    batched = res.sol(ts_q)
    for b in range(2):
        ref = solve_ivp(stiff, (0.0, 3.0), y0[b], method="Radau",
                        rtol=1e-6, atol=1e-8, dense_output=True)
        np.testing.assert_allclose(batched[b], ref.sol(ts_q), rtol=0,
                                   atol=1e-8)
