"""Ensemble (vmap) and sharded (shard_map) integration tests.

vmap-semantics gate (SURVEY.md §4): a batch of IVPs must match a loop of
single IVPs bit-for-bit within tolerance, with per-trajectory adaptive steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp, solve_ivp_ensemble, solve_ivp_sharded
from ivp_tpu.types import Status


def vdp(t, y):
    mu = 1.0
    return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])


def expdec(t, y):
    return -y


def test_ensemble_matches_single():
    rng = np.random.default_rng(0)
    y0s = np.array([2.0, 0.0]) + 0.1 * rng.standard_normal((16, 2))
    res = solve_ivp_ensemble(vdp, (0.0, 20.0), y0s, method="RK45",
                             rtol=1e-6, atol=1e-8)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    assert np.allclose(np.asarray(res.t), 20.0)
    for i in range(0, 16, 5):
        single = solve_ivp(vdp, (0.0, 20.0), y0s[i], method="RK45",
                           rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.y)[i], single.y[:, -1],
                                   rtol=1e-12, atol=1e-12)


def test_ensemble_per_trajectory_steps_differ():
    y0s = np.stack([[2.0, 0.0], [0.01, 0.0], [4.0, -1.0]])
    res = solve_ivp_ensemble(vdp, (0.0, 20.0), y0s, method="RK45",
                             rtol=1e-6, atol=1e-8)
    steps = np.asarray(res.nstep)
    assert len(set(steps.tolist())) > 1  # genuinely adaptive per lane


@pytest.mark.parametrize("method", ["RK45", "DOP853", "BDF", "Radau"])
def test_ensemble_methods(method):
    y0s = np.linspace(0.5, 2.0, 8)[:, None] * np.array([[1.0, 0.0]])
    res = solve_ivp_ensemble(vdp, (0.0, 5.0), y0s, method=method,
                             rtol=1e-6, atol=1e-8)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    for i in (0, 7):
        single = solve_ivp(vdp, (0.0, 5.0), y0s[i], method=method,
                           rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.y)[i], single.y[:, -1],
                                   rtol=1e-9, atol=1e-11)


def test_sharded_ensemble_8_devices():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    rng = np.random.default_rng(1)
    B = 64
    y0s = np.array([2.0, 0.0]) + 0.1 * rng.standard_normal((B, 2))
    res = solve_ivp_sharded(vdp, (0.0, 10.0), y0s, method="RK45",
                            rtol=1e-6, atol=1e-8)
    y = np.asarray(res.y)
    assert y.shape == (B, 2)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    # must match the unsharded ensemble: identical step sequences (counters
    # exact); values agree to cross-program fp reassociation noise
    ref = solve_ivp_ensemble(vdp, (0.0, 10.0), y0s, method="RK45",
                             rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(res.nstep), np.asarray(ref.nstep))
    np.testing.assert_allclose(y, np.asarray(ref.y), rtol=1e-12, atol=1e-12)


def test_large_ensemble_smoke():
    B = 2048
    rng = np.random.default_rng(2)
    y0s = rng.uniform(0.5, 2.0, (B, 1))
    res = solve_ivp_ensemble(expdec, (0.0, 5.0), y0s, method="RK45",
                             rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.y)[:, 0],
                               y0s[:, 0] * np.exp(-5.0), rtol=1e-5)


def test_ensemble_with_terminal_events():
    """Batched bouncing balls: each lane stops at its own ground-hit time."""
    g = 9.81

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1

    heights = np.linspace(5.0, 20.0, 16)
    y0 = np.stack([heights, np.zeros(16)], axis=1)
    res = solve_ivp_ensemble(ball, (0.0, 10.0), y0, method="RK45",
                             rtol=1e-9, atol=1e-9, events=[ground])
    assert np.all(np.asarray(res.status) == Status.USER_INTERRUPT)
    counts = np.asarray(res.n_events)
    assert counts.shape == (16, 1)
    assert np.all(counts == 1)
    t_hits = np.asarray(res.t_events)[:, 0, 0]
    np.testing.assert_allclose(t_hits, np.sqrt(2 * heights / g), rtol=1e-8)
    # final state = event point
    np.testing.assert_allclose(np.asarray(res.t), t_hits, rtol=1e-12)


def test_ensemble_t_eval_sampling():
    """In-loop shared t_eval grid sampling: (B, m, n) trajectories."""
    B = 8
    rng = np.random.default_rng(5)
    lam = rng.uniform(0.5, 1.5, (B, 1))
    grid = np.linspace(0.0, 3.0, 13)

    res = solve_ivp_ensemble(expdec, (0.0, 3.0), lam, method="RK45",
                             rtol=1e-9, atol=1e-12, t_eval=grid)
    ys = np.asarray(res.y_samples)
    assert ys.shape == (B, 13, 1)
    assert np.all(np.asarray(res.n_samples) == 13)
    expected = lam[:, 0:1] * np.exp(-grid)[None, :]
    np.testing.assert_allclose(ys[:, :, 0], expected, rtol=1e-7)


def test_sharded_with_t_eval_and_events():
    """Sharded ensemble with per-lane events and shared-grid sampling."""
    g = 9.81

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1

    heights = np.linspace(5.0, 20.0, 32)
    y0 = np.stack([heights, np.zeros(32)], axis=1)
    grid = np.linspace(0.0, 0.5, 6)
    res = solve_ivp_sharded(ball, (0.0, 10.0), y0, method="RK45",
                            rtol=1e-9, atol=1e-9, events=[ground],
                            t_eval=grid)
    assert np.all(np.asarray(res.status) == Status.USER_INTERRUPT)
    t_hits = np.asarray(res.t_events)[:, 0, 0]
    np.testing.assert_allclose(t_hits, np.sqrt(2 * heights / g), rtol=1e-8)
    ys = np.asarray(res.y_samples)  # (32, 6, 2)
    expected = heights[:, None] - 0.5 * g * grid[None, :] ** 2
    np.testing.assert_allclose(ys[:, :, 0], expected, rtol=1e-9, atol=1e-9)


def test_per_lane_t_span():
    """build_ensemble_solver supports per-trajectory (t0, tf)."""
    from ivp_tpu.batch import build_ensemble_solver

    solver = jax.jit(build_ensemble_solver(expdec, "RK45", n=1))
    B = 8
    y0 = np.ones((B, 1))
    t0 = np.zeros(B)
    tf = np.linspace(1.0, 4.0, B)
    res = solver(jnp.asarray(y0), jnp.asarray(t0), jnp.asarray(tf),
                 1e-9, 1e-12)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.t), tf, rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.y)[:, 0], np.exp(-tf), rtol=1e-8)


def test_per_lane_rtol():
    """Per-lane tolerances (shape (B, 1) or (B, n)): tighter lanes do more
    work and land closer to the exact solution; both ensemble APIs."""
    from ivp_tpu.batch import build_ensemble_solver
    from ivp_tpu import solve_ivp_ensemble

    B = 8
    rtols = np.logspace(-9, -3, B).reshape(B, 1)
    y0 = np.ones((B, 1))
    solver = jax.jit(build_ensemble_solver(expdec, "RK45", n=1))
    res = solver(jnp.asarray(y0), 0.0, 5.0, jnp.asarray(rtols), 1e-12)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    err = np.abs(np.asarray(res.y)[:, 0] - np.exp(-5.0))
    nfev = np.asarray(res.nfev)
    assert err[0] < err[-1] * 1e-2          # tight lane is more accurate
    assert nfev[0] > nfev[-1]               # ... and works harder

    res2 = solve_ivp_ensemble(expdec, (0.0, 5.0), y0, method="RK45",
                              rtol=rtols, atol=1e-12)
    err2 = np.abs(np.asarray(res2.y)[:, 0] - np.exp(-5.0))
    assert err2[0] < err2[-1] * 1e-2


def test_per_lane_t_eval_backward():
    """Per-lane (B, m) sampling grids in a backward-time ensemble."""
    from ivp_tpu.batch import build_ensemble_solver

    B = 6
    grids = np.stack([np.linspace(0.0, -3.0, 7) * (1.0 - 0.05 * k)
                      for k in range(B)])
    solver = jax.jit(build_ensemble_solver(expdec, "RK45", n=1,
                                           t_eval=grids))
    y0 = np.ones((B, 1))
    res = solver(jnp.asarray(y0), 0.0, -3.0, 1e-9, 1e-12)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    assert np.all(np.asarray(res.n_samples) == 7)
    got = np.asarray(res.y_samples)[:, :, 0]
    np.testing.assert_allclose(got, np.exp(-grids), rtol=1e-7, atol=1e-8)


def test_per_lane_args():
    """args_batched=True: each lane integrates a different vector field
    (parameter-sweep ensembles; RHS/jac receive the lane's args slice)."""
    from ivp_tpu.batch import build_ensemble_solver

    B = 8
    lam = np.linspace(0.1, 3.0, B)

    def dec(t, y, lam):
        return -lam * y

    solver = jax.jit(build_ensemble_solver(
        dec, "RK45", n=1, args=(jnp.asarray(lam),), args_batched=True))
    res = solver(np.ones((B, 1)), 0.0, 2.0, 1e-9, 1e-12)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.y)[:, 0], np.exp(-2.0 * lam),
                               rtol=1e-8)

    # stiff per-lane mu through the implicit path (jacfwd sees lane args)
    def vdp(t, y, mu):
        return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

    mus = np.linspace(100.0, 1000.0, 4)
    sol2 = jax.jit(build_ensemble_solver(
        vdp, "Radau", n=2, args=(jnp.asarray(mus),), args_batched=True))
    r2 = sol2(np.tile([2.0, 0.0], (4, 1)), 0.0, 100.0, 1e-6, 1e-9)
    assert np.all(np.asarray(r2.status) == Status.SUCCESS)
    nst = np.asarray(r2.nstep)
    # per-lane fields genuinely differ (each mu has its own step history)
    assert nst.min() != nst.max()


def test_in_device_event_restart():
    """max_restarts: terminal events with a .restart map relaunch the lane
    inside the compiled loop (ModifiedSolution analog, solout.rs:73-78) —
    bouncing-ball ensemble entirely on device."""
    from ivp_tpu.batch import build_ensemble_solver

    g = 9.81
    cor = 0.8

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -cor * y[1]])

    B = 8
    heights = np.linspace(5.0, 20.0, B)
    y0 = np.stack([heights, np.zeros(B)], axis=1)
    solver = jax.jit(build_ensemble_solver(ball, "RK45", n=2, events=[ground],
                                           event_capacity=16, max_restarts=6))
    res = solver(y0, 0.0, 12.0, 1e-9, 1e-9)

    # analytic bounce times: t1 = sqrt(2h/g), then spacing 2*cor^k*v0/g
    t1 = np.sqrt(2 * heights / g)
    v0 = np.sqrt(2 * g * heights)
    tb = np.asarray(res.t_events)[:, 0, :]
    np.testing.assert_allclose(tb[:, 0], t1, atol=1e-10)
    np.testing.assert_allclose(tb[:, 1], t1 + 2 * cor * v0 / g, atol=1e-10)
    nb = np.asarray(res.n_events)[:, 0]
    assert np.all(nb >= 2)
    # lanes that exhaust the restart budget stop with USER_INTERRUPT;
    # the others reach tf with SUCCESS.
    st = np.asarray(res.status)
    nr = np.asarray(res.n_restarts)
    assert np.all((st == Status.SUCCESS) | (st == Status.USER_INTERRUPT))
    assert np.all(nr[st == Status.USER_INTERRUPT] == 6)
    # every SUCCESS lane actually reached tf (a restarted lane must not
    # inherit the engine's finished flag from the interrupted step)
    np.testing.assert_allclose(np.asarray(res.t)[st == Status.SUCCESS], 12.0,
                               atol=1e-9)
    # restarted trajectories stay physical (ball above ground at tf)
    assert np.all(np.asarray(res.y)[:, 0] >= -1e-8)


def test_sharded_per_lane_rtol_and_restarts():
    """Sharded ensembles (8-device virtual mesh) with per-lane rtol and
    in-device event restarts — per-lane state shards with the lanes."""
    B = 32
    rtols = np.logspace(-9, -3, B).reshape(B, 1)
    y0 = np.ones((B, 1))
    res = solve_ivp_sharded(expdec, (0.0, 5.0), y0, method="RK45",
                            rtol=rtols, atol=1e-12)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    err = np.abs(np.asarray(res.y)[:, 0] - np.exp(-5.0))
    assert err[0] < err[-1] * 1e-2
    assert np.asarray(res.nfev)[0] > np.asarray(res.nfev)[-1]

    g = 9.81

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -0.8 * y[1]])

    heights = np.linspace(5.0, 20.0, B)
    y0b = np.stack([heights, np.zeros(B)], axis=1)
    res = solve_ivp_sharded(ball, (0.0, 12.0), y0b, method="RK45",
                            rtol=1e-9, atol=1e-9, events=[ground],
                            event_capacity=16, max_restarts=6)
    tb = np.asarray(res.t_events)[:, 0, 0]
    np.testing.assert_allclose(tb, np.sqrt(2 * heights / g), atol=1e-9)
    assert np.all(np.asarray(res.n_events)[:, 0] >= 2)


def test_sharded_per_lane_span_grid_args():
    """Round-3 sharded surface: per-lane t_span, per-lane t_eval grids and
    per-lane args (args_batched) shard with the lanes over the virtual mesh
    (shard_map slices them as explicit arguments)."""
    B = 16

    def decay(t, y, k):
        return -k * y

    ks = np.linspace(0.5, 2.0, B)
    t0s = np.linspace(0.0, 1.0, B)
    tfs = t0s + np.linspace(2.0, 4.0, B)
    grids = np.stack([np.linspace(t0s[i], tfs[i], 7) for i in range(B)])
    y0 = np.ones((B, 1))
    res = solve_ivp_sharded(decay, (t0s, tfs), y0, method="RK45",
                            rtol=1e-9, atol=1e-12, t_eval=grids,
                            args=(ks,), args_batched=True)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.t), tfs, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.y)[:, 0],
                               np.exp(-ks * (tfs - t0s)), rtol=1e-7)
    samples = np.asarray(res.y_samples)[:, :, 0]
    np.testing.assert_allclose(
        samples, np.exp(-ks[:, None] * (grids - t0s[:, None])), rtol=1e-7)
    assert np.all(np.asarray(res.n_samples) == 7)


def test_restart_with_in_loop_sampling():
    """In-loop t_eval sampling across in-device restarts: grid points after
    a bounce must come from post-restart segments (the in-loop emitter
    truncates each step's emission at the recorded endpoint)."""
    from ivp_tpu.batch import build_ensemble_solver

    g = 9.81
    cor = 0.8

    def ball(t, y):
        return jnp.array([y[1], -g])

    def ground(t, y):
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -cor * y[1]])

    B = 4
    heights = np.array([8.0, 10.0, 12.0, 14.0])
    t1 = np.sqrt(2 * heights / g)
    v1 = cor * np.sqrt(2 * g * heights)
    # per-lane grids: one point before, one shortly after each lane's bounce
    grids = np.stack([np.array([0.5 * t, t + 0.2]) for t in t1])
    solver = jax.jit(build_ensemble_solver(ball, "RK45", n=2,
                                           events=[ground], max_restarts=3,
                                           t_eval=grids))
    res = solver(np.stack([heights, np.zeros(B)], 1), 0.0, 5.0, 1e-9, 1e-9)
    ys = np.asarray(res.y_samples)[:, :, 0]
    before = heights - 0.5 * g * (0.5 * t1) ** 2
    after = v1 * 0.2 - 0.5 * g * 0.2 ** 2  # post-bounce arc, positive
    np.testing.assert_allclose(ys[:, 0], before, rtol=1e-8)
    np.testing.assert_allclose(ys[:, 1], after, rtol=1e-7)
    assert np.all(ys[:, 1] > 0)
    assert np.all(np.asarray(res.n_samples) == 2)


def test_ensemble_max_step_min_step():
    """max_step bounds accepted steps in the ensemble tier (reference
    tests/test_step_control.py max_step semantics, here per lane under
    vmap); min_step floors them."""
    y0 = np.tile([2.0, 0.0], (4, 1))
    r_cap = solve_ivp_ensemble(vdp, (0.0, 10.0), y0, method="RK45",
                               rtol=1e-6, atol=1e-8, max_step=0.05,
                               record_trajectories=True)
    assert np.all(np.asarray(r_cap.status) == 0)
    for i in range(4):
        k = int(np.asarray(r_cap.n_steps_rec)[i])
        ts = np.asarray(r_cap.ts)[i, :k]
        dts = np.diff(np.concatenate([[0.0], ts]))
        assert np.all(dts <= 0.05 + 1e-12)
    # uncapped solve takes far fewer steps (steps larger than 0.05 exist)
    r_free = solve_ivp_ensemble(vdp, (0.0, 10.0), y0, method="RK45",
                                rtol=1e-6, atol=1e-8)
    assert np.all(np.asarray(r_cap.nstep) > np.asarray(r_free.nstep))

    # min_step is accepted and the solve still succeeds (the reference's
    # min_step is an accept-path clamp, not a hard floor on every step —
    # its own test only asserts success, test_step_control.py:164-176)
    r_min = solve_ivp_ensemble(vdp, (0.0, 10.0), y0, method="Radau",
                               rtol=1e-6, atol=1e-8, min_step=1e-10)
    assert np.all(np.asarray(r_min.status) == 0)


def test_ensemble_mass_matrix_via_solver_options():
    """Mass-matrix ensembles: M y' = f through the batched Radau engine
    (reference mass_storage, solve/options.rs:75-123 — here per-lane under
    vmap via solver_options)."""
    M = np.array([[2.0, 0.0], [0.0, 1.0]])

    def rhs(t, y):  # M y' = [y1, -y0]  =>  y' = [y1/2, -y0]
        return jnp.array([y[1], -y[0]])

    y0 = np.tile([1.0, 0.0], (4, 1))
    res = solve_ivp_ensemble(rhs, (0.0, 2.0), y0, method="Radau",
                             rtol=1e-8, atol=1e-10,
                             solver_options={"mass": M})
    assert np.all(np.asarray(res.status) == 0)

    def rhs_explicit(t, y):
        return jnp.array([0.5 * y[1], -y[0]])

    ref = solve_ivp_ensemble(rhs_explicit, (0.0, 2.0), y0, method="RK45",
                             rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.y), np.asarray(ref.y),
                               rtol=0, atol=1e-6)


def test_ensemble_jac_sparsity_grouped_fd_and_banded():
    """jac_sparsity in the ensemble tier: grouped-FD Jacobian (reference
    src/python/sparsity.rs) + banded backend with the band auto-detected
    from the pattern (matrix/base.rs banded storage), vmapped.  At n=12
    'auto' now routes to dense LU (BANDED_AUTO_MIN_N), so the CR path is
    requested explicitly; the band still comes from the sparsity pattern."""
    N = 12

    def rhs(t, y):
        yl = jnp.concatenate([jnp.zeros((1,), y.dtype), y[:-1]])
        yr = jnp.concatenate([y[1:], jnp.zeros((1,), y.dtype)])
        return 10.0 * (yl - 2.0 * y + yr) - y ** 3

    pattern = np.zeros((N, N))
    for i in range(N):
        for j in range(max(0, i - 1), min(N, i + 2)):
            pattern[i, j] = 1.0

    y0 = np.tile(np.sin(np.pi * np.arange(1, N + 1) / (N + 1)), (3, 1))
    r_sp = solve_ivp_ensemble(rhs, (0.0, 0.5), y0, method="Radau",
                              rtol=1e-7, atol=1e-10, jac_sparsity=pattern,
                              solver_options={"linear_mode": "banded"})
    r_fd = solve_ivp_ensemble(rhs, (0.0, 0.5), y0, method="Radau",
                              rtol=1e-7, atol=1e-10)
    assert np.all(np.asarray(r_sp.status) == 0)
    np.testing.assert_allclose(np.asarray(r_sp.y), np.asarray(r_fd.y),
                               rtol=0, atol=1e-7)
    # grouped FD costs ~n_groups (3) RHS evals per jac instead of n (12)
    assert np.asarray(r_sp.nfev).max() < np.asarray(r_fd.nfev).max() + 1

    # and through the dd tier
    r_dd = solve_ivp_ensemble(rhs, (0.0, 0.5), y0, method="Radau",
                              rtol=1e-7, atol=1e-10, jac_sparsity=pattern,
                              dtype="dd")
    assert np.all(np.asarray(r_dd.status) == 0)
    np.testing.assert_allclose(np.asarray(r_dd.y), np.asarray(r_fd.y),
                               rtol=0, atol=1e-6)
    # Efficiency gate: the f32 grouped-FD Jacobian must actually be a
    # Jacobian.  (A dtype-blind FD eps once rounded the perturbation away,
    # giving J == 0 — Newton limped through on tiny steps, so the state
    # comparison above stayed green while nfev exploded.)
    assert np.asarray(r_dd.nfev).max() < 3 * np.asarray(r_fd.nfev).max()


def test_ensemble_empty_system():
    """Empty system (n=0) succeeds trivially in the ensemble tier
    (reference solve_ivp.rs:147-176 fast path; scipy test_ivp.py:712-728)."""
    r = solve_ivp_ensemble(lambda t, y: y[:0], (0.0, 1.0), np.zeros((3, 0)),
                           method="RK45")
    assert np.all(np.asarray(r.status) == 0)
    assert np.asarray(r.y).shape == (3, 0)
    np.testing.assert_allclose(np.asarray(r.t), 1.0)
    r2 = solve_ivp_ensemble(lambda t, y: y[:0], (0.0, 1.0),
                            np.zeros((2, 0)), method="Radau",
                            dense_output=True)
    assert np.all(np.asarray(r2.status) == 0)
    assert np.asarray(r2.ys).shape == (2, 0, 0)


def test_ensemble_zero_interval_lanes():
    """Per-lane zero-interval spans finish trivially with SUCCESS
    (reference solve_ivp.rs:109-145 fast path, per lane under vmap)."""
    from ivp_tpu.batch import build_ensemble_solver

    solver = build_ensemble_solver(expdec, "RK45", n=1, max_steps=50)
    t0 = np.array([0.0, 2.0, 0.0])
    tf = np.array([1.0, 2.0, 2.0])
    r = solver(np.ones((3, 1)), t0, tf, 1e-9, 1e-12)
    assert np.all(np.asarray(r.status) == 0)
    np.testing.assert_allclose(np.asarray(r.y).ravel(),
                               [np.exp(-1.0), 1.0, np.exp(-2.0)], rtol=1e-8)
    assert int(np.asarray(r.nstep)[1]) == 0  # trivial lane did no work

    # whole-batch zero interval through the facade
    r2 = solve_ivp_ensemble(expdec, (2.0, 2.0), np.ones((3, 1)),
                            method="RK45", max_steps=50)
    assert np.all(np.asarray(r2.status) == 0)
    np.testing.assert_allclose(np.asarray(r2.y).ravel(), 1.0)


def test_ensemble_mixed_directions():
    """Forward and backward lanes coexist in one batch (per-lane posneg):
    the batched analog of reference tests/backward_and_bounds.rs."""
    from ivp_tpu.batch import build_ensemble_solver

    solver = build_ensemble_solver(expdec, "RK45", n=1)
    t0 = np.array([0.0, 3.0, 1.0])
    tf = np.array([3.0, 0.0, 3.0])   # fwd, bwd, fwd
    y0 = np.array([[1.0], [np.exp(-3.0)], [np.exp(-1.0)]])
    r = solver(y0, t0, tf, 1e-10, 1e-13)
    assert np.all(np.asarray(r.status) == 0)
    np.testing.assert_allclose(
        np.asarray(r.y).ravel(),
        [np.exp(-3.0), 1.0, np.exp(-3.0)], rtol=1e-8)


# =============================================================================
# Lane chunking (TPU_NOTES #31: equal sub-batches, padded tail, one compile)
# =============================================================================

def test_lane_chunk_matches_unchunked():
    from ivp_tpu.batch import solve_ivp_ensemble

    B = 10
    y0 = np.linspace(1.0, 2.0, B)[:, None]
    rt = np.geomspace(1e-8, 1e-5, B)           # per-lane rtol slices with lanes
    te = np.linspace(0.0, 10.0, 7)

    kw = dict(method="RK45", rtol=rt, atol=1e-10, t_eval=te)
    r0 = solve_ivp_ensemble(lambda t, y: -0.5 * y, (0.0, 10.0), y0, **kw)
    r1 = solve_ivp_ensemble(lambda t, y: -0.5 * y, (0.0, 10.0), y0,
                            lane_chunk=4, **kw)   # chunks 4 + 4 + 2(padded)
    for f in ("t", "y", "status", "nfev", "nstep", "naccpt", "nrejct",
              "y_samples", "n_samples"):
        np.testing.assert_array_equal(np.asarray(getattr(r0, f)),
                                      np.asarray(getattr(r1, f)), err_msg=f)


def test_lane_chunk_dense_output():
    from ivp_tpu.batch import solve_ivp_ensemble

    B = 6
    y0 = np.stack([np.linspace(0.5, 1.5, B), np.zeros(B)], axis=1)

    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    kw = dict(method="DOP853", rtol=1e-9, atol=1e-11, dense_output=True)
    r0 = solve_ivp_ensemble(sho, (0.0, 10.0), y0, **kw)
    r1 = solve_ivp_ensemble(sho, (0.0, 10.0), y0, lane_chunk=4, **kw)
    np.testing.assert_array_equal(np.asarray(r0.n_steps_rec),
                                  np.asarray(r1.n_steps_rec))
    tq = np.linspace(0.0, 10.0, 23)
    np.testing.assert_allclose(np.asarray(r1.sol(tq)),
                               np.asarray(r0.sol(tq)), rtol=1e-12, atol=0)
    # scalar + per-lane grids through the chunked evaluator
    assert np.asarray(r1.sol(5.0)).shape == (B, 2)
    tg = np.tile(tq, (B, 1))
    np.testing.assert_allclose(np.asarray(r1.sol(tg)),
                               np.asarray(r0.sol(tq)), rtol=1e-12, atol=0)
    tmin, tmax = r1.sol.t_span()
    assert tmin.shape == (B,) and np.all(tmax >= 10.0 - 1e-9)


def test_lane_chunk_auto_routing():
    from ivp_tpu.batch import solve_ivp_ensemble
    from tests.test_auto import rober_k

    y0 = np.array([[1.0, 0.0, 0.0, 3e7]] * 2 + [[1.0, 0.0, 0.0, 10.0]] * 3)
    r = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0, method="auto",
                           rtol=1e-4, atol=1e-8, lane_chunk=2)
    sw = np.asarray(r.switched)
    assert sw[:2].all() and not sw[2:].any()
    assert np.all(np.asarray(r.status) == 0)
    r0 = solve_ivp_ensemble(rober_k, (0.0, 50.0), y0, method="auto",
                            rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(r.y), np.asarray(r0.y),
                               rtol=1e-10, atol=1e-12)


def test_sharded_dense_output_8_devices():
    """Batched dense output / trajectory records over the mesh: each drain
    chunk is a per-device while-loop; results match the one-chip ensemble
    recording tier exactly (same compiled engine, same step sequences)."""
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(3)
    B = 32
    y0s = np.array([2.0, 0.0]) + 0.1 * rng.standard_normal((B, 2))
    res = solve_ivp_sharded(vdp, (0.0, 10.0), y0s, method="RK45",
                            rtol=1e-6, atol=1e-8, dense_output=True,
                            rec_chunk=64)  # force several drain chunks
    ref = solve_ivp_ensemble(vdp, (0.0, 10.0), y0s, method="RK45",
                             rtol=1e-6, atol=1e-8, dense_output=True,
                             rec_chunk=64)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    np.testing.assert_array_equal(np.asarray(res.n_steps_rec),
                                  np.asarray(ref.n_steps_rec))
    np.testing.assert_allclose(np.asarray(res.ts), np.asarray(ref.ts),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               rtol=1e-10, atol=1e-12)
    tq = np.linspace(0.0, 10.0, 17)
    np.testing.assert_allclose(np.asarray(res.sol(tq)),
                               np.asarray(ref.sol(tq)),
                               rtol=1e-10, atol=1e-12)


def test_sharded_record_trajectories_events_per_lane_grid():
    """record_trajectories + events + per-lane t_eval grids through the
    sharded recording tier."""
    assert len(jax.devices()) == 8
    B = 16
    y0 = np.stack([np.full(B, 10.0), np.linspace(0.0, 1.0, B)], axis=1)

    def ball(t, y):
        return jnp.array([y[1], -9.81])

    def hit(t, y):
        return y[0]
    hit.terminal = True
    hit.direction = -1

    tg = np.tile(np.linspace(0.0, 1.0, 5), (B, 1))
    res = solve_ivp_sharded(ball, (0.0, 10.0), y0, method="RK45",
                            rtol=1e-9, atol=1e-11, events=[hit], t_eval=tg,
                            record_trajectories=True)
    ref = solve_ivp_ensemble(ball, (0.0, 10.0), y0, method="RK45",
                             rtol=1e-9, atol=1e-11, events=[hit], t_eval=tg,
                             record_trajectories=True)
    np.testing.assert_allclose(np.asarray(res.t_events),
                               np.asarray(ref.t_events), rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(res.n_events),
                                  np.asarray(ref.n_events))
    np.testing.assert_allclose(np.asarray(res.y_samples),
                               np.asarray(ref.y_samples), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(res.n_steps_rec),
                                  np.asarray(ref.n_steps_rec))


def test_lane_chunk_perlane_tol_chunk_equals_n():
    # Regression (ADVICE round 3): a genuine per-lane (B,) rtol sliced to
    # (lane_chunk,) collided with n when lane_chunk == n and was silently
    # reinterpreted as per-STATE tolerances inside the sub-solve.
    # Tolerances are now disambiguated to 2-D against the original (B, n)
    # before chunking.
    from ivp_tpu.batch import solve_ivp_ensemble

    B, n = 6, 2

    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    y0 = np.stack([np.linspace(0.5, 1.5, B), np.zeros(B)], axis=1)
    rt = np.geomspace(1e-9, 1e-4, B)           # per-lane, B != n
    kw = dict(method="RK45", rtol=rt, atol=1e-12)
    r0 = solve_ivp_ensemble(sho, (0.0, 10.0), y0, **kw)
    r1 = solve_ivp_ensemble(sho, (0.0, 10.0), y0, lane_chunk=n, **kw)
    for f in ("y", "status", "nstep", "nfev"):
        np.testing.assert_array_equal(np.asarray(getattr(r0, f)),
                                      np.asarray(getattr(r1, f)), err_msg=f)
    # sanity: the per-lane tolerances really differ across lanes
    assert len(set(np.asarray(r0.nstep).tolist())) > 1


def test_sharded_recording_solver_cached(monkeypatch):
    # Regression (ADVICE round 3): the sharded recording tier rebuilt
    # build_recording_solver and re-jitted the shard_map runner on every
    # call; it now goes through _SHARDED_CACHE.
    import ivp_tpu.batch as batch_mod
    from ivp_tpu import solve_ivp_sharded

    calls = {"n": 0}
    orig = batch_mod.build_recording_solver

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(batch_mod, "build_recording_solver", counted)

    y0 = np.stack([np.linspace(0.5, 1.5, 8), np.zeros(8)], axis=1)
    kw = dict(method="RK45", rtol=1e-6, atol=1e-9, dense_output=True)
    r0 = solve_ivp_sharded(_sho_cached_rhs, (0.0, 5.0), y0, **kw)
    assert calls["n"] == 1
    r1 = solve_ivp_sharded(_sho_cached_rhs, (0.0, 5.0), y0, **kw)
    assert calls["n"] == 1, "second identical call must hit the cache"
    np.testing.assert_array_equal(np.asarray(r0.y), np.asarray(r1.y))
    tq = np.linspace(0.0, 5.0, 9)
    np.testing.assert_array_equal(np.asarray(r0.sol(tq)),
                                  np.asarray(r1.sol(tq)))


def _sho_cached_rhs(t, y):
    return jnp.array([y[1], -y[0]])


def test_stall_emission_many_samples_per_step():
    """Round-5 stall-based sampling: a dense grid over coarse steps puts
    MANY due samples inside one accepted step — the lane must stall and
    emit them one per driver iteration, each interpolated within the
    step that covered it (driver.py body/step_body)."""
    B = 4
    lam = np.linspace(0.4, 1.0, B).reshape(B, 1)
    grid = np.linspace(0.0, 3.0, 64)  # ~10x denser than the step grid
    res = solve_ivp_ensemble(expdec, (0.0, 3.0), lam, method="RK45",
                             rtol=1e-3, atol=1e-6, t_eval=grid)
    assert np.all(np.asarray(res.n_samples) == 64)
    # Loose-rtol solves take ~10 steps over [0,3]: >5 samples per step.
    assert np.all(np.asarray(res.naccpt) < 16)
    ys = np.asarray(res.y_samples)[:, :, 0]
    expected = lam * np.exp(-grid)[None, :]
    np.testing.assert_allclose(ys, expected, rtol=2e-3, atol=1e-6)


def test_stall_emission_drains_after_finish():
    """Samples due at/near tend must still be emitted after the engine
    finishes (done is deferred until the drain completes)."""
    B = 3
    lam = np.ones((B, 1))
    grid = np.asarray([0.0, 2.9999, 3.0])  # last two inside the final step
    res = solve_ivp_ensemble(expdec, (0.0, 3.0), lam, method="RK45",
                             rtol=1e-9, atol=1e-12, t_eval=grid)
    assert np.all(np.asarray(res.n_samples) == 3)
    np.testing.assert_allclose(np.asarray(res.y_samples)[:, -1, 0],
                               np.exp(-3.0), rtol=1e-8)
    assert np.all(np.asarray(res.status) == 0)
