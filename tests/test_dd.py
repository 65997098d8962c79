"""The double-float precision tier (dtype="dd", core/ddmath.py).

dd runs the state arithmetic in hand-rolled f32-pair (Dekker) arithmetic —
the framework's own, faster equivalent of the TPU's f64 emulation (the
reference library has native f64 and no counterpart; this tier exists so the
flagship ensemble metric keeps f64-class accuracy at well above emulation
speed).  These tests pin (a) the primitives' precision, (b) solver accuracy
against native-f64 ground truth, and (c) the facade's guard rails.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ivp_tpu
from ivp_tpu import ddmath as ddm
from ivp_tpu.batch import build_ensemble_solver


def vdp_dd(t, y):
    return ddm.stack([y[1], (1.0 - y[0] * y[0]) * y[1] - y[0]])


def vdp(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def test_dd_primitives_precision():
    """A deep mul/add chain stays within ~1e-13 of native f64 (the dd unit
    2^-48 ~ 3.6e-15, times chain-length accumulation)."""
    rng = np.random.default_rng(1)
    a = rng.uniform(0.5, 1.5, 10000)
    b = rng.uniform(-1.001, -0.999, 10000)

    @jax.jit
    def chain(x: ddm.DD, y: ddm.DD):
        for _ in range(20):
            x = x * y + y
        return x

    x = chain(ddm.from_f64(jnp.asarray(a)), ddm.from_f64(jnp.asarray(b)))
    got = np.asarray(ddm.to_f64(x))
    want = a.copy()
    for _ in range(20):
        want = want * b + b
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
    assert rel.max() < 2e-13


def test_dd_div_sqrt():
    rng = np.random.default_rng(2)
    a = rng.uniform(0.1, 10.0, 1000)
    b = rng.uniform(0.1, 10.0, 1000)
    q = np.asarray(ddm.to_f64(ddm.div(ddm.from_f64(jnp.asarray(a)),
                                      ddm.from_f64(jnp.asarray(b)))))
    assert np.max(np.abs(q - a / b) / np.abs(a / b)) < 1e-13
    s = np.asarray(ddm.to_f64(ddm.sqrt(ddm.from_f64(jnp.asarray(a)))))
    assert np.max(np.abs(s - np.sqrt(a)) / np.sqrt(a)) < 1e-13


def test_dd_operators_and_pytree():
    x = ddm.from_f64(jnp.asarray([1.5, 2.5]))
    y = 2.0 * x - x / 2.0 + x * x  # operator coverage incl. scalar coercion
    want = 2.0 * np.array([1.5, 2.5]) - np.array([1.5, 2.5]) / 2.0 \
        + np.array([1.5, 2.5]) ** 2
    np.testing.assert_allclose(np.asarray(ddm.to_f64(y)), want, rtol=1e-14)
    # DD is a pytree: tree_map hits both words
    doubled = jax.tree_util.tree_map(lambda a: 2 * a, x)
    assert isinstance(doubled, ddm.DD)
    # slicing slices the number, not the tuple fields
    assert x[0].shape == ()


# ---------------------------------------------------------------------------
# Solver accuracy (vs native-f64 ground truth on CPU)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vdp_setup():
    rng = np.random.default_rng(0)
    y0 = np.array([2.0, 0.0]) + 0.05 * rng.standard_normal((8, 2))
    sol64 = jax.jit(build_ensemble_solver(vdp, "RK45", n=2,
                                          dtype=jnp.float64))
    ref = np.asarray(sol64(y0, 0.0, 100.0, 1e-12, 1e-13).y)
    return y0, sol64, ref


def test_dd_matches_f64_accuracy(vdp_setup):
    """dd-at-rtol is as accurate as f64-at-rtol (reference-parity tolerances;
    the global error is discretization-dominated at these settings)."""
    y0, sol64, ref = vdp_setup
    sol_dd = jax.jit(build_ensemble_solver(vdp_dd, "RK45", n=2, dtype="dd"))
    for rt, at in [(1e-6, 1e-8), (1e-8, 1e-10)]:
        r_dd = sol_dd(y0, 0.0, 100.0, rt, at)
        assert np.all(np.asarray(r_dd.status) == 0)
        assert np.asarray(r_dd.y).dtype == np.float64
        e_dd = np.max(np.abs(np.asarray(r_dd.y) - ref))
        e_64 = np.max(np.abs(np.asarray(sol64(y0, 0.0, 100.0, rt, at).y)
                             - ref))
        # same error class: within 3x of the native-f64 run (both
        # discretization-dominated), and absolutely small
        assert e_dd < 3.0 * e_64 + 1e-9
        # step counts track the f64 controller (identical formulas)
        n_dd = float(np.mean(np.asarray(r_dd.nstep)))
        n_64 = float(np.mean(np.asarray(
            sol64(y0, 0.0, 100.0, rt, at).nstep)))
        assert abs(n_dd - n_64) / n_64 < 0.05


def test_dd_dop853(vdp_setup):
    """DOP853 in dd: same error class and step counts as the native-f64
    engine (dual 8(5,3) error norm needs the dd state words — in plain f32
    the deep cancellation in the error sums reject-storms below rtol~1e-6).

    On TPU the dd run matches f64 to 4 digits with identical step counts
    (measured: e_dd == e_64 at rtol 1e-6/1e-8/1e-9).  On the CPU backend the
    step counts still match exactly but the final state carries an ~3e-7
    noise floor after ~1000 VdP steps (LLVM FMA contraction inside fused
    kernels perturbs the Dekker splits — core/ddmath.py docstring); the
    error assertion allows for it."""
    y0, _, _ = vdp_setup
    sol64 = jax.jit(build_ensemble_solver(vdp, "DOP853", n=2,
                                          dtype=jnp.float64))
    ref = np.asarray(sol64(y0, 0.0, 100.0, 1e-12, 1e-13).y)
    sol_dd = jax.jit(build_ensemble_solver(vdp_dd, "DOP853", n=2,
                                           dtype="dd"))
    for rt, at in [(1e-6, 1e-8), (1e-9, 1e-11)]:
        r_dd = sol_dd(y0, 0.0, 100.0, rt, at)
        assert np.all(np.asarray(r_dd.status) == 0)
        e_dd = np.max(np.abs(np.asarray(r_dd.y) - ref))
        r64 = sol64(y0, 0.0, 100.0, rt, at)
        e_64 = np.max(np.abs(np.asarray(r64.y) - ref))
        assert e_dd < 3.0 * e_64 + 1e-6
        n_dd = float(np.mean(np.asarray(r_dd.nstep)))
        n_64 = float(np.mean(np.asarray(r64.nstep)))
        assert abs(n_dd - n_64) / n_64 < 0.05


def test_dd_dop853_t_eval():
    """DOP853 dd dense sampling: the 8-coefficient interpolant (f32, off the
    hi words) agrees with the f64 engine's samples to f32-grade accuracy."""
    y0 = np.tile([2.0, 0.0], (4, 1))
    tg = np.linspace(0.0, 40.0, 17)
    sol = jax.jit(build_ensemble_solver(vdp_dd, "DOP853", n=2, dtype="dd",
                                        t_eval=tg))
    r = sol(y0, 0.0, 40.0, 1e-8, 1e-10)
    assert np.all(np.asarray(r.n_samples) == 17)
    sol64 = jax.jit(build_ensemble_solver(vdp, "DOP853", n=2,
                                          dtype=jnp.float64, t_eval=tg))
    want = np.asarray(sol64(y0, 0.0, 40.0, 1e-8, 1e-10).y_samples)
    np.testing.assert_allclose(np.asarray(r.y_samples), want,
                               rtol=2e-4, atol=2e-4)


def test_dd_rk23(vdp_setup):
    y0, sol64, ref = vdp_setup
    sol_dd = jax.jit(build_ensemble_solver(vdp_dd, "RK23", n=2, dtype="dd"))
    r = sol_dd(y0, 0.0, 20.0, 1e-6, 1e-8)
    assert np.all(np.asarray(r.status) == 0)
    ref20 = np.asarray(
        jax.jit(build_ensemble_solver(vdp, "RK23", n=2, dtype=jnp.float64))(
            y0, 0.0, 20.0, 1e-6, 1e-8).y)
    assert np.max(np.abs(np.asarray(r.y) - ref20)) < 1e-3


def test_dd_t_eval_and_backward():
    y0 = np.tile([2.0, 0.0], (4, 1))
    tg = np.linspace(0.0, 100.0, 11)
    sol = jax.jit(build_ensemble_solver(vdp_dd, "RK45", n=2, dtype="dd",
                                        t_eval=tg))
    r = sol(y0, 0.0, 100.0, 1e-6, 1e-8)
    assert np.all(np.asarray(r.n_samples) == 11)
    # the f32-sampled trajectory agrees with an f64 run at the grid
    sol64 = jax.jit(build_ensemble_solver(vdp, "RK45", n=2,
                                          dtype=jnp.float64, t_eval=tg))
    want = np.asarray(sol64(y0, 0.0, 100.0, 1e-6, 1e-8).y_samples)
    np.testing.assert_allclose(np.asarray(r.y_samples), want,
                               rtol=2e-4, atol=2e-4)
    # backward: integrate forward then back, terminal state must land at t0
    solb = jax.jit(build_ensemble_solver(vdp_dd, "RK45", n=2, dtype="dd"))
    rb = solb(y0, 50.0, 0.0, 1e-6, 1e-8)
    assert np.all(np.asarray(rb.status) == 0)
    assert np.allclose(np.asarray(rb.t), 0.0)


def test_dd_per_lane_tolerances():
    y0 = np.tile([2.0, 0.0], (4, 1))
    sol = jax.jit(build_ensemble_solver(vdp_dd, "RK45", n=2, dtype="dd"))
    rtol = np.array([1e-4, 1e-5, 1e-6, 1e-7])
    r = sol(y0, 0.0, 50.0, rtol[:, None], 1e-8)
    n = np.asarray(r.nstep)
    assert np.all(np.asarray(r.status) == 0)
    assert n[0] < n[1] < n[2] < n[3]  # tighter lanes take more steps


def test_dd_long_horizon_time_accumulation():
    """t accumulates in f64: thousands of steps land exactly on tend (the
    pure-f32 path loses this once h is below the f32 ulp of t)."""
    sol = jax.jit(build_ensemble_solver(vdp_dd, "RK45", n=2, dtype="dd"))
    r = sol(np.tile([2.0, 0.0], (2, 1)), 0.0, 1000.0, 1e-8, 1e-10)
    assert np.all(np.asarray(r.status) == 0)
    assert np.all(np.asarray(r.t) == 1000.0)
    assert float(np.mean(np.asarray(r.nstep))) > 20000


# ---------------------------------------------------------------------------
# Events and in-device restarts
# ---------------------------------------------------------------------------

def test_dd_events_and_restarts():
    """Bouncing-ball ensemble in dd: event/restart functions see plain f32
    arrays (the hi words / the f32-grade interpolant, Engine.lower/lift in
    methods/base.py) while event times keep f64 resolution.  Bounce times
    must match the analytic chain to interp precision (~1e-5 here: y is
    f32-grade at the crossing with |dy/dt| ~ 10)."""
    from ivp_tpu.types import Status

    g, cor, B = 9.81, 0.8, 8

    def ball(t, y):
        return ddm.stack([y[1], -g])

    def ground(t, y):       # y: plain f32 (lowered view)
        return y[0]

    ground.terminal = True
    ground.direction = -1
    ground.restart = lambda t, y: jnp.array([0.0, -cor * y[1]])

    heights = np.linspace(5.0, 20.0, B)
    y0 = np.stack([heights, np.zeros(B)], axis=1)
    solver = jax.jit(build_ensemble_solver(ball, "RK45", n=2, dtype="dd",
                                           events=[ground],
                                           event_capacity=16, max_restarts=6))
    res = solver(y0, 0.0, 12.0, 1e-9, 1e-9)

    t1 = np.sqrt(2 * heights / g)
    v0 = np.sqrt(2 * g * heights)
    tb = np.asarray(res.t_events)[:, 0, :]
    assert tb.dtype == np.float64
    np.testing.assert_allclose(tb[:, 0], t1, atol=2e-5)
    np.testing.assert_allclose(tb[:, 1], t1 + 2 * cor * v0 / g, atol=5e-5)
    assert np.all(np.asarray(res.n_events)[:, 0] >= 2)
    st = np.asarray(res.status)
    nr = np.asarray(res.n_restarts)
    assert np.all((st == Status.SUCCESS) | (st == Status.USER_INTERRUPT))
    assert np.all(nr[st == Status.USER_INTERRUPT] == 6)
    np.testing.assert_allclose(np.asarray(res.t)[st == Status.SUCCESS], 12.0,
                               atol=1e-9)
    assert np.all(np.asarray(res.y)[:, 0] >= -1e-4)


def test_dd_terminal_event_no_restart():
    """A plain terminal event stops the lane at the crossing; the final
    state is the interp-grade event state promoted back to the dd carry."""
    def decay(t, y):
        return ddm.stack([-y[0]])

    def hit(t, y):
        return y[0] - 0.5

    hit.terminal = True
    solver = jax.jit(build_ensemble_solver(decay, "RK45", n=1, dtype="dd",
                                           events=[hit]))
    res = solver(np.ones((4, 1)), 0.0, 10.0, 1e-9, 1e-11)
    from ivp_tpu.types import Status
    assert np.all(np.asarray(res.status) == Status.USER_INTERRUPT)
    # y(t*) = 0.5 at t* = ln 2, to f32-interp accuracy on the f64 time axis
    np.testing.assert_allclose(np.asarray(res.t), np.log(2.0), atol=2e-7)
    np.testing.assert_allclose(np.asarray(res.y), 0.5, atol=1e-6)


# ---------------------------------------------------------------------------
# High-level facade: dense output, trajectory records, checkpoint/resume
# ---------------------------------------------------------------------------

def test_dd_dense_output_and_records():
    """solve_ivp_ensemble(dtype='dd', dense_output=True): per-lane dense
    records hold the f32 views of the dd state on an f64 time axis; the
    batched evaluator agrees with an f64 run to f32-interp accuracy."""
    from ivp_tpu.batch import solve_ivp_ensemble

    y0 = np.array([2.0, 0.0]) + 0.05 * np.random.default_rng(3).standard_normal((4, 2))
    r = solve_ivp_ensemble(vdp_dd, (0.0, 30.0), y0, method="RK45",
                           rtol=1e-8, atol=1e-10, dtype="dd",
                           dense_output=True)
    assert np.all(np.asarray(r.status) == 0)
    assert r.ts.dtype == np.float64          # time axis keeps f64
    assert np.all(r.n_steps_rec > 50)
    r64 = solve_ivp_ensemble(vdp, (0.0, 30.0), y0, method="RK45",
                             rtol=1e-8, atol=1e-10, dtype=jnp.float64,
                             dense_output=True)
    tq = np.linspace(0.0, 30.0, 23)
    np.testing.assert_allclose(r.sol(tq), r64.sol(tq), rtol=2e-4, atol=2e-4)
    # recorded per-step states track the f64 trajectory at the recorded times
    lane = 0
    k = int(r.n_steps_rec[lane])
    yk = np.asarray(r64.sol(r.ts[lane, :k]))[lane].T      # (k, n)
    np.testing.assert_allclose(r.ys[lane, :k], yk, rtol=2e-4, atol=2e-4)


def test_dd_resumable_checkpoint():
    """build_resumable_solver(dtype='dd'): the carry checkpoints as a DD
    pytree and resumes to the same result as the one-shot solver."""
    from ivp_tpu.batch import build_resumable_solver

    start, resume, extract = build_resumable_solver(vdp_dd, "RK45", n=2,
                                                    dtype="dd",
                                                    chunk_steps=64)
    y0 = np.tile([2.0, 0.0], (4, 1))
    carry, ra = start(y0, 0.0, 50.0, 1e-8, 1e-10)
    rounds = 0
    while not bool(np.all(np.asarray(carry.done))):
        # host round-trip: the checkpoint is a plain pytree of arrays
        flat, treedef = jax.tree_util.tree_flatten(carry)
        carry = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(np.asarray(x)) for x in flat])
        carry = resume(carry, ra)
        rounds += 1
    assert rounds >= 3  # chunking actually happened
    res = extract(carry)
    assert np.asarray(res.y).dtype == np.float64
    one = jax.jit(build_ensemble_solver(vdp_dd, "RK45", n=2, dtype="dd"))(
        y0, 0.0, 50.0, 1e-8, 1e-10)
    np.testing.assert_allclose(np.asarray(res.y), np.asarray(one.y),
                               rtol=1e-9, atol=1e-9)
    assert np.array_equal(np.asarray(res.nstep), np.asarray(one.nstep))


def test_dd_rk4_fixed_step():
    """Fixed-step RK4 over dd state: same step count as the f64 engine and
    f64-class global accuracy at h where RK4's O(h^4) error dominates."""
    sol_dd = jax.jit(build_ensemble_solver(vdp_dd, "RK4", n=2, dtype="dd",
                                           first_step=1e-2))
    sol64 = jax.jit(build_ensemble_solver(vdp, "RK4", n=2,
                                          dtype=jnp.float64,
                                          first_step=1e-2))
    y0 = np.tile([2.0, 0.0], (4, 1))
    r = sol_dd(y0, 0.0, 20.0, 1e-6, 1e-8)
    r64 = sol64(y0, 0.0, 20.0, 1e-6, 1e-8)
    assert np.all(np.asarray(r.status) == 0)
    np.testing.assert_array_equal(np.asarray(r.nstep), np.asarray(r64.nstep))
    np.testing.assert_allclose(np.asarray(r.y), np.asarray(r64.y),
                               rtol=1e-6, atol=1e-7)


def test_dd_per_lane_args():
    """args_batched with dd: every lane integrates its own vector field
    (mu sweep), state math in dd."""
    def vdp_mu(t, y, mu):
        return ddm.stack([y[1], (1.0 - y[0] * y[0]) * y[1] * mu - y[0]])

    mus = np.array([0.5, 1.0, 2.0, 4.0])
    solver = jax.jit(build_ensemble_solver(vdp_mu, "RK45", n=2, dtype="dd",
                                           args=(mus,), args_batched=True))
    y0 = np.tile([2.0, 0.0], (4, 1))
    r = solver(y0, 0.0, 20.0, 1e-8, 1e-10)
    assert np.all(np.asarray(r.status) == 0)
    # per-lane ground truth from the f64 path, one lane at a time
    from ivp_tpu import solve_ivp
    for i, mu in enumerate(mus):
        s = solve_ivp(lambda t, y, m=mu: jnp.array(
            [y[1], m * (1.0 - y[0] ** 2) * y[1] - y[0]]),
            (0.0, 20.0), [2.0, 0.0], method="RK45", rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(r.y)[i], s.y[:, -1],
                                   rtol=1e-4, atol=1e-5)


def test_dd_sharded_8_devices():
    """dtype='dd' through the sharded facade: the DD conversion happens
    per-shard inside each device's while-loop, so the dd state shards with
    the lanes like any carry pytree."""
    from ivp_tpu import solve_ivp_sharded, solve_ivp_ensemble

    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    rng = np.random.default_rng(5)
    B = 32
    y0s = np.array([2.0, 0.0]) + 0.1 * rng.standard_normal((B, 2))
    res = solve_ivp_sharded(vdp_dd, (0.0, 10.0), y0s, method="RK45",
                            rtol=1e-8, atol=1e-10, dtype="dd")
    assert np.asarray(res.y).dtype == np.float64
    assert np.all(np.asarray(res.status) == 0)
    ref = solve_ivp_ensemble(vdp, (0.0, 10.0), y0s, method="RK45",
                             rtol=1e-8, atol=1e-10, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(res.y), np.asarray(ref.y),
                               rtol=1e-5, atol=1e-7)
    # step counts track the f64 controller (same formulas, f32 arithmetic)
    n_dd = np.asarray(res.nstep, float)
    n_64 = np.asarray(ref.nstep, float)
    assert np.max(np.abs(n_dd - n_64) / n_64) < 0.05


# ---------------------------------------------------------------------------
# Facade guard rails
# ---------------------------------------------------------------------------

def test_dd_guard_rails():
    # Every method has a dd engine now (dd_erk / dd_radau / dd_bdf); the
    # remaining dd-specific restrictions live on the stiff engines.
    from ivp_tpu.methods import dd_radau
    with pytest.raises(ValueError, match="identity mass"):
        dd_radau.make_engine(False, jac_fn=lambda t, y: None, n=2,
                             mass=np.eye(2))

    # A plain (non-DD) RHS no longer raises: it auto-lifts to dd arithmetic
    # via jaxpr reinterpretation (core/ddify.py; full coverage in
    # tests/test_ddify.py).
    solver = build_ensemble_solver(vdp, "RK45", n=2, dtype="dd")
    res = solver(np.tile([2.0, 0.0], (2, 1)), 0.0, 1.0, 1e-6, 1e-8)
    assert np.all(np.asarray(res.status) == 0)


def test_lean_renorm_correctness():
    """renorm=False dot/mul feed-through: Dekker formulas are exact for
    unnormalized pairs, so a lean chain agrees with the fully renormalized
    one to the dd noise floor (the TPU stage-path optimization,
    methods/dd_erk.py::_stage_renorm)."""
    from ivp_tpu.core import ddmath as ddm
    rng = np.random.default_rng(0)
    ks = [ddm.from_f64(jnp.asarray(rng.standard_normal(16))) for _ in range(6)]
    h = ddm.from_f64(jnp.asarray(0.0123456789))
    coeffs = [0.1, -0.3, 0.25, 0.0, 0.7, -0.05]
    lean = ddm.mul(ddm.dot_const(coeffs, ks, renorm=False), h, renorm=False)
    full = ddm.mul(ddm.dot_const(coeffs, ks, renorm=True), h, renorm=True)
    # compare as values (hi+lo), not per-word
    d = np.asarray(ddm.to_f64(ddm.add(lean, ddm.neg(full))))
    ref = np.max(np.abs(np.asarray(ddm.to_f64(full))))
    assert np.max(np.abs(d)) <= 1e-13 * max(ref, 1.0)
    # a closing add renormalizes the lean result
    y = ddm.from_f64(jnp.asarray(rng.standard_normal(16)))
    out = ddm.add(y, lean)
    assert np.all(np.abs(np.asarray(out.lo))
                  <= np.spacing(np.abs(np.asarray(out.hi)).astype(np.float32)))
