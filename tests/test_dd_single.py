"""dtype="dd" through the single-IVP solve_ivp facade + dtype="auto" routing.

Round-4 VERDICT #1: the dd precision tier (f64-class state from double-f32
arithmetic, core/ddmath.py) is no longer ensemble-only — B=1 runs through
the same generic driver, and ``dtype="auto"`` makes it the default
f64-class path on TPUs with precision-aware fallback
(methods/ddtier.py::resolve_auto_dtype).  The reference's precision tier is
uniform across its whole API (reference src/lib.rs:78-85).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp
from ivp_tpu.methods.ddtier import resolve_auto_dtype, is_dd


def decay(t, y):
    return -0.5 * y


def sho(t, y):
    return jnp.stack([y[1], -y[0]])


# ---------------------------------------------------------------------------
# Explicit methods: dd matches the platform-f64 engine
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["RK45", "DOP853", "RK23"])
def test_dd_single_matches_f64(method):
    r64 = solve_ivp(decay, (0.0, 10.0), [2.0, 4.0], method=method,
                    rtol=1e-10, atol=1e-12)
    rdd = solve_ivp(decay, (0.0, 10.0), [2.0, 4.0], method=method,
                    rtol=1e-10, atol=1e-12, dtype="dd")
    assert rdd.success
    exact = np.array([2.0, 4.0]) * np.exp(-5.0)
    # Recorded endpoints carry the full DD pair (driver-wide recording).
    # Bound set by the CPU backend's dd noise floor (~5e-8 relative for
    # DOP853's long dot chains — TPU_NOTES #20-21; identical to the dd
    # *ensemble* tier on the same backend, and ~5e-14 on TPU).
    np.testing.assert_allclose(rdd.y[:, -1], exact, rtol=1e-7)
    # Step counts match the platform-f64 engine (same controller decisions,
    # modulo the CPU FMA-contraction perturbation of the dd residue stream).
    assert abs(int(rdd.nstep) - int(r64.nstep)) <= max(3, 0.02 * r64.nstep)


def test_dd_single_rk4_fixed_step():
    rdd = solve_ivp(sho, (0.0, 1.0), [1.0, 0.0], method="RK4",
                    first_step=0.01, dtype="dd")
    assert rdd.success
    np.testing.assert_allclose(rdd.y[:, -1], [np.cos(1.0), -np.sin(1.0)],
                               atol=1e-8)


def test_dd_single_tight_rtol_final_state():
    """f64-class recorded endpoints: at amplitude 1e4, f32-grade recording
    (the pre-round-4 Engine.lower view) would err by >= 1e4 * eps_f32/2
    ~ 6e-4 absolute; the wide DD record must stay orders below that."""
    amp = 1e4
    r = solve_ivp(sho, (0.0, 2 * np.pi), [amp, 0.0], method="DOP853",
                  rtol=1e-11, atol=1e-13, dtype="dd")
    assert r.success
    np.testing.assert_allclose(r.y[:, -1], [amp, 0.0], atol=amp * 5e-8)


# ---------------------------------------------------------------------------
# Stiff methods
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_dd_single_stiff(method):
    def vdp(t, y):
        return jnp.stack([y[1], 5.0 * ((1 - y[0] ** 2) * y[1]) - y[0]])

    r64 = solve_ivp(vdp, (0.0, 10.0), [2.0, 0.0], method=method,
                    rtol=1e-7, atol=1e-9)
    rdd = solve_ivp(vdp, (0.0, 10.0), [2.0, 0.0], method=method,
                    rtol=1e-7, atol=1e-9, dtype="dd")
    assert rdd.success
    np.testing.assert_allclose(rdd.y[:, -1], r64.y[:, -1], rtol=1e-5,
                               atol=1e-7)


def test_dd_single_stiff_banded_sparsity():
    """jac_sparsity drives grouped FD + banded routing under dd, same as the
    ensemble tier."""
    n = 8
    pattern = np.eye(n, k=0) + np.eye(n, k=1) + np.eye(n, k=-1)

    def rd(t, y):
        yl = jnp.concatenate([y[:1] * 0, y[:-1]])
        yr = jnp.concatenate([y[1:], y[-1:] * 0])
        return yl - 2 * y + yr - y ** 3

    r64 = solve_ivp(rd, (0.0, 1.0), np.linspace(0.1, 1.0, n), method="Radau",
                    rtol=1e-7, atol=1e-9, jac_sparsity=pattern)
    rdd = solve_ivp(rd, (0.0, 1.0), np.linspace(0.1, 1.0, n), method="Radau",
                    rtol=1e-7, atol=1e-9, jac_sparsity=pattern, dtype="dd")
    assert rdd.success
    np.testing.assert_allclose(rdd.y[:, -1], r64.y[:, -1], rtol=1e-6,
                               atol=1e-8)


# ---------------------------------------------------------------------------
# dd + sampled output (interp-grade contract) and events
# ---------------------------------------------------------------------------

def test_dd_single_t_eval_and_dense():
    ts = np.linspace(0.0, 10.0, 11)
    r = solve_ivp(decay, (0.0, 10.0), [2.0], t_eval=ts, dense_output=True,
                  rtol=1e-6, atol=1e-9, dtype="dd")
    assert r.success
    exact = 2.0 * np.exp(-0.5 * ts)
    # Sampled outputs are interp-grade (f32 views) — within the documented
    # ~1e-6 relative envelope at these magnitudes.
    np.testing.assert_allclose(r.y[0], exact, rtol=5e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.sol(5.0))[0],
                               2.0 * np.exp(-2.5), rtol=5e-6)


def test_dd_single_events():
    def ev(t, y):
        return y[0]
    ev.terminal = True
    ev.direction = -1

    r = solve_ivp(sho, (0.0, 10.0), [1.0, 0.0], events=[ev],
                  rtol=1e-9, atol=1e-12, dtype="dd")
    # cos crosses zero going down at pi/2; event *time* keeps f64-grade
    # resolution (Brent on the time axis).
    assert r.status == 1
    assert abs(r.t_events[0][0] - np.pi / 2) < 1e-5


def test_dd_single_backward():
    r = solve_ivp(decay, (10.0, 0.0), [2.0 * np.exp(-5.0)], rtol=1e-9,
                  atol=1e-12, dtype="dd")
    assert r.success
    np.testing.assert_allclose(r.y[0, -1], 2.0, rtol=1e-7)


# ---------------------------------------------------------------------------
# dtype="auto" routing
# ---------------------------------------------------------------------------

def test_auto_dtype_routing_rules():
    import jax
    on_tpu = jax.default_backend() in ("tpu", "axon")
    # Lean final-state request: dd on TPU, platform f64 elsewhere.
    r = resolve_auto_dtype("auto", rtol=1e-12, sampled_output=False)
    assert is_dd(r) if on_tpu else r == jnp.float64
    # Round 5: sampled output no longer forces a fallback at ANY rtol —
    # dense coefficients are dd-packed and interpolated in f64
    # (ddtier.dd_pack_cont), so the dd tier is precision-uniform.
    for rtol in (1e-4, 1e-9, 1e-12):
        r = resolve_auto_dtype("auto", rtol=rtol, sampled_output=True)
        assert is_dd(r) if on_tpu else r == jnp.float64
    # Mass/DAE: always platform f64.
    assert resolve_auto_dtype("auto", rtol=1e-3, has_mass=True) == jnp.float64
    assert resolve_auto_dtype("auto", rtol=1e-3, has_dae=True) == jnp.float64
    # Non-auto values pass through (None is mapped to "auto" by the
    # facades, not here).
    assert resolve_auto_dtype(jnp.float32) == jnp.float32
    assert is_dd(resolve_auto_dtype("dd"))
    assert resolve_auto_dtype(None) is None


def test_auto_dtype_solves_correctly():
    """dtype='auto' end-to-end on this backend (resolves to f64 on CPU, dd
    on TPU — both must pass the same gate)."""
    r = solve_ivp(decay, (0.0, 10.0), [2.0, 4.0], rtol=1e-10, atol=1e-12,
                  dtype="auto")
    assert r.success
    exact = np.array([2.0, 4.0]) * np.exp(-5.0)
    np.testing.assert_allclose(r.y[:, -1], exact, rtol=1e-8)


def test_dd_dense_output_is_f64_grade():
    """Round-5 VERDICT #2: the dd tier's dense output / t_eval samples /
    event states are f64-grade (dd-packed cont + f64 interpolation), so
    sampled requests no longer fall back to platform f64 under auto.  On
    this CPU test backend the dd state floor is the FMA-contraction noise
    (~1e-7 after long chains, core/ddmath.py) — the interpolant must sit
    on the state, not add an f32-grade error of its own."""
    te = np.linspace(0.0, 10.0, 23)
    r64 = solve_ivp(sho, (0.0, 10.0), [1.0, 0.0], method="DOP853",
                    rtol=1e-10, atol=1e-12, t_eval=te, dense_output=True)
    rdd = solve_ivp(sho, (0.0, 10.0), [1.0, 0.0], method="DOP853",
                    rtol=1e-10, atol=1e-12, t_eval=te, dense_output=True,
                    dtype="dd")
    assert rdd.nstep == r64.nstep  # same controller decisions
    # Sampled outputs track the f64 engine to the CPU dd state floor —
    # an f32-grade interpolant (the pre-round-5 design) would sit at
    # ~6e-8 * |y| ~ 1e-7 minimum even for a perfect state.
    np.testing.assert_allclose(rdd.y, r64.y, atol=2e-7)
    tq = np.linspace(0.05, 9.95, 101)
    np.testing.assert_allclose(rdd.sol(tq), r64.sol(tq), atol=2e-7)
    # The cont record carries dd pairs: low-word rows must be populated.
    conts = rdd.sol._conts
    C = conts.shape[1] // 2
    assert conts.dtype == np.float32 and C == 8
    assert np.abs(conts[:, C]).max() > 0.0  # lo word of row 0 nonzero


def test_dd_event_times_f64_grade():
    """dd event localization refines through the f64-grade interpolant:
    event times must beat f32 resolution (~1e-7 * t) comfortably."""
    def ev(t, y):
        return y[0]
    ev.direction = -1.0
    r = solve_ivp(sho, (0.0, 10.0), [1.0, 0.0], method="RK45",
                  rtol=1e-9, atol=1e-12, events=[ev], dtype="dd")
    assert r.success is True or r.success == 1
    expected = np.array([np.pi / 2, 2.5 * np.pi])
    assert np.abs(np.asarray(r.t_events[0]) - expected).max() < 5e-8
    # Event states are recorded in f64 now (lowered views).
    assert np.asarray(r.y_events[0]).dtype == np.float64


def test_emulation_floor_warning(monkeypatch):
    """On emulated-f64 backends (TPU), rtol below ddtier.
    EMULATION_RTOL_FLOOR warns (TPU_NOTES #36); on CPU it never fires."""
    import warnings as _w
    from ivp_tpu.methods import ddtier

    with _w.catch_warnings():
        _w.simplefilter("error")  # CPU: must not warn
        ddtier.warn_below_emulation_floor(1e-14, jnp.float64)
    monkeypatch.setattr(ddtier.jax, "default_backend", lambda: "tpu")
    with pytest.warns(UserWarning, match="noise floor"):
        ddtier.warn_below_emulation_floor(1e-12, "dd")
    with _w.catch_warnings():
        _w.simplefilter("error")  # above the floor: no warning
        ddtier.warn_below_emulation_floor(1e-9, "dd")
        # explicit f32 requests are exempt
        ddtier.warn_below_emulation_floor(1e-12, jnp.float32)


def test_dd_constant_jacobian():
    """A constant-matrix jac= is honored by the dd stiff tier (it used to
    fall through to jacfwd silently; ddtier.dd_jac_fn round 4)."""
    A = np.array([[-2.0, 1.0], [1.0, -3.0]])

    def f(t, y):
        return jnp.asarray(A) @ y

    from scipy.linalg import expm
    exact = expm(A * 1.0) @ np.array([1.0, 2.0])
    rdd = solve_ivp(f, (0.0, 1.0), [1.0, 2.0], method="Radau", jac=A,
                    rtol=1e-8, atol=1e-10, dtype="dd")
    assert rdd.success
    # The constant jac path must not evaluate jacfwd: njev counts stay at
    # the refresh cadence either way, but the solution must be right.
    np.testing.assert_allclose(rdd.y[:, -1], exact, rtol=1e-6)


def test_dd_rejects_mass_and_dae():
    with pytest.raises(ValueError, match="identity-mass"):
        solve_ivp(decay, (0.0, 1.0), [1.0, 1.0], method="Radau",
                  mass=np.eye(2), dtype="dd")
    with pytest.raises(ValueError, match="identity-mass"):
        solve_ivp(decay, (0.0, 1.0), [1.0, 1.0], method="Radau",
                  nind1=2, dtype="dd")
