"""f64-time/f32-state hybrid (``time_dtype=jnp.float64`` + ``dtype=float32``).

Fixes the f32 long-horizon limit: once steps fall below the f32 ulp of t,
``t + h == t`` and the lane stalls with STEP_SIZE_TOO_SMALL (documented for
BDF on VdP mu=1000 at t~800, tests/test_extra.py).  With the hybrid, t / h /
event times carry f64 resolution while all state math stays f32.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp
from ivp_tpu.batch import solve_ivp_ensemble


def vdp1000(t, y):
    return jnp.array([y[1], 1000.0 * (1.0 - y[0] ** 2) * y[1] - y[0]])


@pytest.mark.slow
def test_bdf_f32_state_f64_time_vdp1000_full_span():
    """BDF with f32 state + f64 time completes the reference harness's
    stiff config (VdP mu=1000, t=[0,3000]) — pure f32 stalls at t~800."""
    res = solve_ivp(vdp1000, (0.0, 3000.0), [2.0, 0.0], method="BDF",
                    rtol=1e-4, atol=1e-6, dtype=jnp.float32,
                    time_dtype=jnp.float64)
    assert res.success, res.message
    assert res.t[-1] == 3000.0
    # f64 reference endpoint (same config; see test_extra.py Radau value).
    np.testing.assert_allclose(np.asarray(res.y[:, -1]),
                               np.array([-1.51059381, 1.17834991e-03]),
                               rtol=5e-3, atol=1e-5)


def test_hybrid_erk_accuracy_and_time_resolution():
    """DOPRI5 hybrid: event times resolve below the f32 ulp of t.  An SHO
    crossing near t=2000*pi has f32 ulp ~ 6e-4; the hybrid pins it to ~1e-9."""
    def sho(t, y):
        return jnp.array([y[1], -y[0]])

    def ev(t, y):
        return y[0]
    ev.direction = 1

    t0 = 6283.0  # just before 2000*pi: f32 ulp of t is ~5e-4 here
    # Upward crossings land at exactly 2000*pi (right after t0) and 2002*pi.
    res = solve_ivp(sho, (t0, t0 + 10.0),
                    [np.sin(t0 - 2000.0 * np.pi), np.cos(t0 - 2000.0 * np.pi)],
                    method="RK45", rtol=1e-6, atol=1e-8,
                    dtype=jnp.float32, time_dtype=jnp.float64,
                    events=[ev])
    assert res.success
    assert len(res.t_events[0]) == 2
    # Event times resolve far below the f32 time ulp (~5e-4 at t~6289):
    # measured ~3e-7 absolute.
    assert abs(res.t_events[0][0] - 2000.0 * np.pi) < 1e-5
    assert abs(res.t_events[0][1] - 2002.0 * np.pi) < 1e-5
    assert np.all(np.diff(res.t) > 0)


def test_hybrid_ensemble_bdf_f32():
    """Hybrid in the ensemble tier: a small BDF f32-state batch completes
    the long stiff span with per-lane success."""
    y0 = np.array([[2.0, 0.0], [1.5, 0.0]], dtype=np.float32)
    res = solve_ivp_ensemble(vdp1000, (0.0, 3000.0), y0, method="BDF",
                             rtol=1e-4, atol=1e-6, dtype=jnp.float32,
                             time_dtype=jnp.float64)
    assert np.all(np.asarray(res.status) == 0)
    np.testing.assert_allclose(np.asarray(res.t), 3000.0, atol=1e-9)
    assert np.asarray(res.y).dtype == np.float32
