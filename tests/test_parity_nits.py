"""Round-4 parity/robustness items (VERDICT r3 #8):

* non-finite y0 raises (SciPy parity — the reference carries the test
  disabled, tests/test_ivp.py:865-870)
* mass= with a non-Radau method raises instead of silently dropping
  (reference solve_ivp.rs:256 ignores it)
* unknown method names warn on the DOPRI5 fallback; strict_methods(True)
  raises
* ensemble event_capacity defaults adaptively (aligned with the single-IVP
  512 at small B) and overflow warns on the host
"""
import numpy as np
import pytest

import ivp_tpu
from ivp_tpu import solve_ivp, solve_ivp_ensemble, strict_methods
from ivp_tpu.batch import _auto_event_capacity
from ivp_tpu.types import canonical_method


def _decay(t, y):
    return -y


# ---------------------------------------------------------------------------
# y0 finiteness
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bad", [np.nan, np.inf, -np.inf])
def test_nonfinite_y0_raises(bad):
    with pytest.raises(ValueError, match="must be finite"):
        solve_ivp(_decay, (0.0, 1.0), [1.0, bad])


def test_nonfinite_y0_batch_raises():
    y0 = np.ones((4, 2))
    y0[2, 1] = np.nan
    with pytest.raises(ValueError, match="must be finite"):
        solve_ivp_ensemble(_decay, (0.0, 1.0), y0)


def test_finite_y0_still_solves():
    r = solve_ivp(_decay, (0.0, 1.0), [1.0], rtol=1e-8, atol=1e-10)
    assert r.success
    np.testing.assert_allclose(r.y[0, -1], np.exp(-1.0), rtol=1e-6)


# ---------------------------------------------------------------------------
# mass with non-Radau methods
# ---------------------------------------------------------------------------

def test_mass_with_bdf_raises():
    with pytest.raises(ValueError, match="only supported by method='Radau'"):
        solve_ivp(_decay, (0.0, 1.0), [1.0, 1.0], method="BDF",
                  mass=np.eye(2))


def test_mass_with_explicit_raises():
    with pytest.raises(ValueError, match="only supported by method='Radau'"):
        solve_ivp(_decay, (0.0, 1.0), [1.0, 1.0], method="RK45",
                  mass=np.eye(2))


def test_mass_with_auto_raises():
    with pytest.raises(ValueError, match="method='Radau'"):
        solve_ivp(_decay, (0.0, 1.0), [1.0, 1.0], method="auto",
                  mass=np.eye(2))


def test_mass_with_bdf_ensemble_raises():
    with pytest.raises(ValueError, match="only supported by method='Radau'"):
        solve_ivp_ensemble(_decay, (0.0, 1.0), np.ones((4, 2)), method="BDF",
                           solver_options={"mass": np.eye(2)})


# ---------------------------------------------------------------------------
# unknown method names
# ---------------------------------------------------------------------------

def test_unknown_method_warns():
    with pytest.warns(UserWarning, match="falling back to DOPRI5"):
        assert canonical_method("Rdau") == "DOPRI5"


def test_strict_methods_raises():
    strict_methods(True)
    try:
        with pytest.raises(ValueError, match="unknown method"):
            solve_ivp(_decay, (0.0, 1.0), [1.0], method="Rdau")
    finally:
        strict_methods(False)


def test_known_method_no_warning(recwarn):
    assert canonical_method("RK45") == "DOPRI5"
    assert not [w for w in recwarn if "falling back" in str(w.message)]


# ---------------------------------------------------------------------------
# ensemble event_capacity defaults + overflow warning
# ---------------------------------------------------------------------------

def test_auto_event_capacity_small_batch_matches_facade():
    # Small ensembles get the single-IVP facade's 512.
    assert _auto_event_capacity((8, 2), [lambda t, y: y[0]], None) == 512


def test_auto_event_capacity_huge_batch_stays_bounded():
    # B=131072 keeps the old bounded default (memory-budgeted).
    cap = _auto_event_capacity((131072, 2), [lambda t, y: y[0]], None)
    assert cap == 16


def test_auto_event_capacity_no_events():
    assert _auto_event_capacity((8, 2), None, None) == 16


def test_ensemble_event_capacity_default_applied():
    def ev(t, y):
        return y[0]

    res = solve_ivp_ensemble(_osc, (0.0, 7.0), np.tile([1.0, 0.0], (3, 1)),
                             events=[ev], rtol=1e-6, atol=1e-9)
    assert res.t_events.shape[-1] == 512  # (B, E, cap) time buffer


def _osc(t, y):
    import jax.numpy as jnp
    return jnp.stack([y[1], -y[0]])


def test_event_overflow_warns():
    def ev(t, y):
        return y[0]

    with pytest.warns(UserWarning, match="overflowed"):
        res = solve_ivp_ensemble(_osc, (0.0, 40.0), np.tile([1.0, 0.0], (3, 1)),
                                 events=[ev], event_capacity=2,
                                 rtol=1e-6, atol=1e-9)
    assert bool(np.any(np.asarray(res.event_overflow)))
