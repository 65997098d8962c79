"""BASELINE.md correctness-gate configurations.

These are the benchmark configs listed in BASELINE.json: exponential decay,
CR3BP/Arenstorf at rtol=1e-12 with dense output, stiff Van der Pol (covered in
test_stiff.py), bouncing ball (covered in test_events.py), and the vmapped
ensemble (covered in test_batch.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import solve_ivp

MU = 0.012277471  # Earth-Moon mass ratio


def cr3bp(t, state, mu):
    x, y, z, vx, vy, vz = state
    r1 = jnp.sqrt((x + mu) ** 2 + y ** 2 + z ** 2)
    r2 = jnp.sqrt((x - 1 + mu) ** 2 + y ** 2 + z ** 2)
    ax = x + 2 * vy - (1 - mu) * (x + mu) / r1 ** 3 - mu * (x - 1 + mu) / r2 ** 3
    ay = y - 2 * vx - (1 - mu) * y / r1 ** 3 - mu * y / r2 ** 3
    az = -(1 - mu) * z / r1 ** 3 - mu * z / r2 ** 3
    return jnp.array([vx, vy, vz, ax, ay, az])


def jacobi_constant(state, mu):
    x, y, z, vx, vy, vz = state
    r1 = np.sqrt((x + mu) ** 2 + y ** 2 + z ** 2)
    r2 = np.sqrt((x - 1 + mu) ** 2 + y ** 2 + z ** 2)
    U = 0.5 * (x ** 2 + y ** 2) + (1 - mu) / r1 + mu / r2
    return 2 * U - (vx ** 2 + vy ** 2 + vz ** 2)


@pytest.mark.slow
def test_cr3bp_arenstorf_dop853():
    """Arenstorf periodic orbit, DOP853 rtol=1e-12 with dense output
    (reference examples/cr3bp.py; BASELINE.json config #3)."""
    state0 = np.array([0.994, 0, 0, 0, -2.00158510637908252240537862224, 0])
    period = 17.0652165601579625588917206249

    sol = solve_ivp(cr3bp, (0, period), state0, method="DOP853",
                    args=(MU,), rtol=1e-12, atol=1e-14, dense_output=True)
    assert sol.success, sol.message

    # Periodicity: the orbit returns to its initial state.
    final = sol.y[:, -1]
    assert abs(final[0] - state0[0]) < 1e-6
    assert abs(final[1] - state0[1]) < 1e-6

    # Jacobi constant conservation along the dense output.
    ts = np.linspace(0, period, 200)
    traj = sol.sol(ts)
    C0 = jacobi_constant(state0, MU)
    Cs = np.array([jacobi_constant(traj[:, i], MU) for i in range(traj.shape[1])])
    assert np.max(np.abs(Cs - C0)) < 1e-8


def test_exponential_decay_gate():
    """Exponential decay, DOPRI5 rtol=1e-6 atol=1e-9 (BASELINE config #1)."""
    res = solve_ivp(lambda t, y: -0.5 * y, (0.0, 10.0), [2.0, 4.0, 8.0],
                    method="RK45", rtol=1e-6, atol=1e-9, dense_output=True)
    assert res.success
    expected = np.array([2.0, 4.0, 8.0]) * np.exp(-0.5 * 10.0)
    np.testing.assert_allclose(res.y[:, -1], expected, rtol=1e-6)
    mid = res.sol(5.0)
    np.testing.assert_allclose(mid, np.array([2.0, 4.0, 8.0]) * np.exp(-2.5),
                               rtol=1e-6)


def test_max_steps_cap():
    """max_steps cap produces a failure status (reference
    tests/test_step_control.py max_steps tests)."""
    res = solve_ivp(lambda t, y: -y, (0.0, 100.0), [1.0], method="RK45",
                    max_steps=3)
    assert not res.success
    assert res.status == -1


@pytest.mark.parametrize("method", ["Radau", "BDF"])
def test_min_step_stiff(method):
    """min_step accepted by both stiff methods (reference
    tests/test_step_control.py:164-176)."""
    res = solve_ivp(lambda t, y: -y, (0.0, 1.0), [1.0], method=method,
                    min_step=1e-10)
    assert res.success


def test_max_steps_large_value():
    """A large max_steps allows completion (reference
    tests/test_step_control.py:112-126)."""
    res = solve_ivp(lambda t, y: -y, (0.0, 10.0), [1.0], method="RK45",
                    max_steps=1_000_000)
    assert res.success
    assert res.status == 0


def test_default_max_steps_is_unlimited():
    """Default max_steps is effectively unlimited, not a solver default cap
    (reference tests/test_step_control.py:129-160)."""
    res = solve_ivp(lambda t, y: -0.001 * y, (0.0, 100000.0), [1.0],
                    method="RK45", rtol=1e-8, atol=1e-10)
    assert res.success, res.message
    assert res.status == 0
    # exp(-100) is far below atol; just check the decay went essentially
    # to zero (the reference test asserts success only).
    assert abs(res.y[0, -1]) < 1e-8


def test_mass_matrix_radau():
    """M y' = f with constant non-identity mass matrix equals the explicitly
    transformed ODE (reference radau.rs mass support; C2/C15 in SURVEY §2)."""
    M = np.array([[2.0, 0.0], [0.0, 4.0]])

    def f(t, y):
        return jnp.array([-y[0], -y[1]])

    res = solve_ivp(f, (0.0, 1.0), [1.0, 1.0], method="Radau", mass=M,
                    rtol=1e-8, atol=1e-10)
    assert res.success
    # Equivalent explicit ODE: y0' = -y0/2, y1' = -y1/4.
    np.testing.assert_allclose(res.y[:, -1],
                               [np.exp(-0.5), np.exp(-0.25)], rtol=1e-6)


def test_linear_backend_auto_routing():
    """Auto linear-backend routing encodes the measured crossovers
    (docs/BENCH.md mid-size table): inverse for n<=8 (n<=32 under the
    batched-f32 factor_f32 hint, benches/inverse_midsize_ab.py), dense
    LU up to n<48 even with a known band, banded CR from n>=48 for
    full-f64 Newton only — f32 factorizations (mixed Newton, factor_f32
    hint, i.e. f32 state / dd) stay dense (inverse then scan-LU)."""
    from ivp_tpu.methods.radau import RadauParams, _backend_kind
    from ivp_tpu.methods import bdf as bdf_mod

    def kind(**kw):
        return _backend_kind(RadauParams(need_cont=False, **kw))

    assert kind(n=4) == "inverse"
    assert kind(n=32, band=(2, 2)) == "lu"           # below the n>=48 floor
    assert kind(n=64, band=(2, 2)) == "banded"
    # Single-IVP semantics: mixed Newton alone still routes banded (CR wins
    # from n>=48 there); the batched-f32 dense win arrives via the
    # ensemble-facade factor_f32 hint.
    assert kind(n=64, band=(2, 2), newton_precision="mixed") == "banded"
    assert kind(n=64, band=(2, 2), factor_f32=True) == "lu"
    # Batched-f32 inverse window: n<=32 with the hint, never without.
    assert kind(n=32, factor_f32=True) == "inverse"
    assert kind(n=32, band=(2, 2), factor_f32=True) == "inverse"
    assert kind(n=33, factor_f32=True) == "lu"
    assert kind(n=64, band=(11, 11)) == "lu"         # band too wide (3w > n)
    assert kind(n=64, band=(2, 2),
                linear_mode="banded") == "banded"    # explicit forces CR

    def bkind(**kw):
        return bdf_mod._backend_kind(bdf_mod.BDFParams(need_cont=False, **kw))

    assert bkind(n=32, band=(2, 2)) == "lu"
    assert bkind(n=64, band=(2, 2)) == "banded"
    assert bkind(n=64, band=(2, 2), newton_precision="mixed") == "banded"
    assert bkind(n=64, band=(2, 2), factor_f32=True) == "lu"
    assert bkind(n=32, factor_f32=True) == "inverse"
    assert bkind(n=33, factor_f32=True) == "lu"

    # The ensemble facade sets the hint for f32 state and mixed Newton.
    from ivp_tpu.batch import _auto_band_opts
    assert _auto_band_opts("RADAU", {"newton_precision": "mixed"},
                           None)["factor_f32"] is True
    assert _auto_band_opts("RADAU", None, None,
                           dtype=jnp.float32)["factor_f32"] is True
    assert "factor_f32" not in _auto_band_opts("RADAU", None, None,
                                               dtype=jnp.float64)
