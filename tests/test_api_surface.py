"""API-surface audit: every public capability from the reference inventory
(SURVEY.md §2, docs/PARITY.md) is importable and minimally functional."""
import inspect

import numpy as np


def test_top_level_exports():
    import ivp_tpu

    for name in ["solve_ivp", "solve_ivp_ensemble", "solve_ivp_sharded",
                 "OdeResult", "OdeSolution", "EnsembleResult", "Status",
                 "EventConfig", "ddmath", "DD", "ddify",
                 "odeint", "odeint_adjoint"]:
        assert hasattr(ivp_tpu, name), name
    # the dd tier covers every method family
    from ivp_tpu.methods import dd_erk, dd_radau, dd_bdf
    for mod in (dd_erk, dd_radau, dd_bdf):
        assert hasattr(mod, "make_engine")


def test_solve_ivp_signature_scipy_compatible():
    """C21: the scipy solve_ivp argument list (reference python/solve.rs:150-167)."""
    from ivp_tpu import solve_ivp

    params = inspect.signature(solve_ivp).parameters
    for name in ["fun", "t_span", "y0", "method", "t_eval", "dense_output",
                 "events", "vectorized", "args", "rtol", "atol", "jac",
                 "jac_sparsity", "max_step", "first_step", "min_step",
                 "max_steps", "mass", "nind1", "nind2", "nind3"]:
        assert name in params, name


def test_method_registry():
    """C5: all six methods + aliases resolve (reference options.rs:61-73)."""
    from ivp_tpu.types import canonical_method, NCOEFF

    assert canonical_method("RK45") == "DOPRI5"
    assert canonical_method("Radau5") == "RADAU"
    assert canonical_method("BDF15") == "BDF"
    assert canonical_method("bogus") == "DOPRI5"  # unknown -> default
    assert set(NCOEFF) == {"RK4", "RK23", "DOPRI5", "DOP853", "RADAU", "BDF"}
    assert NCOEFF["DOP853"] == 8 and NCOEFF["BDF"] == 7


def test_lowlevel_exports():
    """L3/L4 tier: engines + driver are directly usable."""
    from ivp_tpu import lowlevel

    for name in ["get_engine", "make_driver", "DriverConfig", "run_args",
                 "Carry", "Engine", "RunArgs", "StepProposal", "EventSpec",
                 "get_interp"]:
        assert hasattr(lowlevel, name), name


def test_lowlevel_drive():
    """Drive an engine manually through the low-level API."""
    import jax.numpy as jnp
    from ivp_tpu.lowlevel import (DriverConfig, get_engine, make_driver,
                                  run_args)

    def rhs(t, y):
        return -y

    engine, params = get_engine("DOPRI5", need_cont=False, n=1)
    cfg = DriverConfig(rec_cap=0)
    init_carry, run_chunk, _, _ = make_driver(engine, params, cfg, rhs)
    ra = run_args(1.0, jnp.full((1,), 1e-8), jnp.full((1,), 1e-10),
                  1.0, 0.0, 10_000, jnp.float64)
    carry = init_carry(jnp.asarray(0.0), jnp.asarray([1.0]), None, ra)
    carry = run_chunk(carry, ra)
    assert bool(carry.done)
    assert int(carry.status) == 0
    np.testing.assert_allclose(float(carry.y[0]), np.exp(-1.0), rtol=1e-8)


def test_aux_subsystems_present():
    """SURVEY §5: counters, sparsity, linalg, profiling, debug, resume."""
    from ivp_tpu.core import sparsity, linalg  # noqa: F401
    from ivp_tpu.utils import profiling, debug  # noqa: F401
    from ivp_tpu.batch import build_resumable_solver  # noqa: F401
    # (the Pallas alternative backend was measured 5-10x slower than the
    # XLA driver and archived to attic/pallas_erk.py in round 3)

    assert callable(sparsity.column_groups)
    assert callable(linalg.lu_factor)
    assert callable(build_resumable_solver)
