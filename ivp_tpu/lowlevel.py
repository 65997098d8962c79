"""Low-level API: step engines + the while-loop driver.

This is the equivalent of the reference's Rust tier (L3 integrator kernels +
L4 orchestration, reference src/lib.rs:87-103): direct access to the step
engines and the generic driver for users who need custom integration loops —
their own recorders, restart policies, or composition with other traced code.

Example — a custom fixed-point restart loop around terminal events:

    from ivp_tpu.lowlevel import get_engine, make_driver, DriverConfig, run_args

    engine, params = get_engine("DOPRI5", need_cont=True, n=2)
    cfg = DriverConfig(rec_cap=1024, record_cont=True, ncoeff=engine.ncoeff)
    init_carry, run_chunk, reset, run_bounded = make_driver(
        engine, params, cfg, rhs)
    ra = run_args(tend, rtol, atol, hmax, 0.0, 100_000, jnp.float64)
    carry = init_carry(t0, y0, None, ra)
    carry = run_chunk(carry, ra)       # integrate to completion / buffer-full
    # carry.rec_* hold the accepted steps; carry is a checkpointable pytree.
"""
from .core.driver import Carry, DriverConfig, make_driver, run_args  # noqa: F401
from .core.events import EventSpec, EvState  # noqa: F401
from .methods import get_engine  # noqa: F401
from .methods.base import Engine, RunArgs, StepProposal  # noqa: F401
from .methods.interp import get_interp  # noqa: F401
