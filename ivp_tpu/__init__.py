"""ivp_tpu — a TPU-native initial-value-problem (ODE/DAE) solver framework.

Built from scratch in JAX/XLA for TPUs, with the same capability surface as the
Rust reference library ``ivp`` (SciPy-compatible ``solve_ivp``): explicit
Runge–Kutta methods (RK4, RK23, DOPRI5/RK45, DOP853) and stiff solvers
(Radau IIA(5), variable-order BDF(1–5)) with adaptive PI/Gustafsson step-size
control, dense output, exact ``t_eval`` sampling, backward integration, and
terminal/directional event detection with Brent root refinement.

Design (see SURVEY.md §7): instead of a sequential per-problem time loop, each
integrator is a pure ``attempt(t, y, state) -> proposal`` step function advanced
by a single generic ``jax.lax.while_loop`` driver.  ``jax.vmap`` of that loop
yields lock-step integration of large ensembles of independent IVPs with
per-trajectory adaptive step sizes and done-masking; ``shard_map`` spreads the
ensemble axis across a TPU mesh with no collectives in the hot loop.

Double precision is enabled on import (required to reach the reference
tolerances, e.g. rtol=1e-12 CR3BP); set ``IVP_TPU_NO_X64=1`` to opt out.
"""
import os as _os

if _os.environ.get("IVP_TPU_NO_X64", "0") != "1":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

from .types import Status, EventConfig, strict_methods       # noqa: E402
from .solve import solve_ivp, OdeResult, OdeSolution         # noqa: E402
from .batch import solve_ivp_ensemble, EnsembleResult        # noqa: E402
from .parallel.sharding import solve_ivp_sharded             # noqa: E402
from .core import ddmath                                     # noqa: E402
from .core.ddmath import DD                                  # noqa: E402
from .core.ddify import ddify                                # noqa: E402
from .core.sparsity import detect_jac_sparsity               # noqa: E402
from .adjoint import odeint, odeint_adjoint                  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "solve_ivp",
    "solve_ivp_ensemble",
    "solve_ivp_sharded",
    "OdeResult",
    "OdeSolution",
    "EnsembleResult",
    "Status",
    "EventConfig",
    "strict_methods",
    "ddmath",
    "DD",
    "ddify",
    "detect_jac_sparsity",
    "odeint",
    "odeint_adjoint",
]
