"""Multi-chip ensemble sharding over a TPU mesh.

Independent trajectories need no collectives in the hot loop (SURVEY.md §2,
parallelism table): the ensemble axis is sharded over the mesh with
``shard_map`` so every device runs its *own* ``lax.while_loop`` — devices
finish independently instead of lock-stepping on a global loop condition,
and results are gathered only at the end (by the output sharding).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import build_ensemble_solver


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_ensemble_solver(solver, mesh: Mesh, axis: str = "data",
                          tol_specs=(None, None)):
    """Wrap a ``build_ensemble_solver`` result for SPMD execution over ``mesh``.

    The batch axis of ``y0_batch`` is split across devices; each device runs an
    independent while-loop over its shard (no collectives inside).
    ``tol_specs``: per-argument PartitionSpec (or None = replicated) for
    (rtol, atol) — pass ``P(axis)`` for per-lane tolerances.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        lambda y0, t0, tf, rtol, atol: solver(y0, t0, tf, rtol, atol),
        mesh=mesh,
        in_specs=(P(axis), None, None) + tuple(tol_specs),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def solve_ivp_sharded(fun, t_span, y0_batch, method="RK45", *, rtol=1e-3,
                      atol=1e-6, args=(), jac=None, max_steps: int = 100_000,
                      mesh: Optional[Mesh] = None, axis: str = "data",
                      dtype=None, events=None, event_capacity: int = 16,
                      t_eval=None, solver_options: Optional[dict] = None,
                      max_restarts: int = 0):
    """Batched solve with the ensemble axis sharded over a device mesh.

    The batch size must be divisible by the mesh size.  Per-lane terminal /
    directional events (with optional in-device ``restart`` maps), per-lane
    rtol/atol (leading (B,) axis) and ``solver_options`` are supported —
    per-lane state shards with the lanes.  (Per-lane ``t_eval`` grids and
    ``args_batched`` are not yet supported in the sharded wrapper.)
    """
    y0_batch = jnp.atleast_2d(jnp.asarray(y0_batch))
    B, n = y0_batch.shape
    if mesh is None:
        mesh = make_mesh(axis=axis)
    if t_eval is not None and np.ndim(t_eval) > 1:
        raise NotImplementedError(
            "per-lane t_eval grids are not supported in solve_ivp_sharded")
    solver = build_ensemble_solver(fun, method, n=n, dtype=dtype,
                                   args=tuple(args), jac=jac,
                                   max_steps=max_steps, events=events,
                                   event_capacity=event_capacity,
                                   t_eval=t_eval,
                                   solver_options=solver_options,
                                   max_restarts=max_restarts)

    def _norm(v):
        """(value, spec): per-lane tolerances are normalized to (B, k) BEFORE
        sharding, so the per-shard (B/ndev, k) slice is unambiguously
        per-lane inside _norm_tol (a 1-D (B,) array could otherwise be
        misread as per-component when the shard size happens to equal n)."""
        a = np.asarray(v)
        if a.ndim == 1 and a.shape[0] == B and B != n:
            a = a[:, None]
        if a.ndim == 2:
            if a.shape[0] != B:
                raise ValueError(f"2-D tolerance must have leading batch "
                                 f"dim {B}, got {a.shape}")
            return jnp.asarray(a), P(axis)
        return v, None

    (rtol_v, spec_r), (atol_v, spec_a) = _norm(rtol), _norm(atol)
    runner = shard_ensemble_solver(solver, mesh, axis,
                                   tol_specs=(spec_r, spec_a))
    t0, tf = float(t_span[0]), float(t_span[1])
    sh = NamedSharding(mesh, P(axis))
    y0_batch = jax.device_put(y0_batch, sh)
    rtol_in = jax.device_put(rtol_v, sh) if spec_r is not None else rtol_v
    atol_in = jax.device_put(atol_v, sh) if spec_a is not None else atol_v
    return runner(y0_batch, t0, tf, rtol_in, atol_in)
