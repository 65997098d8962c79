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
from ..core.cache import LRUCache

# Built solvers + jitted shard_map runners, keyed by (mesh, problem
# signature): repeated sharded solves must not pay builder + trace +
# compile again (same discipline as batch.py::_ENSEMBLE_CACHE).
_SHARDED_CACHE = LRUCache(maxsize=32)


def _mesh_key(mesh: Mesh, axis: str):
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names, axis)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def shard_ensemble_solver(solver, mesh: Mesh, axis: str = "data",
                          tol_specs=(None, None)):
    """Wrap a ``build_ensemble_solver`` result for SPMD execution over ``mesh``.

    The batch axis of ``y0_batch`` is split across devices; each device runs an
    independent while-loop over its shard (no collectives inside).
    ``tol_specs``: per-argument PartitionSpec (or None = replicated) for
    (rtol, atol) — pass ``P(axis)`` for per-lane tolerances.
    """
    sharded = _shard_map()(
        lambda y0, t0, tf, rtol, atol: solver(y0, t0, tf, rtol, atol),
        mesh=mesh,
        in_specs=(P(axis), None, None) + tuple(tol_specs),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def solve_ivp_sharded(fun, t_span, y0_batch, method="RK45", *, rtol=1e-3,
                      atol=1e-6, args=(), jac=None, jac_sparsity=None,
                      max_steps: int = 100_000,
                      max_step=None, min_step: float = 0.0,
                      mesh: Optional[Mesh] = None, axis: str = "data",
                      dtype=None, events=None,
                      event_capacity: Optional[int] = None,
                      t_eval=None, solver_options: Optional[dict] = None,
                      max_restarts: int = 0, args_batched: bool = False,
                      dense_output: bool = False,
                      record_trajectories: bool = False,
                      rec_chunk: int = 1024, time_dtype=None):
    """Batched solve with the ensemble axis sharded over a device mesh.

    The batch size must be divisible by the mesh size.  The full per-lane
    parameter surface of :func:`build_ensemble_solver` shards with the lanes:

    * per-lane terminal/directional events (with in-device ``restart`` maps),
    * per-lane rtol/atol — leading (B,) / (B,1) / (B,n) axis,
    * per-lane ``t_span`` — pass arrays ``(t0s, tfs)`` of shape (B,),
    * per-lane ``t_eval`` grids — shape (B, m),
    * per-lane ``args`` (``args_batched=True``) — each element with a leading
      (B,) axis, so every lane integrates its own vector field,
    * ``solver_options``.

    Per-lane inputs are passed as sharded *arguments* (not closure constants)
    so shard_map slices them alongside ``y0_batch``.

    ``record_trajectories`` / ``dense_output``: the batched per-step
    recording tier (ivp_tpu/batch.py) over the mesh — each drain chunk is a
    shard_map (one independent while-loop per device, no hot-loop
    collectives); the host gathers and concatenates record buffers between
    chunks, exactly as in :func:`ivp_tpu.batch.solve_ivp_ensemble`.
    """
    y0_batch = jnp.atleast_2d(jnp.asarray(y0_batch))
    B, n = y0_batch.shape
    # Adaptive event-record capacity, consistent with solve_ivp_ensemble
    # (memory-budgeted; single-IVP-like 512 at small B).
    if event_capacity is None:
        from ..batch import _auto_event_capacity
        event_capacity = _auto_event_capacity((B, n), events, dtype)
    # The DEFAULT precision tier: ``dtype=None`` resolves like ``"auto"`` —
    # the same precision-aware dd routing as the one-chip facades
    # (methods/ddtier.py); ``dtype=jnp.float64`` is the platform-f64 escape
    # hatch.
    from ..methods.ddtier import (resolve_auto_dtype,
                                  warn_below_emulation_floor)
    _so = solver_options or {}
    dtype = resolve_auto_dtype(
        "auto" if dtype is None else dtype, rtol=rtol,
        sampled_output=bool(t_eval is not None or dense_output
                            or record_trajectories or events is not None),
        has_mass="mass" in _so, has_dae="nind" in _so, method=str(method))
    warn_below_emulation_floor(rtol, dtype)
    if isinstance(jac_sparsity, str):
        # jac_sparsity="auto": detect on the host around lane 0 before the
        # sharded solver is built (core/sparsity.py; with per-lane args the
        # probe uses lane 0's vector field).
        from ..core.sparsity import resolve_jac_sparsity
        probe_args = tuple(a[0] for a in args) if (args_batched and args) \
            else tuple(args)
        jac_sparsity = resolve_jac_sparsity(
            jac_sparsity,
            lambda t, y: jnp.asarray(fun(t, y, *probe_args)).reshape(n),
            float(np.asarray(t_span[0]).reshape(-1)[0]), y0_batch,
            t1=float(np.asarray(t_span[1]).reshape(-1)[0]))
    if mesh is None:
        mesh = make_mesh(axis=axis)
    from ..batch import _hashable
    from ..types import canonical_method
    prob_key = (_mesh_key(mesh, axis), canonical_method(method)
                if isinstance(method, str) else method,
                n, str(dtype), _hashable(fun),
                tuple(_hashable(a) for a in tuple(args)), _hashable(jac),
                _hashable(jac_sparsity), max_steps, max_step, min_step,
                tuple(_hashable(e) for e in (events or [])), event_capacity,
                (np.asarray(t_eval, float).shape,
                 np.asarray(t_eval, float).tobytes())
                if t_eval is not None else None,
                tuple(sorted((k, _hashable(v))
                             for k, v in (solver_options or {}).items())),
                max_restarts, args_batched, str(time_dtype))
    if dense_output or record_trajectories:
        if args_batched:
            raise ValueError(
                "dense_output/record_trajectories do not compose with "
                "args_batched in the sharded facade yet; use "
                "solve_ivp_ensemble(lane_chunk=...) on one chip")
        if np.ndim(t_span[0]) or np.ndim(t_span[1]):
            raise ValueError(
                "per-lane t_span does not compose with the sharded "
                "recording tier; pass a scalar (t0, tf)")
        return _solve_sharded_recording(
            fun, t_span, y0_batch, method, mesh, axis, prob_key=prob_key,
            rtol=rtol, atol=atol, args=args, jac=jac,
            jac_sparsity=jac_sparsity, max_steps=max_steps,
            max_step=max_step, min_step=min_step, dtype=dtype,
            events=events, event_capacity=event_capacity, t_eval=t_eval,
            solver_options=solver_options, max_restarts=max_restarts,
            dense_output=dense_output, rec_chunk=rec_chunk,
            time_dtype=time_dtype)
    solver = _SHARDED_CACHE.get_or_build(
        ("solver",) + prob_key,
        lambda: build_ensemble_solver(fun, method, n=n, dtype=dtype,
                                      args=tuple(args), jac=jac,
                                      jac_sparsity=jac_sparsity,
                                      max_steps=max_steps,
                                      max_step=max_step, min_step=min_step,
                                      events=events,
                                      event_capacity=event_capacity,
                                      t_eval=t_eval,
                                      solver_options=solver_options,
                                      max_restarts=max_restarts,
                                      args_batched=args_batched))

    def _norm_tol_spec(v):
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

    (rtol_v, spec_r), (atol_v, spec_a) = _norm_tol_spec(rtol), _norm_tol_spec(atol)

    # Per-lane t_span: (B,) arrays shard with the lanes; scalars replicate.
    t0_in, tf_in = t_span[0], t_span[1]
    spec_t0 = P(axis) if np.ndim(t0_in) == 1 else None
    spec_tf = P(axis) if np.ndim(tf_in) == 1 else None
    t0_v = jnp.asarray(t0_in) if spec_t0 is not None else float(t0_in)
    tf_v = jnp.asarray(tf_in) if spec_tf is not None else float(tf_in)

    # Per-lane t_eval grids are passed as an explicit sharded argument (the
    # builder's closure grid cannot shard); shared 1-D grids stay baked in.
    grid_v = None
    spec_g = None
    if t_eval is not None and np.ndim(t_eval) == 2:
        grid_v = jnp.asarray(t_eval)
        if grid_v.shape[0] != B:
            raise ValueError(f"per-lane t_eval must have leading batch dim "
                             f"{B}, got {grid_v.shape}")
        spec_g = P(axis)

    bargs_v = None
    specs_args = None
    if args_batched:
        bargs_v = tuple(jnp.asarray(a) for a in args)
        for a in bargs_v:
            if a.shape[0] != B:
                raise ValueError(f"args_batched elements must have leading "
                                 f"batch dim {B}, got {a.shape}")
        specs_args = tuple(P(axis) for _ in bargs_v)

    spec_sig = (spec_t0 is not None, spec_tf is not None,
                spec_r is not None, spec_a is not None, spec_g is not None,
                len(specs_args) if specs_args is not None else None)

    def _build_runner():
        sharded = _shard_map()(
            lambda y0, t0, tf, r, a, g, ba: solver(y0, t0, tf, r, a,
                                                   t_grid=g, batched_args=ba),
            mesh=mesh,
            in_specs=(P(axis), spec_t0, spec_tf, spec_r, spec_a, spec_g,
                      specs_args),
            out_specs=P(axis),
            check_vma=False,
        )
        return jax.jit(sharded)

    runner = _SHARDED_CACHE.get_or_build(
        ("runner",) + prob_key + (spec_sig,), _build_runner)

    sh = NamedSharding(mesh, P(axis))
    y0_batch = jax.device_put(y0_batch, sh)
    put = lambda v, spec: jax.device_put(v, sh) if spec is not None else v
    return runner(y0_batch, put(t0_v, spec_t0), put(tf_v, spec_tf),
                  put(rtol_v, spec_r), put(atol_v, spec_a),
                  put(grid_v, spec_g),
                  (tuple(jax.device_put(a, sh) for a in bargs_v)
                   if bargs_v is not None else None))


def _solve_sharded_recording(fun, t_span, y0_batch, method, mesh, axis, *,
                             prob_key, rtol, atol, args, jac, jac_sparsity,
                             max_steps, max_step, min_step, dtype, events,
                             event_capacity, t_eval, solver_options,
                             max_restarts, dense_output, rec_chunk,
                             time_dtype):
    """Batched per-step recording over a device mesh.

    The host chunk-drain loop of :func:`ivp_tpu.batch.solve_ivp_ensemble`
    runs unchanged; each drain chunk executes as a ``shard_map`` of the
    vmapped recording driver (one independent while-loop per device — no
    collectives inside), with the carry pytree sharded over the lane axis.
    The host gathers record buffers between chunks, so device memory stays
    bounded per chip.
    """
    from ..batch import build_recording_solver, _run_recording

    B, n = y0_batch.shape
    ndev = mesh.devices.size
    if B % ndev:
        raise ValueError(
            f"batch size {B} must divide the mesh size {ndev}")
    rec_key = ("recording",) + prob_key + (dense_output, rec_chunk)
    entry = _SHARDED_CACHE.get_or_build(
        rec_key, lambda: build_recording_solver(
            fun, method, n=n, dtype=dtype, args=tuple(args), jac=jac,
            jac_sparsity=jac_sparsity, max_steps=max_steps,
            max_step=max_step, min_step=min_step, events=events,
            event_capacity=event_capacity, t_eval=t_eval,
            solver_options=solver_options, max_restarts=max_restarts,
            dense_output=dense_output, rec_chunk=rec_chunk,
            time_dtype=time_dtype))
    engine, start, run_vchunk, vreset, dense = entry
    sh = NamedSharding(mesh, P(axis))
    smap = _shard_map()

    def _ra_spec(ra):
        """PartitionSpec tree for RunArgs: per-lane fields shard with the
        lanes, shared scalars/grids replicate."""
        return type(ra)(
            tend=None,
            rtol=P(axis) if ra.rtol.ndim == 2 else None,
            atol=P(axis) if ra.atol.ndim == 2 else None,
            hmax=None, hmin=None, max_steps=None,
            t_grid=(P(axis) if (ra.t_grid is not None
                                and ra.t_grid.ndim == 2) else None))

    def sh_start(y0b, t0, tf, rt, at):
        carry, ra = start(y0b, t0, tf, rt, at)
        carry = jax.device_put(carry, sh)

        def put(v, per_lane):
            return jax.device_put(
                v, NamedSharding(mesh, P(axis) if per_lane else P()))

        ra = ra._replace(
            rtol=put(ra.rtol, ra.rtol.ndim == 2),
            atol=put(ra.atol, ra.atol.ndim == 2),
            t_grid=(put(ra.t_grid, ra.t_grid.ndim == 2)
                    if ra.t_grid is not None else None))
        return carry, ra

    def run_sharded(carry, ra):
        spec_sig = (ra.rtol.ndim, ra.atol.ndim,
                    ra.t_grid.ndim if ra.t_grid is not None else None)
        runner = _SHARDED_CACHE.get_or_build(
            rec_key + ("runner", spec_sig),
            lambda: jax.jit(smap(
                lambda c, r: run_vchunk(c, r), mesh=mesh,
                in_specs=(P(axis), _ra_spec(ra)), out_specs=P(axis),
                check_vma=False)))
        return runner(carry, ra)

    entry2 = (engine, sh_start, run_sharded, vreset, dense)
    return _run_recording(entry2, np.asarray(y0_batch), t_span, rtol, atol,
                          method, dense_output)
