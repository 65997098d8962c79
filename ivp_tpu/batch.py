"""Batched ensemble solving: vmap of the integration state machine.

This is the TPU-native headline feature (SURVEY.md §2 "DP" row): thousands of
independent IVPs integrate in lock-step under ``jax.vmap`` of the
``lax.while_loop`` driver, each with its own adaptive step size, step counters
and status code; finished trajectories are frozen by the while-loop batching
rule until the whole batch converges.

The lean final-state mode carries no output buffers — ideal for Monte Carlo /
parameter sweeps and the benchmark metric (IVPs/sec/chip).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .types import canonical_method
from .core.cache import LRUCache, cache_token
from .core.driver import DriverConfig, make_driver, run_args
from .core.events import EventSpec
from .methods import get_engine
from .methods.base import RunArgs


def _norm_tol(v, B, n, dtype, name):
    """Normalize a tolerance to (value, vmap_axis).

    scalar / (n,)            -> shared across the batch (axis None)
    (B,) with B != n         -> per-lane scalar
    (B, 1) or (B, n)         -> per-lane (possibly per-component)

    A 1-D length-B array with B == n is ambiguous and treated as
    per-component; pass shape (B, 1) to force per-lane in that case.
    """
    a = jnp.asarray(v, dtype)
    if a.ndim == 1 and a.shape[0] == B and B != n:
        a = a[:, None]
    if a.ndim == 2:
        if a.shape[0] != B:
            raise ValueError(
                f"{name} with 2 dims must have leading batch dim {B}, "
                f"got {a.shape}")
        return jnp.broadcast_to(a, (B, n)), 0
    return jnp.broadcast_to(a, (n,)), None


class EnsembleResult(NamedTuple):
    t: Any        # (B,) final time per trajectory
    y: Any        # (B, n) final state
    status: Any   # (B,) int32 internal status codes (0 = success)
    nfev: Any     # (B,)
    nstep: Any    # (B,)
    naccpt: Any   # (B,)
    nrejct: Any   # (B,)
    t_events: Any = None  # (B, E, cap) event times (valid up to n_events)
    y_events: Any = None  # (B, E, cap, n)
    n_events: Any = None  # (B, E) int32 per-event occurrence counts
    y_samples: Any = None  # (B, m, n) states at the shared t_eval grid
    n_samples: Any = None  # (B,) int32 emitted sample counts
    n_restarts: Any = None  # (B,) int32 in-device event restarts performed


_ENSEMBLE_CACHE = LRUCache(maxsize=64)
_hashable = cache_token  # GC-safe key component (core/cache.py)


def build_ensemble_solver(fun, method="RK45", *, n, dtype=None, args=(),
                          jac=None, max_steps: int = 100_000,
                          first_step: Optional[float] = None,
                          events=None, event_capacity: int = 16,
                          unroll: int = 4, t_eval=None,
                          solver_options: Optional[dict] = None,
                          args_batched: bool = False,
                          max_restarts: int = 0) -> Callable:
    """Return a jittable ``solver(y0_batch, t0, tf, rtol, atol) -> EnsembleResult``.

    The returned function is pure (jit/vmap/shard_map composable); y0_batch has
    shape (B, n).  Per-trajectory t0/tf are supported by passing (B,) arrays.

    ``events``: optional list of scipy-style event callables (``terminal`` /
    ``direction`` attributes); terminal events stop individual trajectories
    and the per-lane event times/states are returned in fixed-capacity
    buffers.

    ``args_batched=True``: every element of ``args`` carries a leading (B,)
    batch axis and is vmapped per-lane — parameter-sweep ensembles where each
    trajectory integrates a *different* vector field (RHS, jac and events all
    receive the lane's slice).

    ``max_restarts``: in-device event restarts.  An event callable with a
    ``restart`` attribute (``y_new = e.restart(t, y)``) that fires terminally
    restarts its lane from the event point with the modified state, up to
    ``max_restarts`` times per lane — the reference's ModifiedSolution
    control flag (src/solout.rs:73-78) fused into the compiled loop (e.g.
    bouncing-ball ensembles with zero host round-trips).
    """
    dtype = jnp.dtype(dtype) if dtype is not None else jnp.result_type(1.0)
    method = canonical_method(method)

    ev_list = list(events) if events else []
    n_ev = len(ev_list)
    ev_spec = None
    if n_ev:
        directions = tuple(int(np.sign(getattr(e, "direction", 0) or 0))
                           for e in ev_list)
        terminal_counts = tuple(
            1 if getattr(e, "terminal", False) is True
            else int(getattr(e, "terminal", 0) or 0) for e in ev_list)
        ev_spec = EventSpec(n_ev, directions, terminal_counts, event_capacity)

    sample_grid = None
    sample_cap = 0
    if t_eval is not None:
        # (m,) shared grid or (B, m) per-lane grids.
        sample_grid = np.atleast_1d(np.asarray(t_eval, dtype=float))
        if sample_grid.ndim > 2:
            raise ValueError("t_eval must be 1-D (shared) or 2-D (per-lane)")
        sample_cap = int(sample_grid.shape[-1])

    cfg = DriverConfig(rec_cap=0, record_cont=False, ncoeff=0,
                       event_spec=ev_spec, unroll=max(1, unroll),
                       sample_cap=sample_cap, max_restarts=max_restarts)

    def build_fns(args_):
        """Engine + driver closures for one lane's args (traced per-lane
        when args_batched; once otherwise)."""

        def rhs(t, y):
            return jnp.asarray(fun(t, y, *args_), dtype).reshape(n)

        jac_fn = None
        if method in ("RADAU", "BDF"):
            if jac is not None and callable(jac):
                def jac_fn(t, y):
                    return jnp.asarray(jac(t, y, *args_), dtype).reshape(n, n)
            else:
                def jac_fn(t, y):
                    return jax.jacfwd(lambda yy: rhs(t, yy))(y)

        events_fn = None
        if n_ev:
            def events_fn(t, y):
                return jnp.stack(
                    [jnp.asarray(e(t, y, *args_), dtype).reshape(())
                     for e in ev_list])

        restart_fns = [getattr(e, "restart", None) for e in ev_list]
        engine, p = get_engine(method, need_cont=bool(n_ev) or sample_cap > 0,
                               jac_fn=jac_fn, n=n, **(solver_options or {}))
        init_carry, run_chunk, _, _ = make_driver(engine, p, cfg, rhs,
                                                  events_fn, restart_fns)
        return init_carry, run_chunk

    if not args_batched:
        shared_fns = build_fns(tuple(args))

    def solve_one(y0, t0, tf, rtol, atol, t_grid, lane_args):
        init_carry, run_chunk = (build_fns(lane_args) if args_batched
                                 else shared_fns)
        ra = run_args(tf, jnp.broadcast_to(rtol, (n,)),
                      jnp.broadcast_to(atol, (n,)),
                      jnp.abs(tf - t0), 0.0, max_steps, dtype,
                      t_grid=t_grid)
        fs = jnp.asarray(first_step, dtype) if first_step is not None else None
        c = init_carry(t0, y0, fs, ra)
        c = run_chunk(c, ra)
        kw = {}
        if n_ev:
            kw.update(t_events=c.ev.t_buf, y_events=c.ev.y_buf,
                      n_events=c.ev.n_rec)
        if sample_cap:
            kw.update(y_samples=c.sample_y, n_samples=c.s_cursor)
        if max_restarts:
            kw.update(n_restarts=c.n_restarts)
        return EnsembleResult(t=c.t, y=c.y, status=c.status, nfev=c.nfev,
                              nstep=c.nstep, naccpt=c.naccpt, nrejct=c.nrejct,
                              **kw)

    def solver(y0_batch, t0, tf, rtol, atol):
        y0_batch = jnp.asarray(y0_batch, dtype)
        B = y0_batch.shape[0]
        t0_b = jnp.broadcast_to(jnp.asarray(t0, dtype), (B,))
        tf_b = jnp.broadcast_to(jnp.asarray(tf, dtype), (B,))
        rtol_v, ax_r = _norm_tol(rtol, B, n, dtype, "rtol")
        atol_v, ax_a = _norm_tol(atol, B, n, dtype, "atol")
        if sample_grid is None:
            grid, ax_g = None, None
        else:
            grid = jnp.asarray(sample_grid, dtype)
            ax_g = 0 if grid.ndim == 2 else None
        if args_batched:
            lane_args = tuple(jnp.asarray(a) for a in args)
            ax_args = tuple(0 for _ in lane_args)
        else:
            lane_args = ()
            ax_args = ()
        return jax.vmap(solve_one,
                        in_axes=(0, 0, 0, ax_r, ax_a, ax_g, ax_args))(
            y0_batch, t0_b, tf_b, rtol_v, atol_v, grid, lane_args)

    return solver


def build_resumable_solver(fun, method="RK45", *, n, dtype=None, args=(),
                           jac=None, chunk_steps: int = 1024,
                           max_steps: int = 100_000, events=None,
                           event_capacity: int = 16,
                           first_step: Optional[float] = None,
                           t_eval=None, solver_options: Optional[dict] = None,
                           max_restarts: int = 0, unroll: int = 1):
    """Checkpointable ensemble integration (SURVEY.md §5 checkpoint/resume:
    the while-loop carry IS the checkpoint).

    Returns (start, resume, extract):
      start(y0_batch, t0, tf, rtol, atol) -> (carry, ra)
      resume(carry, ra) -> carry   # advances up to chunk_steps attempts/lane
      extract(carry) -> EnsembleResult

    ``carry`` is a plain pytree of arrays — save/restore it with any pytree
    checkpointer (e.g. orbax) and call ``resume`` to continue;
    ``carry.done`` reports per-trajectory completion.
    """
    dtype = jnp.dtype(dtype) if dtype is not None else jnp.result_type(1.0)
    method_c = canonical_method(method)

    def rhs(t, y):
        return jnp.asarray(fun(t, y, *args), dtype).reshape(n)

    jac_fn = None
    if method_c in ("RADAU", "BDF"):
        if jac is not None and callable(jac):
            def jac_fn(t, y):
                return jnp.asarray(jac(t, y, *args), dtype).reshape(n, n)
        else:
            def jac_fn(t, y):
                return jax.jacfwd(lambda yy: rhs(t, yy))(y)

    ev_list = list(events) if events else []
    n_ev = len(ev_list)
    ev_spec = None
    events_fn = None
    if n_ev:
        directions = tuple(int(np.sign(getattr(e, "direction", 0) or 0))
                           for e in ev_list)
        terminal_counts = tuple(
            1 if getattr(e, "terminal", False) is True
            else int(getattr(e, "terminal", 0) or 0) for e in ev_list)
        ev_spec = EventSpec(n_ev, directions, terminal_counts, event_capacity)

        def events_fn(t, y):
            return jnp.stack([jnp.asarray(e(t, y, *args), dtype).reshape(())
                              for e in ev_list])

    sample_grid = None
    sample_cap = 0
    if t_eval is not None:
        # (m,) shared grid or (B, m) per-lane grids.
        sample_grid = np.atleast_1d(np.asarray(t_eval, dtype=float))
        if sample_grid.ndim > 2:
            raise ValueError("t_eval must be 1-D (shared) or 2-D (per-lane)")
        sample_cap = int(sample_grid.shape[-1])

    engine, p = get_engine(method_c, need_cont=bool(n_ev) or sample_cap > 0,
                           jac_fn=jac_fn, n=n, **(solver_options or {}))
    cfg = DriverConfig(rec_cap=0, record_cont=False, ncoeff=0,
                       event_spec=ev_spec, sample_cap=sample_cap,
                       max_restarts=max_restarts, unroll=max(1, unroll))
    restart_fns = [getattr(e, "restart", None) for e in ev_list]
    init_carry, _, _, run_bounded = make_driver(engine, p, cfg, rhs,
                                                events_fn, restart_fns)

    def _ra_axes(ra: RunArgs) -> RunArgs:
        """vmap axes matching which RunArgs fields are per-lane (batched
        fields carry a leading B axis; shapes are static at trace time)."""
        return RunArgs(
            tend=None,
            rtol=0 if ra.rtol.ndim == 2 else None,
            atol=0 if ra.atol.ndim == 2 else None,
            hmax=None, hmin=None, max_steps=None,
            t_grid=(0 if (ra.t_grid is not None and ra.t_grid.ndim == 2)
                    else None),
        )

    def start(y0_batch, t0, tf, rtol, atol):
        y0_batch = jnp.asarray(y0_batch, dtype)
        B = y0_batch.shape[0]
        if sample_grid is not None:
            d = np.sign(float(tf) - float(t0)) or 1.0
            if np.any(np.diff(sample_grid * d, axis=-1) < 0):
                raise ValueError("t_eval must be sorted in integration direction")
        rtol_v, _ = _norm_tol(rtol, B, n, dtype, "rtol")
        atol_v, _ = _norm_tol(atol, B, n, dtype, "atol")
        grid = (jnp.asarray(sample_grid, dtype)
                if sample_grid is not None else None)
        ra = RunArgs(
            tend=jnp.asarray(tf, dtype), rtol=rtol_v, atol=atol_v,
            hmax=jnp.asarray(abs(float(tf) - float(t0)), dtype),
            hmin=jnp.asarray(0.0, dtype),
            max_steps=jnp.asarray(max_steps, jnp.int32), t_grid=grid)
        t0_b = jnp.broadcast_to(jnp.asarray(t0, dtype), (B,))
        fs = jnp.asarray(first_step, dtype) if first_step is not None else None
        carry = jax.vmap(lambda y0, tt, r: init_carry(tt, y0, fs, r),
                         in_axes=(0, 0, _ra_axes(ra)))(y0_batch, t0_b, ra)
        return carry, ra

    @jax.jit
    def resume(carry, ra):
        return jax.vmap(lambda c, r: run_bounded(c, r, chunk_steps),
                        in_axes=(0, _ra_axes(ra)))(carry, ra)

    def extract(carry):
        kw = {}
        if n_ev:
            kw.update(t_events=carry.ev.t_buf, y_events=carry.ev.y_buf,
                      n_events=carry.ev.n_rec)
        if sample_cap:
            kw.update(y_samples=carry.sample_y, n_samples=carry.s_cursor)
        if max_restarts:
            kw.update(n_restarts=carry.n_restarts)
        return EnsembleResult(t=carry.t, y=carry.y, status=carry.status,
                              nfev=carry.nfev, nstep=carry.nstep,
                              naccpt=carry.naccpt, nrejct=carry.nrejct,
                              **kw)

    return start, resume, extract


def solve_ivp_ensemble(fun, t_span, y0_batch, method="RK45", *, rtol=1e-3,
                       atol=1e-6, args=(), jac=None, max_steps: int = 100_000,
                       first_step=None, dtype=None, events=None,
                       event_capacity: int = 16, t_eval=None,
                       chunk_steps: int = 16384,
                       solver_options: Optional[dict] = None,
                       max_restarts: int = 0) -> EnsembleResult:
    """Batched solve to final state, executed as a host loop of bounded device
    chunks (no single device call runs unboundedly — robust against runtime
    watchdogs on pathological problems; compiled solver cached)."""
    y0_batch = np.atleast_2d(np.asarray(y0_batch))
    n = y0_batch.shape[1]
    key = ("ensemble", canonical_method(method), n, str(dtype),
           _hashable(fun), tuple(_hashable(a) for a in tuple(args)),
           _hashable(jac), max_steps, first_step is not None,
           tuple(_hashable(e) for e in (events or [])), event_capacity,
           chunk_steps,
           (np.asarray(t_eval, float).shape,
            np.asarray(t_eval, float).tobytes())
           if t_eval is not None else None,
           tuple(sorted((solver_options or {}).items())), max_restarts)
    entry = _ENSEMBLE_CACHE.get_or_build(key, lambda: build_resumable_solver(
        fun, method, n=n, dtype=dtype, args=tuple(args), jac=jac,
        max_steps=max_steps, first_step=first_step, events=events,
        event_capacity=event_capacity, chunk_steps=chunk_steps,
        t_eval=t_eval, solver_options=solver_options,
        max_restarts=max_restarts))
    start, resume, extract = entry
    t0, tf = float(t_span[0]), float(t_span[1])
    carry, ra = start(y0_batch, t0, tf, rtol, atol)
    while True:
        carry = resume(carry, ra)
        if bool(np.all(np.asarray(carry.done))):
            break
    return extract(carry)

