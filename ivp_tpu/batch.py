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

import os

import jax
import jax.numpy as jnp
import numpy as np

from .types import canonical_method
from .core.cache import LRUCache, cache_token
from .core.driver import DriverConfig, make_driver, run_args
from .core.events import EventSpec
from .core import ddmath as ddm
from .core.ddify import auto_dd_rhs
from .methods import get_engine
from .methods.base import RunArgs


# dd-tier detection/plumbing shared with the single-IVP facade
# (methods/ddtier.py); _is_dd kept as the module-local name.
from .methods.ddtier import is_dd as _is_dd  # noqa: E402
from .methods.ddtier import dd_jac_fn as _dd_jac_fn_impl  # noqa: E402
from .methods.ddtier import make_dd_engine as _make_dd_engine_impl  # noqa: E402


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


def _norm_sample_grid(t_eval):
    """Validate a t_eval grid: (m,) shared or (B, m) per-lane, each lane
    monotone (the in-loop monotone sample cursor, driver.py, silently
    mis-samples an unsorted grid — reject it up front)."""
    grid = np.atleast_1d(np.asarray(t_eval, dtype=float))
    if grid.ndim > 2:
        raise ValueError("t_eval must be 1-D (shared) or 2-D (per-lane)")
    if grid.shape[-1] > 1:
        d = np.diff(grid, axis=-1)
        mono = (np.all(d >= 0.0, axis=-1) | np.all(d <= 0.0, axis=-1))
        if not np.all(mono):
            raise ValueError(
                "t_eval must be sorted (monotone in the integration "
                "direction) for ensemble solvers")
    return grid


# The lane-chunk saturation table was measured on this chip generation
# (docs/TPU_NOTES.md #31, docs/BENCH.md mid-size table); other TPU kinds
# get a conservative fallback until measured (round-5 VERDICT weak #4).
_LANE_CHUNK_MEASURED_KIND = "TPU v5 lite"


def _auto_lane_chunk(method, n, B, dtype, solver_options,
                     device_kind=None) -> Optional[int]:
    """Default lane-chunk size for stiff mid-size ensembles.

    Mid-size stiff ensembles saturate the chip by B=4096-8192 and then fall
    off a VMEM-tiling cliff (Radau n=32 mixed: 3081 IVPs/s at B=8192 ->
    1501 at B=16384, OOM at 65k — docs/TPU_NOTES.md #31); large per-lane
    dense f64 factorizations additionally risk crashing the TPU worker at
    big B (TPU_NOTES #2/#5).  This table encodes the measured saturation
    points (docs/BENCH.md mid-size table) so the default configuration
    host-loops equal sub-batches instead of walking off the cliff.

    The table is keyed on ``device_kind`` (auto-detected when None): the
    measured numbers apply on the chip generation they were measured on
    (and on non-TPU backends, where no cliff exists and the values are
    plain bounded-memory defaults); an *unvalidated* TPU kind gets chunks
    halved (smaller device calls are strictly safer against VMEM cliffs
    and worker crashes; the cost is a little host-loop overhead until the
    kind is measured and added to the table).

    Returns None (no chunking) for explicit methods and small systems.
    """
    m = str(method).upper() if isinstance(method, str) else ""
    if m == "AUTO":
        m = "RADAU"  # the stiff resume leg is the regime that needs it
    else:
        m = canonical_method(method) if isinstance(method, str) else ""
    if m not in ("RADAU", "BDF") or n < 16:
        return None
    so = solver_options or {}
    f32_factor = (_is_dd(dtype)
                  or (dtype is not None and not isinstance(dtype, str)
                      and jnp.dtype(dtype) == jnp.float32)
                  or so.get("newton_precision") == "mixed"
                  or so.get("factor_f32"))
    if n < 48:
        chunk = 8192
    elif n < 96:
        chunk = 2048 if f32_factor else 1024
    else:
        chunk = 256
    if device_kind is None:
        try:
            device_kind = jax.devices()[0].device_kind
        except Exception:
            device_kind = ""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and device_kind != _LANE_CHUNK_MEASURED_KIND:
        chunk = max(256, chunk // 2)
    return chunk if B > chunk else None


def _auto_event_capacity(y0_shape, events, dtype, lane_chunk=None) -> int:
    """Default per-event record capacity for the ensemble tier.

    The single-IVP facade defaults to 512; the ensemble buffers are
    (B, E, cap, n+1)-sized, so the same default at B=131072 would cost
    gigabytes.  Budget ~32 MiB of device memory for event records per
    device call and clamp to [16, 512] — small/medium ensembles get the
    facade's 512, huge ones keep the old 16 (overflow is flagged on
    EnsembleResult.event_overflow and warned about by the facade)."""
    if not events:
        return 16
    n_ev = 1 if callable(events) else max(1, len(list(events)))
    B, n = int(y0_shape[0]), max(1, int(y0_shape[1]))
    if lane_chunk is not None:
        B = min(B, int(lane_chunk))
    itemsize = 4 if (dtype is not None and not isinstance(dtype, str)
                     and jnp.dtype(dtype) == jnp.float32) else 8
    budget = 32 * 1024 * 1024
    cap = budget // max(1, B * n_ev * (n + 1) * itemsize)
    return int(min(512, max(16, cap)))


def _warn_event_overflow(res):
    """Host-side loudness for dropped event records (the fixed-capacity
    buffers flag overflow; a silent flag is a footgun for event-dense
    ensembles — VERDICT r3 weak #8)."""
    ov = getattr(res, "event_overflow", None)
    if ov is not None and np.asarray(ov).size and bool(np.any(np.asarray(ov))):
        import warnings
        warnings.warn(
            "event record buffers overflowed on some lanes (occurrences "
            "were dropped; see EnsembleResult.event_overflow).  Raise "
            "event_capacity= to keep them.", UserWarning, stacklevel=3)
    return res


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
    event_overflow: Any = None  # (B, E) bool — event occurrences were dropped
    #                             because the fixed-capacity buffer filled
    switched: Any = None  # (B,) bool — lane resumed with the stiff engine
    #                       (method="auto"; ivp_tpu/auto.py)
    ts: Any = None        # (B, S) recorded per-step times (dense/trajectory mode)
    ys: Any = None        # (B, S, n) recorded per-step states
    n_steps_rec: Any = None  # (B,) int32 valid rows in ts/ys
    sol: Any = None       # batched dense evaluator (dense_output mode)


_ENSEMBLE_CACHE = LRUCache(maxsize=64)
_hashable = cache_token  # GC-safe key component (core/cache.py)


def _dd_jac_fn(fun, args_, jac, n, jac_sparsity=None):
    """f32 Jacobian for the dd stiff tier (methods/ddtier.py)."""
    return _dd_jac_fn_impl(fun, args_, jac, n, jac_sparsity)


def _no_auto_sparsity(jac_sparsity, builder: str):
    """The raw builders construct solvers before any y0 exists, so the
    probing detection behind jac_sparsity="auto" cannot run — direct users
    to the facades (which have y0) or to detect_jac_sparsity."""
    if isinstance(jac_sparsity, str):
        raise ValueError(
            f"jac_sparsity='auto' needs an initial state to probe, but "
            f"{builder} builds before y0 is known.  Pass an explicit "
            "pattern, use solve_ivp / solve_ivp_ensemble / "
            "solve_ivp_sharded, or call "
            "ivp_tpu.detect_jac_sparsity(rhs, t0, y0) yourself.")
    return jac_sparsity


def _auto_band_opts(method_c, solver_options, jac_sparsity, dtype=None):
    """Auto-enable the banded linear backend from a narrow-band sparsity
    pattern (mirrors solve.py:316-324; the engines' "auto" mode still only
    selects it when profitable and mass-free).  Batched f32
    factorizations (f32 state or mixed Newton under vmap) carry the
    factor_f32 routing hint: lanes saturate the VPU, so dense scan-LU
    beats banded CR through n=192 there (docs/BENCH.md) — unlike single
    IVPs, where CR wins from n>=48 at every precision."""
    opts = dict(solver_options or {})
    if method_c not in ("RADAU", "BDF"):
        return opts
    if jac_sparsity is not None and "band" not in opts:
        from .core.block_tridiag import band_of_pattern
        opts["band"] = band_of_pattern(jac_sparsity)
    f32_factor = ((dtype is not None and jnp.dtype(dtype) == jnp.float32)
                  or opts.get("newton_precision") == "mixed")
    if f32_factor and "factor_f32" not in opts:
        opts["factor_f32"] = True
    return opts


def _guard_worker_crash_region(method_c, n, B, dtype, solver_options,
                               jac_sparsity=None):
    """Refuse to dispatch the known TPU-worker-killing region (round-5
    VERDICT #4; TPU_NOTES #2/#5, docs/BENCH.md mid-size table): per-lane
    DENSE f64 LU with n >= 64 at B >= 4096 has hard-crashed the worker
    (minutes of recovery) — the masked scan-LU fix removed the reproducible
    crash, but the region stays guarded at the builder level until a
    recorded probe sweep proves it safe.  The facades auto-chunk well below
    it (_auto_lane_chunk caps f64 dense at 1024 lanes for n >= 48); direct
    builder users hit this guard at trace time, before any device dispatch.

    Not in the region: explicit methods, f32/mixed/dd factorizations
    (measured healthy through B=8192), the banded CR backend, and non-TPU
    backends.  Escape hatch: IVP_TPU_ALLOW_LARGE_DENSE_F64=1 (used by the
    crash-probe sweep, benches/midsize_stiff.py)."""
    if method_c not in ("RADAU", "BDF") or n < 64 or B < 4096:
        return
    if jax.default_backend() not in ("tpu", "axon"):
        return
    if os.environ.get("IVP_TPU_ALLOW_LARGE_DENSE_F64") == "1":
        return
    so = solver_options or {}
    if "band" in so or jac_sparsity is not None:
        return  # banded CR backend — not the dense-LU path
    if (_is_dd(dtype)
            or (dtype is not None and not isinstance(dtype, str)
                and jnp.dtype(dtype) == jnp.float32)
            or so.get("newton_precision") == "mixed"
            or so.get("factor_f32")):
        return  # f32-grade factorization — measured healthy
    raise ValueError(
        f"{method_c} ensemble with dense f64 per-lane LU at n={n}, B={B} "
        f"is in the known TPU-worker-crash region (docs/TPU_NOTES.md #2/#5)."
        f"  Use solve_ivp_ensemble (auto lane-chunking), pass a banded "
        f"jac_sparsity, use solver_options={{'newton_precision': 'mixed'}}, "
        f"chunk the batch below 4096 lanes yourself, or set "
        f"IVP_TPU_ALLOW_LARGE_DENSE_F64=1 to dispatch anyway.")


def _make_dd_engine(method_c, need_cont, fun, args_, jac, n, solver_options,
                    jac_sparsity=None):
    """Engine factory for the dd tier (methods/ddtier.py): explicit methods
    via methods/dd_erk, the stiff methods via methods/dd_radau / dd_bdf
    (dd state + f32 Newton solves)."""
    opts = (_auto_band_opts(method_c, solver_options, jac_sparsity)
            if method_c in ("RADAU", "BDF") else dict(solver_options or {}))
    return _make_dd_engine_impl(method_c, need_cont, fun, args_, jac, n,
                                opts, jac_sparsity)


def build_ensemble_solver(fun, method="RK45", *, n, dtype=None, args=(),
                          jac=None, jac_sparsity=None,
                          max_steps: int = 100_000,
                          first_step: Optional[float] = None,
                          max_step: Optional[float] = None,
                          min_step: float = 0.0,
                          events=None, event_capacity: int = 16,
                          unroll: int = 4, t_eval=None,
                          solver_options: Optional[dict] = None,
                          args_batched: bool = False,
                          max_restarts: int = 0,
                          time_dtype=None) -> Callable:
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

    ``time_dtype``: pass ``jnp.float64`` with ``dtype=jnp.float32`` for the
    f64-time/f32-state hybrid — t, h and event times keep f64 resolution
    while state math runs at f32 speed (fixes the f32 long-horizon limit
    where ``t + h == t`` once steps fall below the f32 ulp of t).

    ``solver_options`` forwards per-engine options (the reference's
    per-solver builder surface): controller/Newton knobs, and for the stiff
    methods also ``mass=`` (mass matrix), ``nind=(n1, n2, n3)`` (DAE index
    partition, Radau) and ``linear_mode=``/``band=`` (linear backend) —
    mass-matrix/DAE/banded ensembles under vmap.

    ``dtype="dd"``: f64-class state precision via the framework's own
    double-float arithmetic (core/ddmath.py) — 2-3x faster than the
    platform's f64 emulation on TPU.  Explicit methods only.  The RHS may
    be the same plain-jnp callable used with every other dtype (it is
    auto-lifted to dd arithmetic by jaxpr reinterpretation,
    core/ddify.py), or a hand-written DD-native function (DD operators /
    ``ddmath.stack``) for full control.  Final states are
    returned as f64.  Event and restart functions see f64 views of the dd
    state (round 5: dense coefficients are dd-packed and interpolated in
    f64 — methods/ddtier.py::dd_pack_cont), so event values, states,
    times and in-device restarts are all f64-grade; a restart's state
    re-enters the dd path through its exact split.
    """
    jac_sparsity = _no_auto_sparsity(jac_sparsity, "build_ensemble_solver")
    # Default precision tier: dtype=None resolves like "auto" (the dd
    # tier on TPUs, platform f64 elsewhere / for mass or DAE options —
    # methods/ddtier.py); dtype=jnp.float64 is the explicit escape hatch.
    from .methods.ddtier import resolve_auto_dtype as _resolve_auto
    dtype = _resolve_auto("auto" if dtype is None else dtype,
                          has_mass="mass" in (solver_options or {}),
                          has_dae="nind" in (solver_options or {}))
    use_dd = _is_dd(dtype)
    if use_dd:
        dtype = jnp.dtype(jnp.float32)   # carrier dtype of the dd words
        tdt = jnp.dtype(jnp.float64)     # exact time axis
    else:
        dtype = jnp.dtype(dtype) if dtype is not None else jnp.result_type(1.0)
        tdt = jnp.dtype(time_dtype) if time_dtype is not None else dtype
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
        sample_grid = _norm_sample_grid(t_eval)
        sample_cap = int(sample_grid.shape[-1])

    cfg = DriverConfig(rec_cap=0, record_cont=False, ncoeff=0,
                       event_spec=ev_spec, unroll=max(1, unroll),
                       sample_cap=sample_cap, max_restarts=max_restarts)

    def build_fns(args_):
        """Engine + driver closures for one lane's args (traced per-lane
        when args_batched; once otherwise)."""

        if use_dd:
            # Accepts either a DD-native RHS or a plain-jnp one: the plain
            # form is auto-lifted to dd arithmetic by jaxpr reinterpretation
            # (core/ddify.py), so dtype="dd" takes the same callable as every
            # other dtype.
            dd_fun = auto_dd_rhs(fun)

            def rhs(t, y):
                return dd_fun(t, y, *args_).reshape(n)
        else:
            def rhs(t, y):
                return jnp.asarray(fun(t, y, *args_), dtype).reshape(n)

        jac_fn = None
        const_jac = False
        if method in ("RADAU", "BDF") and not use_dd:
            from .solve import _facade_jac_dtype, _normalize_jac
            jac_fn, const_jac = _normalize_jac(
                jac, rhs, n, dtype, args_, jac_sparsity,
                jac_dtype=_facade_jac_dtype(method, solver_options))

        events_fn = None
        if n_ev:
            # dd tier: event values/states see f64 views (Engine.lower).
            ev_dt = jnp.float64 if use_dd else dtype

            def events_fn(t, y):
                return jnp.stack(
                    [jnp.asarray(e(t, y, *args_), ev_dt).reshape(())
                     for e in ev_list])

        restart_fns = [getattr(e, "restart", None) for e in ev_list]
        if use_dd:
            engine, p = _make_dd_engine(
                method, bool(n_ev) or sample_cap > 0, fun, args_, jac, n,
                solver_options, jac_sparsity)
        else:
            engine, p = get_engine(
                method, need_cont=bool(n_ev) or sample_cap > 0,
                jac_fn=jac_fn, const_jac=const_jac, n=n,
                **_auto_band_opts(method, solver_options, jac_sparsity,
                                  dtype=dtype))
        init_carry, run_chunk, _, _ = make_driver(engine, p, cfg, rhs,
                                                  events_fn, restart_fns)
        return init_carry, run_chunk

    if not args_batched:
        shared_fns = build_fns(tuple(args))

    def solve_one(y0, t0, tf, rtol, atol, t_grid, lane_args):
        init_carry, run_chunk = (build_fns(lane_args) if args_batched
                                 else shared_fns)
        hmax = jnp.abs(tf - t0)
        if max_step is not None:
            hmax = jnp.minimum(hmax, jnp.abs(jnp.asarray(max_step, tdt)))
        ra = run_args(tf, jnp.broadcast_to(rtol, (n,)),
                      jnp.broadcast_to(atol, (n,)),
                      hmax, abs(min_step), max_steps, dtype,
                      t_grid=t_grid, time_dtype=tdt)
        # dd: keep first_step at full (time-dtype) resolution — RK4's
        # fixed h must not be f32-rounded (methods/dd_erk.py::dd_rk4_init);
        # the adaptive engines' init casts to f32 themselves.
        fs_dt = tdt if use_dd else dtype
        fs = jnp.asarray(first_step, fs_dt) if first_step is not None else None
        c = init_carry(t0, y0, fs, ra)
        c = run_chunk(c, ra)
        kw = {}
        if n_ev:
            kw.update(t_events=c.ev.t_buf, y_events=c.ev.y_buf,
                      n_events=c.ev.n_rec, event_overflow=c.ev.overflow)
        if sample_cap:
            kw.update(y_samples=c.sample_y, n_samples=c.s_cursor)
        if max_restarts:
            kw.update(n_restarts=c.n_restarts)
        return EnsembleResult(t=c.t, y=c.y, status=c.status, nfev=c.nfev,
                              nstep=c.nstep, naccpt=c.naccpt, nrejct=c.nrejct,
                              **kw)

    def solver(y0_batch, t0, tf, rtol, atol, t_grid=None, batched_args=None):
        """``t_grid`` / ``batched_args`` override the builder's baked-in
        t_eval grid / per-lane args with explicitly passed arrays — required
        when the batch axis is sharded (shard_map slices arguments, not
        closure constants; parallel/sharding.py)."""
        if use_dd:
            y0_batch = ddm.from_f64(jnp.asarray(y0_batch, jnp.float64))
        else:
            y0_batch = jnp.asarray(y0_batch, dtype)
        B = y0_batch.shape[0]
        _guard_worker_crash_region(method, n, B, dtype,
                                   solver_options, jac_sparsity)
        t0_b = jnp.broadcast_to(jnp.asarray(t0, tdt), (B,))
        tf_b = jnp.broadcast_to(jnp.asarray(tf, tdt), (B,))
        rtol_v, ax_r = _norm_tol(rtol, B, n, dtype, "rtol")
        atol_v, ax_a = _norm_tol(atol, B, n, dtype, "atol")
        if t_grid is not None:
            grid = jnp.asarray(t_grid, tdt)
            if sample_cap == 0 or grid.shape[-1] != sample_cap:
                raise ValueError(
                    f"explicit t_grid must match the builder's t_eval length "
                    f"{sample_cap}, got {grid.shape}")
            ax_g = 0 if grid.ndim == 2 else None
        elif sample_grid is None:
            grid, ax_g = None, None
        else:
            grid = jnp.asarray(sample_grid, tdt)
            ax_g = 0 if grid.ndim == 2 else None
        if batched_args is not None:
            if not args_batched:
                raise ValueError(
                    "explicit batched_args requires args_batched=True")
            lane_args = tuple(jnp.asarray(a) for a in batched_args)
            ax_args = tuple(0 for _ in lane_args)
        elif args_batched:
            lane_args = tuple(jnp.asarray(a) for a in args)
            ax_args = tuple(0 for _ in lane_args)
        else:
            lane_args = ()
            ax_args = ()
        res = jax.vmap(solve_one,
                       in_axes=(0, 0, 0, ax_r, ax_a, ax_g, ax_args))(
            y0_batch, t0_b, tf_b, rtol_v, atol_v, grid, lane_args)
        if use_dd:
            res = res._replace(y=ddm.to_f64(res.y))
        return res

    return solver


def build_resumable_solver(fun, method="RK45", *, n, dtype=None, args=(),
                           jac=None, jac_sparsity=None,
                           chunk_steps: int = 1024,
                           max_steps: int = 100_000, events=None,
                           event_capacity: int = 16,
                           first_step: Optional[float] = None,
                           max_step: Optional[float] = None,
                           min_step: float = 0.0,
                           t_eval=None, solver_options: Optional[dict] = None,
                           max_restarts: int = 0, unroll: int = 1,
                           time_dtype=None):
    """Checkpointable ensemble integration (SURVEY.md §5 checkpoint/resume:
    the while-loop carry IS the checkpoint).

    Returns (start, resume, extract):
      start(y0_batch, t0, tf, rtol, atol) -> (carry, ra)
      resume(carry, ra) -> carry   # advances up to chunk_steps attempts/lane
      extract(carry) -> EnsembleResult

    ``carry`` is a plain pytree of arrays — save/restore it with any pytree
    checkpointer (e.g. orbax) and call ``resume`` to continue;
    ``carry.done`` reports per-trajectory completion.

    ``dtype="dd"`` is supported with the same contract as
    :func:`build_ensemble_solver` (DD RHS, f32 event views, f64 event
    times); the checkpoint carry then holds the state as a DD pytree.
    """
    jac_sparsity = _no_auto_sparsity(jac_sparsity, "build_resumable_solver")
    # Default precision tier: dtype=None resolves like "auto" (the dd
    # tier on TPUs, platform f64 elsewhere / for mass or DAE options —
    # methods/ddtier.py); dtype=jnp.float64 is the explicit escape hatch.
    from .methods.ddtier import resolve_auto_dtype as _resolve_auto
    dtype = _resolve_auto("auto" if dtype is None else dtype,
                          has_mass="mass" in (solver_options or {}),
                          has_dae="nind" in (solver_options or {}))
    use_dd = _is_dd(dtype)
    if use_dd:
        dtype = jnp.dtype(jnp.float32)   # carrier dtype of the dd words
        tdt = jnp.dtype(jnp.float64)     # exact time axis
    else:
        dtype = jnp.dtype(dtype) if dtype is not None else jnp.result_type(1.0)
        tdt = jnp.dtype(time_dtype) if time_dtype is not None else dtype
    method_c = canonical_method(method)

    if use_dd:
        dd_fun = auto_dd_rhs(fun)  # plain RHS auto-lifted (core/ddify.py)

        def rhs(t, y):
            return dd_fun(t, y, *args).reshape(n)
    else:
        def rhs(t, y):
            return jnp.asarray(fun(t, y, *args), dtype).reshape(n)

    jac_fn = None
    const_jac = False
    if method_c in ("RADAU", "BDF") and not use_dd:
        from .solve import _facade_jac_dtype, _normalize_jac
        jac_fn, const_jac = _normalize_jac(
            jac, rhs, n, dtype, tuple(args), jac_sparsity,
            jac_dtype=_facade_jac_dtype(method_c, solver_options))

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

        # dd tier: event values/states see f64 views (Engine.lower).
        ev_dt = jnp.float64 if use_dd else dtype

        def events_fn(t, y):
            return jnp.stack([jnp.asarray(e(t, y, *args), ev_dt).reshape(())
                              for e in ev_list])

    sample_grid = None
    sample_cap = 0
    if t_eval is not None:
        sample_grid = _norm_sample_grid(t_eval)
        sample_cap = int(sample_grid.shape[-1])

    if use_dd:
        engine, p = _make_dd_engine(
            method_c, bool(n_ev) or sample_cap > 0, fun, tuple(args), jac, n,
            solver_options, jac_sparsity)
    else:
        engine, p = get_engine(
            method_c, need_cont=bool(n_ev) or sample_cap > 0,
            jac_fn=jac_fn, const_jac=const_jac, n=n,
            **_auto_band_opts(method_c, solver_options, jac_sparsity,
                                  dtype=dtype))
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

    # dd: keep first_step at full (time-dtype) resolution — RK4's
    # fixed h must not be f32-rounded (methods/dd_erk.py::dd_rk4_init);
    # the adaptive engines' init casts to f32 themselves.
    _fs_dt = tdt if use_dd else dtype
    _fs = (jnp.asarray(first_step, _fs_dt) if first_step is not None
           else None)

    @jax.jit
    def _vinit(y0_batch, t0_b, ra):
        """Jitted vmapped init: eager per-op dispatch of init_carry
        (hinit RHS evals, dd splits) cost seconds per facade call through
        the remote-execution tunnel (round-5 measurement)."""
        return jax.vmap(lambda y0, tt, r: init_carry(tt, y0, _fs, r),
                        in_axes=(0, 0, _ra_axes(ra)))(y0_batch, t0_b, ra)

    def start(y0_batch, t0, tf, rtol, atol):
        if use_dd:
            y0_batch = ddm.from_f64(jnp.asarray(y0_batch, jnp.float64))
        else:
            y0_batch = jnp.asarray(y0_batch, dtype)
        B = y0_batch.shape[0]
        _guard_worker_crash_region(method_c, n, B, dtype,
                                   solver_options, jac_sparsity)
        # t0 may be a scalar or a (B,) array of per-lane start times (the
        # method="auto" stiff resume restarts each tripped lane from its own
        # reached time, ivp_tpu/auto.py).
        t0_arr = np.atleast_1d(np.asarray(t0, float))
        if sample_grid is not None:
            d = np.sign(float(tf) - float(t0_arr.ravel()[0])) or 1.0
            if np.any(np.diff(sample_grid * d, axis=-1) < 0):
                raise ValueError("t_eval must be sorted in integration direction")
        rtol_v, _ = _norm_tol(rtol, B, n, dtype, "rtol")
        atol_v, _ = _norm_tol(atol, B, n, dtype, "atol")
        grid = (jnp.asarray(sample_grid, tdt)
                if sample_grid is not None else None)
        hmax = float(np.max(np.abs(float(tf) - t0_arr)))
        if max_step is not None:
            hmax = min(hmax, abs(float(max_step)))
        ra = RunArgs(
            tend=jnp.asarray(tf, tdt), rtol=rtol_v, atol=atol_v,
            hmax=jnp.asarray(hmax, tdt),
            hmin=jnp.asarray(abs(min_step), tdt),
            max_steps=jnp.asarray(max_steps, jnp.int32), t_grid=grid)
        t0_b = jnp.broadcast_to(jnp.asarray(t0, tdt), (B,))
        carry = _vinit(y0_batch, t0_b, ra)
        return carry, ra

    @jax.jit
    def resume(carry, ra):
        return jax.vmap(lambda c, r: run_bounded(c, r, chunk_steps),
                        in_axes=(0, _ra_axes(ra)))(carry, ra)

    def extract(carry):
        kw = {}
        if n_ev:
            kw.update(t_events=carry.ev.t_buf, y_events=carry.ev.y_buf,
                      n_events=carry.ev.n_rec,
                      event_overflow=carry.ev.overflow)
        if sample_cap:
            kw.update(y_samples=carry.sample_y, n_samples=carry.s_cursor)
        if max_restarts:
            kw.update(n_restarts=carry.n_restarts)
        y = ddm.to_f64(carry.y) if use_dd else carry.y
        return EnsembleResult(t=carry.t, y=y, status=carry.status,
                              nfev=carry.nfev, nstep=carry.nstep,
                              naccpt=carry.naccpt, nrejct=carry.nrejct,
                              **kw)

    return start, resume, extract


def solve_ivp_ensemble(fun, t_span, y0_batch, method="RK45", *, rtol=1e-3,
                       atol=1e-6, args=(), jac=None, jac_sparsity=None,
                       max_steps: int = 100_000,
                       first_step=None, max_step=None, min_step: float = 0.0,
                       dtype=None, events=None,
                       event_capacity: Optional[int] = None, t_eval=None,
                       chunk_steps: int = 16384,
                       solver_options: Optional[dict] = None,
                       max_restarts: int = 0,
                       dense_output: bool = False,
                       record_trajectories: bool = False,
                       rec_chunk: int = 1024,
                       lane_chunk="auto",
                       time_dtype=None) -> EnsembleResult:
    """Batched solve to final state, executed as a host loop of bounded device
    chunks (no single device call runs unboundedly — robust against runtime
    watchdogs on pathological problems; compiled solver cached).

    ``record_trajectories=True`` additionally returns every accepted step per
    lane — ``ts`` (B, S), ``ys`` (B, S, n) padded arrays with per-lane valid
    counts ``n_steps_rec`` (B,).  ``dense_output=True`` implies recording and
    also returns ``sol``, a batched :class:`BatchOdeSolution` evaluator whose
    per-lane interpolants match the single-IVP ``OdeResult.sol`` (reference
    src/solve/cont.rs:79-153, solout.rs:141-147 — the per-step dense records
    the ensemble tier previously dropped).  Device memory stays bounded: the
    loop records into (B, rec_chunk) buffers that the host drains between
    re-entries, so total steps per lane are unbounded.

    ``max_step`` / ``min_step`` bound the adaptive step sizes;
    ``jac_sparsity`` enables the grouped-FD Jacobian and auto-selects the
    banded linear backend for the stiff methods (every precision tier).

    ``dtype="dd"`` composes with every option here:
    final states and recorded trajectories come back as f64; dense output,
    t_eval samples and event states are f64-grade (dd-packed dense
    coefficients, round 5); all time axes (step endpoints, event times,
    sample grids) keep f64 resolution.

    ``method="auto"``: per-lane stiffness routing (the batched LSODA
    analog, ivp_tpu/auto.py) — the whole batch integrates with the
    explicit method; lanes whose stiffness detector trips are resumed
    with the stiff engine from their exact reached states, with event
    terminal budgets, sample cursors and counters continuing across the
    switch.  ``result.switched`` marks the resumed lanes.

    ``lane_chunk``: host-loop the lane axis in equal sub-batches of this
    size (the final sub-batch is padded, one compile total).  Mid-size
    stiff ensembles (n=16-64) saturate by B=4096-8192 and then fall off a
    VMEM-tiling cliff (docs/TPU_NOTES.md #31) — chunking keeps every
    device call at the saturating batch size regardless of total B.
    Composes with every option here, including dense_output and
    method="auto".  The default ``"auto"`` picks the saturating sub-batch
    from the measured (n, method, factor-precision) table
    (:func:`_auto_lane_chunk`) — pass ``None`` to disable chunking or an
    int to force a size.

    ``dtype="auto"``: routes f64-class requests to the dd tier on TPUs
    (precision-aware — methods/ddtier.py::resolve_auto_dtype).
    """
    _y0_host = np.atleast_2d(np.asarray(y0_batch))
    if _y0_host.size and not np.all(np.isfinite(_y0_host)):
        raise ValueError(
            "All components of the initial states `y0_batch` must be "
            "finite.")
    # The DEFAULT precision tier: ``dtype=None`` resolves like ``"auto"`` —
    # the dd tier on TPUs, platform f64 on CPU/GPU and for mass/DAE
    # problems (methods/ddtier.py::resolve_auto_dtype);
    # ``dtype=jnp.float64`` is the explicit platform-f64 escape hatch.
    from .methods.ddtier import (resolve_auto_dtype,
                                 warn_below_emulation_floor)
    _so = solver_options or {}
    dtype = resolve_auto_dtype(
        "auto" if dtype is None else dtype, rtol=rtol,
        sampled_output=bool(t_eval is not None or dense_output
                            or record_trajectories or events is not None),
        has_mass="mass" in _so, has_dae="nind" in _so,
        method=str(method))
    warn_below_emulation_floor(rtol, dtype)
    if isinstance(lane_chunk, str):
        if lane_chunk != "auto":
            raise ValueError(f"lane_chunk must be an int, None or 'auto', "
                             f"got {lane_chunk!r}")
        # Default: table-driven sub-batching for stiff mid-size ensembles
        # (saturation/cliff data in docs/TPU_NOTES.md #31, docs/BENCH.md).
        lane_chunk = _auto_lane_chunk(
            method, _y0_host.shape[1] if _y0_host.ndim == 2 else 1,
            _y0_host.shape[0], dtype, solver_options)
    if event_capacity is None:
        event_capacity = _auto_event_capacity(
            _y0_host.shape if _y0_host.ndim == 2 else (1, _y0_host.size),
            events, dtype, lane_chunk)
    if isinstance(jac_sparsity, str) and np.asarray(y0_batch).size:
        # jac_sparsity="auto": host-side structural detection around the
        # first lane's y0 (core/sparsity.py; TPU-build extension).  Resolved
        # before the method="auto" dispatch so the stiff resume leg sees a
        # concrete pattern.
        from .core.sparsity import resolve_jac_sparsity
        _n_det = int(np.atleast_2d(np.asarray(y0_batch)).shape[1])
        jac_sparsity = resolve_jac_sparsity(
            jac_sparsity,
            lambda t, y: jnp.asarray(fun(t, y, *tuple(args))).reshape(_n_det),
            float(t_span[0]), np.atleast_2d(np.asarray(y0_batch)),
            t1=float(t_span[1]))
    if lane_chunk is not None:
        _y0 = np.atleast_2d(np.asarray(y0_batch))
        if _y0.shape[0] > int(lane_chunk):
            return _solve_lane_chunked(
                fun, t_span, _y0, method, int(lane_chunk),
                dict(rtol=rtol, atol=atol, args=args, jac=jac,
                     jac_sparsity=jac_sparsity, max_steps=max_steps,
                     first_step=first_step, max_step=max_step,
                     min_step=min_step, dtype=dtype, events=events,
                     event_capacity=event_capacity, chunk_steps=chunk_steps,
                     solver_options=solver_options,
                     max_restarts=max_restarts, dense_output=dense_output,
                     record_trajectories=record_trajectories,
                     rec_chunk=rec_chunk, time_dtype=time_dtype),
                t_eval)
    if isinstance(method, str) and method.lower() == "auto":
        from .auto import solve_ivp_ensemble_auto
        return _warn_event_overflow(solve_ivp_ensemble_auto(
            fun, t_span, y0_batch, rtol=rtol, atol=atol, args=args, jac=jac,
            jac_sparsity=jac_sparsity, max_steps=max_steps,
            first_step=first_step, max_step=max_step, min_step=min_step,
            dtype=dtype, events=events, event_capacity=event_capacity,
            t_eval=t_eval, chunk_steps=chunk_steps,
            solver_options=solver_options, max_restarts=max_restarts,
            dense_output=dense_output,
            record_trajectories=record_trajectories,
            rec_chunk=rec_chunk, time_dtype=time_dtype))
    y0_batch = np.atleast_2d(np.asarray(y0_batch))
    n = y0_batch.shape[1]
    record = bool(dense_output or record_trajectories)
    if n == 0:
        # Empty system: nothing to integrate (reference solve_ivp.rs:147-176
        # fast path, extended to the ensemble tier).
        B = y0_batch.shape[0]
        z = np.zeros((B,), np.int32)
        kw = {}
        if record:
            kw.update(ts=np.zeros((B, 0)), ys=np.zeros((B, 0, 0)),
                      n_steps_rec=z.astype(np.int64))
        return EnsembleResult(
            t=np.full((B,), float(t_span[1])), y=np.zeros((B, 0)),
            status=z, nfev=z, nstep=z, naccpt=z, nrejct=z, **kw)
    key = ("ensemble", canonical_method(method), n, str(dtype),
           _hashable(fun), tuple(_hashable(a) for a in tuple(args)),
           _hashable(jac), _hashable(jac_sparsity),
           max_steps, first_step is not None,
           tuple(_hashable(e) for e in (events or [])), event_capacity,
           chunk_steps,
           (np.asarray(t_eval, float).shape,
            np.asarray(t_eval, float).tobytes())
           if t_eval is not None else None,
           tuple(sorted((k, _hashable(v))
                        for k, v in (solver_options or {}).items())),
           max_restarts,
           record, dense_output, rec_chunk if record else 0,
           str(time_dtype), max_step, min_step)
    if record:
        entry = _ENSEMBLE_CACHE.get_or_build(
            key, lambda: build_recording_solver(
                fun, method, n=n, dtype=dtype, args=tuple(args), jac=jac,
                jac_sparsity=jac_sparsity,
                max_steps=max_steps, first_step=first_step,
                max_step=max_step, min_step=min_step, events=events,
                event_capacity=event_capacity, t_eval=t_eval,
                solver_options=solver_options, max_restarts=max_restarts,
                dense_output=dense_output, rec_chunk=rec_chunk,
                time_dtype=time_dtype))
        return _warn_event_overflow(
            _run_recording(entry, y0_batch, t_span, rtol, atol, method,
                           dense_output))
    entry = _ENSEMBLE_CACHE.get_or_build(key, lambda: build_resumable_solver(
        fun, method, n=n, dtype=dtype, args=tuple(args), jac=jac,
        jac_sparsity=jac_sparsity,
        max_steps=max_steps, first_step=first_step,
        max_step=max_step, min_step=min_step, events=events,
        event_capacity=event_capacity, chunk_steps=chunk_steps,
        t_eval=t_eval, solver_options=solver_options,
        max_restarts=max_restarts, time_dtype=time_dtype))
    start, resume, extract = entry
    t0, tf = float(t_span[0]), float(t_span[1])
    carry, ra = start(y0_batch, t0, tf, rtol, atol)
    while True:
        carry = resume(carry, ra)
        if bool(np.all(np.asarray(carry.done))):
            break
    return _warn_event_overflow(extract(carry))


# =============================================================================
# Batched trajectory recording + dense output
# =============================================================================

class BatchOdeSolution:
    """Batched continuous solution: one piecewise interpolant per lane.

    Callable like the single-IVP ``OdeSolution`` but over the whole ensemble:

    * ``sol(t)`` with scalar ``t`` -> (B, n)
    * ``sol(ts)`` with shared grid (m,) -> (B, n, m)
    * ``sol(ts)`` with per-lane grids (B, m) -> (B, n, m)

    Extrapolates beyond each lane's covered span with its first/last segment
    (SciPy semantics; reference src/solve/cont.rs:93-153).  Per-lane spans are
    in ``t_mins`` / ``t_maxs``.
    """

    def __init__(self, method, interp, xolds, hs, conts, edges, counts,
                 t0, y0_batch):
        self.method = method
        self._interp = interp
        self._xolds = np.asarray(xolds)    # (B, S)
        self._hs = np.asarray(hs)          # (B, S)
        self._conts = np.asarray(conts)    # (B, S, C, n)
        self._edges = np.asarray(edges)    # (B, S) recorded step endpoints
        self._counts = np.asarray(counts)  # (B,)
        self._y0 = np.asarray(y0_batch)    # (B, n)
        B = self._xolds.shape[0]
        self.n_lanes = B
        # t0 may be per-lane (the method="auto" stiff resume starts each
        # switched lane from its own reached time, ivp_tpu/auto.py).
        self._t0 = np.broadcast_to(np.asarray(t0, float), (B,))
        has = self._counts > 0
        lastv = self._edges[np.arange(B), np.maximum(self._counts - 1, 0)]
        t_end = np.where(has, lastv, self._t0)
        t_start = np.where(has, self._xolds[:, 0], self._t0)
        self.t_mins = np.minimum(t_start, t_end)
        self.t_maxs = np.maximum(t_start, t_end)
        self._forward = bool(np.all(t_end >= t_start))
        # Pad edges past each lane's count so searchsorted never selects a
        # padded segment (clip keeps queries on the last real one).
        pad = np.inf if self._forward else -np.inf
        mask = np.arange(self._edges.shape[1])[None, :] >= self._counts[:, None]
        self._search_edges = np.where(mask, pad, self._edges)

    def __call__(self, t):
        t_arr = np.asarray(t, dtype=float)
        scalar = t_arr.ndim == 0
        if t_arr.ndim <= 1:
            ts = np.broadcast_to(np.atleast_1d(t_arr)[None, :],
                                 (self.n_lanes, np.atleast_1d(t_arr).size))
        elif t_arr.ndim == 2:
            if t_arr.shape[0] != self.n_lanes:
                raise ValueError(
                    f"per-lane query grid must have leading dim "
                    f"{self.n_lanes}, got {t_arr.shape}")
            ts = t_arr
        else:
            raise ValueError("query times must be scalar, (m,) or (B, m)")

        B, m = ts.shape
        if self._xolds.shape[1] == 0:
            out = np.broadcast_to(self._y0[:, :, None], (B, self._y0.shape[1], m))
            return out[:, :, 0] if scalar else np.array(out)

        sgn = 1.0 if self._forward else -1.0
        # (B, m) segment indices via batched searchsorted.
        return self._eval(ts, sgn, scalar)

    def t_span(self):
        """Per-lane covered spans: ``(t_mins, t_maxs)`` arrays of shape (B,)
        (the batched analog of OdeSolution.t_span / reference cont.rs:67-76)."""
        return self.t_mins, self.t_maxs

    def _eval(self, ts, sgn, scalar):
        B, m = ts.shape
        idx = np.asarray(jax.vmap(
            lambda e, tq: jnp.searchsorted(e, tq, side="left"))(
                jnp.asarray(sgn * self._search_edges), jnp.asarray(sgn * ts)))
        idx = np.minimum(idx, np.maximum(self._counts[:, None] - 1, 0))

        rows = np.arange(B)[:, None]
        conts = jnp.asarray(self._conts[rows, idx])  # (B, m, C, n)
        xolds = jnp.asarray(self._xolds[rows, idx])
        hs = jnp.asarray(self._hs[rows, idx])
        ys = jax.vmap(jax.vmap(self._interp))(conts, xolds, hs,
                                              jnp.asarray(ts))  # (B, m, n)
        ys = np.transpose(np.asarray(ys), (0, 2, 1))  # (B, n, m)
        return ys[:, :, 0] if scalar else ys


def build_recording_solver(fun, method="RK45", *, n, dtype=None, args=(),
                           jac=None, jac_sparsity=None,
                           max_steps: int = 100_000,
                           first_step: Optional[float] = None,
                           max_step: Optional[float] = None,
                           min_step: float = 0.0, events=None,
                           event_capacity: int = 16, t_eval=None,
                           solver_options: Optional[dict] = None,
                           max_restarts: int = 0, dense_output: bool = True,
                           rec_chunk: int = 1024, time_dtype=None):
    """Vmapped driver with per-lane step recording (rec_cap > 0 under vmap).

    Returns ``(engine, start, run_chunk, reset, dense_output)`` for the
    chunk-drain host loop in :func:`solve_ivp_ensemble`; the record buffers
    are plain carry arrays, so the single-IVP recording machinery batches
    as-is — each lane has its own cursor, and a vmapped chunk stops when
    every lane is done or full.

    ``dtype="dd"``: recorded step states and dense coefficients are the f32
    views of the dd state (Engine.lower); the recorded *time* axes keep f64.
    """
    jac_sparsity = _no_auto_sparsity(jac_sparsity, "build_recording_solver")
    # Default precision tier: dtype=None resolves like "auto" (the dd
    # tier on TPUs, platform f64 elsewhere / for mass or DAE options —
    # methods/ddtier.py); dtype=jnp.float64 is the explicit escape hatch.
    from .methods.ddtier import resolve_auto_dtype as _resolve_auto
    dtype = _resolve_auto("auto" if dtype is None else dtype,
                          has_mass="mass" in (solver_options or {}),
                          has_dae="nind" in (solver_options or {}))
    use_dd = _is_dd(dtype)
    if use_dd:
        dtype = jnp.dtype(jnp.float32)   # carrier dtype of the dd words
        tdt = jnp.dtype(jnp.float64)     # exact time axis
    else:
        dtype = jnp.dtype(dtype) if dtype is not None else jnp.result_type(1.0)
        tdt = jnp.dtype(time_dtype) if time_dtype is not None else dtype
    method_c = canonical_method(method)

    if use_dd:
        dd_fun = auto_dd_rhs(fun)  # plain RHS auto-lifted (core/ddify.py)

        def rhs(t, y):
            return dd_fun(t, y, *args).reshape(n)
    else:
        def rhs(t, y):
            return jnp.asarray(fun(t, y, *args), dtype).reshape(n)

    jac_fn = None
    const_jac = False
    if method_c in ("RADAU", "BDF") and not use_dd:
        from .solve import _facade_jac_dtype, _normalize_jac
        jac_fn, const_jac = _normalize_jac(
            jac, rhs, n, dtype, tuple(args), jac_sparsity,
            jac_dtype=_facade_jac_dtype(method_c, solver_options))

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

        # dd tier: event values/states see f64 views (Engine.lower).
        ev_dt = jnp.float64 if use_dd else dtype

        def events_fn(t, y):
            return jnp.stack([jnp.asarray(e(t, y, *args), ev_dt).reshape(())
                              for e in ev_list])

    sample_grid = None
    sample_cap = 0
    if t_eval is not None:
        sample_grid = _norm_sample_grid(t_eval)
        sample_cap = int(sample_grid.shape[-1])

    need_cont = bool(dense_output or n_ev or sample_cap)
    if use_dd:
        engine, p = _make_dd_engine(method_c, need_cont, fun, tuple(args),
                                    jac, n, solver_options, jac_sparsity)
    else:
        engine, p = get_engine(
            method_c, need_cont=need_cont, jac_fn=jac_fn,
            const_jac=const_jac, n=n,
            **_auto_band_opts(method_c, solver_options, jac_sparsity,
                                  dtype=dtype))
    # Scan-based recording (driver.DriverConfig.rec_scan): under vmap the
    # while-design's per-lane record writes lower as scatters / full-buffer
    # selects (measured 20-100x the lean loop, docs/BENCH.md round 5);
    # the scan chunk records through stacked scan outputs instead.
    cfg = DriverConfig(rec_cap=rec_chunk, record_cont=dense_output,
                       rec_scan=True,
                       ncoeff=engine.ncoeff, event_spec=ev_spec,
                       sample_cap=sample_cap, max_restarts=max_restarts)
    restart_fns = [getattr(e, "restart", None) for e in ev_list]
    init_carry, run_chunk, reset, _ = make_driver(engine, p, cfg, rhs,
                                                  events_fn, restart_fns)

    def _ra_axes(ra: RunArgs) -> RunArgs:
        return RunArgs(
            tend=None,
            rtol=0 if ra.rtol.ndim == 2 else None,
            atol=0 if ra.atol.ndim == 2 else None,
            hmax=None, hmin=None, max_steps=None,
            t_grid=(0 if (ra.t_grid is not None and ra.t_grid.ndim == 2)
                    else None),
        )

    # dd: keep first_step at full (time-dtype) resolution — RK4's
    # fixed h must not be f32-rounded (methods/dd_erk.py::dd_rk4_init);
    # the adaptive engines' init casts to f32 themselves.
    _fs_dt = tdt if use_dd else dtype
    _fs = (jnp.asarray(first_step, _fs_dt) if first_step is not None
           else None)

    @jax.jit
    def _vinit(y0_batch, t0_b, ra):
        """Jitted vmapped init: eager per-op dispatch of init_carry
        (hinit RHS evals, dd splits) cost seconds per facade call through
        the remote-execution tunnel (round-5 measurement)."""
        return jax.vmap(lambda y0, tt, r: init_carry(tt, y0, _fs, r),
                        in_axes=(0, 0, _ra_axes(ra)))(y0_batch, t0_b, ra)

    def start(y0_batch, t0, tf, rtol, atol):
        if use_dd:
            y0_batch = ddm.from_f64(jnp.asarray(y0_batch, jnp.float64))
        else:
            y0_batch = jnp.asarray(y0_batch, dtype)
        B = y0_batch.shape[0]
        _guard_worker_crash_region(method_c, n, B, dtype,
                                   solver_options, jac_sparsity)
        rtol_v, _ = _norm_tol(rtol, B, n, dtype, "rtol")
        atol_v, _ = _norm_tol(atol, B, n, dtype, "atol")
        grid = (jnp.asarray(sample_grid, tdt)
                if sample_grid is not None else None)
        # t0 may be a scalar or a (B,) array of per-lane start times (the
        # method="auto" stiff resume restarts each tripped lane from its own
        # reached time, ivp_tpu/auto.py).
        hmax = float(np.max(np.abs(float(tf) - np.asarray(t0, float))))
        if max_step is not None:
            hmax = min(hmax, abs(float(max_step)))
        ra = RunArgs(
            tend=jnp.asarray(tf, tdt), rtol=rtol_v, atol=atol_v,
            hmax=jnp.asarray(hmax, tdt),
            hmin=jnp.asarray(abs(min_step), tdt),
            max_steps=jnp.asarray(max_steps, jnp.int32), t_grid=grid)
        t0_b = jnp.broadcast_to(jnp.asarray(t0, tdt), (B,))
        carry = _vinit(y0_batch, t0_b, ra)
        return carry, ra

    @jax.jit
    def run_vchunk(carry, ra):
        return jax.vmap(run_chunk, in_axes=(0, _ra_axes(ra)))(carry, ra)

    vreset = jax.jit(jax.vmap(reset))
    return engine, start, run_vchunk, vreset, dense_output


def _drain_recording(entry, y0_batch, t0, tf, rtol, atol, preload=None):
    """Host chunk-drain loop for the recording solver: scatter each chunk's
    per-lane records into growing padded arrays (vectorized, no per-lane
    Python loop).  Returns ``(carry, counts, ts, ys, xolds, hs, conts)``.

    ``t0`` may be a (B,) array of per-lane start times and ``preload`` a
    carry -> carry continuation hook (the method="auto" stiff resume,
    ivp_tpu/auto.py)."""
    engine, start, run_vchunk, vreset, dense_output = entry
    B, n = np.asarray(y0_batch).shape
    carry, ra = start(y0_batch, t0, tf, rtol, atol)
    if preload is not None:
        carry = preload(carry)

    chunks = []  # (valid (B,cap), rec_t, rec_y, rec_xold, rec_h, rec_cont)
    while True:
        carry, recs = run_vchunk(carry, ra)
        valid = np.asarray(recs.valid)                          # (B, cap)
        if valid.any():
            # dd tier: recorded endpoints carry the full DD pair (driver
            # records the state representation) — lift to f64 on drain.
            rec_y = (ddm.to_f64(recs.y)
                     if isinstance(recs.y, ddm.DD) else recs.y)
            rc = None
            if dense_output:
                # Flat (B, cap, C*n) record rows -> (B, cap, C, n).
                rc = np.asarray(recs.cont)
                rc = rc.reshape(rc.shape[0], rc.shape[1], -1, n)
            chunks.append((valid, np.asarray(recs.t),
                           np.asarray(rec_y),
                           np.asarray(recs.xold),
                           np.asarray(recs.h), rc))
        if bool(np.all(np.asarray(carry.done))):
            break

    counts = (np.sum([c[0].sum(axis=1) for c in chunks], axis=0)
              .astype(np.int64) if chunks else np.zeros((B,), np.int64))
    S = int(counts.max()) if chunks else 0
    C = engine.ncoeff
    ts = np.zeros((B, S))
    ys = np.zeros((B, S, n))
    xolds = np.zeros((B, S))
    hs = np.zeros((B, S))
    conts = np.zeros((B, S, C, n)) if dense_output else None
    offs = np.zeros((B,), np.int64)
    for valid, ct, cy, cx, ch, cc in chunks:
        # Compact: scan rows are in iteration (= chronological) order but
        # interleaved with invalid (rejected / frozen-lane) rows — scatter
        # each valid row to its per-lane running offset.
        rows, cols_in = np.nonzero(valid)
        cols_out = offs[rows] + np.cumsum(valid, axis=1)[rows, cols_in] - 1
        ts[rows, cols_out] = ct[rows, cols_in]
        ys[rows, cols_out] = cy[rows, cols_in]
        xolds[rows, cols_out] = cx[rows, cols_in]
        hs[rows, cols_out] = ch[rows, cols_in]
        if dense_output:
            conts[rows, cols_out] = cc[rows, cols_in]
        offs = offs + valid.sum(axis=1)
    return carry, counts, ts, ys, xolds, hs, conts


def _recording_result(engine, method, carry, counts, ts, ys, xolds, hs,
                      conts, dense_output, t0, y0_batch) -> EnsembleResult:
    """Assemble the EnsembleResult of a drained recording run."""
    kw = dict(ts=ts, ys=ys, n_steps_rec=counts)
    if dense_output:
        kw["sol"] = BatchOdeSolution(method, engine.interp, xolds, hs, conts,
                                     ts, counts, t0, y0_batch)
    ev = carry.ev
    n_ev = int(np.asarray(ev.hits).shape[-1])
    if n_ev:
        kw.update(t_events=np.asarray(ev.t_buf), y_events=np.asarray(ev.y_buf),
                  n_events=np.asarray(ev.n_rec),
                  event_overflow=np.asarray(ev.overflow))
    if carry.sample_y.shape[-2]:
        kw.update(y_samples=np.asarray(carry.sample_y),
                  n_samples=np.asarray(carry.s_cursor))
    kw.update(n_restarts=np.asarray(carry.n_restarts))
    y_fin = (ddm.to_f64(carry.y) if isinstance(carry.y, ddm.DD)
             else carry.y)
    return EnsembleResult(t=np.asarray(carry.t), y=np.asarray(y_fin),
                          status=np.asarray(carry.status),
                          nfev=np.asarray(carry.nfev),
                          nstep=np.asarray(carry.nstep),
                          naccpt=np.asarray(carry.naccpt),
                          nrejct=np.asarray(carry.nrejct), **kw)



def _run_recording(entry, y0_batch, t_span, rtol, atol, method,
                   dense_output) -> EnsembleResult:
    """Drain + assemble for the plain (single-method) recording path."""
    t0, tf = float(t_span[0]), float(t_span[1])
    carry, counts, ts, ys, xolds, hs, conts = _drain_recording(
        entry, y0_batch, t0, tf, rtol, atol)
    return _recording_result(entry[0], method, carry, counts, ts, ys,
                             xolds, hs, conts, dense_output, t0, y0_batch)


# =============================================================================
# Lane chunking (host loop over equal sub-batches; docs/TPU_NOTES.md #31)
# =============================================================================

def _disambiguate_tol(v, B, n):
    """Resolve a tolerance's lane/component interpretation at the ORIGINAL
    (B, n) before chunking: a per-lane 1-D (B,) vector becomes (B, 1) so a
    chunk sub-solve can never reinterpret the sliced vector as per-state
    when the chunk size collides with n (the _norm_tol ambiguity rule must
    be applied once, against the full batch, not per chunk)."""
    if v is None:
        return None
    a = np.asarray(v)
    if a.ndim == 1 and a.shape[0] == B and B != n:
        return a[:, None]
    return v


def _lane_slice(v, sl, B):
    """Slice per-lane (2-D, leading dim B) parameters; pass shared values
    through.  1-D inputs must be disambiguated first (_disambiguate_tol)."""
    if v is None:
        return None
    a = np.asarray(v)
    if a.ndim == 2 and a.shape[0] == B:
        return a[sl]
    return v


def _pad_lanes(a, p):
    """Append p copies of the last lane (tail padding for the final chunk)."""
    if p == 0 or a is None or np.ndim(a) == 0:
        return a
    a = np.asarray(a)
    return np.concatenate([a, np.repeat(a[-1:], p, axis=0)], axis=0)


class ChunkedBatchSolution:
    """Lane-chunked batched dense solution: per-chunk evaluators
    (:class:`BatchOdeSolution` or the method="auto"
    CompositeBatchOdeSolution) concatenated along the lane axis.  Same
    query surface: scalar / shared (m,) / per-lane (B, m) grids."""

    def __init__(self, sols, counts):
        self._sols = list(sols)
        self._counts = [int(c) for c in counts]
        self.n_lanes = sum(self._counts)
        self.method = sols[0].method
        self.t_mins = np.concatenate(
            [np.asarray(s.t_mins)[:c] for s, c in zip(sols, self._counts)])
        self.t_maxs = np.concatenate(
            [np.asarray(s.t_maxs)[:c] for s, c in zip(sols, self._counts)])

    def t_span(self):
        return self.t_mins, self.t_maxs

    def __call__(self, t):
        t_arr = np.asarray(t, dtype=float)
        scalar = t_arr.ndim == 0
        if t_arr.ndim <= 1:
            ts = np.broadcast_to(np.atleast_1d(t_arr)[None, :],
                                 (self.n_lanes, np.atleast_1d(t_arr).size))
        elif t_arr.ndim == 2:
            if t_arr.shape[0] != self.n_lanes:
                raise ValueError(
                    f"per-lane query grid must have leading dim "
                    f"{self.n_lanes}, got {t_arr.shape}")
            ts = t_arr
        else:
            raise ValueError("query times must be scalar, (m,) or (B, m)")
        outs = []
        off = 0
        for s, c in zip(self._sols, self._counts):
            sub = ts[off:off + c]
            if c < s.n_lanes:  # padded final chunk
                sub = np.concatenate(
                    [sub, np.repeat(sub[-1:], s.n_lanes - c, axis=0)])
            outs.append(np.asarray(s(sub))[:c])
            off += c
        out = np.concatenate(outs, axis=0)
        return out[:, :, 0] if scalar else out


def _solve_lane_chunked(fun, t_span, y0_arr, method, lane_chunk, kw,
                        t_eval) -> EnsembleResult:
    """Host loop over equal lane sub-batches (final one tail-padded so
    every device call has the same shape -> one compile), results
    concatenated back to the full batch."""
    B, n = y0_arr.shape
    rtol = _disambiguate_tol(kw.pop("rtol"), B, n)
    atol = _disambiguate_tol(kw.pop("atol"), B, n)
    te_perlane = t_eval is not None and np.asarray(t_eval, float).ndim == 2

    parts = []
    counts = []
    for lo in range(0, B, lane_chunk):
        hi = min(lo + lane_chunk, B)
        sl = slice(lo, hi)
        p = lane_chunk - (hi - lo)   # tail padding
        y0c = _pad_lanes(y0_arr[sl], p)
        rt = _pad_lanes(_lane_slice(rtol, sl, B), p)
        at = _pad_lanes(_lane_slice(atol, sl, B), p)
        te = (_pad_lanes(np.asarray(t_eval, float)[sl], p) if te_perlane
              else t_eval)
        parts.append(solve_ivp_ensemble(
            fun, t_span, y0c, method, rtol=rt, atol=at, t_eval=te, **kw))
        counts.append(hi - lo)

    def cat(f):
        vals = [getattr(r, f) for r in parts]
        if any(v is None for v in vals):
            return None
        if f == "sol":
            return ChunkedBatchSolution(vals, counts)
        if f in ("ts", "ys"):   # pad the step axis to the widest chunk
            S = max(np.asarray(v).shape[1] for v in vals)
            padded = []
            for v, c in zip(vals, counts):
                a = np.asarray(v)[:c]
                if a.shape[1] < S:
                    pad = [(0, 0)] * a.ndim
                    pad[1] = (0, S - a.shape[1])
                    a = np.pad(a, pad)
                padded.append(a)
            return np.concatenate(padded, axis=0)
        return np.concatenate([np.asarray(v)[:c]
                               for v, c in zip(vals, counts)], axis=0)

    return EnsembleResult(**{f: cat(f) for f in EnsembleResult._fields})
