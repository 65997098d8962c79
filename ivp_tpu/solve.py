"""SciPy-compatible ``solve_ivp`` facade.

API parity target: the reference's Python entry point
(reference src/python/solve.rs:150-432) which itself mirrors
``scipy.integrate.solve_ivp``.  The RHS / events / jacobian are JAX-traceable
callables compiled *into* the integration loop, eliminating the per-RHS-call
language-boundary cost the reference pays (SURVEY.md §3.2).

Output sampling (``t_eval``), dense output and ``first_step`` output
enforcement are vectorized post-processing passes over the recorded per-step
interpolant segments, instead of the reference's in-loop callback
(reference src/solve/solout.rs).  Event detection runs in-loop (it must stop
the integration) — see core/events.py.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .types import Status, canonical_method, scipy_message
from .core.cache import LRUCache, cache_token
from .core.driver import DriverConfig, make_driver, run_args
from .core.events import EventSpec
from .core import ddmath as ddm
from .methods import get_engine

_TOL = 1e-12  # endpoint matching tolerance (reference solout.rs:33)


# =============================================================================
# Result containers
# =============================================================================

class OdeResult(dict):
    """SciPy-style bunch: attribute and item access.

    Fields: t, y, sol, t_events, y_events, nfev, njev, nlu, nstep, naccpt,
    nrejct, status, message, success (reference src/python/result.rs:14-98).
    """

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __repr__(self):
        keys = ", ".join(sorted(self.keys()))
        return f"OdeResult({keys})"


class OdeSolution:
    """Continuous solution: piecewise per-step interpolants, callable like
    SciPy's OdeSolution (extrapolates beyond the covered span; reference
    src/python/solution.rs:76-139, src/solve/cont.rs:93-153)."""

    def __init__(self, method: str, interp: Callable, xolds, hs, conts, t0, y0,
                 t_ends=None):
        self.method = method
        self._interp = interp
        self._xolds = np.asarray(xolds)
        self._hs = np.asarray(hs)
        self._conts = np.asarray(conts)
        self._t0 = float(t0)
        self._y0 = np.asarray(y0)
        self.n_segments = self._xolds.shape[0]
        if self.n_segments:
            # Segment right edges in integration order for searchsorted.
            # ``t_ends`` (the recorded per-step endpoints) matters when a
            # step was truncated by a terminal/restarting event: its
            # interpolant's nominal span xold + h extends past the event
            # point and would otherwise shadow the post-restart segments.
            if t_ends is not None:
                self._edges = np.asarray(t_ends)
            else:
                self._edges = self._xolds + self._hs
            t_start = self._xolds[0]
            t_end = self._edges[-1]
            self.t_min = float(min(t_start, t_end))
            self.t_max = float(max(t_start, t_end))
            self._forward = (t_end - t_start) >= 0
        else:
            self.t_min = self.t_max = self._t0
            self._forward = True
            self._edges = np.zeros((0,))

    def _find_segments(self, ts: np.ndarray) -> np.ndarray:
        if self.n_segments == 0:
            return np.zeros(ts.shape, np.int64)
        if self._forward:
            idx = np.searchsorted(self._edges, ts, side="left")
        else:
            idx = np.searchsorted(-self._edges, -ts, side="left")
        return np.clip(idx, 0, self.n_segments - 1)

    def __call__(self, t):
        t_arr = np.asarray(t, dtype=float)
        scalar = t_arr.ndim == 0
        ts = np.atleast_1d(t_arr)
        if self.n_segments == 0:
            out = np.broadcast_to(self._y0[:, None], (self._y0.shape[0], ts.shape[0]))
            return out[:, 0] if scalar else np.array(out)
        idx = self._find_segments(ts)
        conts = jnp.asarray(self._conts[idx])
        xolds = jnp.asarray(self._xolds[idx])
        hs = jnp.asarray(self._hs[idx])
        ys = jax.vmap(self._interp)(conts, xolds, hs, jnp.asarray(ts))  # (m, n)
        ys = np.asarray(ys).T  # (n, m)
        return ys[:, 0] if scalar else ys

    # -- strict (range-checked) variants of the Rust solution tier
    #    (reference src/solve/solution.rs:25-71 sol/sol_many/sol_span;
    #    src/solve/cont.rs:79-117 errors on out-of-range evaluation) --

    def t_span(self):
        """(t_min, t_max) covered by the interpolants (cont.rs:67-76)."""
        return self.t_min, self.t_max

    def _check_range(self, ts):
        eps = 1e-12 * max(1.0, abs(self.t_min), abs(self.t_max))
        bad = (ts < self.t_min - eps) | (ts > self.t_max + eps)
        if np.any(bad):
            t_bad = np.atleast_1d(ts)[np.atleast_1d(bad)][0]
            raise ValueError(
                f"t={t_bad} outside the solution span "
                f"[{self.t_min}, {self.t_max}] (strict evaluation; use the "
                f"callable form for SciPy-style extrapolation)")

    def sol(self, t):
        """Strict scalar evaluation: raises outside [t_min, t_max]
        (reference solution.rs:25-38)."""
        t_arr = np.asarray(t, dtype=float)
        self._check_range(t_arr)
        return self(t)

    def sol_many(self, ts):
        """Strict vectorized evaluation (reference solution.rs:40-55)."""
        ts = np.asarray(ts, dtype=float)
        self._check_range(ts)
        return self(ts)

    def sol_span(self, t_start, t_end, m):
        """Evaluate on ``m`` evenly spaced points of [t_start, t_end], all of
        which must lie inside the covered span (reference solution.rs:57-71).

        Returns (ts (m,), ys (n, m)).
        """
        ts = np.linspace(float(t_start), float(t_end), int(m))
        self._check_range(ts)
        return ts, self(ts)


# =============================================================================
# Compiled-solver cache
# =============================================================================

_SOLVER_CACHE = LRUCache(maxsize=64)
_hashable = cache_token  # GC-safe key component (core/cache.py)


def _get_compiled(key, builder):
    return _SOLVER_CACHE.get_or_build(key, builder)


# =============================================================================
# solve_ivp
# =============================================================================

def solve_ivp(
    fun: Callable,
    t_span,
    y0,
    method: str = "RK45",
    t_eval=None,
    dense_output: bool = False,
    events=None,
    vectorized: bool = False,  # accepted for SciPy parity; traced RHS makes it moot
    args=None,
    *,
    rtol=1e-3,
    atol=1e-6,
    jac=None,
    jac_sparsity=None,
    max_step: float = math.inf,
    min_step: float = 0.0,
    first_step: Optional[float] = None,
    max_steps: Optional[int] = None,
    mass=None,
    nind1: Optional[int] = None,
    nind2: Optional[int] = None,
    nind3: Optional[int] = None,
    dtype=None,
    time_dtype=None,
    chunk_steps: int = 4096,
    event_capacity: int = 512,
    solver_options: Optional[dict] = None,
    max_restarts: int = 0,
) -> OdeResult:
    """Solve an initial value problem y' = f(t, y) with a TPU-compiled loop.

    SciPy-compatible signature (reference src/python/solve.rs:150-167).
    ``fun``, ``events`` and ``jac`` must be JAX-traceable.

    Beyond SciPy: ``max_restarts`` enables in-device event restarts — a
    terminal event whose callable has a ``restart`` attribute
    (``y_new = e.restart(t, y)``) relaunches the integration from the event
    point with the modified state inside the compiled loop (the reference's
    ControlFlag::ModifiedSolution, src/solout.rs:73-78), up to
    ``max_restarts`` times; ``result.n_restarts`` reports the count.

    ``time_dtype=jnp.float64`` with ``dtype=jnp.float32`` activates the
    f64-time/f32-state hybrid: t, h and event times keep f64 resolution
    while state arithmetic runs at f32 speed (fixes long-horizon f32 runs
    stalling once steps fall below the f32 ulp of t).

    ``dtype="dd"``: the double-float precision tier — f64-class state
    precision from the framework's own double-f32 arithmetic
    (core/ddmath.py) at 1.7-2x the platform's emulated-f64 throughput on
    TPU.  Step sequences match the platform-f64 engines through rtol 1e-13;
    the whole output surface is f64-grade (round 5): recorded step
    endpoints carry the full DD pair, dense coefficients are recorded as
    dd (hi, lo) pairs and interpolated in f64, and event values/states/
    times are f64 (methods/ddtier.py::dd_pack_cont) — precision-uniform
    like the reference's Float tier (reference src/lib.rs:78-85).

    ``dtype=None`` (the default) resolves like ``"auto"``: the dd tier on
    TPUs (where platform f64 is software emulation), platform f64 on
    CPU/GPU and for mass/DAE problems
    (methods/ddtier.py::resolve_auto_dtype).  ``dtype=jnp.float64`` is the
    explicit platform-f64 escape hatch.

    ``result.event_overflow`` flags events whose fixed-capacity record
    buffer (``event_capacity``) dropped occurrences.
    """
    del vectorized  # the RHS is traced; vectorization is inherent
    y0_host = np.atleast_1d(np.asarray(y0))
    if y0_host.size and not np.all(np.isfinite(y0_host)):
        # SciPy parity (the reference carries this test disabled,
        # tests/test_ivp.py:865-870); a non-finite y0 otherwise poisons
        # hinit and integrates garbage silently.
        raise ValueError(
            "All components of the initial state `y0` must be finite.")
    if isinstance(method, str) and method.lower() == "auto":
        if mass is not None:
            raise ValueError(
                "method='auto' starts with an explicit method and cannot "
                "honor mass=; use method='Radau' for mass-matrix problems.")
        # LSODA-analog automatic stiffness switching (ivp_tpu/auto.py).
        from .auto import solve_ivp_auto
        return solve_ivp_auto(
            fun, t_span, y0, t_eval=t_eval, dense_output=dense_output,
            events=events, args=args, rtol=rtol, atol=atol, jac=jac,
            jac_sparsity=jac_sparsity, max_step=max_step, min_step=min_step,
            first_step=first_step, max_steps=max_steps, mass=mass,
            nind1=nind1, nind2=nind2, nind3=nind3, dtype=dtype,
            time_dtype=time_dtype, chunk_steps=chunk_steps,
            event_capacity=event_capacity, solver_options=solver_options,
            max_restarts=max_restarts)
    # The DEFAULT precision tier: ``dtype=None`` resolves like ``"auto"`` —
    # the dd double-float tier on TPUs (the framework's fastest f64-class
    # execution path, methods/ddtier.py), platform f64 on CPU/GPU and for
    # mass/DAE problems.  ``dtype=jnp.float64`` is the explicit platform-f64
    # escape hatch; ``dtype="dd"`` requests the dd tier unconditionally.
    from .methods.ddtier import (is_dd, resolve_auto_dtype,
                                 warn_below_emulation_floor)
    has_dae = any(v is not None for v in (nind1, nind2, nind3))
    dtype = resolve_auto_dtype(
        "auto" if dtype is None else dtype, rtol=rtol,
        sampled_output=bool(t_eval is not None or dense_output
                            or events is not None),
        has_mass=mass is not None, has_dae=has_dae, method=str(method))
    warn_below_emulation_floor(rtol, dtype)
    use_dd = is_dd(dtype)
    if use_dd:
        if mass is not None or has_dae:
            raise ValueError(
                "dtype='dd' integrates identity-mass ODEs only (the dd "
                "stiff engines have no mass/DAE support); use the platform "
                "f64 tier for mass-matrix / DAE problems.")
        # Carrier dtype of the dd words is f32; the time axis defaults to
        # platform f64 (exact t accumulation — same contract as the dd
        # ensemble tier, docs/BENCH.md).
        dtype = jnp.dtype(jnp.float32)
        tdt = (jnp.dtype(time_dtype) if time_dtype is not None
               else jnp.dtype(jnp.float64))
    else:
        dtype = jnp.dtype(dtype) if dtype is not None else jnp.result_type(1.0)
        # f64-time/f32-state hybrid: time_dtype=jnp.float64 with dtype=float32
        # keeps t/h/event-times at f64 resolution while state math stays f32
        # (fixes the f32 long-horizon limit where t + h == t for small steps).
        tdt = jnp.dtype(time_dtype) if time_dtype is not None else dtype

    t0, tf = (float(t_span[0]), float(t_span[1]))
    y0_arr = jnp.atleast_1d(jnp.asarray(y0, jnp.float64 if use_dd else dtype))
    n = int(y0_arr.shape[0])
    method = canonical_method(method)

    if args is None:
        args = ()
    else:
        args = tuple(args)

    # -- event normalization (scipy attribute convention) --
    if events is not None and callable(events):
        events = [events]
    ev_list = list(events) if events is not None else []
    n_events = len(ev_list)
    directions = []
    terminal_counts = []
    for e in ev_list:
        d = getattr(e, "direction", 0) or 0
        directions.append(int(np.sign(d)))
        term = getattr(e, "terminal", False)
        if term is True:
            terminal_counts.append(1)
        elif term:
            terminal_counts.append(int(term))
        else:
            terminal_counts.append(0)
    directions = tuple(directions)
    terminal_counts = tuple(terminal_counts)

    # -- t_eval validation (scipy semantics) --
    t_eval_arr = None
    if t_eval is not None:
        t_eval_arr = np.atleast_1d(np.asarray(t_eval, dtype=float))
        lo, hi = min(t0, tf), max(t0, tf)
        if t_eval_arr.size and (t_eval_arr.min() < lo - _TOL or t_eval_arr.max() > hi + _TOL):
            raise ValueError("Values in `t_eval` are not within `t_span`.")

    # -- fast paths: zero interval / empty system (reference
    #    solve_ivp.rs:109-176) --
    if abs(tf - t0) < 1e-15:
        return _zero_interval_result(method, t0, y0_arr, t_eval_arr,
                                     dense_output, n_events, events is not None)
    if n == 0:
        return _empty_system_result(method, t0, tf, t_eval_arr, dense_output,
                                    n_events, events is not None)

    # -- wrap user callables into traced closures --
    if use_dd:
        # A plain-jnp RHS auto-lifts to dd arithmetic by jaxpr
        # reinterpretation (core/ddify.py) — same callable as every dtype.
        from .core.ddify import auto_dd_rhs
        dd_fun = auto_dd_rhs(fun)

        def rhs(t, y):
            return dd_fun(t, y, *args).reshape(n)
    else:
        def rhs(t, y):
            return jnp.asarray(fun(t, y, *args), dtype).reshape(n)

    if n_events:
        # Event functions see plain-array state views (Engine.lower: f64
        # views of the dd state since round 5, so event values, states and
        # times are all f64-grade on every tier).
        ev_dt = jnp.float64 if use_dd else dtype

        def events_fn(t, y):
            return jnp.stack(
                [jnp.asarray(e(t, y, *args), ev_dt).reshape(()) for e in ev_list]
            )
    else:
        events_fn = None

    # jac_sparsity="auto": detect the structural pattern by probing jacfwd
    # around y0 (host-side, one-time) — feeds grouped FD + the banded
    # backend like a user pattern (TPU-build extension; the reference
    # requires an explicit scipy pattern, src/python/sparsity.rs:30-92).
    if isinstance(jac_sparsity, str):
        from .core.sparsity import resolve_jac_sparsity
        probe_rhs = ((lambda t, y: jnp.asarray(fun(t, y, *args)).reshape(n))
                     if use_dd else rhs)
        jac_sparsity = resolve_jac_sparsity(jac_sparsity, probe_rhs, t0,
                                            y0_arr, t1=tf)

    if use_dd:
        jac_fn, const_jac = None, False  # the dd stiff engines build their
        #                                  own f32 Jacobian (ddtier.dd_jac_fn)
    else:
        jac_fn, const_jac = _normalize_jac(
            jac, rhs, n, dtype, args, jac_sparsity=jac_sparsity,
            jac_dtype=_facade_jac_dtype(method, solver_options))

    need_cont = bool(dense_output or t_eval_arr is not None or n_events
                     or first_step is not None)

    # -- build / fetch the compiled driver --
    ev_spec = (EventSpec(n_events, directions, terminal_counts, event_capacity)
               if n_events else None)
    key = (
        "solve", method, n, str(dtype), str(tdt), need_cont, chunk_steps, ev_spec,
        _hashable(fun), _hashable(jac), tuple(_hashable(a) for a in args),
        tuple(_hashable(e) for e in ev_list),
        first_step is not None, bool(mass is not None),
        nind1, nind2, nind3, _hashable(jac_sparsity),
        tuple(sorted((solver_options or {}).items())), max_restarts,
        use_dd,
    )

    # Narrow-band Jacobian sparsity enables the block-tridiagonal cyclic
    # reduction backend in the stiff engines (reference banded storage,
    # matrix/base.rs:6-16; here log-depth CR instead of a sequential
    # banded LU — core/block_tridiag.py).
    extra_opts = {}
    if (jac_sparsity is not None and method in ("RADAU", "BDF")
            and "band" not in (solver_options or {})):
        from .core.block_tridiag import band_of_pattern
        extra_opts["band"] = band_of_pattern(jac_sparsity)
    # (No factor_f32 hint here: for single IVPs the banded CR backend wins
    # from n>=48 at every factor precision — the batched-f32 dense win is
    # an ensemble/vmap phenomenon, hinted by the batch builders only.)

    def builder():
        if use_dd:
            from .methods.ddtier import make_dd_engine
            engine, p = make_dd_engine(
                method, need_cont, fun, args, jac, n,
                {**extra_opts, **(solver_options or {})}, jac_sparsity)
        else:
            engine, p = get_engine(
                method, need_cont=need_cont, jac_fn=jac_fn,
                const_jac=const_jac,
                mass=mass, nind=(nind1, nind2, nind3), n=n,
                **extra_opts, **(solver_options or {}),
            )
        cfg = DriverConfig(rec_cap=chunk_steps, record_cont=need_cont,
                           ncoeff=engine.ncoeff, event_spec=ev_spec,
                           max_restarts=max_restarts)
        restart_fns = [getattr(e, "restart", None) for e in ev_list]
        init_carry, run_chunk, reset, _ = make_driver(engine, p, cfg, rhs,
                                                      events_fn, restart_fns)
        return (
            engine,
            jax.jit(init_carry),
            jax.jit(run_chunk),
            jax.jit(reset),
        )

    engine, init_carry, run_chunk, reset = _get_compiled(key, builder)

    # -- run (chunked host loop: unbounded steps, bounded device buffers) --
    hmax = abs(tf - t0) if not np.isfinite(max_step) else float(max_step)
    nmax = int(max_steps) if max_steps is not None else 2**31 - 2
    ra = run_args(tf, _broadcast_tol(rtol, n, dtype), _broadcast_tol(atol, n, dtype),
                  hmax, min_step, nmax, dtype, time_dtype=tdt)

    fs = first_step
    if method == "RK4" and fs is None:
        fs = abs(tf - t0) / 100.0  # reference solve_ivp.rs:185
    # dd: first_step stays at time-dtype resolution (RK4's fixed h must not
    # be f32-rounded; the adaptive engines' init casts to f32 themselves).
    fs_tr = (jnp.asarray(abs(fs), tdt if use_dd else dtype)
             if fs is not None else None)

    y0_dev = ddm.from_f64(y0_arr) if use_dd else y0_arr
    carry = init_carry(jnp.asarray(t0, tdt), y0_dev, fs_tr, ra)

    seg_t, seg_y, seg_xold, seg_h, seg_cont = [], [], [], [], []
    while True:
        carry = run_chunk(carry, ra)
        k = int(carry.n_rec)
        if k:
            # Slice on device BEFORE the host transfer (k is a host int, so
            # [:k] is a static slice): a typical solve records ~1e2 steps
            # into chunk_steps=4096-row buffers — fetching only the valid
            # prefix cuts the device->host bytes ~40x on the latency path.
            # dd: recorded endpoints carry the full DD pair — lift to f64.
            ry = ddm.to_f64(carry.rec_y[:k]) if use_dd else carry.rec_y[:k]
            seg_t.append(np.asarray(carry.rec_t[:k]))
            seg_y.append(np.asarray(ry))
            seg_xold.append(np.asarray(carry.rec_xold[:k]))
            seg_h.append(np.asarray(carry.rec_h[:k]))
            if need_cont:
                # Flat (k, C*n) record rows -> (k, C, n) (driver.Carry).
                seg_cont.append(
                    np.asarray(carry.rec_cont[:k]).reshape(k, -1, n))
        if bool(carry.done):
            break
        carry = reset(carry)

    rec_t = np.concatenate(seg_t) if seg_t else np.zeros((0,))
    rec_y = np.concatenate(seg_y) if seg_y else np.zeros((0, n))
    rec_xold = np.concatenate(seg_xold) if seg_xold else np.zeros((0,))
    rec_h = np.concatenate(seg_h) if seg_h else np.zeros((0,))
    rec_cont = (np.concatenate(seg_cont) if seg_cont
                else np.zeros((0, engine.ncoeff, n)))

    status = int(carry.status)
    terminated = status == Status.USER_INTERRUPT

    # -- assemble outputs --
    posneg = 1.0 if tf >= t0 else -1.0
    y0_np = np.asarray(y0_arr)

    def interp_at(ts: np.ndarray) -> np.ndarray:
        """Vectorized dense evaluation of many times against the records."""
        if ts.size == 0:
            return np.zeros((0, n))
        # Recorded endpoints, not xold + h: an event-truncated (restart)
        # step's interpolant nominally spans past the event point and must
        # not shadow the post-restart segments.
        edges = rec_t
        if posneg > 0:
            idx = np.searchsorted(edges, ts - _TOL, side="left")
        else:
            idx = np.searchsorted(-edges, -(ts + _TOL), side="left")
        idx = np.clip(idx, 0, len(edges) - 1)
        out = jax.vmap(engine.interp)(
            jnp.asarray(rec_cont[idx]), jnp.asarray(rec_xold[idx]),
            jnp.asarray(rec_h[idx]), jnp.asarray(ts))
        return np.asarray(out)

    if t_eval_arr is not None:
        # Emission window (reference solout.rs:344-386): points inside completed
        # steps; on terminal interruption the terminal step's points are not
        # emitted, but the event point itself is appended (solout.rs:314-325).
        if terminated and len(rec_t):
            t_limit = rec_xold[-1]
        else:
            t_limit = carry_t_reached(rec_t, t0)
        sel = ((t_eval_arr - t0) * posneg >= -_TOL) & \
              ((t_eval_arr - t_limit) * posneg <= _TOL)
        ts = t_eval_arr[sel]
        ys = np.zeros((ts.size, n))
        at_t0 = np.abs(ts - t0) <= _TOL
        if np.any(~at_t0):
            ys[~at_t0] = interp_at(ts[~at_t0])
        ys[at_t0] = y0_np
        t_out = list(ts)
        y_out = list(ys)
        if terminated and len(rec_t):
            t_out.append(rec_t[-1])
            y_out.append(rec_y[-1])
    else:
        t_out = [t0] + list(rec_t)
        y_out = [y0_np] + list(rec_y)
        if first_step is not None and method != "RK4" and len(rec_t):
            t_out, y_out = _enforce_first_step(
                t_out, y_out, rec_t, rec_y, t0, posneg, float(first_step),
                interp_at)
        # Dedup identical consecutive endpoints (reference solout.rs:424-427).
        t_out, y_out = _dedup(t_out, y_out)

    t_arr = np.asarray(t_out, dtype=float)
    y_arr = (np.stack(y_out, axis=1) if len(y_out)
             else np.zeros((n, 0)))  # (n, n_points) like SciPy

    # -- events output --
    event_overflow = None
    if events is None:
        t_events = None
        y_events = None
    else:
        t_events = []
        y_events = []
        counts = np.asarray(carry.ev.n_rec) if n_events else np.zeros((0,), int)
        tb = np.asarray(carry.ev.t_buf) if n_events else None
        yb = np.asarray(carry.ev.y_buf) if n_events else None
        for i in range(n_events):
            c = int(counts[i])
            t_events.append(np.array(tb[i, :c]))
            y_events.append(np.array(yb[i, :c]))
        event_overflow = (np.asarray(carry.ev.overflow) if n_events
                          else np.zeros((0,), bool))

    # -- dense output --
    sol = None
    if dense_output:
        sol = OdeSolution(method, engine.interp, rec_xold, rec_h, rec_cont,
                          t0, y0_np, t_ends=rec_t)

    scipy_status = Status.to_scipy(status)
    return OdeResult(
        t=t_arr, y=y_arr, sol=sol,
        t_events=t_events, y_events=y_events,
        nfev=int(carry.nfev), njev=int(carry.njev), nlu=int(carry.nlu),
        nstep=int(carry.nstep), naccpt=int(carry.naccpt), nrejct=int(carry.nrejct),
        status=scipy_status, message=scipy_message(status),
        success=scipy_status >= 0,
        n_restarts=int(carry.n_restarts),
        event_overflow=event_overflow,
        # Raw status + exact reached state: where the loop actually stopped
        # (r.t[-1] is a sampled point under t_eval).  Feeds warm restarts and
        # the method="auto" switcher (ivp_tpu/auto.py).
        raw_status=status,
        t_reached=float(carry.t),
        y_reached=np.asarray(ddm.to_f64(carry.y) if use_dd else carry.y),
    )


# =============================================================================
# Helpers
# =============================================================================

def carry_t_reached(rec_t, t0):
    return rec_t[-1] if len(rec_t) else t0


def _broadcast_tol(tol, n, dtype):
    arr = jnp.asarray(tol, dtype).reshape(-1)
    if arr.shape[0] == 1:
        arr = jnp.broadcast_to(arr, (n,))
    elif arr.shape[0] != n:
        raise ValueError(f"tolerance vector length {arr.shape[0]} != n={n}")
    return arr


def _normalize_jac(jac, rhs, n, dtype, args, jac_sparsity=None,
                   jac_dtype=None):
    """Return (jac_fn(t, y) -> (n,n), const_jac flag).

    Callable jac is traced; a constant matrix is closed over; None falls back
    to grouped finite differences when a sparsity pattern is supplied
    (reference src/python/sparsity.rs) and otherwise to jax.jacfwd of the RHS
    (replacing the reference's hand-rolled forward differences,
    reference src/ivp.rs:67-107).

    ``jac_dtype`` (e.g. float32 under mixed-precision Newton — see
    radau.RadauParams.jac_precision): the Jacobian is EVALUATED in that
    dtype — inputs cast before the user callable / jacfwd / grouped FD runs,
    so the whole Jacobian graph lowers to cheap native arithmetic instead
    of emulated f64.  J only feeds the (already f32-factored) Newton
    iteration matrices, so this is the same inexact-Newton trade as the f32
    factor itself.
    """
    jdt = jac_dtype

    def _cast_in(t, y):
        if jdt is None:
            return t, y
        return t.astype(jdt) if hasattr(t, "astype") else t, y.astype(jdt)

    if jac is None:
        if jac_sparsity is not None:
            from .core.sparsity import make_grouped_fd_jac
            fd_dtype = jdt or dtype
            if jdt is None:
                fd_rhs = rhs
            else:
                def fd_rhs(t, y):
                    return rhs(t, y).astype(jdt)
            fd_jac, _ = make_grouped_fd_jac(fd_rhs, jac_sparsity, n, fd_dtype)

            def jac_fn(t, y):
                return fd_jac(*_cast_in(t, y))
            return jac_fn, False

        if jdt is None:
            def jac_fn(t, y):
                return jax.jacfwd(lambda yy: rhs(t, yy))(y)
        else:
            def jac_fn(t, y):
                tj, yj = _cast_in(t, y)
                return jax.jacfwd(lambda yy: rhs(tj, yy).astype(jdt))(yj)
        return jac_fn, False
    if callable(jac):
        def jac_fn(t, y):
            tj, yj = _cast_in(t, y)
            j = jac(tj, yj, *args)
            if hasattr(j, "toarray"):
                j = j.toarray()
            return jnp.asarray(j, jdt or dtype).reshape(n, n)
        return jac_fn, False
    # constant matrix (possibly scipy-sparse)
    j = jac.toarray() if hasattr(jac, "toarray") else jac
    j_const = jnp.asarray(np.asarray(j, dtype=float), jdt or dtype).reshape(n, n)

    def jac_fn(t, y):
        return j_const

    return jac_fn, True


def _facade_jac_dtype(method, solver_options):
    """f32 Jacobian evaluation when the stiff engine will factor in f32
    (newton_precision='mixed'), unless the user opts out with
    jac_precision='state' (see radau.RadauParams.jac_precision)."""
    so = solver_options or {}
    if method not in ("RADAU", "BDF"):
        return None
    if so.get("jac_precision", "auto") == "state":
        return None
    if (so.get("newton_precision") == "mixed"
            or so.get("jac_precision") == "float32"):
        return jnp.float32
    return None


def _dedup(t_out, y_out):
    td, yd = [], []
    for t, y in zip(t_out, y_out):
        if td and abs(td[-1] - t) <= _TOL:
            continue
        td.append(t)
        yd.append(y)
    return td, yd


def _enforce_first_step(t_out, y_out, rec_t, rec_y, t0, posneg, h0, interp_at):
    """first_step output enforcement (reference solout.rs:392-421): the first
    reported point after t0 is exactly t0 +/- h0, obtained by interpolation;
    intermediate accepted steps before the target are suppressed."""
    target = t0 + posneg * h0
    j = None
    for k, t in enumerate(rec_t):
        if posneg * (t - target) >= -_TOL:
            j = k
            break
    if j is None:
        return t_out, y_out  # never reached the target; keep raw records
    new_t = [t0]
    new_y = [y_out[0]]
    y_target = interp_at(np.asarray([target]))[0]
    new_t.append(target)
    new_y.append(y_target)
    if abs(rec_t[j] - target) > _TOL:
        new_t.append(rec_t[j])
        new_y.append(rec_y[j])
    new_t.extend(rec_t[j + 1:])
    new_y.extend(rec_y[j + 1:])
    return new_t, new_y


def _zero_interval_result(method, t0, y0_arr, t_eval_arr, dense_output,
                          n_events, events_given):
    y0_np = np.asarray(y0_arr)
    n = y0_np.shape[0]
    if t_eval_arr is not None:
        ts = t_eval_arr[np.abs(t_eval_arr - t0) < _TOL]
    else:
        ts = np.asarray([t0])
    y = np.broadcast_to(y0_np[:, None], (n, ts.size)).copy()
    sol = None
    if dense_output:
        from .methods.interp import get_interp
        interp, ncoeff = get_interp(method)
        sol = OdeSolution(method, interp, np.zeros((0,)), np.zeros((0,)),
                          np.zeros((0, ncoeff, n)), t0, y0_np)
    t_events = [np.zeros((0,)) for _ in range(n_events)] if events_given else None
    y_events = [np.zeros((0, n)) for _ in range(n_events)] if events_given else None
    return OdeResult(
        t=ts, y=y, sol=sol, t_events=t_events, y_events=y_events,
        nfev=0, njev=0, nlu=0, nstep=0, naccpt=0, nrejct=0,
        status=0, message=scipy_message(Status.SUCCESS), success=True,
        raw_status=Status.SUCCESS, t_reached=t0, y_reached=y0_np,
    )


def _empty_system_result(method, t0, tf, t_eval_arr, dense_output,
                         n_events, events_given):
    ts = t_eval_arr if t_eval_arr is not None else np.asarray([t0, tf])
    y = np.zeros((0, ts.size))
    sol = None
    if dense_output:
        from .methods.interp import get_interp
        interp, ncoeff = get_interp(method)
        sol = OdeSolution(method, interp, np.zeros((0,)), np.zeros((0,)),
                          np.zeros((0, ncoeff, 0)), t0, np.zeros((0,)))
    t_events = [np.zeros((0,)) for _ in range(n_events)] if events_given else None
    y_events = [np.zeros((0, 0)) for _ in range(n_events)] if events_given else None
    return OdeResult(
        t=np.asarray(ts, dtype=float), y=y, sol=sol,
        t_events=t_events, y_events=y_events,
        nfev=0, njev=0, nlu=0, nstep=0, naccpt=0, nrejct=0,
        status=0, message=scipy_message(Status.SUCCESS), success=True,
        raw_status=Status.SUCCESS, t_reached=tf, y_reached=np.zeros((0,)),
    )

