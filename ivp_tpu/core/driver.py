"""Generic integration driver: one ``lax.while_loop`` around any step engine.

The reference gives every integrator its own monolithic time loop with a
mutable callback (SolOut).  Here the loop is a single generic state machine:

    carry -> engine.attempt -> [events] -> [record] -> counters/status -> carry

All control flow is branchless/masked, so ``jax.vmap`` of ``run_chunk`` gives
lock-step ensembles with per-trajectory adaptive steps, done-masking and
per-trajectory status codes (SURVEY.md §7 "hard parts" #1).

Recording uses preallocated ``chunk``-sized buffers; the host drains them and
re-enters, so total steps are unbounded while device memory stays static.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Status
from ..core.common import tree_where
from ..core.events import EventSpec, EvState, init_ev_state, process_events
from ..methods.base import Engine, RunArgs


@dataclasses.dataclass(frozen=True)
class DriverConfig:
    """Static driver configuration (part of the compile key)."""

    rec_cap: int = 0           # step records per chunk (0 = final-state only)
    record_cont: bool = False  # also record dense coefficients
    rec_scan: bool = False     # scan-based recording (ensemble tier): the
    #                            chunk runs as a fixed-length lax.scan whose
    #                            stacked per-iteration outputs ARE the
    #                            records (structural indices -> plain DUS
    #                            under vmap).  The while_loop design's
    #                            per-lane cursor writes lower as batched
    #                            scatters / full-buffer selects, measured
    #                            20-100x the lean loop (docs/BENCH.md r5).
    #                            Scan trades that for <= rec_cap masked
    #                            attempts of tail waste per chunk.  The
    #                            unbatched single-IVP driver keeps the
    #                            while design (unbatched DUS is cheap and
    #                            early exit wins at B=1).
    ncoeff: int = 0
    event_spec: Optional[EventSpec] = None
    sample_cap: int = 0        # in-loop t_grid emission buffer size (0 = off)
    unroll: int = 1            # step attempts per while iteration (lean mode
    #                            only: requires rec_cap == 0). Amortizes the
    #                            loop condition's cross-lane reduction.
    max_restarts: int = 0      # in-device event-restart budget (0 = off):
    #                            a terminal event with a restart function
    #                            re-launches the lane from the event point
    #                            with the modified state — the reference's
    #                            SolOut ControlFlag::ModifiedSolution
    #                            (src/solout.rs:73-78) fused into the
    #                            compiled loop, per-lane, no host round-trip.


class Carry(NamedTuple):
    t: Any
    y: Any
    ms: Any
    status: Any   # int32, Status.RUNNING while integrating
    done: Any     # bool
    nfev: Any
    njev: Any
    nlu: Any
    nstep: Any
    naccpt: Any
    nrejct: Any
    n_rec: Any
    rec_t: Any     # (cap,)
    rec_y: Any     # (cap, n) in the state representation (a DD pytree of two
    #                (cap, n) words for the dd tier — recorded step endpoints
    #                keep full f64-class precision; the facades lift on drain)
    rec_xold: Any  # (cap,)
    rec_h: Any     # (cap,)
    rec_cont: Any  # (cap, C*n) FLATTENED dense-coefficient records
    #                ((cap, 0) when cont recording is off).  Flat layout
    #                is deliberate: a (cap, C, n) buffer gets a tiled
    #                TPU layout padding the minor (C, n) dims ~10x
    #                (measured 8.0G for 768M of dd cont records — OOM);
    #                the flat minor dim tiles at ~1x.  Drains reshape
    #                to (k, C, n).
    ev: EvState
    s_cursor: Any  # int32 — next t_grid sample to emit
    sample_y: Any  # (sample_cap, n) in-loop interpolated samples
    n_restarts: Any  # int32 — in-device event restarts performed
    # Last accepted segment (sample mode only; zero-size otherwise): the
    # stall-based t_grid emission interpolates due samples from this
    # carried segment, one per body iteration, instead of a nested
    # while_loop per step (which cost ~10x the lean loop under vmap —
    # round-5 measurement, docs/BENCH.md).
    seg_cont: Any   # (C, n) dense coefficients of the last accepted step
    seg_xold: Any   # left edge
    seg_h: Any      # signed step size
    seg_valid: Any  # bool — at least one step accepted


def _i32(v):
    return jnp.asarray(v, jnp.int32)


class RecOut(NamedTuple):
    """Per-iteration record payload of the scan-based recording chunk
    (stacked by lax.scan into (cap, ...) arrays; (B, cap, ...) under
    vmap).  ``valid`` marks iterations that actually advanced a step —
    the host drain compacts on it."""

    t: Any      # accepted-step endpoint (event-truncated when terminal)
    y: Any      # state at t, in the state representation (DD pytree for dd)
    xold: Any   # left edge of the step
    h: Any      # signed step size used
    cont: Any   # (C*n,) flattened dense coefficients ((0,) if not recorded)
    valid: Any  # bool — this iteration advanced (and the lane was live)


def make_driver(engine: Engine, p, cfg: DriverConfig, rhs, events_fn=None,
                restart_fns=None):
    """Build (init_carry, run_chunk) for a given engine + static config.

    ``restart_fns``: optional per-event list of ``y_new = f(t, y)`` callables
    (None entries = no restart for that event); with ``cfg.max_restarts > 0``
    a terminal event whose entry is non-None restarts the lane in-loop.
    """
    spec = cfg.event_spec
    has_events = spec is not None and spec.n_events > 0
    # Scan-based recording keeps NO record buffers in the carry (records
    # come back as stacked scan outputs); cap gates the while-design
    # in-carry buffers only.
    cap = 0 if cfg.rec_scan else cfg.rec_cap
    C = cfg.ncoeff if cfg.record_cont else 0
    # Carried-segment cont rows for stall-based sampling: sized from the
    # ENGINE (cfg.ncoeff is 0 in the lean ensemble mode, but the engine
    # still produces (ncoeff, n) cont when sampling needs it).
    Cs = engine.ncoeff if cfg.sample_cap else 0
    restart_fns = list(restart_fns or [])
    has_restarts = (has_events and cfg.max_restarts > 0
                    and any(f is not None for f in restart_fns))
    # State-representation adapters (base.py Engine.lower/lift): events,
    # restart maps and event buffers operate on plain arrays even when the
    # engine carries a richer state (the dd tier's DD pairs).
    lower = engine.lower or (lambda y: y)
    lift = engine.lift or (lambda a: a)

    def init_carry(t0, y0, first_step, ra: RunArgs) -> Carry:
        dtype = y0.dtype
        # Event/sample buffers follow the *lowered-view* dtype: engines with
        # a rich state representation (the dd tier) lower to f64 views, so
        # recorded event states and in-loop samples keep full precision.
        odt = jax.eval_shape(lower, y0).dtype
        # Time precision follows ra.tend: with an f64-time/f32-state hybrid
        # (time_dtype in the builders) t, the record time axis and event
        # times carry f64 resolution while the state math stays f32.
        tdt = ra.tend.dtype
        n = y0.shape[-1]
        t0 = jnp.asarray(t0, tdt)
        ms, nfev0 = engine.init(rhs, t0, y0, first_step, ra, p)
        ev = (init_ev_state(events_fn, t0, lower(y0), spec, odt, tdt)
              if has_events else
              EvState(g_prev=jnp.zeros((0,), odt), hits=jnp.zeros((0,), jnp.int32),
                      n_rec=jnp.zeros((0,), jnp.int32), t_buf=jnp.zeros((0, 1), tdt),
                      y_buf=jnp.zeros((0, 1, n), odt),
                      overflow=jnp.zeros((0,), bool)))
        # Per-lane zero-interval fast path (reference solve_ivp.rs:109-145,
        # |xend - x0| < 1e-15, here per lane under vmap): the lane is done
        # at init with its initial state — without this, a trivial span
        # spins the controller against h -> 0 until max_steps.
        trivial = jnp.abs(ra.tend - t0) < 1e-15
        return Carry(
            t=t0, y=y0, ms=ms,
            status=jnp.where(trivial, _i32(Status.SUCCESS),
                             _i32(Status.RUNNING)),
            done=trivial,
            nfev=_i32(nfev0), njev=_i32(0), nlu=_i32(0),
            nstep=_i32(0), naccpt=_i32(0), nrejct=_i32(0),
            n_rec=_i32(0),
            rec_t=jnp.zeros((cap,), tdt),
            # Full state-representation record buffers: for plain engines a
            # (cap, n) array as before; for rich states (the dd tier's DD
            # pair) one (cap, n) buffer per leaf, so recorded step endpoints
            # lose no precision (events/interp see f64 lowered views).
            rec_y=jax.tree.map(
                lambda a: jnp.zeros((cap,) + a.shape, a.dtype), y0),
            rec_xold=jnp.zeros((cap,), tdt),
            rec_h=jnp.zeros((cap,), tdt),
            rec_cont=jnp.zeros((cap, C * n), dtype),
            ev=ev,
            s_cursor=_i32(0),
            sample_y=jnp.zeros((cfg.sample_cap, n), odt),
            n_restarts=_i32(0),
            seg_cont=jnp.zeros((Cs, n), dtype),
            seg_xold=jnp.zeros((), tdt),
            seg_h=jnp.zeros((), tdt),
            seg_valid=jnp.zeros((), bool),
        )

    def step_body(c: Carry, ra: RunArgs, stall=None) -> Carry:
        """One step attempt.  ``stall`` (sample mode): boolean — when True
        this iteration is an emission-only iteration and every effect of
        the attempt is masked out field-by-field (cheap scalar/row selects
        and dropped scatter writes — NO whole-carry select, which would
        materialize the big sample/record buffers every iteration)."""
        res = engine.attempt(rhs, c.t, c.y, c.naccpt, c.ms, ra, p)
        adv = res.advance
        act = jnp.ones((), bool) if stall is None else ~stall
        adv = adv & act

        # ---- Events (on advanced steps only) ----
        if has_events:
            out = process_events(
                events_fn, engine.interp, res.cont, res.xold, res.h_used,
                c.t, lower(c.y), res.t_new, lower(res.y_new), c.ms.posneg,
                c.ev, spec,
            )
            ev_new = tree_where(adv, out.state, c.ev)
            terminal = adv & out.terminal
            t_rec = jnp.where(terminal, out.t_term, res.t_new)
            y_rec = tree_where(terminal, lift(out.y_term), res.y_new)
        else:
            ev_new = c.ev
            terminal = jnp.zeros((), bool)
            t_rec, y_rec = res.t_new, res.y_new

        # ---- In-device event restart (ModifiedSolution analog) ----
        n_restarts = c.n_restarts
        ms_next = res.ms
        finished = res.finished
        if has_restarts:
            can = jnp.asarray([f is not None for f in restart_fns])
            restartable = jnp.any(
                jnp.where(jnp.arange(spec.n_events) == out.i_term, can, False))
            # No restart exactly at (or beyond) tend — the trajectory is over.
            before_end = (out.t_term - ra.tend) * c.ms.posneg < 0.0
            do_restart = (terminal & restartable & before_end
                          & (c.n_restarts < cfg.max_restarts))
            # Apply the matching event's restart map to the event state.
            y_re = out.y_term
            for i, rf in enumerate(restart_fns):
                if rf is not None:
                    y_re = jnp.where(out.i_term == i,
                                     rf(out.t_term, out.y_term), y_re)
            # Fresh method state from the restart point (the reference
            # re-evaluates f after ModifiedSolution; BDF additionally needs
            # its difference array rebuilt, so re-init covers every engine).
            # cond-gated: a non-restarting step skips the init's RHS/jac
            # work in the scalar path (under vmap this lowers to select,
            # costing nothing extra).
            fs_re = (jnp.abs(res.h_used) if engine.name == "RK4" else None)

            def _restart_init():
                ms_re, nfev_re = engine.init(rhs, out.t_term, lift(y_re),
                                             fs_re, ra, p)
                return ms_re, _i32(nfev_re), events_fn(out.t_term, y_re)

            def _no_restart():
                return res.ms, _i32(0), ev_new.g_prev

            ms_next, nfev_re, g_re = lax.cond(do_restart, _restart_init,
                                              _no_restart)
            njev_re = (do_restart.astype(jnp.int32) * engine.init_njev
                       if engine.init_njev else _i32(0))
            # Event values restart from the modified state; the restarting
            # event's hit counter resets so it can fire again (other
            # events keep their accumulated terminal counts); recorded
            # occurrence buffers are kept.
            hits_re = jnp.where(jnp.arange(spec.n_events) == out.i_term,
                                0, ev_new.hits)
            ev_re = ev_new._replace(g_prev=g_re, hits=hits_re)
            ev_new = tree_where(do_restart, ev_re, ev_new)
            terminal = terminal & ~do_restart
            # A restarted lane is mid-flight again even if the engine had
            # flagged this as its final (tend-landing) step.
            finished = finished & ~do_restart
            t_rec = jnp.where(do_restart, out.t_term, t_rec)
            y_rec = tree_where(do_restart, lift(y_re), y_rec)
            n_restarts = n_restarts + do_restart.astype(jnp.int32)
            res = res._replace(nfev_inc=res.nfev_inc + nfev_re,
                               njev_inc=res.njev_inc + njev_re)

        # ---- Record the accepted step ----
        if cap:
            # One-hot masked row selects instead of .at[idx].set: per-lane
            # dynamic-index scatters under vmap lower catastrophically on
            # TPU (measured 100x the lean loop on the recording tier;
            # same pathology as the sample write above, TPU_NOTES #2).
            # arange == n_rec is all-False once the buffer is full
            # (n_rec == cap), reproducing mode="drop".
            onehot = adv & (jnp.arange(cap) == c.n_rec)           # (cap,)

            def _oh(buf, val):
                mask = onehot.reshape((cap,) + (1,) * (buf.ndim - 1))
                return jnp.where(mask, val, buf)

            rec_t = _oh(c.rec_t, t_rec)
            rec_y = jax.tree.map(_oh, c.rec_y, y_rec)
            rec_xold = _oh(c.rec_xold, res.xold)
            rec_h = _oh(c.rec_h, res.h_used)
            rec_cont = (_oh(c.rec_cont, res.cont.reshape(-1)) if C
                        else c.rec_cont)
            n_rec = c.n_rec + adv.astype(jnp.int32)
        else:
            rec_t, rec_y = c.rec_t, c.rec_y
            rec_xold, rec_h, rec_cont = c.rec_xold, c.rec_h, c.rec_cont
            n_rec = c.n_rec

        # ---- Carried segment for stall-based t_grid emission ----
        # (the emission itself happens in the wrapping ``body`` below, one
        # sample per iteration, from this carried last-accepted segment)
        if cfg.sample_cap:
            seg_cont = jnp.where(adv, res.cont, c.seg_cont)
            seg_xold = jnp.where(adv, res.xold, c.seg_xold)
            seg_h = jnp.where(adv, res.h_used, c.seg_h)
            seg_valid = c.seg_valid | adv
        else:
            seg_cont, seg_xold = c.seg_cont, c.seg_xold
            seg_h, seg_valid = c.seg_h, c.seg_valid
        s_cursor, sample_y = c.s_cursor, c.sample_y

        # ---- Counters (masked out on stall iterations) ----
        zero = _i32(0)
        nstep = c.nstep + (res.count_step & act).astype(jnp.int32)
        naccpt = c.naccpt + (res.accepted & act).astype(jnp.int32)
        nrejct = c.nrejct + (res.count_reject & act).astype(jnp.int32)
        nfev = c.nfev + jnp.where(act, res.nfev_inc, zero)
        njev = c.njev + jnp.where(act, res.njev_inc, zero)
        nlu = c.nlu + jnp.where(act, res.nlu_inc, zero)

        # ---- Status resolution (priority: engine failure > terminal event >
        #      reached tend > step budget) ----
        status = res.status
        running = status == Status.RUNNING
        status = jnp.where(running & terminal, _i32(Status.USER_INTERRUPT), status)
        running = status == Status.RUNNING
        status = jnp.where(running & finished, _i32(Status.SUCCESS), status)
        running = status == Status.RUNNING
        status = jnp.where(running & (nstep > ra.max_steps),
                           _i32(Status.NEED_LARGER_NMAX), status)

        # ---- Stall masking of the state advance (sample mode) ----
        # res.t_new/y_new already fall back to (t, y) on rejected attempts,
        # but an ACCEPTED attempt during a stall iteration must be fully
        # discarded: gate t/y/ms/status on ``act`` (cheap per-lane selects;
        # the record/event buffers were gated through ``adv`` above).
        t_step = t_rec if has_events else res.t_new
        y_step = y_rec if has_events else res.y_new
        if stall is not None:
            t_step = jnp.where(act, t_step, c.t)
            y_step = tree_where(act, y_step, c.y)
            ms_next = tree_where(act, ms_next, c.ms)
            status = jnp.where(act, status, c.status)
        done = status != Status.RUNNING
        if cfg.sample_cap:
            # A lane whose engine is finished may still owe due samples:
            # defer ``done`` until the emission path (body) drains them.
            tau_n = ra.t_grid[jnp.minimum(c.s_cursor, cfg.sample_cap - 1)]
            pend = ((c.s_cursor < cfg.sample_cap) & seg_valid
                    & ((tau_n - t_step) * c.ms.posneg <= 0.0))
            done = done & ~pend

        # Scan-mode record payload: the step's record row rides out as a
        # scan output instead of an in-carry buffer write.
        if cfg.rec_scan:
            payload = RecOut(
                t=t_rec, y=y_rec, xold=res.xold, h=res.h_used,
                cont=(res.cont.reshape(-1) if cfg.record_cont
                      else jnp.zeros((0,), c.rec_cont.dtype)),
                valid=adv)
        else:
            payload = None

        # On terminal events the trajectory ends at the event point (the
        # reference reports the event point as the final sample,
        # solout.rs:314-325).
        return Carry(
            t=t_step,
            y=y_step,
            ms=ms_next,
            status=status, done=done,
            nfev=nfev, njev=njev, nlu=nlu,
            nstep=nstep, naccpt=naccpt, nrejct=nrejct,
            n_rec=n_rec, rec_t=rec_t, rec_y=rec_y,
            rec_xold=rec_xold, rec_h=rec_h, rec_cont=rec_cont,
            ev=ev_new,
            s_cursor=s_cursor, sample_y=sample_y,
            n_restarts=n_restarts,
            seg_cont=seg_cont, seg_xold=seg_xold, seg_h=seg_h,
            seg_valid=seg_valid,
        ), payload

    def body(c: Carry, ra: RunArgs) -> Carry:
        """One driver iteration: either one step attempt (step_body) or —
        when a t_grid sample is due inside the already-covered span — one
        sample emission from the carried segment, with the step attempt's
        results discarded (the lane "stalls" until its due samples are
        drained, so every sample interpolates the segment that covered it:
        identical semantics to the reference's in-callback sampling,
        solout.rs:344-386).  This replaces a nested per-step while_loop
        whose mere presence cost ~10x the lean loop under vmap (round-5
        measurement, docs/BENCH.md): now sampling costs one masked interp
        per iteration plus one extra iteration per emitted sample."""
        if not cfg.sample_cap:
            return step_body(c, ra)
        posneg = c.ms.posneg
        idx = jnp.minimum(c.s_cursor, cfg.sample_cap - 1)
        tau = ra.t_grid[idx]
        due = ((c.s_cursor < cfg.sample_cap) & c.seg_valid
               & ((tau - c.t) * posneg <= 0.0))

        c2, payload = step_body(c, ra, stall=due)

        # Emission merge: one masked one-hot row write into the sample
        # buffer (c2.sample_y is c.sample_y — the step path never touches
        # it), cursor bump, and done-recomputation covering both paths.
        # One-hot masked select instead of .at[idx].set: a per-lane
        # dynamic-index scatter/gather on the (m, n) buffer lowers
        # catastrophically under vmap on TPU (measured 5x the whole solve;
        # TPU_NOTES #2's gather/scatter rule applies outside LU too).
        yi = engine.interp(c.seg_cont, c.seg_xold, c.seg_h, tau)
        write = due & (jnp.arange(cfg.sample_cap) == idx)      # (m,)
        sample_y = jnp.where(write[:, None],
                             yi.astype(c.sample_y.dtype)[None, :],
                             c.sample_y)
        s_cursor = c.s_cursor + due.astype(jnp.int32)
        tau2 = ra.t_grid[jnp.minimum(s_cursor, cfg.sample_cap - 1)]
        still = ((s_cursor < cfg.sample_cap) & c2.seg_valid
                 & ((tau2 - c2.t) * posneg <= 0.0))
        done = (c2.status != Status.RUNNING) & ~still
        return c2._replace(sample_y=sample_y, s_cursor=s_cursor,
                           done=done), payload

    if cfg.unroll > 1 and cap:
        raise ValueError("driver unroll requires rec_cap == 0 (lean mode)")

    def _body_unrolled(c: Carry, ra: RunArgs) -> Carry:
        if cfg.unroll <= 1:
            return body(c, ra)[0]
        for _ in range(cfg.unroll):
            c2, _ = body(c, ra)
            c = tree_where(c.done, c, c2)  # freeze finished lanes mid-unroll
        return c

    def run_chunk(c: Carry, ra: RunArgs) -> Carry:
        """Integrate until done or the record buffer fills (pure; jit me)."""

        def cond(c):
            go = ~c.done
            if cap:
                go = go & (c.n_rec < cap)
            return go

        return lax.while_loop(cond, lambda c: _body_unrolled(c, ra), c)

    def run_scan_chunk(c: Carry, ra: RunArgs):
        """Scan-based recording chunk: exactly ``cfg.rec_cap`` iterations,
        stacked RecOut records as scan outputs (structural indexing — no
        per-lane scatter/one-hot buffer traffic under vmap).  Finished
        lanes are frozen and emit valid=False rows; the host drain
        compacts on the validity mask."""

        def sbody(cc, _):
            cc2, payload = body(cc, ra)
            cc3 = tree_where(cc.done, cc, cc2)
            payload = payload._replace(valid=payload.valid & ~cc.done)
            return cc3, payload

        return lax.scan(sbody, c, None, length=cfg.rec_cap)

    def reset_records(c: Carry) -> Carry:
        """Host-side drain helper: clear the record cursor between chunks."""
        return c._replace(n_rec=_i32(0))

    def run_bounded(c: Carry, ra: RunArgs, max_attempts) -> Carry:
        """Integrate at most ``max_attempts`` step attempts (checkpoint
        cadence for resumable integration; done lanes are frozen)."""
        start = c.nstep

        def cond(cc):
            go = (~cc.done) & (cc.nstep - start < max_attempts)
            if cap:
                go = go & (cc.n_rec < cap)
            return go

        return lax.while_loop(cond, lambda cc: _body_unrolled(cc, ra), c)

    if cfg.rec_scan:
        return init_carry, run_scan_chunk, reset_records, run_bounded
    return init_carry, run_chunk, reset_records, run_bounded


def run_args(tend, rtol, atol, hmax, hmin, max_steps, dtype,
             t_grid=None, time_dtype=None) -> RunArgs:
    """Tolerances carry the state dtype; tend/hmax/hmin/t_grid carry the time
    dtype (defaults to the state dtype; pass float64 with float32 state for
    the f64-time/f32-state hybrid)."""
    tdt = jnp.dtype(time_dtype) if time_dtype is not None else dtype
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)
    return RunArgs(
        tend=jnp.asarray(tend, tdt),
        rtol=rtol, atol=atol,
        hmax=jnp.asarray(abs(hmax), tdt) if not hasattr(hmax, "dtype") else jnp.abs(hmax).astype(tdt),
        hmin=jnp.asarray(abs(hmin), tdt) if not hasattr(hmin, "dtype") else jnp.abs(hmin).astype(tdt),
        max_steps=_i32(max_steps),
        t_grid=jnp.asarray(t_grid, tdt) if t_grid is not None else None,
    )

