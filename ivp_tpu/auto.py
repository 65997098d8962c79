"""Automatic stiffness switching: ``method="auto"``.

The reference inherits Hairer's stiffness detector in DOPRI5/DOP853
(reference src/methods/dopri5.rs:363-391, dop853.rs:447-472) but stops the
integration with Status::ProbablyStiff and leaves the restart to the user.
``method="auto"`` closes that loop at the facade level — the LSODA idea,
which SciPy ships but the reference deliberately removed (reference
tests/test_ivp.py:1-19): integrate with a fast explicit method until its
stiffness detector trips, then resume from the exact reached state with an
implicit method, stitching t/y, events (terminal counts continue across the
switch), counters and dense segments into one result.

The switch is one-way (explicit -> implicit): like the reference, the
implicit engines carry no nonstiffness detector.

Configuration via ``solver_options``:

* ``nonstiff_method`` ("RK45"/"DOP853", default "RK45") — must be a method
  with a stiffness detector.
* ``stiff_method`` ("Radau"/"BDF", default "Radau").
* ``nonstiff_options`` / ``stiff_options`` — per-engine option dicts (e.g.
  ``{"stiff_test": 100}`` to tighten the detector cadence).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .types import Status, canonical_method

_DETECTOR_METHODS = ("DOPRI5", "DOP853")
_IMPLICIT_METHODS = ("RADAU", "BDF")
_TOL = 1e-12


class _EventShim:
    """Event wrapper for the post-switch phase.

    Terminal counts continue across the switch: occurrences already recorded
    in the explicit phase are subtracted from the terminal budget.  The
    ``direction`` and in-device ``restart`` attributes pass through.
    """

    def __init__(self, f, seen: int):
        self._f = f
        self.direction = getattr(f, "direction", 0)
        term = getattr(f, "terminal", False)
        if term is True:
            term = 1
        if term:
            # Phase 1 interrupts when the budget is reached, so seen < term.
            self.terminal = max(int(term) - int(seen), 1)
        else:
            self.terminal = False
        r = getattr(f, "restart", None)
        if r is not None:
            self.restart = r

    def __call__(self, *args, **kwargs):
        return self._f(*args, **kwargs)


class CompositeOdeSolution:
    """Piecewise continuous solution across method switches.

    Same callable/strict surface as ``OdeSolution`` (extrapolating
    ``__call__``; range-checked ``sol``/``sol_many``/``sol_span``); queries
    dispatch to the phase whose span contains the time.
    """

    def __init__(self, sols, boundaries, forward: bool):
        self._sols = list(sols)
        self._bounds = np.asarray(boundaries, float)
        self._forward = forward
        self.t_min = min(s.t_min for s in self._sols)
        self.t_max = max(s.t_max for s in self._sols)
        self.n_segments = sum(s.n_segments for s in self._sols)

    def __call__(self, t):
        t_arr = np.asarray(t, dtype=float)
        scalar = t_arr.ndim == 0
        ts = np.atleast_1d(t_arr)
        if self._forward:
            idx = np.searchsorted(self._bounds, ts, side="right")
        else:
            idx = np.searchsorted(-self._bounds, -ts, side="right")
        out: Optional[np.ndarray] = None
        for k, s in enumerate(self._sols):
            m = idx == k
            if not np.any(m):
                continue
            ys = np.atleast_2d(s(ts[m]))
            if out is None:
                out = np.empty((ys.shape[0], ts.shape[0]))
            out[:, m] = ys
        assert out is not None
        return out[:, 0] if scalar else out

    # -- strict (range-checked) tier, mirroring OdeSolution --

    def t_span(self):
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
        t_arr = np.asarray(t, dtype=float)
        self._check_range(t_arr)
        return self(t)

    def sol_many(self, ts):
        ts = np.asarray(ts, dtype=float)
        self._check_range(ts)
        return self(ts)

    def sol_span(self, t_start, t_end, m):
        ts = np.linspace(float(t_start), float(t_end), int(m))
        self._check_range(ts)
        return ts, self(ts)


class CompositeBatchOdeSolution:
    """Batched piecewise dense solution across per-lane method switches.

    Same query surface as :class:`ivp_tpu.batch.BatchOdeSolution` (scalar /
    shared ``(m,)`` / per-lane ``(B, m)`` grids -> ``(B, n[, m])``).  Lanes
    in ``idx`` switched engines at ``t_switch[i]``: queries up to the switch
    time evaluate phase 1's interpolants, queries past it phase 2's — the
    batched analog of :class:`CompositeOdeSolution`'s span dispatch.
    Unswitched lanes always evaluate phase 1.
    """

    def __init__(self, sol1, sol2, idx, t_switch, forward: bool):
        self._s1 = sol1            # full-batch phase-1 BatchOdeSolution
        self._s2 = sol2            # sub-batch (len(idx)) phase-2 solution
        self._idx = np.asarray(idx)
        self._tsw = np.asarray(t_switch, float)   # (len(idx),)
        self._fwd = bool(forward)
        # A switched lane whose stiff phase recorded zero accepted steps
        # (immediate phase-2 failure; its status flags it) has no valid
        # phase-2 interpolant — keep phase-1/extrapolated values for it
        # rather than evaluating zeroed dense coefficients.
        cnt2 = getattr(sol2, "_counts", None)
        self._has2 = (np.asarray(cnt2) > 0 if cnt2 is not None
                      else np.ones(self._idx.size, dtype=bool))
        self.n_lanes = sol1.n_lanes
        self.method = (sol1.method, sol2.method)
        self.t_mins = np.asarray(sol1.t_mins).copy()
        self.t_maxs = np.asarray(sol1.t_maxs).copy()
        if forward:
            self.t_maxs[self._idx] = np.asarray(sol2.t_maxs)
        else:
            self.t_mins[self._idx] = np.asarray(sol2.t_mins)

    def t_span(self):
        """Per-lane covered spans (batched OdeSolution.t_span analog)."""
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
        out = np.array(self._s1(ts))                        # (B, n, m)
        if self._idx.size and ts.shape[1]:
            sub = np.asarray(self._s2(ts[self._idx]))       # (B2, n, m)
            sgn = 1.0 if self._fwd else -1.0
            past = ((ts[self._idx] - self._tsw[:, None]) * sgn >= 0.0) \
                & self._has2[:, None]
            out[self._idx] = np.where(past[:, None, :], sub,
                                      out[self._idx])
        return out[:, :, 0] if scalar else out


def _parse_auto_options(solver_options):
    """Split ``solver_options`` into (nonstiff, stiff, ns_opts, st_opts)."""
    so = dict(solver_options or {})
    nonstiff = canonical_method(so.pop("nonstiff_method", "RK45"))
    stiff = canonical_method(so.pop("stiff_method", "Radau"))
    ns_opts = so.pop("nonstiff_options", None)
    st_opts = so.pop("stiff_options", None)
    if so:
        raise ValueError(
            "method='auto' accepts solver_options keys 'nonstiff_method', "
            "'stiff_method', 'nonstiff_options', 'stiff_options'; got "
            f"{sorted(so)} — put per-engine options in nonstiff_options / "
            "stiff_options")
    if nonstiff not in _DETECTOR_METHODS:
        raise ValueError(
            f"nonstiff_method must be one of {_DETECTOR_METHODS} (methods "
            f"with a stiffness detector); got {nonstiff!r}")
    if stiff not in _IMPLICIT_METHODS:
        raise ValueError(
            f"stiff_method must be one of {_IMPLICIT_METHODS}; got {stiff!r}")
    return nonstiff, stiff, ns_opts, st_opts


def solve_ivp_auto(fun, t_span, y0, *, solver_options=None, events=None,
                   t_eval=None, dense_output=False, first_step=None,
                   max_steps=None, **kw):
    """``solve_ivp(method="auto")`` implementation; see module docstring."""
    from .solve import solve_ivp

    nonstiff, stiff, ns_opts, st_opts = _parse_auto_options(solver_options)

    t0, tf = float(t_span[0]), float(t_span[1])
    r1 = solve_ivp(fun, (t0, tf), y0, method=nonstiff, t_eval=t_eval,
                   dense_output=dense_output, events=events,
                   first_step=first_step, max_steps=max_steps,
                   solver_options=ns_opts, **kw)
    if r1.get("raw_status") != Status.PROBABLY_STIFF:
        r1["methods"] = [nonstiff]
        r1["t_switch"] = None
        return r1

    # -- switch: resume from the exact reached state with the stiff engine --
    t_sw = float(r1.t_reached)
    y_sw = np.asarray(r1.y_reached)
    posneg = 1.0 if tf >= t0 else -1.0

    ev2 = None
    if events is not None:
        ev_list = [events] if callable(events) else list(events)
        ev2 = [_EventShim(e, len(r1.t_events[i]))
               for i, e in enumerate(ev_list)]

    te2 = None
    if t_eval is not None:
        te = np.atleast_1d(np.asarray(t_eval, dtype=float))
        te2 = te[(te - t_sw) * posneg > _TOL]

    ms2 = None
    if max_steps is not None:
        ms2 = max(int(max_steps) - int(r1.nstep), 1)

    r2 = solve_ivp(fun, (t_sw, tf), y_sw, method=stiff, t_eval=te2,
                   dense_output=dense_output, events=ev2, max_steps=ms2,
                   solver_options=st_opts, **kw)
    return _stitch(r1, r2, nonstiff, stiff, t_sw,
                   has_t_eval=t_eval is not None, dense=dense_output,
                   events_given=events is not None, forward=posneg > 0)


def _gather_rows(v, idx, B, n):
    """Gather sub-batch rows of a per-lane array; pass shared values through
    (mirrors batch._norm_tol's per-lane detection)."""
    a = np.asarray(v)
    if a.ndim == 1 and a.shape[0] == B and B != n:
        return a[idx]
    if a.ndim == 2 and a.shape[0] == B:
        return a[idx]
    return v


def solve_ivp_ensemble_auto(fun, t_span, y0_batch, *, rtol=1e-3, atol=1e-6,
                            solver_options=None, t_eval=None,
                            dense_output=False, record_trajectories=False,
                            rec_chunk=1024,
                            first_step=None, chunk_steps=16384,
                            events=None, max_restarts=0, **kw):
    """Batched ``method="auto"``: per-lane stiffness routing.

    The LSODA analog over the ensemble axis — the TPU-native version of the
    reference's per-problem ProbablyStiff stop (src/methods/dopri5.rs:363-391):
    the whole batch runs the explicit engine in lock-step; lanes whose
    detector trips end with PROBABLY_STIFF while the rest finish normally,
    and only the tripped lanes are re-launched with the stiff engine from
    their exact reached (t, y).  Continuity across the switch is exact
    because the fresh stiff carry is pre-loaded with each lane's phase-1
    state: event terminal budgets and occurrence buffers, the monotone
    t_eval sample cursor, step/eval counters (so ``max_steps`` spans both
    phases) and restart counts all continue.

    Returns an :class:`ivp_tpu.batch.EnsembleResult` whose ``switched``
    field marks the resumed lanes.  Same ``solver_options`` surface as the
    single-IVP ``method="auto"``.

    ``record_trajectories=True`` / ``dense_output=True`` compose with the
    switch: per-lane step records concatenate across the two phases, and
    ``sol`` is a :class:`CompositeBatchOdeSolution` that evaluates phase 1's
    interpolants up to each lane's switch time and phase 2's past it
    (the batched analog of the single-IVP :class:`CompositeOdeSolution`).
    """
    import jax.numpy as jnp
    from .batch import (EnsembleResult, build_resumable_solver,
                        build_recording_solver, _drain_recording,
                        _recording_result, _ENSEMBLE_CACHE, _hashable)

    record = bool(dense_output or record_trajectories)
    nonstiff, stiff, ns_opts, st_opts = _parse_auto_options(solver_options)

    y0_batch = np.atleast_2d(np.asarray(y0_batch))
    B, n = y0_batch.shape
    t0, tf = float(t_span[0]), float(t_span[1])
    if n == 0:
        # Empty system: nothing can be stiff; take the ensemble fast path.
        from .batch import solve_ivp_ensemble
        r = solve_ivp_ensemble(fun, t_span, y0_batch, method=nonstiff,
                               rtol=rtol, atol=atol,
                               dense_output=dense_output,
                               record_trajectories=record_trajectories,
                               **kw)
        return r._replace(switched=np.zeros(B, bool))

    def build(method, opts, te, key_extra):
        key = ("ensemble-auto", method, n, str(kw.get("dtype")),
               _hashable(fun), tuple(_hashable(a) for a in kw.get("args", ())),
               _hashable(kw.get("jac")), _hashable(kw.get("jac_sparsity")),
               kw.get("max_steps", 100_000), first_step is not None,
               tuple(_hashable(e) for e in (events or [])),
               kw.get("event_capacity", 16), chunk_steps,
               (np.asarray(te, float).shape, np.asarray(te, float).tobytes())
               if te is not None else None,
               tuple(sorted((k2, _hashable(v))
                            for k2, v in (opts or {}).items())),
               max_restarts, str(kw.get("time_dtype")),
               kw.get("max_step"), kw.get("min_step", 0.0), key_extra,
               record, dense_output, rec_chunk if record else 0)
        if record:
            return _ENSEMBLE_CACHE.get_or_build(
                key, lambda: build_recording_solver(
                    fun, method, n=n, t_eval=te,
                    events=events, max_restarts=max_restarts,
                    first_step=first_step if key_extra == "p1" else None,
                    solver_options=opts, dense_output=dense_output,
                    rec_chunk=rec_chunk, **kw))
        return _ENSEMBLE_CACHE.get_or_build(
            key, lambda: build_resumable_solver(
                fun, method, n=n, chunk_steps=chunk_steps, t_eval=te,
                events=events, max_restarts=max_restarts,
                first_step=first_step if key_extra == "p1" else None,
                solver_options=opts, **kw))

    def run(start, resume, extract, y0b, t0b, rt, at, preload=None):
        carry, ra = start(y0b, t0b, tf, rt, at)
        if preload is not None:
            carry = preload(carry)
        while True:
            carry = resume(carry, ra)
            if bool(np.all(np.asarray(carry.done))):
                break
        return carry, extract(carry)

    # -- phase 1: the whole batch on the explicit engine --
    if record:
        ent1 = build(nonstiff, ns_opts, t_eval, "p1")
        c1, cnt1, ts1, ys1, xo1, h1, co1 = _drain_recording(
            ent1, y0_batch, t0, tf, rtol, atol)
        res1 = _recording_result(ent1[0], nonstiff, c1, cnt1, ts1, ys1,
                                 xo1, h1, co1, dense_output, t0, y0_batch)
    else:
        c1, res1 = run(*build(nonstiff, ns_opts, t_eval, "p1"),
                       y0_batch, t0, rtol, atol)
    trip = np.asarray(res1.status) == int(Status.PROBABLY_STIFF)
    if not trip.any():
        return res1._replace(switched=np.zeros(B, bool))

    # -- phase 2: tripped lanes only, resumed from their reached states --
    idx = np.nonzero(trip)[0]
    y_sub = np.asarray(res1.y)[idx]
    t_sub = np.asarray(res1.t)[idx]
    te_sub = t_eval
    if t_eval is not None:
        te_arr = np.asarray(t_eval, float)
        if te_arr.ndim == 2:         # per-lane grids travel with their lanes
            te_sub = te_arr[idx]
    rt_sub = _gather_rows(rtol, idx, B, n)
    at_sub = _gather_rows(atol, idx, B, n)

    def preload(c2):
        """Pre-load the fresh stiff carry with phase-1 continuation state."""
        g = lambda a: jnp.asarray(np.asarray(a)[idx])  # noqa: E731
        c2 = c2._replace(
            nfev=c2.nfev + g(c1.nfev), njev=c2.njev + g(c1.njev),
            nlu=c2.nlu + g(c1.nlu), nstep=c2.nstep + g(c1.nstep),
            naccpt=c2.naccpt + g(c1.naccpt),
            nrejct=c2.nrejct + g(c1.nrejct),
            n_restarts=c2.n_restarts + g(c1.n_restarts))
        if events:
            # Terminal budgets (hits) and occurrence buffers continue; the
            # event values g_prev stay the fresh init's (evaluated at the
            # switch point — identical to phase 1's last accepted point).
            c2 = c2._replace(ev=c2.ev._replace(
                hits=g(c1.ev.hits), n_rec=g(c1.ev.n_rec),
                t_buf=g(c1.ev.t_buf), y_buf=g(c1.ev.y_buf),
                overflow=g(c1.ev.overflow)))
        if t_eval is not None:
            c2 = c2._replace(s_cursor=g(c1.s_cursor),
                             sample_y=g(c1.sample_y))
        return c2

    if record:
        ent2 = build(stiff, st_opts, te_sub, "p2")
        c2f, cnt2, ts2, ys2, xo2, h2, co2 = _drain_recording(
            ent2, y_sub, t_sub, tf, rt_sub, at_sub, preload=preload)
        res2 = _recording_result(ent2[0], stiff, c2f, cnt2, ts2, ys2,
                                 xo2, h2, co2, dense_output, t_sub, y_sub)
    else:
        _, res2 = run(*build(stiff, st_opts, te_sub, "p2"),
                      y_sub, t_sub, rt_sub, at_sub, preload=preload)

    # -- scatter the resumed lanes back into the batch result --
    def scat(base, sub):
        if base is None or sub is None:
            return base
        a = np.asarray(base).copy()
        a[idx] = np.asarray(sub)
        return a

    merged = {f: scat(getattr(res1, f), getattr(res2, f))
              for f in ("t", "y", "status", "nfev", "nstep", "naccpt",
                        "nrejct", "t_events", "y_events", "n_events",
                        "y_samples", "n_samples", "n_restarts",
                        "event_overflow")}

    if record:
        # -- concatenate per-lane step records across the two phases --
        # (phase-2 records start strictly after each lane's switch point —
        # records are accepted-step ENDPOINTS, so there is no duplicate).
        counts_m = cnt1.astype(np.int64).copy()
        counts_m[idx] = cnt1[idx] + cnt2
        S = int(counts_m.max()) if counts_m.size else 0
        ts_m = np.zeros((B, S))
        ys_m = np.zeros((B, S, n))
        S1 = ts1.shape[1]
        ts_m[:, :S1] = ts1
        ys_m[:, :S1] = ys1
        S2 = ts2.shape[1]
        if S2:
            rows2, cols2 = np.nonzero(
                np.arange(S2)[None, :] < np.asarray(cnt2)[:, None])
            cols_out = cnt1[idx][rows2] + cols2
            ts_m[idx[rows2], cols_out] = ts2[rows2, cols2]
            ys_m[idx[rows2], cols_out] = ys2[rows2, cols2]
        merged.update(ts=ts_m, ys=ys_m, n_steps_rec=counts_m)
        if dense_output:
            merged["sol"] = CompositeBatchOdeSolution(
                res1.sol, res2.sol, idx, t_sub, forward=(tf >= t0))
    return EnsembleResult(**merged, switched=trip)


def _stitch(r1, r2, m1, m2, t_sw, *, has_t_eval, dense, events_given,
            forward):
    from .solve import OdeResult

    if has_t_eval:
        # Phase-2 t_eval points were filtered strictly past t_sw: no overlap.
        t = np.concatenate([r1.t, r2.t])
        y = np.concatenate([r1.y, r2.y], axis=1)
    else:
        # r2 starts at exactly r1's reached point: drop the duplicate.
        t = np.concatenate([r1.t, r2.t[1:]])
        y = np.concatenate([r1.y, r2.y[:, 1:]], axis=1)

    t_events = y_events = None
    if events_given:
        t_events = [np.concatenate([a, b])
                    for a, b in zip(r1.t_events, r2.t_events)]
        y_events = [np.concatenate([a, b], axis=0)
                    for a, b in zip(r1.y_events, r2.y_events)]

    sol = None
    if dense:
        sol = CompositeOdeSolution([r1.sol, r2.sol], [t_sw], forward)

    ov1, ov2 = r1.get("event_overflow"), r2.get("event_overflow")
    overflow = None
    if ov1 is not None or ov2 is not None:
        z = np.zeros(0, bool)
        overflow = np.logical_or(
            ov1 if ov1 is not None else z, ov2 if ov2 is not None else z)

    return OdeResult(
        t=t, y=y, sol=sol, t_events=t_events, y_events=y_events,
        nfev=r1.nfev + r2.nfev, njev=r1.njev + r2.njev,
        nlu=r1.nlu + r2.nlu, nstep=r1.nstep + r2.nstep,
        naccpt=r1.naccpt + r2.naccpt, nrejct=r1.nrejct + r2.nrejct,
        status=r2.status, message=r2.message, success=r2.success,
        raw_status=r2.get("raw_status"),
        t_reached=r2.get("t_reached"), y_reached=r2.get("y_reached"),
        n_restarts=r1.get("n_restarts", 0) + r2.get("n_restarts", 0),
        event_overflow=overflow,
        methods=[m1, m2], t_switch=t_sw,
    )
