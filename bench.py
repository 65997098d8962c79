"""Benchmark: batched Van der Pol IVPs/sec per chip (BASELINE.md primary metric).

Config mirrors the reference harness problem (reference benches/benchmark.py:
107-115): Van der Pol mu=1 (non-stiff), t in [0, 100], y0 ~ [2, 0], DOPRI5
(RK45), rtol=1e-6, atol=1e-8 — integrated as a vmapped ensemble on one chip
instead of one IVP at a time through a Python-callback boundary.

Prints a detail JSON line first, then the compact headline JSON line LAST
({"metric", "value", "unit", "vs_baseline", ...} — the driver tail-captures
stdout, so the headline must be final and short).  The reported value is the
literal NO-ARGUMENT path (plain-jnp RHS, no dtype= anywhere): since round 5
``dtype=None`` resolves like ``"auto"`` — the dd double-float tier on TPUs,
f64-class precision (round-5 VERDICT #1).  Platform-f64/f32/explicit-dd/
stiff/Lorenz(t_eval)/single-latency rows ride along.  vs_baseline is
measured against the BASELINE.json north star of 1e5 independent Van der
Pol IVPs/sec/chip.

Env knobs: IVP_TPU_BENCH_B (batch size; default 524288 for f64/f32 rows,
262144 for the dd-tier rows — the measured per-dtype saturation points,
see main()).
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compile cache: the bench's ~8 configs recompile from scratch
# otherwise (~5 min of compiles on the remote chip), which can push the run
# past external time budgets.
jax.config.update("jax_compilation_cache_dir", "/tmp/ivp_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import ivp_tpu  # noqa: F401  (enables x64)
from ivp_tpu.batch import build_ensemble_solver

NORTH_STAR = 1.0e5  # IVPs/sec/chip (BASELINE.json)


def vdp(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def vdp_dd(t, y):
    from ivp_tpu import ddmath as ddm
    return ddm.stack([y[1], (1.0 - y[0] * y[0]) * y[1] - y[0]])


def measure(dtype, B, t0=0.0, tf=100.0, rtol=1e-6, atol=1e-8, n_runs=3):
    """``dtype=None`` measures the literal no-argument path: a plain-jnp RHS
    and no dtype anywhere (resolves to the dd tier on TPUs since round 5);
    ``dtype="dd"`` measures the hand-written DD-native RHS for comparison
    (their agreement doubles as the ddify auto-lift parity check)."""
    rhs = vdp_dd if (isinstance(dtype, str) and dtype == "dd") else vdp
    if dtype is None:
        solver = jax.jit(build_ensemble_solver(rhs, "RK45", n=2))
    else:
        solver = jax.jit(build_ensemble_solver(rhs, "RK45", n=2, dtype=dtype))
    rng = np.random.default_rng(0)
    carrier = jnp.float64 if (rhs is vdp_dd or dtype is None) else dtype
    y0s = [jnp.asarray(np.array([2.0, 0.0])
                       + 0.05 * rng.standard_normal((B, 2)), carrier)
           for _ in range(n_runs + 1)]

    def sync(res):
        # force execution with a tiny device->host fetch (block_until_ready
        # alone is unreliable through the remote-execution tunnel)
        return int(np.asarray(res.nfev[0]))

    res = solver(y0s[0], t0, tf, rtol, atol)
    sync(res)  # warmup/compile
    times = []
    for k in range(n_runs):
        start = time.perf_counter()
        res = solver(y0s[k + 1], t0, tf, rtol, atol)
        sync(res)
        times.append(time.perf_counter() - start)
    dt = float(np.median(times))
    stats = {
        "wall_s": round(dt, 4),
        "ivps_per_sec": round(B / dt, 1),
        "rhs_evals_per_sec": round(int(np.sum(np.asarray(res.nfev))) / dt, 1),
        "success_fraction": float(np.mean(np.asarray(res.status) == 0)),
        "mean_nstep": float(np.mean(np.asarray(res.nstep))),
        "max_nstep": int(np.max(np.asarray(res.nstep))),
        # Repeat/variance metadata (VERDICT r3 weak #6): chip-session drift
        # is ±10%+, so every row carries its own spread.
        "repeats": n_runs,
        "walls_s": [round(t, 4) for t in times],
        "spread_pct": round(100.0 * (max(times) - min(times)) / dt, 1),
    }
    return stats


def _build_stiff_runner(method="Radau", B=131072, t0=0.0, tf=3000.0,
                        rtol=1e-4, atol=1e-6, dtype=jnp.float64,
                        solver_options=None):
    """Stiff VdP mu=1000 ensemble runner (chunked resumable solve); config
    matches the reference harness's stiff benchmark (reference
    benches/benchmark.py:118-126)."""
    from ivp_tpu.batch import build_resumable_solver

    def vdp_stiff(t, y):
        return jnp.array([y[1], 1000.0 * (1.0 - y[0] ** 2) * y[1] - y[0]])

    start, resume, extract = build_resumable_solver(
        vdp_stiff, method, n=2, chunk_steps=4096, dtype=dtype,
        solver_options=solver_options)
    rng = np.random.default_rng(0)
    y0 = np.array([2.0, 0.0]) + 0.02 * rng.standard_normal((B, 2))

    def run(eps):
        carry, ra = start(y0 + eps, t0, tf, rtol, atol)
        while True:
            carry = resume(carry, ra)
            if bool(np.all(np.asarray(carry.done))):
                break
        return extract(carry)

    return run


def measure_stiff(method="Radau", B=131072, t0=0.0, tf=3000.0, rtol=1e-4,
                  atol=1e-6, dtype=jnp.float64, solver_options=None,
                  label=""):
    """Single stiff config (one warm repeat).  For the bench report the
    stiff configs are measured INTERLEAVED (measure_stiff_matrix) — the
    chip's throughput drifts enough between sequential configs to distort
    their ratios (docs/TPU_NOTES.md #24)."""
    run = _build_stiff_runner(method, B, t0, tf, rtol, atol, dtype,
                              solver_options)
    run(0.0)  # warmup/compile
    start_t = time.perf_counter()
    res = run(1e-9)
    dt = time.perf_counter() - start_t
    dt_name = dtype if isinstance(dtype, str) else jnp.dtype(dtype).name
    return {
        "config": f"VdP mu=1000, t=[0,3000], {method}{label}, rtol=1e-4, "
                  f"{dt_name}, B={B}",
        "ivps_per_sec": round(B / dt, 1),
        "wall_s": round(dt, 3),
        "success_fraction": float(np.mean(np.asarray(res.status) == 0)),
    }


def measure_stiff_matrix(configs, B=131072, rounds=3):
    """Measure several stiff configs with interleaved timing rounds
    (TPU_NOTES #24: cross-config drift swamps <2x ratios otherwise).
    Returns {key: row} with each row's best wall across rounds."""
    built = []
    out = {}
    for key, kw in configs:
        try:
            bkw = {k: v for k, v in kw.items() if k != "label"}
            run = _build_stiff_runner(B=B, **bkw)
            run(0.0)  # compile + warm
            built.append((key, kw, run))
        except Exception as e:
            out[key] = {"error": str(e)[:200]}
    walls = {key: [] for key, _, _ in built}
    ok = {}
    for r in range(rounds):
        for key, kw, run in built:
            try:
                # Unmeasured staging run first: switching programs on the
                # remote worker costs a re-staging overhead that would
                # otherwise land inside the timed run and compress ratios
                # (the same reason the dedicated interleaved A/Bs time the
                # run right after the same program's warmup).
                run((2 * r + 1) * 1e-9)
                t0 = time.perf_counter()
                res = run((2 * r + 2) * 1e-9)
                walls[key].append(time.perf_counter() - t0)
                ok[key] = float(np.mean(np.asarray(res.status) == 0))
            except Exception as e:
                out[key] = {"error": str(e)[:200]}
    for key, kw, _ in built:
        if key in out or not walls[key]:
            continue
        dt = float(np.min(walls[key]))
        dtype = kw.get("dtype", jnp.float64)
        dt_name = dtype if isinstance(dtype, str) else jnp.dtype(dtype).name
        out[key] = {
            "config": f"VdP mu=1000, t=[0,3000], {kw.get('method', 'Radau')}"
                      f"{kw.get('label', '')}, rtol=1e-4, {dt_name}, B={B}, "
                      f"interleaved best-of-{rounds}",
            "ivps_per_sec": round(B / dt, 1),
            "wall_s": round(dt, 3),
            "success_fraction": ok.get(key, float("nan")),
        }
    return out


def measure_lorenz(B=16384, rtol=1e-8, atol=1e-10, dtype=None, t_eval=None):
    """Reference harness config #3 (benchmark.py:129-137): Lorenz chaotic,
    t in [0, 100], tight tolerances — as a perturbed-IC ensemble.
    ``dtype=None`` measures the no-argument default path (the dd tier on
    TPUs since round 5); ``dtype="dd"`` runs the hand-written DD-native
    RHS; ``dtype=jnp.float64`` the platform-f64 tier.  ``t_eval`` adds
    in-loop sampled output (the dd-grade dense path, round-5 VERDICT #2)."""
    use_dd = isinstance(dtype, str) and dtype == "dd"

    if use_dd:
        from ivp_tpu import ddmath as ddm

        def lorenz(t, y):
            return ddm.stack([(y[1] - y[0]) * 10.0,
                              y[0] * 28.0 - y[0] * y[2] - y[1],
                              y[0] * y[1] - y[2] * (8.0 / 3.0)])
    else:
        def lorenz(t, y):
            return jnp.array([10.0 * (y[1] - y[0]),
                              y[0] * (28.0 - y[2]) - y[1],
                              y[0] * y[1] - (8.0 / 3.0) * y[2]])

    kw = {} if dtype is None else {"dtype": dtype}
    solver = jax.jit(build_ensemble_solver(lorenz, "DOP853", n=3,
                                           max_steps=200_000, t_eval=t_eval,
                                           **kw))
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(np.array([1.0, 1.0, 1.0])
                     + 1e-3 * rng.standard_normal((B, 3)))
    res = solver(y0, 0.0, 100.0, rtol, atol)
    int(np.asarray(res.nfev[0]))  # warmup sync
    start = time.perf_counter()
    res = solver(y0 + 1e-9, 0.0, 100.0, rtol, atol)
    n0 = int(np.asarray(res.nfev[0]))  # sync
    dt = time.perf_counter() - start
    tag = ("dd" if use_dd else
           "default" if dtype is None else jnp.dtype(dtype).name)
    te_tag = "" if t_eval is None else f", t_eval[{len(t_eval)}]"
    return {
        "config": f"Lorenz, t=[0,100], DOP853, rtol={rtol}, {tag}{te_tag}, "
                  f"B={B}",
        "ivps_per_sec": round(B / dt, 1),
        "wall_s": round(dt, 3),
        "mean_nstep": float(np.mean(np.asarray(res.nstep))),
        "success_fraction": float(np.mean(np.asarray(res.status) == 0)),
    }


def measure_linear100(B=4096, rtol=1e-6, atol=1e-8):
    """Reference harness config #4 (benchmark.py:140-148): linear system of
    N=100 coupled decays — a larger-n state vector per trajectory."""
    N = 100
    lam = jnp.asarray(np.linspace(0.5, 2.0, N))

    def decay(t, y):
        return -lam * y

    solver = jax.jit(build_ensemble_solver(decay, "RK45", n=N))
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(1.0 + 0.1 * rng.standard_normal((B, N)))
    res = solver(y0, 0.0, 10.0, rtol, atol)
    int(np.asarray(res.nfev[0]))
    # This config's wall is ~50-100 ms: single-shot timing is dominated by
    # remote-dispatch noise (measured 38k..92k across back-to-back runs);
    # take the best of 3 warm runs.
    times = []
    for k in range(3):
        start = time.perf_counter()
        res = solver(y0 + 1e-9 * (k + 1), 0.0, 10.0, rtol, atol)
        int(np.asarray(res.nfev[0]))
        times.append(time.perf_counter() - start)
    dt = float(np.min(times))
    return {
        "config": f"linear decay N=100, t=[0,10], RK45, rtol={rtol}, f64, B={B}",
        "ivps_per_sec": round(B / dt, 1),
        "wall_s": round(dt, 3),
        "success_fraction": float(np.mean(np.asarray(res.status) == 0)),
    }


def _measure_with_retry(dtype, B, attempts=6):
    """The remote TPU worker occasionally restarts and can stay down for
    tens of minutes (observed twice on 2026-08-17); retry with a patient
    backoff so a round-end bench run survives an outage window (~25 min
    total across 6 attempts)."""
    for k in range(attempts):
        try:
            return measure(dtype, B)
        except Exception:
            if k == attempts - 1:
                raise
            time.sleep(min(120 * (k + 1), 480))


def main():
    # Per-dtype tuned batch sizes (measured same-session sweeps): f64/f32
    # peak at 2^19 (+2% / +13% over 2^18 — larger batches amortize the
    # lockstep divergence tail and dispatch overheads; f32 declines again
    # at 2^20), dd peaks at 2^18 (its 2x state traffic saturates earlier).
    # IVP_TPU_BENCH_B overrides all three.
    env_b = os.environ.get("IVP_TPU_BENCH_B")
    B = int(env_b) if env_b else 524288
    B_dd = int(env_b) if env_b else 262144
    # The PRIMARY metric: the literal no-argument path — plain-jnp RHS, no
    # dtype anywhere (resolves to the dd tier on TPUs; round-5 VERDICT #1).
    default_row = _measure_with_retry(None, B_dd)
    f64 = _measure_with_retry(jnp.float64, B)
    f32 = _measure_with_retry(jnp.float32, B)
    try:
        # The double-float tier with a hand-written DD-native RHS
        # (dtype="dd", core/ddmath.py) — its agreement with default_row is
        # the ddify auto-lift parity check.
        dd = _measure_with_retry("dd", B_dd, attempts=2)
    except Exception as e:
        dd = {"error": str(e)[:200]}
    # Stiff configs measured with interleaved timing rounds so their
    # RATIOS are trustworthy despite chip-throughput drift (TPU_NOTES #24).
    try:
        stiff_rows = measure_stiff_matrix([
            ("radau_f64", dict(method="Radau")),
            ("bdf_f64", dict(method="BDF")),
            ("radau_f32", dict(method="Radau", dtype=jnp.float32)),
            ("radau_mixed", dict(
                method="Radau", label="/mixed-precision",
                solver_options={"newton_precision": "mixed"})),
            # The dd stiff tier (methods/dd_radau.py, dd_bdf.py).
            ("radau_dd", dict(method="Radau", dtype="dd")),
            ("bdf_dd", dict(method="BDF", dtype="dd")),
        ])
    except Exception as e:  # secondary metrics must never break the report
        stiff_rows = {"error": str(e)[:200]}
    _g = (stiff_rows.get if isinstance(stiff_rows, dict)
          else (lambda *_: {"error": "matrix failed"}))
    stiff = _g("radau_f64", {})
    stiff_bdf = _g("bdf_f64", {})
    stiff_f32 = _g("radau_f32", {})
    stiff_mixed = _g("radau_mixed", {})
    stiff_dd = _g("radau_dd", {})
    stiff_bdf_dd = _g("bdf_dd", {})

    def _aux(fn, **kw):
        try:
            return fn(**kw)
        except Exception as e:
            return {"error": str(e)[:200]}

    lorenz = _aux(measure_lorenz, dtype=jnp.float64)
    lorenz_dd = _aux(measure_lorenz, dtype="dd")
    # Sampled-output rows (round-5 VERDICT #2): Lorenz with a 100-point
    # t_eval grid — the default path now keeps dd speed WITH dense-grade
    # sampling (dd-packed cont + f64 interpolation), vs the platform-f64
    # row.
    te_grid = np.linspace(0.0, 100.0, 100)
    lorenz_te_default = _aux(measure_lorenz, t_eval=te_grid)
    lorenz_te_f64 = _aux(measure_lorenz, dtype=jnp.float64, t_eval=te_grid)
    linear100 = _aux(measure_linear100)

    # Single-IVP warm latency vs SciPy (round-5 VERDICT #3): embed the
    # per-problem rows so every BENCH artifact carries them.
    try:
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benches"))
        from single_latency import run_rows
        latency_rows = run_rows(reps=5, dtype="auto")
    except Exception as e:
        latency_rows = {"error": str(e)[:200]}

    # The no-argument default resolves through methods/ddtier.py.
    from ivp_tpu.methods.ddtier import resolve_auto_dtype, is_dd
    resolved = resolve_auto_dtype("auto", rtol=1e-6, sampled_output=False)
    dd_ok = isinstance(dd, dict) and "ivps_per_sec" in dd
    default_ok = (isinstance(default_row, dict)
                  and "ivps_per_sec" in default_row)
    # Primary = the measured no-argument path; platform f64 only as a
    # last-resort stand-in if the default row errored.
    primary = default_row if default_ok else f64
    value = primary["ivps_per_sec"]

    # Roofline context (benches/roofline.py, docs/BENCH.md): dd's bandwidth
    # ceiling is ~half the measured f32 throughput (2x state traffic).
    f32_ok = isinstance(f32, dict) and "ivps_per_sec" in f32
    roofline = {
        "f32_hbm_bound_ivps": f32.get("ivps_per_sec") if f32_ok else None,
        "dd_bw_ceiling_ivps": (round(f32["ivps_per_sec"] / 2.0, 1)
                               if f32_ok else None),
        "dd_fraction_of_ceiling": (round(2.0 * dd["ivps_per_sec"]
                                         / f32["ivps_per_sec"], 3)
                                   if (dd_ok and f32_ok) else None),
        "f64_emulation_note": "platform f64 is emulation-op-bound at ~1/3 "
                              "VPU peak (benches/roofline.py)",
    }

    detail = {
        "batch": B,
        "batch_dd": B_dd,
        "default_noarg": default_row,
        "f64": f64,
        "f32": f32,
        "dd": dd,
        "stiff_radau_f64": stiff,
        "stiff_bdf_f64": stiff_bdf,
        "stiff_radau_f32": stiff_f32,
        "stiff_radau_f64_mixed_newton": stiff_mixed,
        "stiff_radau_dd": stiff_dd,
        "stiff_bdf_dd": stiff_bdf_dd,
        "lorenz_dop853_f64": lorenz,
        "lorenz_dop853_dd": lorenz_dd,
        "lorenz_dop853_teval_default": lorenz_te_default,
        "lorenz_dop853_teval_f64": lorenz_te_f64,
        "linear_decay_n100_f64": linear100,
        "single_ivp_latency_vs_scipy": latency_rows,
        "roofline": roofline,
        "device": str(jax.devices()[0]),
        "config": "VdP mu=1, t=[0,100], DOPRI5, rtol=1e-6, atol=1e-8",
    }
    print(json.dumps({"detail": detail}))

    # Compact headline LAST (the driver tail-captures stdout; r3's artifact
    # lost the primary value because it led a >2000-char line).
    print(json.dumps({
        "metric": "vdp_ivps_per_sec_per_chip_default_noarg",
        "value": value,
        "unit": "IVPs/s",
        "vs_baseline": round(value / NORTH_STAR, 4),
        "dtype_resolved": str(resolved) if default_ok else "float64",
        "platform_f64_ivps": f64.get("ivps_per_sec"),
        "dd_ivps": dd.get("ivps_per_sec") if dd_ok else None,
        "f32_ivps": f32.get("ivps_per_sec") if f32_ok else None,
        "stiff_radau_dd_ivps": stiff_dd.get("ivps_per_sec"),
        "stiff_bdf_dd_ivps": stiff_bdf_dd.get("ivps_per_sec"),
        "lorenz_teval_default_ivps": (
            lorenz_te_default.get("ivps_per_sec")
            if isinstance(lorenz_te_default, dict) else None),
        "repeats": primary.get("repeats"),
        "spread_pct": primary.get("spread_pct"),
        "success_fraction": primary.get("success_fraction"),
    }))


if __name__ == "__main__":
    main()
