"""Phase breakdown of one vmapped Radau attempt at mid-size n.

Answers: at n=16/32 dense ensembles, how much of an attempt is
(a) LU factorization of E1 + complex-pair E2, (b) the Jacobian evaluation,
(c) everything else (Newton solves, error estimate, controller)?

Both (a) and (b) execute EVERY attempt under vmap (the per-lane
``lax.cond`` reuse gates lower to both-branches select, docs/TPU_NOTES #13),
so their share bounds what a refactorization-cadence scheme could recover.

Run on TPU: ``python benches/radau_phases.py`` -> one JSON line per config.
Env: IVP_TPU_MID_B (default 4096), IVP_TPU_PHASE_STEPS (default 30).
"""
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ivp_tpu  # noqa: F401  (x64 on)

sys.path.insert(0, os.path.dirname(__file__))
from midsize_stiff import make_brusselator  # noqa: E402

from ivp_tpu.methods import radau
from ivp_tpu.methods.base import RunArgs  # noqa: F401
from ivp_tpu.core.driver import run_args


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timed(fn, *args, reps=3):
    fn(*args)  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def breakdown(N, B, K, newton_precision="mixed"):
    n = 2 * N
    rhs, jac, y0f = make_brusselator(N)
    engine, p = radau.make_engine(False, jac_fn=jac, n=n,
                                  newton_precision=newton_precision)

    ra = run_args(10.0, jnp.full((n,), 1e-4), jnp.full((n,), 1e-6),
                  10.0, 0.0, 1 << 30, jnp.float64)

    y0b = jnp.asarray(y0f(B, np.random.default_rng(0)))

    def init_one(y0):
        t0 = jnp.zeros(())
        ms, _ = engine.init(rhs, t0, y0, None, ra, p)
        return t0, y0, jnp.zeros((), jnp.int32), ms

    def attempt_one(state):
        t, y, naccpt, ms = state
        res = engine.attempt(rhs, t, y, naccpt, ms, ra, p)
        return (res.t_new, res.y_new, naccpt + res.accepted.astype(jnp.int32),
                res.ms)

    state0 = jax.jit(jax.vmap(init_one))(y0b)

    @jax.jit
    def scan_attempts(state):
        return lax.fori_loop(0, K, lambda i, s: jax.vmap(attempt_one)(s),
                             state)

    # --- isolated factor (same backend the engine auto-selected) ---
    from ivp_tpu import tableaus as tab
    from ivp_tpu.methods.radau import make_linear_backend
    factor, solve1, solve2, zero_lin = make_linear_backend(p)

    eye = jnp.eye(n)

    def build_e(h, J):
        e1 = (tab.RADAU_U1 / h) * eye - J
        return e1, (tab.RADAU_ALPH / h) * eye - J, (tab.RADAU_BETA / h) * eye

    def factor_one(h, y):
        J = jac(0.0, y)
        e1, e2r, e2i = build_e(h, J)
        lin, sing = factor(e1, e2r, e2i)
        return lin

    def jac_one(y):
        return jac(0.0, y)

    hs = jnp.full((B,), 1e-3)
    ys = y0b

    @jax.jit
    def scan_factor(ys):
        def body(i, ys):
            lin = jax.vmap(factor_one)(hs, ys)
            probe = jax.tree.leaves(lin)[0]
            return ys + 1e-12 * probe.reshape(B, -1)[:, :n]
        return lax.fori_loop(0, K, body, ys)

    @jax.jit
    def scan_jac(ys):
        def body(i, ys):
            J = jax.vmap(jac_one)(ys)
            return ys + 1e-12 * J[:, 0, :]
        return lax.fori_loop(0, K, body, ys)

    t_attempt, _ = timed(scan_attempts, state0)
    t_factor, _ = timed(scan_factor, ys)
    t_jac, _ = timed(scan_jac, ys)

    per = lambda t: t / K * 1e3  # ms per vmapped call
    rec = {
        "metric": f"radau_attempt_phases_n{n}",
        "B": B, "K": K, "newton_precision": newton_precision,
        "attempt_ms": round(per(t_attempt), 3),
        "factor_plus_jac_ms": round(per(t_factor), 3),
        "jac_ms": round(per(t_jac), 3),
        "factor_share": round((per(t_factor) - per(t_jac))
                              / per(t_attempt), 3),
        "jac_share": round(per(t_jac) / per(t_attempt), 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    B = int(os.environ.get("IVP_TPU_MID_B", 4096))
    K = int(os.environ.get("IVP_TPU_PHASE_STEPS", 30))
    for N in (8, 16):
        breakdown(N, B, K)
