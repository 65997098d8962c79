"""Interleaved A/B of linear-solve backends for the mixed-precision (f32
factor) stiff hot loop at mid-size n.

The Radau/BDF mixed-Newton attempt factors E1 (real) + E2 (complex pair)
every attempt under vmap and then runs ~2-7 Newton solves against the
factors.  Candidates per (factor + NIT solves) unit, all batched over B
lanes inside a fori_loop (mimicking the while_loop hot path):

  scanlu  — pure-JAX gather-free LU + scan/unroll substitutions
            (current production backend, core/linalg.py)
  xla_lu  — native XLA LuDecomposition (f32 real + c64 complex) +
            per-solve batched triangular_solve (MXU-blocked)
  xla_inv — native XLA LU + explicit inverse built once per factor via
            n-RHS triangular solves (MXU); every Newton solve becomes a
            fused broadcast matvec
  jax_inv — pure-JAX explicit inverse (current linear_mode='inverse')

Permutations are applied gather-free in the hot path (one-hot matrices
built at factor time) per docs/TPU_NOTES.md #2.

Run: python benches/native_linalg_ab.py  (env: IVP_TPU_NL_B, IVP_TPU_NL_NIT)
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import jax.lax.linalg as jla

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ivp_tpu  # noqa: F401  (x64 on)

from ivp_tpu.core.linalg import (inv, inv_complex, lu_factor, lu_factor_cpair,
                                 lu_solve, lu_solve_cpair, matvec,
                                 solve_complex_inv)

F32 = jnp.float32


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def make_problem(n, B, seed=0):
    rng = np.random.default_rng(seed)
    J = rng.standard_normal((B, n, n)).astype(np.float32) * 0.3
    fac1, alphn, betan = 2.0, 1.5, 2.5
    eye = np.eye(n, dtype=np.float32)
    e1 = fac1 * eye - J
    e2r = alphn * eye - J
    e2i = betan * np.broadcast_to(eye, (B, n, n)).copy()
    b = rng.standard_normal((B, n)).astype(np.float32)
    return jnp.asarray(e1), jnp.asarray(e2r), jnp.asarray(e2i), jnp.asarray(b)


# ---------------------------------------------------------------- variants

def unit_scanlu(e1, e2r, e2i, b, nit):
    lu1, s1 = lu_factor(e1)
    lu2, s2 = lu_factor_cpair(e2r, e2i)
    x = b
    for _ in range(nit):
        x1 = lu_solve(lu1, x)
        xr, xi = lu_solve_cpair(lu2, x, x1)
        x = x1 + 1e-6 * (xr + xi)
    return x, s1 | s2


def _perm_mat(perm, dtype):
    n = perm.shape[-1]
    return (perm[:, None] == jnp.arange(n)[None, :]).astype(dtype)


def unit_xla_lu(e1, e2r, e2i, b, nit):
    lu1, piv1, perm1 = jla.lu(e1)
    d1 = jnp.diagonal(lu1)
    s1 = jnp.any((d1 == 0.0) | ~jnp.isfinite(d1))
    P1 = _perm_mat(perm1, e1.dtype)
    ec = lax.complex(e2r, e2i)
    lu2, piv2, perm2 = jla.lu(ec)
    d2 = jnp.diagonal(lu2)
    s2 = jnp.any((d2 == 0.0) | ~jnp.isfinite(jnp.abs(d2)))
    P2 = _perm_mat(perm2, e1.dtype)

    def solve_r(bv):
        pb = jnp.sum(P1 * bv[None, :], axis=1)[:, None]
        x = jla.triangular_solve(lu1, pb, left_side=True, lower=True,
                                 unit_diagonal=True)
        x = jla.triangular_solve(lu1, x, left_side=True, lower=False)
        return x[:, 0]

    def solve_c(br, bi):
        bc = lax.complex(jnp.sum(P2 * br[None, :], axis=1),
                         jnp.sum(P2 * bi[None, :], axis=1))[:, None]
        x = jla.triangular_solve(lu2, bc, left_side=True, lower=True,
                                 unit_diagonal=True)
        x = jla.triangular_solve(lu2, x, left_side=True, lower=False)
        return jnp.real(x[:, 0]), jnp.imag(x[:, 0])

    x = b
    for _ in range(nit):
        x1 = solve_r(x)
        xr, xi = solve_c(x, x1)
        x = x1 + 1e-6 * (xr + xi)
    return x, s1 | s2


def unit_xla_inv(e1, e2r, e2i, b, nit):
    n = e1.shape[-1]

    def inv_real(a):
        lu_, piv_, perm_ = jla.lu(a)
        d = jnp.diagonal(lu_)
        sing = jnp.any((d == 0.0) | ~jnp.isfinite(d))
        Pm = _perm_mat(perm_, a.dtype)
        X = jla.triangular_solve(lu_, Pm, left_side=True, lower=True,
                                 unit_diagonal=True)
        X = jla.triangular_solve(lu_, X, left_side=True, lower=False)
        return X, sing

    inv1, s1 = inv_real(e1)
    ec = lax.complex(e2r, e2i)
    lu2, piv2, perm2 = jla.lu(ec)
    d2 = jnp.diagonal(lu2)
    s2 = jnp.any((d2 == 0.0) | ~jnp.isfinite(jnp.abs(d2)))
    P2c = _perm_mat(perm2, ec.dtype)
    X2 = jla.triangular_solve(lu2, P2c, left_side=True, lower=True,
                              unit_diagonal=True)
    X2 = jla.triangular_solve(lu2, X2, left_side=True, lower=False)
    Br, Bi = jnp.real(X2), jnp.imag(X2)

    x = b
    for _ in range(nit):
        x1 = matvec(inv1, x)
        xr, xi = solve_complex_inv((Br, Bi), x, x1)
        x = x1 + 1e-6 * (xr + xi)
    return x, s1 | s2


def unit_jax_inv(e1, e2r, e2i, b, nit):
    inv1, s1 = inv(e1)
    (Br, Bi), s2 = inv_complex(e2r, e2i)
    x = b
    for _ in range(nit):
        x1 = matvec(inv1, x)
        xr, xi = solve_complex_inv((Br, Bi), x, x1)
        x = x1 + 1e-6 * (xr + xi)
    return x, s1 | s2


UNITS = {"scanlu": unit_scanlu, "xla_lu": unit_xla_lu,
         "xla_inv": unit_xla_inv, "jax_inv": unit_jax_inv}


def build(kind, n, B, nit, K):
    unit = UNITS[kind]

    @jax.jit
    def run(e1, e2r, e2i, b):
        def body(i, carry):
            e1_, b_ = carry
            if kind in ("scanlu", "jax_inv"):
                x, sing = jax.vmap(lambda a, br, bi, bb:
                                   unit(a, br, bi, bb, nit))(e1_, e2r, e2i, b_)
            else:
                x, sing = jax.vmap(lambda a, br, bi, bb:
                                   unit(a, br, bi, bb, nit))(e1_, e2r, e2i, b_)
            return e1_ + 1e-9, x
        return lax.fori_loop(0, K, body, (e1, b))

    return run


def measure(n, B, nit, K=8, rounds=2):
    e1, e2r, e2i, b = make_problem(n, B)
    # correctness cross-check (single call per variant)
    ref = None
    outs = {}
    for kind, unit in UNITS.items():
        f = jax.jit(jax.vmap(lambda a, br, bi, bb: unit(a, br, bi, bb, 2)[0]))
        outs[kind] = np.asarray(f(e1, e2r, e2i, b))
    ref = outs["scanlu"]
    for kind, o in outs.items():
        err = float(np.max(np.abs(o - ref)) / (np.max(np.abs(ref)) + 1e-30))
        if err > 1e-4:
            print(json.dumps({"check": kind, "n": n, "rel_err": err}),
                  flush=True)

    runners = {k: build(k, n, B, nit, K) for k in UNITS}
    times = {k: [] for k in UNITS}
    # compile + warm
    for k, f in runners.items():
        sync(f(e1, e2r, e2i, b))
    for _ in range(rounds):
        for k, f in runners.items():
            t0 = time.perf_counter()
            sync(f(e1, e2r, e2i, b))
            times[k].append(time.perf_counter() - t0)
    rec = {"metric": f"linsolve_unit_ms_n{n}", "B": B, "nit": nit, "K": K}
    for k in UNITS:
        rec[k] = round(min(times[k]) / K * 1e3, 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    B = int(os.environ.get("IVP_TPU_NL_B", 4096))
    nit = int(os.environ.get("IVP_TPU_NL_NIT", 3))
    for n, b_ in ((16, B), (32, B), (64, B // 4), (128, B // 16)):
        measure(n, b_, nit)
