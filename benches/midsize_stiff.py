"""Mid-size stiff ensembles: the regime between n=2 toys and n=400 single IVPs.

Measures vmapped Radau/BDF throughput on the 1-D Brusselator
method-of-lines problem (Hairer & Wanner's BRUS: the standard scalable stiff
PDE test) at n = 16/32/64 dense, and a batched *banded* ensemble at n = 128
where the block-tridiagonal cyclic-reduction backend replaces dense LU
under vmap (reference banded storage, matrix/base.rs:6-16 — here exercised
across an ensemble axis for the first time).

Run on TPU: ``python benches/midsize_stiff.py``; prints one JSON line per
config.  Env: IVP_TPU_MID_B (default 4096), IVP_TPU_BANDED_B (default 256).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import ivp_tpu  # noqa: F401  (x64 on)
from ivp_tpu.batch import build_resumable_solver

ALPHA = 0.02  # diffusion coefficient (alpha = 1/50, Hairer BRUS)


def make_brusselator(N, dtype=jnp.float64):
    """Interleaved [u0, v0, u1, v1, ...] 1-D Brusselator MOL, n = 2N states,
    Dirichlet boundaries u=1, v=3; pentadiagonal Jacobian (band (2, 2))."""
    n = 2 * N
    c = ALPHA * (N + 1) ** 2

    def rhs(t, y):
        u = y[0::2]
        v = y[1::2]
        ul = jnp.concatenate([jnp.ones((1,), y.dtype), u[:-1]])
        ur = jnp.concatenate([u[1:], jnp.ones((1,), y.dtype)])
        vl = jnp.concatenate([jnp.full((1,), 3.0, y.dtype), v[:-1]])
        vr = jnp.concatenate([v[1:], jnp.full((1,), 3.0, y.dtype)])
        du = 1.0 + u * u * v - 4.0 * u + c * (ul - 2.0 * u + ur)
        dv = 3.0 * u - u * u * v + c * (vl - 2.0 * v + vr)
        return jnp.stack([du, dv], axis=1).reshape(n)

    def jac(t, y):
        u = y[0::2]
        v = y[1::2]
        J = jnp.zeros((n, n), y.dtype)
        idx = jnp.arange(N)
        iu, iv = 2 * idx, 2 * idx + 1
        J = J.at[iu, iu].set(2.0 * u * v - 4.0 - 2.0 * c)
        J = J.at[iu, iv].set(u * u)
        J = J.at[iv, iu].set(3.0 - 2.0 * u * v)
        J = J.at[iv, iv].set(-u * u - 2.0 * c)
        J = J.at[iu[:-1], iu[1:]].set(c)   # u_i <- u_{i+1}
        J = J.at[iu[1:], iu[:-1]].set(c)   # u_i <- u_{i-1}
        J = J.at[iv[:-1], iv[1:]].set(c)
        J = J.at[iv[1:], iv[:-1]].set(c)
        return J

    def y0(B, rng):
        x = (np.arange(1, N + 1)) / (N + 1)
        u0 = 1.0 + np.sin(2 * np.pi * x)
        v0 = 3.0 * np.ones(N)
        base = np.stack([u0, v0], axis=1).reshape(n)
        return base[None, :] + 0.01 * rng.standard_normal((B, n))

    return rhs, jac, y0


def measure(method, N, B, solver_options=None, tf=10.0, rtol=1e-4, atol=1e-6,
            label="", dtype=None):
    n = 2 * N
    rhs, jac, y0f = make_brusselator(N)
    # dtype=None would resolve to the dd tier under the round-5 default;
    # this sweep's unlabeled rows mean PLATFORM F64 — pin it.
    start, resume, extract = build_resumable_solver(
        rhs, method, n=n, jac=jac, chunk_steps=2048,
        solver_options=solver_options,
        dtype=jnp.float64 if dtype is None else dtype)
    if isinstance(dtype, str):
        label = label + f"/{dtype}"
    rng = np.random.default_rng(0)
    y0 = y0f(B, rng)

    def run(y0b):
        carry, ra = start(y0b, 0.0, tf, rtol, atol)
        while True:
            carry = resume(carry, ra)
            if bool(np.all(np.asarray(carry.done))):
                break
        return extract(carry)

    res = run(y0)  # compile + warm
    t0 = time.perf_counter()
    res = run(y0 + 1e-9)
    dt = time.perf_counter() - t0
    return {
        "config": f"Brusselator N={N} (n={n}), {method}{label}, B={B}, "
                  f"t=[0,{tf}], rtol={rtol}",
        "ivps_per_sec": round(B / dt, 1),
        "sys_per_sec_x_n": round(B * n / dt, 1),
        "wall_s": round(dt, 3),
        "success_fraction": float(np.mean(np.asarray(res.status) == 0)),
        "mean_nstep": float(np.mean(np.asarray(res.nstep))),
    }


def main():
    B = int(os.environ.get("IVP_TPU_MID_B", 4096))
    Bb = int(os.environ.get("IVP_TPU_BANDED_B", 256))
    only = os.environ.get("IVP_TPU_MID_ONLY", "")
    rows = []

    def add(**kw):
        if only and only not in (kw.get("label", "") + kw["method"]
                                 + str(kw["N"])):
            return
        # The remote TPU worker can crash on big dense LU programs and takes
        # minutes to recover; retry with backoff (cf. bench.py).
        for attempt in range(3):
            try:
                rows.append(measure(**kw))
                break
            except Exception as e:
                if attempt == 2:
                    rows.append({"config": str(kw), "error": str(e)[:300]})
                else:
                    time.sleep(150)
        print(json.dumps(rows[-1]), flush=True)

    for N in (8, 16):
        add(method="Radau", N=N, B=B)
    add(method="Radau", N=32, B=1024)  # dense n=64: small B, crash-prone
    add(method="BDF", N=8, B=B)
    add(method="BDF", N=16, B=B)
    # Linear-backend sweep at n=32: dense LU vs explicit inverse vs banded CR.
    add(method="Radau", N=16, B=B, solver_options={"linear_mode": "inverse"},
        label="/inverse")
    add(method="Radau", N=16, B=B,
        solver_options={"linear_mode": "banded", "band": (2, 2)},
        label="/bandedCR")
    add(method="Radau", N=16, B=B,
        solver_options={"newton_precision": "mixed"}, label="/mixedNewton")
    # dd stiff tier at mid-size (dd state + f32 complex-pair LU).
    add(method="Radau", N=16, B=B, dtype="dd")
    add(method="Radau", N=16, B=B, dtype="dd",
        solver_options={"linear_mode": "banded", "band": (2, 2)},
        label="/bandedCR")
    # Batched banded ensemble at n=128 (the workload the CR design promises).
    add(method="Radau", N=64, B=Bb,
        solver_options={"linear_mode": "banded", "band": (2, 2)},
        label="/bandedCR")
    add(method="Radau", N=64, B=Bb, label="/denseLU")

    # Round-4 crash-region probe (VERDICT r4 #2): the n>=64 dense f64 LU at
    # B=4096 used to hard-crash the TPU worker (TPU_NOTES #2/#5, pre
    # scan-LU).  Gated behind IVP_TPU_MID_CRASHPROBE=1 — the n=128 row
    # alone runs several minutes.
    if os.environ.get("IVP_TPU_MID_CRASHPROBE") == "1":
        add(method="Radau", N=32, B=4096, label="/denseLU-crashprobe")
        add(method="Radau", N=64, B=4096, label="/denseLU-crashprobe")


if __name__ == "__main__":
    main()
