"""Linear algebra for the implicit solvers (Radau, BDF).

Pure-JAX partial-pivot LU, written **gather/scatter-free**: every
data-dependent row operation (pivot search, row swap, substitution update) is
expressed as comparisons + masked reductions + rank-1 updates, so the lowered
program contains no dynamic-slice/scatter inside the integration loops —
the safest and fastest form for TPU (and it batches trivially under vmap:
each ensemble lane factors its own matrix inside one fused program).

Rationale vs alternatives:
* XLA's LuDecomposition custom op only implements f32/c64 on TPU; the stiff
  solvers need f64 to reach reference tolerances.
* The permutation is accumulated as an explicit matrix P (so solving is a
  matmul), replacing the pivot-index bookkeeping of the reference's
  Fortran-style decomposition (reference src/matrix/lu.rs, linear.rs).

The complex system (alpha + i*beta)/h * M - J that Radau factors each step
(reference src/methods/radau.rs:376-417) is solved in an equivalent
**split-real 2n x 2n form** [[Ar, -Ai], [Ai, Ar]] — complex support varies
across TPU generations while real arithmetic is universal, and for small
systems the extra flops are negligible.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Unroll factorization/substitution loops at trace time below this size:
# sequential fori_loops of tiny masked updates dominate wall-clock for the
# small systems typical of IVP ensembles, and unrolled bodies (with static k)
# let XLA simplify the masks into slices and fuse across iterations.
UNROLL_N = 16


def lu_factor(a):
    """Partial-pivot LU. Returns ((lu, P), singular_flag).

    ``lu`` holds L (unit diagonal, strictly below) and U (on/above); ``P`` is
    the permutation matrix with P @ a = L @ U.  The singularity test mirrors
    the reference's zero-pivot error (reference src/matrix/lu.rs:37-125).
    """
    n = a.shape[-1]
    rows = jnp.arange(n)
    dtype = a.dtype

    def body(k, carry):
        lu, P, sing = carry
        colk = jnp.sum(jnp.where(rows[None, :] == k, lu, 0.0), axis=1)  # lu[:, k]
        mag = jnp.where(rows >= k, jnp.abs(colk), -1.0)
        p = jnp.argmax(mag)

        # Row swap k <-> p as a rank-2 masked update (no gathers; exact
        # no-op when p == k).
        is_k = (rows == k).astype(dtype)
        is_p = (rows == p).astype(dtype)
        rowk = is_k @ lu
        rowp = is_p @ lu

        def swap(m, rk, rp):
            return (m - is_k[:, None] * (rk - rp)[None, :]
                      - is_p[:, None] * (rp - rk)[None, :])

        lu = swap(lu, rowk, rowp)
        P = swap(P, is_k @ P, is_p @ P)

        colk2 = jnp.sum(jnp.where(rows[None, :] == k, lu, 0.0), axis=1)
        pivval = jnp.dot(is_k, colk2)
        sing = sing | (pivval == 0.0) | ~jnp.isfinite(pivval)
        denom = jnp.where(pivval == 0.0, 1.0, pivval)

        factors = jnp.where(rows > k, colk2 / denom, 0.0)
        urow = is_k @ lu  # pivot row after swap
        upper = jnp.where(rows[None, :] > k, urow[None, :], 0.0)
        lu = lu - factors[:, None] * upper
        # store multipliers in column k below the diagonal
        lu = jnp.where((rows[:, None] > k) & (rows[None, :] == k),
                       factors[:, None], lu)
        return lu, P, sing

    lu0 = jnp.asarray(a)
    P0 = jnp.eye(n, dtype=dtype)
    sing0 = jnp.zeros((), bool)
    if n <= UNROLL_N:
        carry = (lu0, P0, sing0)
        for k in range(n):
            carry = body(k, carry)
        lu, P, sing = carry
    else:
        lu, P, sing = lax.fori_loop(0, n, body, (lu0, P0, sing0))
    return (lu, P), sing


def lu_solve(lu_piv, b):
    """Solve A x = b given ``lu_factor`` output (permutation matmul + masked
    forward/back substitution; O(n^2) vectorized work, no dynamic indexing)."""
    lu, P = lu_piv
    n = lu.shape[-1]
    rows = jnp.arange(n)
    dtype = lu.dtype

    x = P @ jnp.asarray(b)

    def fwd(k, x):
        is_k = (rows == k).astype(dtype)
        lk = jnp.where(rows < k, is_k @ lu, 0.0)
        return x - is_k * jnp.dot(lk, x)

    def bwd(i, x):
        k = n - 1 - i
        is_k = (rows == k).astype(dtype)
        urow = is_k @ lu
        uk = jnp.where(rows > k, urow, 0.0)
        diag = jnp.dot(urow, is_k)
        val = (jnp.dot(is_k, x) - jnp.dot(uk, x)) / diag
        return jnp.where(rows == k, val, x)

    if n <= UNROLL_N:
        for k in range(n):
            x = fwd(k, x)
        for i in range(n):
            x = bwd(i, x)
        return x
    x = lax.fori_loop(0, n, fwd, x)
    return lax.fori_loop(0, n, bwd, x)


def split_complex_matrix(ar, ai):
    """Real 2n x 2n embedding of the complex matrix ar + i*ai."""
    top = jnp.concatenate([ar, -ai], axis=-1)
    bot = jnp.concatenate([ai, ar], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def lu_factor_complex(ar, ai):
    """Factor ar + i*ai via the split-real embedding."""
    return lu_factor(split_complex_matrix(ar, ai))


def lu_solve_complex(lu_piv, br, bi):
    """Solve (ar + i*ai) (xr + i*xi) = br + i*bi given the split-real factors."""
    n = br.shape[-1]
    x = lu_solve(lu_piv, jnp.concatenate([br, bi], axis=-1))
    return x[..., :n], x[..., n:]
