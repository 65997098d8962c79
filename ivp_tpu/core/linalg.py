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

    def _row(m, mask):
        # masked row extraction: sum_i mask[i]*m[i,:] without a batched
        # matvec (tiny dot_generals are pathologically slow under vmap on
        # TPU, see docs/TPU_NOTES.md #13)
        return jnp.sum(jnp.where(mask[:, None], m, 0.0), axis=0)

    def body(k, carry):
        lu, P, sing = carry
        colk = jnp.sum(jnp.where(rows[None, :] == k, lu, 0.0), axis=1)  # lu[:, k]
        mag = jnp.where(rows >= k, jnp.abs(colk), -1.0)
        p = jnp.argmax(mag)

        # Row swap k <-> p as a rank-2 masked update (no gathers; exact
        # no-op when p == k).
        is_k = rows == k
        is_p = rows == p
        rowk = _row(lu, is_k)
        rowp = _row(lu, is_p)
        fk = is_k.astype(dtype)
        fp = is_p.astype(dtype)

        def swap(m, rk, rp):
            return (m - fk[:, None] * (rk - rp)[None, :]
                      - fp[:, None] * (rp - rk)[None, :])

        lu = swap(lu, rowk, rowp)
        P = swap(P, _row(P, is_k), _row(P, is_p))

        colk2 = jnp.sum(jnp.where(rows[None, :] == k, lu, 0.0), axis=1)
        pivval = jnp.sum(jnp.where(is_k, colk2, 0.0))
        sing = sing | (pivval == 0.0) | ~jnp.isfinite(pivval)
        denom = jnp.where(pivval == 0.0, 1.0, pivval)

        factors = jnp.where(rows > k, colk2 / denom, 0.0)
        urow = _row(lu, is_k)  # pivot row after swap
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

    # permutation apply + substitutions via masked reductions (no tiny
    # batched matvecs; see docs/TPU_NOTES.md #13)
    x = jnp.sum(P * jnp.asarray(b)[None, :], axis=1)

    def _row(m, mask):
        return jnp.sum(jnp.where(mask[:, None], m, 0.0), axis=0)

    def fwd(k, x):
        is_k = rows == k
        lk = jnp.where(rows < k, _row(lu, is_k), 0.0)
        return x - is_k.astype(dtype) * jnp.sum(lk * x)

    def bwd(i, x):
        k = n - 1 - i
        is_k = rows == k
        urow = _row(lu, is_k)
        uk = jnp.where(rows > k, urow, 0.0)
        diag = jnp.sum(jnp.where(is_k, urow, 0.0))
        val = (jnp.sum(jnp.where(is_k, x, 0.0)) - jnp.sum(uk * x)) / diag
        return jnp.where(is_k, val, x)

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
