"""Linear algebra for the implicit solvers (Radau, BDF).

Uses a pure-JAX partial-pivot LU rather than XLA's LuDecomposition custom op:
TPU's LuDecomposition only implements f32/c64, while the stiff solvers need
f64 to reach reference tolerances.  The pure-JAX factorization lowers to
elementwise/select/fori ops that run in any precision on any backend, batches
under vmap (each ensemble lane factors its own matrix inside one fused
program), and for the tiny systems typical of IVPs avoids the custom-call
overhead entirely — replacing the reference's Fortran-style decompositions
(reference src/matrix/lu.rs, linear.rs).

The complex system (alpha + i*beta)/h * M - J that Radau factors each step
(reference src/methods/radau.rs:376-417) is solved in an equivalent
**split-real 2n x 2n form** [[Ar, -Ai], [Ai, Ar]] — complex support varies
across TPU generations while real arithmetic is universal, and for small
systems the extra flops are negligible.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def lu_factor(a):
    """Partial-pivot LU. Returns ((lu, piv), singular_flag).

    Format matches scipy.linalg.lu_factor: L (unit diagonal) strictly below,
    U on/above the diagonal, ``piv[k]`` = row swapped with k at step k.
    The singularity test mirrors the reference's zero-pivot error
    (reference src/matrix/lu.rs:37-125).
    """
    n = a.shape[-1]
    rows = jnp.arange(n)

    def body(k, carry):
        lu, piv, sing = carry
        col = jnp.where(rows >= k, jnp.abs(lu[:, k]), -1.0)
        p = jnp.argmax(col)
        # swap rows k and p (works when p == k).
        rowk = lu[k]
        rowp = lu[p]
        lu = lu.at[k].set(rowp).at[p].set(rowk)
        piv = piv.at[k].set(p.astype(jnp.int32))
        pivval = lu[k, k]
        sing = sing | (pivval == 0.0) | ~jnp.isfinite(pivval)
        denom = jnp.where(pivval == 0.0, 1.0, pivval)
        factors = jnp.where(rows > k, lu[:, k] / denom, 0.0)
        upper = jnp.where(rows[None, :] > k, lu[k][None, :], 0.0)
        lu = lu - factors[:, None] * upper
        lu = lu.at[:, k].set(jnp.where(rows > k, factors, lu[:, k]))
        return lu, piv, sing

    lu0 = jnp.asarray(a)
    piv0 = jnp.zeros((n,), jnp.int32)
    sing0 = jnp.zeros((), bool)
    lu, piv, sing = lax.fori_loop(0, n, body, (lu0, piv0, sing0))
    return (lu, piv), sing


def lu_solve(lu_piv, b):
    """Solve A x = b given ``lu_factor`` output (sequential row swaps +
    masked forward/back substitution; O(n^2) vectorized work)."""
    lu, piv = lu_piv
    n = lu.shape[-1]
    rows = jnp.arange(n)

    def swap(k, x):
        p = piv[k]
        xk = x[k]
        xp = x[p]
        return x.at[k].set(xp).at[p].set(xk)

    x = lax.fori_loop(0, n, swap, jnp.asarray(b))

    def fwd(k, x):
        lk = jnp.where(rows < k, lu[k], 0.0)
        return x.at[k].add(-jnp.dot(lk, x))

    x = lax.fori_loop(0, n, fwd, x)

    def bwd(i, x):
        k = n - 1 - i
        uk = jnp.where(rows > k, lu[k], 0.0)
        val = (x[k] - jnp.dot(uk, x)) / lu[k, k]
        return x.at[k].set(val)

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
