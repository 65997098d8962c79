"""Linear algebra for the implicit solvers (Radau, BDF).

Uses XLA's native LU (``jax.scipy.linalg.lu_factor``) which lowers to blocked
TPU programs and batches under vmap (MXU-tiled for the ensemble case) —
replacing the reference's hand-written Fortran-style decompositions
(reference src/matrix/lu.rs, linear.rs).

The complex system (alpha + i*beta)/h * M - J that Radau factors each step
(reference src/methods/radau.rs:376-417) is solved in an equivalent
**split-real 2n x 2n form** [[Ar, -Ai], [Ai, Ar]] — complex LU support varies
across TPU generations while real f32/f64 LU is universal, and for the small
systems typical of IVPs the 4x flops are negligible next to a robust,
portable lowering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lu_factor(a):
    """LU with partial pivoting. Returns ((lu, piv), singular_flag).

    The singularity test mirrors the reference's zero-pivot error
    (reference src/matrix/lu.rs:37-125): exact zero on the diagonal of U, or
    any non-finite entry (overflow during elimination).
    """
    lu, piv = jax.scipy.linalg.lu_factor(a)
    diag = jnp.diagonal(lu)
    singular = jnp.any(diag == 0.0) | ~jnp.all(jnp.isfinite(lu))
    return (lu, piv), singular


def lu_solve(lu_piv, b):
    return jax.scipy.linalg.lu_solve(lu_piv, b)


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
