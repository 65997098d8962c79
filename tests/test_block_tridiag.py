"""Tests for the block-tridiagonal cyclic-reduction solver
(core/block_tridiag.py) — the TPU-native banded backend replacing the
reference's sequential banded LU (reference src/matrix/base.rs:6-16,
index.rs:26-35).

All solver calls are jit-wrapped: this runtime's XLA CPU backend can
deadlock when very long eager op queues are materialized.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ivp_tpu.core.block_tridiag import (
    band_of_pattern, blocks_from_dense, btd_factor, btd_factor_complex,
    btd_solve, btd_solve_complex, pad_rhs)


def _banded(rng, n, bw, diag=6.0):
    a = np.diag(diag * np.ones(n))
    for off in range(-bw, bw + 1):
        a += np.diag(rng.standard_normal(n - abs(off)), off)
    return a


def _solve_real(a, rhs, b):
    n = a.shape[0]

    @jax.jit
    def run(am, r):
        fac, sing = btd_factor(*blocks_from_dense(am, b))
        return btd_solve(fac, pad_rhs(r, b)), sing

    x, sing = run(jnp.asarray(a), jnp.asarray(rhs))
    return np.asarray(x).reshape(-1)[:n], bool(sing)


@pytest.mark.parametrize("n,bw", [(7, 1), (16, 2), (9, 2), (13, 4),
                                  (50, 2), (400, 2), (33, 3)])
def test_real_banded_solve(n, bw):
    rng = np.random.default_rng(n + bw)
    a = _banded(rng, n, bw)
    rhs = rng.standard_normal(n)
    x, sing = _solve_real(a, rhs, max(bw, 1))
    assert not sing
    np.testing.assert_allclose(a @ x, rhs, atol=1e-10)


@pytest.mark.parametrize("n,bw", [(16, 2), (9, 2), (101, 3)])
def test_complex_banded_solve(n, bw):
    rng = np.random.default_rng(n)
    ar = _banded(rng, n, bw)
    ai = _banded(rng, n, bw, diag=0.5)
    b = max(bw, 1)
    rr = rng.standard_normal(n)
    ri = rng.standard_normal(n)

    @jax.jit
    def run(armat, aimat, r1, r2):
        Dr, Lr, Ur = blocks_from_dense(armat, b)
        Di, Li, Ui = blocks_from_dense(aimat, b)
        fac, sing = btd_factor_complex((Dr, Di), (Lr, Li), (Ur, Ui))
        (xr, xi) = btd_solve_complex(fac, pad_rhs(r1, b), pad_rhs(r2, b))
        return xr, xi, sing

    xr, xi, sing = run(jnp.asarray(ar), jnp.asarray(ai),
                       jnp.asarray(rr), jnp.asarray(ri))
    assert not bool(sing)
    z = np.asarray(xr).reshape(-1)[:n] + 1j * np.asarray(xi).reshape(-1)[:n]
    np.testing.assert_allclose((ar + 1j * ai) @ z, rr + 1j * ri, atol=1e-9)


def test_band_of_pattern():
    from scipy.sparse import coo_matrix
    pat = np.zeros((6, 6))
    pat[3, 1] = 1  # ml = 2
    pat[0, 1] = 1  # mu = 1
    np.fill_diagonal(pat, 1)
    assert band_of_pattern(pat) == (2, 1)
    assert band_of_pattern(coo_matrix(pat)) == (2, 1)


def test_singular_flag():
    n, b = 8, 2
    a = np.zeros((n, n))  # all-zero diagonal blocks are singular
    _, sing = _solve_real(a, np.ones(n), b)
    assert sing


def test_vmaps_over_batch():
    """CR batches under vmap (the ensemble path for banded stiff systems)."""
    rng = np.random.default_rng(0)
    B, n, bw = 4, 12, 2
    mats = np.stack([_banded(rng, n, bw) for _ in range(B)])
    rhs = rng.standard_normal((B, n))
    b = bw

    @jax.jit
    @jax.vmap
    def run(am, rm):
        fac, sing = btd_factor(*blocks_from_dense(am, b))
        return btd_solve(fac, pad_rhs(rm, b)).reshape(-1)[:n], sing

    x, sing = run(jnp.asarray(mats), jnp.asarray(rhs))
    assert not bool(np.any(np.asarray(sing)))
    for k in range(B):
        np.testing.assert_allclose(mats[k] @ np.asarray(x)[k], rhs[k],
                                   atol=1e-10)
