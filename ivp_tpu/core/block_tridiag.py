"""Banded linear systems as block-tridiagonal cyclic reduction (CR).

TPU-native replacement for the reference's sequential banded LU
(reference src/matrix/base.rs:6-16 banded storage, index.rs:26-35
compact-diagonal indexing): a banded matrix with bandwidths (ml, mu) is
viewed as block-tridiagonal with block size b = max(ml, mu) and factored by
cyclic reduction — log2(m) *levels*, each a batch of dense b x b block
inverses and block products over all remaining blocks.  Sequential depth is
O(log n) instead of the O(n) column sweep of a banded LU, and every level is
a vectorized batch — what the TPU's vector units want.  Small dense blocks
reuse ``linalg.inv`` / ``linalg.inv_complex`` (closed-form adjugate with
pre-scaling for b <= 3, pivoted LU above).

**Uniform-shape scan formulation**: the block count is padded to M = 2^K
with decoupled identity blocks (D=I, L=U=0, rhs=0), which are invariant
under CR elimination, so every level operates on fixed (M/2, b, b) arrays
and the K levels run under ``lax.scan``.  An unrolled shrinking-shape CR
compiles to a graph whose LLVM time grows superlinearly (a factor + 6
solves took 134 s to compile on this runtime's XLA CPU); the scanned body
is traced once and compiles in seconds, while on TPU the padded level ops
are latency-bound at these sizes, so the extra flops are free.

Factor/solve split mirrors LU: ``btd_factor`` precomputes the per-level
eliminator products once per (re)factorization; ``btd_solve`` costs only
batched block matvecs down/up the log-depth ladder — cheap enough for
Radau/BDF Newton iterations.  Complex systems (Radau's E2) run the same
algorithm in split (re, im) pairs.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax, vmap

from .linalg import inv, inv_complex, matvec


# ---------------------------------------------------------------------------
# Block extraction
# ---------------------------------------------------------------------------

def band_of_pattern(pattern) -> Tuple[int, int]:
    """(ml, mu) bandwidths of a (dense or scipy-sparse) sparsity pattern."""
    if hasattr(pattern, "tocoo"):
        coo = pattern.tocoo()
        rows, cols = np.asarray(coo.row), np.asarray(coo.col)
    else:
        rows, cols = np.nonzero(np.asarray(pattern))
    if rows.size == 0:
        return 0, 0
    return int(np.max(rows - cols, initial=0)), int(np.max(cols - rows, initial=0))


def _num_blocks(n: int, b: int) -> int:
    return -(-n // b)


def _padded_m(m: int) -> int:
    """Block count padded to a power of two (>= 1)."""
    M = 1
    while M < m:
        M *= 2
    return M


def blocks_from_dense(a, b: int):
    """Split a dense (n, n) matrix into block-tridiagonal (D, L, U).

    D: (M, b, b) diagonal blocks, L/U: (M, b, b) sub/super block diagonals
    (L[0] = U[M-1] = 0), where M = 2^K >= ceil(n/b).  Rows/cols beyond n and
    blocks beyond ceil(n/b) are identity-diagonal decoupled padding.
    Entries of ``a`` outside the block-tridiagonal band are ignored (callers
    guarantee bandwidth <= b).
    """
    n = a.shape[-1]
    m = _num_blocks(n, b)
    M = _padded_m(m)
    N = M * b
    if N != n:
        a = jnp.eye(N, dtype=a.dtype).at[:n, :n].set(a)
    a4 = a.reshape(M, b, M, b).transpose(0, 2, 1, 3)  # (M, M, b, b)
    D = jnp.diagonal(a4, axis1=0, axis2=1).transpose(2, 0, 1)
    zero = jnp.zeros((1, b, b), a.dtype)
    if M > 1:
        Lm = jnp.diagonal(a4, offset=-1, axis1=0, axis2=1).transpose(2, 0, 1)
        Um = jnp.diagonal(a4, offset=1, axis1=0, axis2=1).transpose(2, 0, 1)
        L = jnp.concatenate([zero, Lm], axis=0)
        U = jnp.concatenate([Um, zero], axis=0)
    else:
        L = jnp.zeros((1, b, b), a.dtype)
        U = jnp.zeros((1, b, b), a.dtype)
    return D, L, U


def pad_rhs(v, b: int):
    """Pad a (n,) RHS with zeros to the (M, b) block layout."""
    n = v.shape[-1]
    N = _padded_m(_num_blocks(n, b)) * b
    if N != n:
        v = jnp.concatenate([v, jnp.zeros((N - n,), v.dtype)])
    return v.reshape(-1, b)


# ---------------------------------------------------------------------------
# Real CR
# ---------------------------------------------------------------------------

def _bmm(A, B):
    """Batched block matmul (m, b, b) @ (m, b, b) as mul+reduce (no tiny
    dot_general: docs/TPU_NOTES.md #13)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


# Batched block matvec (m, b, b) @ (m, b): linalg.matvec broadcasts over
# leading dims with the same mul+reduce idiom.
_bmv = matvec


class BTDFactor(NamedTuple):
    # Stacked per-level eliminator tensors, each (K, M/2, b, b).
    LDinv: jnp.ndarray
    UDinv: jnp.ndarray
    Dinv_odd: jnp.ndarray
    L_odd: jnp.ndarray
    U_odd: jnp.ndarray
    Dinv_top: jnp.ndarray  # (b, b)


def btd_factor(D, L, U):
    """Cyclic-reduction factorization of (M, b, b) block arrays (M = 2^K,
    identity-padded — see ``blocks_from_dense``).

    Returns (BTDFactor, singular_flag).
    """
    M, b = D.shape[0], D.shape[1]
    half = M // 2

    def level(carry, _):
        D, L, U, sing = carry
        De, Le, Ue = D[0::2], L[0::2], U[0::2]
        Do, Lo, Uo = D[1::2], L[1::2], U[1::2]
        Dinv_o, s = vmap(inv)(Do)
        sing = sing | jnp.any(s)

        zblk = jnp.zeros((1, b, b), D.dtype)
        Dinv_left = jnp.concatenate([zblk, Dinv_o[:half - 1]], axis=0)
        L_left = jnp.concatenate([zblk, Lo[:half - 1]], axis=0)
        U_left = jnp.concatenate([zblk, Uo[:half - 1]], axis=0)

        LDinv = _bmm(Le, Dinv_left)
        UDinv = _bmm(Ue, Dinv_o)
        D_new = De - _bmm(LDinv, U_left) - _bmm(UDinv, Lo)
        L_new = -_bmm(LDinv, L_left)
        U_new = -_bmm(UDinv, Uo)
        eye = jnp.broadcast_to(jnp.eye(b, dtype=D.dtype), (half, b, b))
        z = jnp.zeros((half, b, b), D.dtype)
        carry = (jnp.concatenate([D_new, eye]), jnp.concatenate([L_new, z]),
                 jnp.concatenate([U_new, z]), sing)
        return carry, (LDinv, UDinv, Dinv_o, Lo, Uo)

    sing0 = jnp.zeros((), bool)
    K = int(M).bit_length() - 1  # log2(M)
    if K:
        (D, L, U, sing), ys = lax.scan(level, (D, L, U, sing0), None, length=K)
        LDinv, UDinv, Dinv_o, Lo, Uo = ys
    else:
        sing = sing0
        e = jnp.zeros((0, half if half else 1, b, b), D.dtype)
        LDinv = UDinv = Dinv_o = Lo = Uo = e
    Dinv_top, s = inv(D[0])
    sing = sing | s
    return BTDFactor(LDinv=LDinv, UDinv=UDinv, Dinv_odd=Dinv_o,
                     L_odd=Lo, U_odd=Uo, Dinv_top=Dinv_top), sing


def btd_solve(fac: BTDFactor, rhs):
    """Solve given a CR factorization; ``rhs`` has shape (M, b) (padded)."""
    M, b = rhs.shape[0], rhs.shape[1]
    half = M // 2
    K = fac.LDinv.shape[0]

    def down(x, lev):
        LDinv, UDinv, _, _, _ = lev
        be, bo = x[0::2], x[1::2]
        zrow = jnp.zeros((1, b), x.dtype)
        b_left = jnp.concatenate([zrow, bo[:half - 1]], axis=0)
        x_new = be - _bmv(LDinv, b_left) - _bmv(UDinv, bo)
        return jnp.concatenate([x_new, jnp.zeros((half, b), x.dtype)]), bo

    def up(x, lev):
        _, _, Dinv_o, Lo, Uo, bo = lev
        xe = x[:half]
        zrow = jnp.zeros((1, b), x.dtype)
        x_right = jnp.concatenate([xe[1:], zrow], axis=0)
        xo = _bmv(Dinv_o, bo - _bmv(Lo, xe) - _bmv(Uo, x_right))
        return jnp.stack([xe, xo], axis=1).reshape(M, b), None

    levels = (fac.LDinv, fac.UDinv, fac.Dinv_odd, fac.L_odd, fac.U_odd)
    x = rhs
    if K:
        x, bos = lax.scan(down, x, levels)
    x = x.at[0].set(_bmv(fac.Dinv_top[None], x[0:1])[0])
    x = x.at[1:].set(0.0)
    if K:
        x, _ = lax.scan(up, x, levels + (bos,), reverse=True)
    return x


# ---------------------------------------------------------------------------
# Complex CR (split re/im pairs)
# ---------------------------------------------------------------------------

def _cbmm(A, B):
    Ar, Ai = A
    Br, Bi = B
    return _bmm(Ar, Br) - _bmm(Ai, Bi), _bmm(Ar, Bi) + _bmm(Ai, Br)


def _cbmv(A, x):
    Ar, Ai = A
    xr, xi = x
    return _bmv(Ar, xr) - _bmv(Ai, xi), _bmv(Ar, xi) + _bmv(Ai, xr)


def _csub(a, b):
    return a[0] - b[0], a[1] - b[1]


class BTDFactorC(NamedTuple):
    # Each entry is a (re, im) pair of (K, M/2, b, b) stacked tensors.
    LDinv: tuple
    UDinv: tuple
    Dinv_odd: tuple
    L_odd: tuple
    U_odd: tuple
    Dinv_top: tuple  # (re, im) pair of (b, b)


def _inv_c(ar, ai):
    (br, bi), s = inv_complex(ar, ai)
    return br, bi, s


def btd_factor_complex(D, L, U):
    """CR factorization of a complex block-tridiagonal system given as
    (re, im) pairs of identity-padded (M, b, b) block arrays.

    Note the identity padding only needs the *real* part to be identity
    (``blocks_from_dense`` on the imaginary part pads its diagonal with
    identity too, making phantom blocks I + iI — still invertible and
    decoupled, which is all CR needs).
    """
    M, b = D[0].shape[0], D[0].shape[1]
    half = M // 2

    def split(pair, s):
        return pair[0][s], pair[1][s]

    def level(carry, _):
        D, L, U, sing = carry
        De, Le, Ue = (split(D, np.s_[0::2]), split(L, np.s_[0::2]),
                      split(U, np.s_[0::2]))
        Do, Lo, Uo = (split(D, np.s_[1::2]), split(L, np.s_[1::2]),
                      split(U, np.s_[1::2]))
        dr, di, s = vmap(_inv_c)(Do[0], Do[1])
        Dinv_o = (dr, di)
        sing = sing | jnp.any(s)

        zblk = jnp.zeros((1, b, b), De[0].dtype)

        def shift(pair):
            return (jnp.concatenate([zblk, pair[0][:half - 1]], axis=0),
                    jnp.concatenate([zblk, pair[1][:half - 1]], axis=0))

        Dinv_left, L_left, U_left = shift(Dinv_o), shift(Lo), shift(Uo)

        LDinv = _cbmm(Le, Dinv_left)
        UDinv = _cbmm(Ue, Dinv_o)
        D_new = _csub(_csub(De, _cbmm(LDinv, U_left)), _cbmm(UDinv, Lo))
        L_new = _cbmm(LDinv, L_left)
        L_new = (-L_new[0], -L_new[1])
        U_new = _cbmm(UDinv, Uo)
        U_new = (-U_new[0], -U_new[1])

        eye = jnp.broadcast_to(jnp.eye(b, dtype=De[0].dtype), (half, b, b))
        z = jnp.zeros((half, b, b), De[0].dtype)

        def cat(pair, tr, ti):
            return (jnp.concatenate([pair[0], tr]),
                    jnp.concatenate([pair[1], ti]))

        carry = (cat(D_new, eye, z), cat(L_new, z, z), cat(U_new, z, z), sing)
        return carry, (LDinv, UDinv, Dinv_o, Lo, Uo)

    sing0 = jnp.zeros((), bool)
    K = int(M).bit_length() - 1
    if K:
        (D, L, U, sing), ys = lax.scan(level, (D, L, U, sing0), None, length=K)
        LDinv, UDinv, Dinv_o, Lo, Uo = ys
    else:
        sing = sing0
        e = jnp.zeros((0, half if half else 1, b, b), D[0].dtype)
        LDinv = UDinv = Dinv_o = Lo = Uo = (e, e)
    tr, ti, s = _inv_c(D[0][0], D[1][0])
    sing = sing | s
    return BTDFactorC(LDinv=LDinv, UDinv=UDinv, Dinv_odd=Dinv_o,
                      L_odd=Lo, U_odd=Uo, Dinv_top=(tr, ti)), sing


def btd_solve_complex(fac: BTDFactorC, rhs_r, rhs_i):
    """Solve the complex system; rhs parts have shape (M, b) (padded)."""
    M, b = rhs_r.shape[0], rhs_r.shape[1]
    half = M // 2
    K = fac.LDinv[0].shape[0]

    def down(x, lev):
        LDinv, UDinv = lev[0], lev[1]
        be = (x[0][0::2], x[1][0::2])
        bo = (x[0][1::2], x[1][1::2])
        zrow = jnp.zeros((1, b), x[0].dtype)
        b_left = (jnp.concatenate([zrow, bo[0][:half - 1]]),
                  jnp.concatenate([zrow, bo[1][:half - 1]]))
        xn = _csub(_csub(be, _cbmv(LDinv, b_left)), _cbmv(UDinv, bo))
        zpad = jnp.zeros((half, b), x[0].dtype)
        return ((jnp.concatenate([xn[0], zpad]),
                 jnp.concatenate([xn[1], zpad])), bo)

    def up(x, lev):
        Dinv_o, Lo, Uo, bo = lev[2], lev[3], lev[4], lev[5]
        xe = (x[0][:half], x[1][:half])
        zrow = jnp.zeros((1, b), x[0].dtype)
        x_right = (jnp.concatenate([xe[0][1:], zrow]),
                   jnp.concatenate([xe[1][1:], zrow]))
        resid = _csub(_csub(bo, _cbmv(Lo, xe)), _cbmv(Uo, x_right))
        xo = _cbmv(Dinv_o, resid)
        mr = jnp.stack([xe[0], xo[0]], axis=1).reshape(M, b)
        mi = jnp.stack([xe[1], xo[1]], axis=1).reshape(M, b)
        return (mr, mi), None

    levels = (fac.LDinv, fac.UDinv, fac.Dinv_odd, fac.L_odd, fac.U_odd)
    x = (rhs_r, rhs_i)
    if K:
        x, bos = lax.scan(down, x, levels)
    tr, ti = _cbmv((fac.Dinv_top[0][None], fac.Dinv_top[1][None]),
                   (x[0][0:1], x[1][0:1]))
    x = (x[0].at[0].set(tr[0]).at[1:].set(0.0),
         x[1].at[0].set(ti[0]).at[1:].set(0.0))
    if K:
        x, _ = lax.scan(up, x, levels + (bos,), reverse=True)
    return x
