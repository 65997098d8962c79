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
# Beyond the threshold, substitutions run as lax.scan over pre-masked rows
# (O(n) per step) and the factorization as a fori_loop.
# The threshold is dtype-dependent (measured Radau attempt at B=4096, TPU
# v5e, docs/BENCH.md mid-size table): f32 bodies stay cheap when inlined
# (n=32 mixed-Newton attempt 20 ms unrolled vs 51 ms scanned) but lose by
# n=64 (37 vs 30 ms); emulated-f64 bodies bloat the op count quickly, so
# f64 keeps the smaller window (n=32 full-Newton: 75 ms scanned vs 108 ms
# unrolled).
UNROLL_N = 16        # f64 / default
UNROLL_N_F32 = 32    # f32 factorizations (mixed/dd Newton, f32 state)


def _unroll_n(dtype):
    return UNROLL_N_F32 if dtype == jnp.float32 else UNROLL_N


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

        # Post-swap column k and pivot row derive in O(n) from the pre-swap
        # extractions (same values — the swap only exchanged entries k,p),
        # saving two O(n^2) masked reductions per pivot step.
        ck = jnp.sum(jnp.where(is_k, colk, 0.0))
        cp = jnp.sum(jnp.where(is_p, colk, 0.0))
        colk2 = colk + fk * (cp - ck) + fp * (ck - cp)
        pivval = cp
        sing = sing | (pivval == 0.0) | ~jnp.isfinite(pivval)
        denom = jnp.where(pivval == 0.0, 1.0, pivval)

        factors = jnp.where(rows > k, colk2 / denom, 0.0)
        urow = jnp.where(p == k, rowk, rowp)  # pivot row after swap
        upper = jnp.where(rows[None, :] > k, urow[None, :], 0.0)
        lu = lu - factors[:, None] * upper
        # store multipliers in column k below the diagonal
        lu = jnp.where((rows[:, None] > k) & (rows[None, :] == k),
                       factors[:, None], lu)
        return lu, P, sing

    lu0 = jnp.asarray(a)
    P0 = jnp.eye(n, dtype=dtype)
    sing0 = jnp.zeros((), bool)
    if n <= _unroll_n(dtype):
        carry = (lu0, P0, sing0)
        for k in range(n):
            carry = body(k, carry)
        lu, P, sing = carry
    else:
        lu, P, sing = lax.fori_loop(0, n, body, (lu0, P0, sing0))
    return (lu, P), sing


def _strict_parts(lu):
    """(strictly-lower L, strictly-upper U, diag) of the packed LU — three
    O(n^2) masked selects hoisted OUT of the substitution recurrences."""
    n = lu.shape[-1]
    rows = jnp.arange(n)
    below = rows[:, None] > rows[None, :]
    eye = rows[:, None] == rows[None, :]
    L = jnp.where(below, lu, 0.0)
    U = jnp.where(below | eye, 0.0, lu)
    diag = jnp.sum(jnp.where(eye, lu, 0.0), axis=-1)
    return L, U, diag


def lu_solve(lu_piv, b):
    """Solve A x = b given ``lu_factor`` output (permutation matmul +
    scan-based forward/back substitution).

    For n > UNROLL_N the substitutions run as ``lax.scan`` over the
    pre-masked rows of L/U: the scan feeds row k to step k directly, so each
    step is O(n) work — versus the masked fori_loop form whose traced-k row
    extraction costs O(n^2) per step (the dominant mid-size stiff-ensemble
    cost before this change, docs/BENCH.md mid-size table)."""
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

    if n <= _unroll_n(dtype):
        for k in range(n):
            x = fwd(k, x)
        for i in range(n):
            x = bwd(i, x)
        return x

    L, U, diag = _strict_parts(lu)
    onehot = jnp.eye(n, dtype=dtype)

    def fwd_s(x, inp):
        lrow, ek = inp
        return x - ek * jnp.sum(lrow * x), None

    def bwd_s(x, inp):
        urow, ek, d = inp
        val = (jnp.sum(ek * x) - jnp.sum(urow * x)) / d
        return jnp.where(ek != 0.0, val, x), None

    x, _ = lax.scan(fwd_s, x, (L, onehot))
    x, _ = lax.scan(bwd_s, x, (U, onehot, diag), reverse=True)
    return x


def _lu_solve_cols(lu_piv, bcols):
    """Multi-RHS ``lu_solve``: solve A X = B for B of shape (n, k).

    Same masked substitutions as ``lu_solve`` broadcast over the column axis,
    so the sequential depth is identical to a single solve.
    """
    lu, P = lu_piv
    n = lu.shape[-1]
    rows = jnp.arange(n)
    dtype = lu.dtype

    x = jnp.sum(P[:, :, None] * jnp.asarray(bcols)[None, :, :], axis=1)

    def _row(m, mask):
        return jnp.sum(jnp.where(mask[:, None], m, 0.0), axis=0)

    def fwd(k, x):
        is_k = rows == k
        lk = jnp.where(rows < k, _row(lu, is_k), 0.0)
        return x - is_k.astype(dtype)[:, None] * jnp.sum(lk[:, None] * x, axis=0)[None, :]

    def bwd(i, x):
        k = n - 1 - i
        is_k = rows == k
        urow = _row(lu, is_k)
        uk = jnp.where(rows > k, urow, 0.0)
        diag = jnp.sum(jnp.where(is_k, urow, 0.0))
        val = (jnp.sum(jnp.where(is_k[:, None], x, 0.0), axis=0)
               - jnp.sum(uk[:, None] * x, axis=0)) / diag
        return jnp.where(is_k[:, None], val[None, :], x)

    if n <= _unroll_n(dtype):
        for k in range(n):
            x = fwd(k, x)
        for i in range(n):
            x = bwd(i, x)
        return x

    # lax.scan over pre-masked rows: O(n) per step (see lu_solve).
    L, U, diag = _strict_parts(lu)
    onehot = jnp.eye(n, dtype=dtype)

    def fwd_s(x, inp):
        lrow, ek = inp
        return x - ek[:, None] * jnp.sum(lrow[:, None] * x, axis=0)[None, :], None

    def bwd_s(x, inp):
        urow, ek, d = inp
        val = (jnp.sum(ek[:, None] * x, axis=0)
               - jnp.sum(urow[:, None] * x, axis=0)) / d
        return jnp.where((ek != 0.0)[:, None], val[None, :], x), None

    x, _ = lax.scan(fwd_s, x, (L, onehot))
    x, _ = lax.scan(bwd_s, x, (U, onehot, diag), reverse=True)
    return x


def matvec(a, x):
    """(n, n) @ (n,) as broadcast multiply + reduce.

    Tiny batched ``dot_general``s are pathologically slow under vmap on TPU
    (docs/TPU_NOTES.md #13); this form fuses into the surrounding elementwise
    program instead.
    """
    return jnp.sum(a * x[..., None, :], axis=-1)


# Size cutoff for the closed-form adjugate inverse.  Above it the inverse is
# built from the pivoted LU (one multi-RHS substitution pass).
_ADJUGATE_N = 3


def _prescale(*mats):
    """Global scale factor bringing matrix entries to O(1).

    The implicit solvers' iteration matrices have entries ~1/h, so adjugate
    cofactor/determinant products reach 1e19..1e38+.  This runtime's f64
    multiply breaks for products beyond the f32 range (~3.4e38): it returns
    NaN/inf (observed on both the CPU and TPU backends — docs/TPU_NOTES.md).
    Scaling to O(1) before forming products keeps everything in safe range
    and is better conditioned regardless.
    """
    s = jnp.asarray(0.0, mats[0].dtype)
    for m in mats:
        s = jnp.maximum(s, jnp.max(jnp.abs(m)))
    bad = (s == 0.0) | ~jnp.isfinite(s)
    return jnp.where(bad, 1.0, s), bad


def inv(a):
    """Explicit inverse with a singularity flag: ``(a_inv, singular)``.

    Purpose-built for the implicit solvers' ensembles: one inverse per
    (re)factorization turns every Newton-iteration linear solve into a fused
    elementwise matvec, replacing ~4n sequential masked substitution steps
    per solve (the dominant stiff-ensemble cost under vmap, where
    ``lax.cond``-gated reuse cannot skip work).  Closed-form adjugate for
    n <= 3 (on a matrix pre-scaled to O(1) entries, see ``_prescale``);
    partial-pivot LU + multi-RHS substitution above.
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    if n > _ADJUGATE_N:
        lu_piv, sing = lu_factor(a)
        return _lu_solve_cols(lu_piv, jnp.eye(n, dtype=a.dtype)), sing
    scale, bad = _prescale(a)
    a = a / scale
    if n == 1:
        det = a[0, 0]
        sing = bad | (det == 0.0) | ~jnp.isfinite(det)
        adj = jnp.full((1, 1), 1.0, a.dtype)
        d = jnp.where(sing, 1.0, det)
        return (adj / d) * (1.0 / scale), sing
    if n == 2:
        det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
        sing = bad | (det == 0.0) | ~jnp.isfinite(det)
        d = jnp.where(sing, 1.0, det)
        adj = jnp.stack([jnp.stack([a[1, 1], -a[0, 1]]),
                         jnp.stack([-a[1, 0], a[0, 0]])])
        return (adj / d) * (1.0 / scale), sing
    r0, r1, r2 = a[0], a[1], a[2]

    def cross(u, v):
        return jnp.stack([u[1] * v[2] - u[2] * v[1],
                          u[2] * v[0] - u[0] * v[2],
                          u[0] * v[1] - u[1] * v[0]])

    c12 = cross(r1, r2)
    det = jnp.sum(r0 * c12)
    sing = bad | (det == 0.0) | ~jnp.isfinite(det)
    d = jnp.where(sing, 1.0, det)
    # inverse columns are r1xr2, r2xr0, r0xr1 over det
    adj = jnp.stack([c12, cross(r2, r0), cross(r0, r1)], axis=1)
    return (adj / d) * (1.0 / scale), sing


def inv_complex(ar, ai):
    """Inverse of the complex matrix ``ar + i*ai`` as ``((br, bi), singular)``.

    Closed-form complex adjugate for n <= 3 (split re/im arithmetic — no
    complex dtype, which varies across TPU generations); otherwise the
    complex-pair LU (``lu_factor_cpair``: half the flops and half the
    sequential depth of the former split-real 2n embedding) solved
    multi-RHS against the identity.
    """
    ar = jnp.asarray(ar)
    ai = jnp.asarray(ai)
    n = ar.shape[-1]

    def cmul(x, y):
        return x[0] * y[0] - x[1] * y[1], x[0] * y[1] + x[1] * y[0]

    def cdiv_by(x, dr, di):
        mag = dr * dr + di * di
        return ((x[0] * dr + x[1] * di) / mag, (x[1] * dr - x[0] * di) / mag)

    if n <= _ADJUGATE_N:
        # Pre-scale to O(1) entries (see _prescale: products beyond the f32
        # range break on this runtime's f64, and |det|^2 would overflow it).
        scale, bad = _prescale(ar, ai)
        ar = ar / scale
        ai = ai / scale
        rescale = 1.0 / scale
        if n == 1:
            dr, di = ar[0, 0], ai[0, 0]
        elif n == 2:
            m0 = cmul((ar[0, 0], ai[0, 0]), (ar[1, 1], ai[1, 1]))
            m1 = cmul((ar[0, 1], ai[0, 1]), (ar[1, 0], ai[1, 0]))
            dr, di = m0[0] - m1[0], m0[1] - m1[1]
        else:
            def cross_c(u, v):
                out_r, out_i = [], []
                for (p, q) in ((1, 2), (2, 0), (0, 1)):
                    a_ = cmul((u[0][p], u[1][p]), (v[0][q], v[1][q]))
                    b_ = cmul((u[0][q], u[1][q]), (v[0][p], v[1][p]))
                    out_r.append(a_[0] - b_[0])
                    out_i.append(a_[1] - b_[1])
                return jnp.stack(out_r), jnp.stack(out_i)

            rows = [(ar[k], ai[k]) for k in range(3)]
            c12 = cross_c(rows[1], rows[2])
            pr, pi = cmul((rows[0][0][0], rows[0][1][0]), (c12[0][0], c12[1][0]))
            for k in (1, 2):
                qr, qi = cmul((rows[0][0][k], rows[0][1][k]),
                              (c12[0][k], c12[1][k]))
                pr, pi = pr + qr, pi + qi
            dr, di = pr, pi
        sing = bad | ((dr == 0.0) & (di == 0.0)) | ~jnp.isfinite(dr) | ~jnp.isfinite(di)
        dr = jnp.where(sing, 1.0, dr)
        di = jnp.where(sing, 0.0, di)
        if n == 1:
            br, bi = cdiv_by((jnp.ones_like(ar), jnp.zeros_like(ai)), dr, di)
            return (br * rescale, bi * rescale), sing
        if n == 2:
            adj_r = jnp.stack([jnp.stack([ar[1, 1], -ar[0, 1]]),
                               jnp.stack([-ar[1, 0], ar[0, 0]])])
            adj_i = jnp.stack([jnp.stack([ai[1, 1], -ai[0, 1]]),
                               jnp.stack([-ai[1, 0], ai[0, 0]])])
            br, bi = cdiv_by((adj_r, adj_i), dr, di)
            return (br * rescale, bi * rescale), sing
        c20 = cross_c(rows[2], rows[0])
        c01 = cross_c(rows[0], rows[1])
        adj_r = jnp.stack([c12[0], c20[0], c01[0]], axis=1)
        adj_i = jnp.stack([c12[1], c20[1], c01[1]], axis=1)
        br, bi = cdiv_by((adj_r, adj_i), dr, di)
        return (br * rescale, bi * rescale), sing

    lu_rep, sing = lu_factor_cpair(ar, ai)
    br, bi = _lu_solve_cols_cpair(lu_rep, jnp.eye(n, dtype=ar.dtype),
                                  jnp.zeros((n, n), ar.dtype))
    return (br, bi), sing


def solve_complex_inv(binv, br_, bi_):
    """Apply a complex inverse ``binv=(Br, Bi)`` to ``br_ + i*bi_``."""
    Br, Bi = binv
    return (matvec(Br, br_) - matvec(Bi, bi_),
            matvec(Bi, br_) + matvec(Br, bi_))


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


# =============================================================================
# Complex-pair LU (true complex factorization on (re, im) arrays)
# =============================================================================
#
# The split-real 2n x 2n embedding above costs 8/3 n^3 real multiplies and 2n
# sequential pivot steps.  Factoring the complex matrix directly on (re, im)
# pairs — the reference's approach, src/matrix/lu.rs:178-302 — costs 4/3 n^3
# real multiplies over n pivot steps: half the flops AND half the sequential
# depth, which is what dominates the per-attempt cost of mid-size Radau
# ensembles (docs/BENCH.md mid-size table).  Pivoting uses the |re| + |im|
# magnitude like the reference.

def lu_factor_cpair(ar, ai):
    """Complex partial-pivot LU on (re, im) pairs.

    Returns ((lur, lui, P), singular_flag) with L (unit diagonal, strictly
    below) and U packed like ``lu_factor``; P is the real permutation matrix.
    """
    n = ar.shape[-1]
    rows = jnp.arange(n)
    dtype = ar.dtype

    def _row(m, mask):
        return jnp.sum(jnp.where(mask[:, None], m, 0.0), axis=0)

    def _col(m, k):
        return jnp.sum(jnp.where(rows[None, :] == k, m, 0.0), axis=1)

    def body(k, carry):
        lur, lui, P, sing = carry
        colr0 = _col(lur, k)
        coli0 = _col(lui, k)
        mag = jnp.where(rows >= k, jnp.abs(colr0) + jnp.abs(coli0), -1.0)
        p = jnp.argmax(mag)

        is_k = rows == k
        is_p = rows == p
        fk = is_k.astype(dtype)
        fp = is_p.astype(dtype)

        def swap(m):
            rk = _row(m, is_k)
            rp = _row(m, is_p)
            return (m - fk[:, None] * (rk - rp)[None, :]
                      - fp[:, None] * (rp - rk)[None, :]), rk, rp

        lur, rk_r, rp_r = swap(lur)
        lui, rk_i, rp_i = swap(lui)
        P, _, _ = swap(P)

        # Post-swap column k / pivot row derive in O(n) from the pre-swap
        # extractions (cf. lu_factor): 4 fewer O(n^2) reductions per step.
        def _exch(col):
            ck = jnp.sum(jnp.where(is_k, col, 0.0))
            cp = jnp.sum(jnp.where(is_p, col, 0.0))
            return col + fk * (cp - ck) + fp * (ck - cp), cp

        colr, piv_r = _exch(colr0)
        coli, piv_i = _exch(coli0)
        pmag = jnp.abs(piv_r) + jnp.abs(piv_i)
        sing = sing | (pmag == 0.0) | ~jnp.isfinite(pmag)
        # complex reciprocal of the pivot (den guarded when singular)
        den = piv_r * piv_r + piv_i * piv_i
        den = jnp.where(den == 0.0, 1.0, den)
        inv_r = piv_r / den
        inv_i = -piv_i / den

        below = rows > k
        fr = jnp.where(below, colr, 0.0)
        fi = jnp.where(below, coli, 0.0)
        fac_r = fr * inv_r - fi * inv_i
        fac_i = fr * inv_i + fi * inv_r

        ur = jnp.where(p == k, rk_r, rp_r)
        ui = jnp.where(p == k, rk_i, rp_i)
        right = rows[None, :] > k
        ur_u = jnp.where(right, ur[None, :], 0.0)
        ui_u = jnp.where(right, ui[None, :], 0.0)
        # complex rank-1 update of the trailing block
        lur = lur - (fac_r[:, None] * ur_u - fac_i[:, None] * ui_u)
        lui = lui - (fac_r[:, None] * ui_u + fac_i[:, None] * ur_u)
        # store the complex multipliers in column k below the diagonal
        in_col = below[:, None] & (rows[None, :] == k)
        lur = jnp.where(in_col, fac_r[:, None], lur)
        lui = jnp.where(in_col, fac_i[:, None], lui)
        return lur, lui, P, sing

    carry = (jnp.asarray(ar), jnp.asarray(ai), jnp.eye(n, dtype=dtype),
             jnp.zeros((), bool))
    if n <= _unroll_n(dtype):
        for k in range(n):
            carry = body(k, carry)
    else:
        carry = lax.fori_loop(0, n, body, carry)
    lur, lui, P, sing = carry
    return (lur, lui, P), sing


def _lu_solve_cols_cpair(lu_rep, Br, Bi):
    """Multi-RHS complex-pair solve: A X = B for B of shape (n, m).

    The masked substitutions of ``lu_solve_cpair`` broadcast over the column
    axis — identical sequential depth to a single solve (cf.
    ``_lu_solve_cols`` for the real case); used to form explicit complex
    inverses (``inv_complex``) in one factorization + one n-deep sweep.
    """
    lur, lui, P = lu_rep
    n = lur.shape[-1]
    rows = jnp.arange(n)
    dtype = lur.dtype

    xr = jnp.sum(P[:, :, None] * jnp.asarray(Br)[None, :, :], axis=1)
    xi = jnp.sum(P[:, :, None] * jnp.asarray(Bi)[None, :, :], axis=1)

    def _row(m, mask):
        return jnp.sum(jnp.where(mask[:, None], m, 0.0), axis=0)

    def fwd(k, x):
        xr, xi = x
        is_k = rows == k
        left = rows < k
        lr = jnp.where(left, _row(lur, is_k), 0.0)[:, None]
        li = jnp.where(left, _row(lui, is_k), 0.0)[:, None]
        sr = jnp.sum(lr * xr - li * xi, axis=0)
        si = jnp.sum(lr * xi + li * xr, axis=0)
        f = is_k.astype(dtype)[:, None]
        return xr - f * sr[None, :], xi - f * si[None, :]

    def bwd(i, x):
        xr, xi = x
        k = n - 1 - i
        is_k = rows == k
        ur = _row(lur, is_k)
        ui = _row(lui, is_k)
        right = rows > k
        ukr = jnp.where(right, ur, 0.0)[:, None]
        uki = jnp.where(right, ui, 0.0)[:, None]
        rr = (jnp.sum(jnp.where(is_k[:, None], xr, 0.0), axis=0)
              - jnp.sum(ukr * xr - uki * xi, axis=0))
        ri = (jnp.sum(jnp.where(is_k[:, None], xi, 0.0), axis=0)
              - jnp.sum(ukr * xi + uki * xr, axis=0))
        dr = jnp.sum(jnp.where(is_k, ur, 0.0))
        di = jnp.sum(jnp.where(is_k, ui, 0.0))
        den = dr * dr + di * di
        den = jnp.where(den == 0.0, 1.0, den)
        vr = (rr * dr + ri * di) / den
        vi = (ri * dr - rr * di) / den
        mask = is_k[:, None]
        return (jnp.where(mask, vr[None, :], xr),
                jnp.where(mask, vi[None, :], xi))

    x = (xr, xi)
    if n <= _unroll_n(dtype):
        for k in range(n):
            x = fwd(k, x)
        for i in range(n):
            x = bwd(i, x)
        return x

    # lax.scan over pre-masked rows: O(n) per step (see lu_solve).
    Lr, Ur, dr_ = _strict_parts(lur)
    Li, Ui, di_ = _strict_parts(lui)
    onehot = jnp.eye(n, dtype=dtype)
    den_ = dr_ * dr_ + di_ * di_
    den_ = jnp.where(den_ == 0.0, 1.0, den_)

    def fwd_s(x, inp):
        xr, xi = x
        lr, li, ek = inp
        sr = jnp.sum(lr[:, None] * xr - li[:, None] * xi, axis=0)
        si = jnp.sum(lr[:, None] * xi + li[:, None] * xr, axis=0)
        f = ek[:, None]
        return (xr - f * sr[None, :], xi - f * si[None, :]), None

    def bwd_s(x, inp):
        xr, xi = x
        ur, ui, ek, dr, di, den = inp
        rr = (jnp.sum(ek[:, None] * xr, axis=0)
              - jnp.sum(ur[:, None] * xr - ui[:, None] * xi, axis=0))
        ri = (jnp.sum(ek[:, None] * xi, axis=0)
              - jnp.sum(ur[:, None] * xi + ui[:, None] * xr, axis=0))
        vr = (rr * dr + ri * di) / den
        vi = (ri * dr - rr * di) / den
        m = (ek != 0.0)[:, None]
        return (jnp.where(m, vr[None, :], xr),
                jnp.where(m, vi[None, :], xi)), None

    x, _ = lax.scan(fwd_s, x, (Lr, Li, onehot))
    x, _ = lax.scan(bwd_s, x, (Ur, Ui, onehot, dr_, di_, den_),
                    reverse=True)
    return x


def lu_solve_cpair(lu_rep, br, bi):
    """Solve (ar + i*ai)(xr + i*xi) = br + i*bi from ``lu_factor_cpair``."""
    lur, lui, P = lu_rep
    n = lur.shape[-1]
    rows = jnp.arange(n)
    dtype = lur.dtype

    xr = jnp.sum(P * jnp.asarray(br)[None, :], axis=1)
    xi = jnp.sum(P * jnp.asarray(bi)[None, :], axis=1)

    def _row(m, mask):
        return jnp.sum(jnp.where(mask[:, None], m, 0.0), axis=0)

    def fwd(k, x):
        xr, xi = x
        is_k = rows == k
        left = rows < k
        lr = jnp.where(left, _row(lur, is_k), 0.0)
        li = jnp.where(left, _row(lui, is_k), 0.0)
        sr = jnp.sum(lr * xr - li * xi)
        si = jnp.sum(lr * xi + li * xr)
        f = is_k.astype(dtype)
        return xr - f * sr, xi - f * si

    def bwd(i, x):
        xr, xi = x
        k = n - 1 - i
        is_k = rows == k
        ur = _row(lur, is_k)
        ui = _row(lui, is_k)
        right = rows > k
        ukr = jnp.where(right, ur, 0.0)
        uki = jnp.where(right, ui, 0.0)
        rr = jnp.sum(jnp.where(is_k, xr, 0.0)) - jnp.sum(ukr * xr - uki * xi)
        ri = jnp.sum(jnp.where(is_k, xi, 0.0)) - jnp.sum(ukr * xi + uki * xr)
        dr = jnp.sum(jnp.where(is_k, ur, 0.0))
        di = jnp.sum(jnp.where(is_k, ui, 0.0))
        den = dr * dr + di * di
        den = jnp.where(den == 0.0, 1.0, den)
        vr = (rr * dr + ri * di) / den
        vi = (ri * dr - rr * di) / den
        return (jnp.where(is_k, vr, xr), jnp.where(is_k, vi, xi))

    x = (xr, xi)
    if n <= _unroll_n(dtype):
        for k in range(n):
            x = fwd(k, x)
        for i in range(n):
            x = bwd(i, x)
        return x

    # lax.scan over pre-masked rows: O(n) per step (see lu_solve).
    Lr, Ur, dr_ = _strict_parts(lur)
    Li, Ui, di_ = _strict_parts(lui)
    onehot = jnp.eye(n, dtype=dtype)
    den_ = dr_ * dr_ + di_ * di_
    den_ = jnp.where(den_ == 0.0, 1.0, den_)

    def fwd_s(x, inp):
        xr, xi = x
        lr, li, ek = inp
        sr = jnp.sum(lr * xr - li * xi)
        si = jnp.sum(lr * xi + li * xr)
        return (xr - ek * sr, xi - ek * si), None

    def bwd_s(x, inp):
        xr, xi = x
        ur, ui, ek, dr, di, den = inp
        rr = jnp.sum(ek * xr) - jnp.sum(ur * xr - ui * xi)
        ri = jnp.sum(ek * xi) - jnp.sum(ur * xi + ui * xr)
        vr = (rr * dr + ri * di) / den
        vi = (ri * dr - rr * di) / den
        m = ek != 0.0
        return (jnp.where(m, vr, xr), jnp.where(m, vi, xi)), None

    x, _ = lax.scan(fwd_s, x, (Lr, Li, onehot))
    x, _ = lax.scan(bwd_s, x, (Ur, Ui, onehot, dr_, di_, den_),
                    reverse=True)
    return x
