"""Double-float ("dd") arithmetic: f64-class precision from f32 pairs.

This TPU has no native f64: XLA emulates it as a double-float (two f32s)
with full special-case handling — the optimized HLO of one ERK attempt shows
~34x instruction amplification, over a third of it `is-finite`/bitmask
special-case plumbing and accurate-renormalization chains (docs/BENCH.md
roofline; docs/TPU_NOTES.md #14/#17 document the emulation's f32-range
limit, which confirms the representation).

This module is the framework's own double-float arithmetic, tuned for the
ODE hot loop where the special cases cannot occur (state arithmetic on
finite, well-scaled values) and where sloppy renormalization is sufficient
(~2^-48 relative error per op, accumulated global rounding ~1e-12 over
thousands of steps — far below integration tolerances):

* TwoSum/QuickTwoSum (Knuth/Dekker, branch-free) with single-pass
  renormalization — ~11 f32 ops per add vs the emulation's ~25+.
* TwoProd via Dekker splitting (the VPU exposes no single-rounding FMA
  through XLA) with second-order cross terms dropped — ~21 ops per multiply.
* No NaN/inf/signed-zero handling: integrator state that goes non-finite is
  caught by the driver's error-norm checks, exactly as in the f32 path.

The resulting ``dtype="dd"`` ensembles run the *state* arithmetic here while
step control, error norms and the stiffness classifier run in plain f32 off
the hi words (the same proven design as ``controller_precision="float32"``),
and the time axis stays in platform f64 (exact t accumulation).

``DD`` is a NamedTuple pytree, so it vmaps/jits/checkpoints like any array.

Two compiler hazards are handled here (both verified empirically;
docs/TPU_NOTES.md #20-22):

* XLA's algebraic simplifier rewrites ``(a + b) - a -> b`` for ANY
  operands (constants or runtime values) — float-invalid, and it zeroes
  TwoSum's error word.  The ``optimization_barrier`` calls in
  :func:`_two_sum`/:func:`_quick_two_sum`/:func:`_split` block it.
  Barriers are NOT free on TPU (they block fusion, measured ~15% in the
  hot loop), so they sit exactly where an algebraic identity must be
  broken and nowhere else — :func:`_prod_residue` has no such shape and
  is deliberately unbarriered (+27% measured, bit-identical results).
* On the **CPU** backend only, LLVM contracts mul/add chains into FMAs
  *inside fused kernels* (below HLO — barrier-invariant), which perturbs
  Dekker splits at the ~2^-31 level per step.  On TPU, jitted and eager
  execution agree bit-for-bit (verified), so the production path has full
  ~2^-48 semantics; CPU-run tests see a slightly elevated dd noise floor
  (~1e-7 after 1e4 steps) and tolerance assertions account for it.  The
  same contraction is why solution-bearing dot accumulations chain
  renormalized adds off-TPU (methods/dd_erk.py::_exact_state).

No counterpart exists in the reference (reference src/ is CPU Rust with
native f64); this is TPU-first design per the hardware guide.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax


_SPLIT = np.float32(4097.0)  # 2^12 + 1: Dekker split constant for f32


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, branch-free).

    The barriers pin the rounded sum s.  XLA's algebraic simplifier rewrites
    ``(a + b) - a -> b`` for ANY operands (not just constants — verified:
    a tracer-aware variant that dropped barriers for runtime-runtime sums
    degraded the DOP853 dd final state from 4e-11 to 5e-7 vs the f64 engine
    at rtol 1e-9, while step counts stayed plausible).  The rewrite is valid
    for reals and zeroes exactly the error word this function exists to
    compute, so every TwoSum keeps its barriers; the measured ~15% fusion
    cost on TPU is the price of a correct low word.
    """
    s = lax.optimization_barrier(a + b)
    v = lax.optimization_barrier(s - a)
    e = (a - (s - v)) + (b - v)
    return s, e


def _quick_two_sum(a, b):
    """Dekker FastTwoSum (requires |a| >= |b| for exactness; used for
    renormalization where the invariant holds to rounding).  Barriers: see
    :func:`_two_sum`."""
    s = lax.optimization_barrier(a + b)
    e = b - lax.optimization_barrier(s - a)
    return s, e


def _split(a):
    # The barrier pins the *rounded* product t: the backend otherwise
    # contracts (t - a) into fma(SPLIT, a, -a) — exact, which is precisely
    # what Dekker's split must NOT be (measured: the low words degrade from
    # 2^-48 to ~2^-35 and DOP853's deep error-sum cancellation collapses).
    t = lax.optimization_barrier(_SPLIT * a)
    w = lax.optimization_barrier(t - a)
    hi = t - w
    return hi, a - hi


def _two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (no FMA on the VPU path)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


class DD(NamedTuple):
    """A double-float number/array: value = hi + lo, |lo| <= ulp(hi)/2.

    Arithmetic operators accept DD, plain f32 arrays and Python scalars
    (scalars are split to dd constants at trace time).  Tuple's sequence
    semantics (`+` concat, `*` repeat) are overridden.
    """

    hi: Any
    lo: Any

    # ---- pytree-friendly metadata -------------------------------------
    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def __getitem__(self, idx):
        # NamedTuple's int-indexing is shadowed on purpose: dd[0] slices the
        # number array, use .hi/.lo for the fields.
        return DD(self.hi[idx], self.lo[idx])

    def astype(self, dtype):
        if dtype == self.hi.dtype:
            return self
        return to_f64(self).astype(dtype)

    def reshape(self, *shape):
        return DD(self.hi.reshape(*shape), self.lo.reshape(*shape))

    # ---- arithmetic ---------------------------------------------------
    def __add__(self, other):
        return add(self, _coerce(other))

    __radd__ = __add__

    def __sub__(self, other):
        return add(self, neg(_coerce(other)))

    def __rsub__(self, other):
        return add(_coerce(other), neg(self))

    def __mul__(self, other):
        if isinstance(other, (int, float, np.floating, np.integer)):
            return mul_const(self, float(other))
        return mul(self, _coerce(other))

    __rmul__ = __mul__

    def __neg__(self):
        return DD(-self.hi, -self.lo)

    def __truediv__(self, other):
        return div(self, _coerce(other))

    def __rtruediv__(self, other):
        return div(_coerce(other), self)

    def __pow__(self, k):
        if not isinstance(k, int) or k < 1:
            raise TypeError("DD ** only supports positive integer powers")
        r = self
        for _ in range(k - 1):
            r = mul(r, self)
        return r


def _coerce(v) -> DD:
    if isinstance(v, DD):
        return v
    if isinstance(v, (int, float, np.floating, np.integer)):
        return const(float(v))
    a = jnp.asarray(v)
    if a.dtype == jnp.float32:
        return DD(a, jnp.zeros_like(a))
    return from_f64(a)


def const(x: float) -> DD:
    """Split a Python float into an exact dd constant (trace-time)."""
    hi = np.float32(x)
    lo = np.float32(x - float(hi))
    return DD(jnp.float32(hi), jnp.float32(lo))


def from_f64(x) -> DD:
    """Split an f64 (or any) array into a dd pair."""
    x = jnp.asarray(x)
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DD(hi, lo)


def from_f32(x) -> DD:
    x = jnp.asarray(x, jnp.float32)
    return DD(x, jnp.zeros_like(x))


def to_f64(x: DD):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def add(x: DD, y: DD) -> DD:
    """Sloppy dd addition (Dekker add2): ~2^-48 relative error."""
    s, e = _two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DD(*_quick_two_sum(s, e))


def neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def mul(x: DD, y: DD, renorm: bool = True) -> DD:
    """dd multiply; second-order (lo*lo) term dropped (~2^-48 relative).

    ``renorm=False`` skips the final renormalization: every Dekker formula
    here is exact for *unnormalized* pairs too (two_prod splits the hi word
    exactly whatever the lo bound; cross terms use lo verbatim), so a
    product feeding straight into another dd add/mul can stay unnormalized
    — the consumer's renormalization absorbs it.  The only cost is a
    slightly larger dropped x.lo*y.lo-class term (still ~2^-45-level).
    Keep the default for values whose .hi is consumed alone (error
    estimators) or stored in carries."""
    p, e = _two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    if not renorm:
        return DD(p, e)
    return DD(*_quick_two_sum(p, e))


def presplit(y: DD):
    """Precompute the Dekker split of ``y.hi`` for reuse across several
    multiplies — e.g. the per-attempt step size that feeds every stage
    chain (6 multiplies share one barrier-pinned split instead of paying
    one each)."""
    yh, yl = _split(y.hi)
    return (y, yh, yl)


def mul_presplit(x: DD, ys, renorm: bool = True) -> DD:
    """dd multiply where the right operand comes pre-split
    (:func:`presplit`); semantics identical to :func:`mul`."""
    y, yh, yl = ys
    p = x.hi * y.hi
    xh, xl = _split(x.hi)
    e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    e = e + (x.hi * y.lo + x.lo * y.hi)
    if not renorm:
        return DD(p, e)
    return DD(*_quick_two_sum(p, e))


def mul_pot(x: DD, s) -> DD:
    """Multiply by an exact power of two (error-free: both words scale)."""
    return DD(x.hi * s, x.lo * s)


def mul_f32(x: DD, s) -> DD:
    """Multiply by a plain-f32 scalar/array (no low word: e.g. an f32 step
    size) — one split cheaper than a general dd multiply."""
    p, e = _two_prod(x.hi, s)
    e = e + x.lo * s
    return DD(*_quick_two_sum(p, e))


def div(x: DD, y: DD) -> DD:
    """dd division via reciprocal refinement (one Newton step on f32 seed)."""
    # q1 ~ f32 quotient; r = x - q1*y in dd; q2 = r.hi / y.hi correction.
    q1 = x.hi / y.hi
    r = add(x, neg(mul(from_f32(q1), y)))
    q2 = (r.hi + r.lo) / y.hi
    return DD(*_quick_two_sum(q1, q2))


def sqrt(x: DD) -> DD:
    """dd sqrt via one Newton/Heron refinement of the f32 seed."""
    s = jnp.sqrt(x.hi)
    # e = (x - s*s) / (2s), computed with an exact square of the seed.
    p, pe = _two_prod(s, s)
    d = add(x, DD(-p, -pe))
    e = (d.hi + d.lo) / (2.0 * s)
    return DD(*_quick_two_sum(s, e))


def where(pred, x: DD, y: DD) -> DD:
    return DD(jnp.where(pred, x.hi, y.hi), jnp.where(pred, x.lo, y.lo))


def stack(parts, axis=0) -> DD:
    parts = [_coerce(p) for p in parts]
    return DD(jnp.stack([p.hi for p in parts], axis=axis),
              jnp.stack([p.lo for p in parts], axis=axis))


def concatenate(parts, axis=0) -> DD:
    parts = [_coerce(p) for p in parts]
    return DD(jnp.concatenate([p.hi for p in parts], axis=axis),
              jnp.concatenate([p.lo for p in parts], axis=axis))


def zeros(shape, like: DD | None = None) -> DD:
    return DD(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


def _const_parts(c: float):
    """Trace-time Dekker decomposition of a Python-float coefficient:
    the dd words (hi, lo) of ``c`` plus the split halves (ch, cl) of ``hi``
    — all exact f32 constants computed with numpy's round-to-nearest f32
    arithmetic (bit-identical to the device's), so the runtime pays no
    split (and no barrier) for the constant side of a multiply."""
    hi = np.float32(c)
    lo = np.float32(c - float(hi))
    t = np.float32(_SPLIT * hi)
    ch = np.float32(t - np.float32(t - hi))
    cl = np.float32(hi - ch)
    return hi, lo, ch, cl


def _prod_residue(k: DD, hi, lo, ch, cl, p):
    """Exact residue of ``p = k.hi * hi`` plus the dd cross terms, for a
    constant whose split halves (ch, cl) are trace-time values.

    Deliberately *unbarriered*: an A/B on the v5e measured the
    barrier-pinned form at 188.6k vs 260.6k IVPs/s (-28%, barriers block
    fusion and force HBM materialization) with bit-identical step counts
    including DOP853 at rtol 1e-9 — XLA's simplifier does not refactor
    this shape in practice (the split itself stays pinned inside
    :func:`_split`, which IS measured-necessary)."""
    xh, xl = _split(k.hi)
    e = ((xh * ch - p) + xh * cl + xl * ch) + xl * cl
    if lo == 0.0:
        return e + k.lo * hi
    return e + (k.hi * lo + k.lo * hi)


def mul_const(x: DD, c: float) -> DD:
    """x * c for a trace-time Python-float ``c``: one runtime split
    (of ``x.hi``) instead of the general multiply's two."""
    hi, lo, ch, cl = _const_parts(c)
    p = x.hi * hi
    e = _prod_residue(x, hi, lo, ch, cl, p)
    return DD(*_quick_two_sum(p, e))


def _const_parts_arr(c):
    """Vectorized :func:`_const_parts`: trace-time Dekker decomposition of a
    numpy coefficient ARRAY (numpy's round-to-nearest f32 matches the
    device's, so hi/lo/ch/cl are exact f32 constants)."""
    c = np.asarray(c, np.float64)
    hi = c.astype(np.float32)
    lo = (c - hi.astype(np.float64)).astype(np.float32)
    t = (_SPLIT * hi).astype(np.float32)
    ch = (t - (t - hi).astype(np.float32)).astype(np.float32)
    cl = (hi - ch).astype(np.float32)
    return hi, lo, ch, cl


def mul_const_arr(x: DD, c, renorm: bool = True) -> DD:
    """Elementwise/broadcast x * c for a trace-time numpy array ``c`` — the
    vectorized :func:`mul_const` (one runtime split, of ``x.hi``; the
    constant side splits at trace time).  One call replaces a Python loop
    of per-row ``mul_const``s: same flops, but a constant number of HLO ops
    (and barriers) regardless of the row count — the dd op-count lever the
    roofline prescribes (docs/BENCH.md)."""
    hi, lo, ch, cl = _const_parts_arr(c)
    hi_c, lo_c = jnp.asarray(hi), jnp.asarray(lo)
    ch_c, cl_c = jnp.asarray(ch), jnp.asarray(cl)
    p = x.hi * hi_c
    xh, xl = _split(x.hi)
    e = ((xh * ch_c - p) + xh * cl_c + xl * ch_c) + xl * cl_c
    if np.any(lo != 0.0):
        e = e + (x.hi * lo_c + x.lo * hi_c)
    else:
        e = e + x.lo * hi_c
    if not renorm:
        return DD(p, e)
    return DD(*_quick_two_sum(p, e))


def sum0(x: DD) -> DD:
    """dd sum over the leading axis by pairwise (log-depth) reduction:
    3 dd adds collapse 8 rows (vs 7 chained), and every add is one
    vectorized HLO group instead of a Python-unrolled per-row chain.
    Pairwise dd summation is also at least as accurate as sequential
    chaining (error grows O(log m) vs O(m))."""
    m = x.shape[0]
    while m > 1:
        half = m // 2
        even = DD(x.hi[0:2 * half:2], x.lo[0:2 * half:2])
        odd = DD(x.hi[1:2 * half:2], x.lo[1:2 * half:2])
        s = add(even, odd)
        if m % 2:
            s = DD(jnp.concatenate([s.hi, x.hi[m - 1:m]], axis=0),
                   jnp.concatenate([s.lo, x.lo[m - 1:m]], axis=0))
        x = s
        m = x.shape[0]
    return DD(x.hi[0], x.lo[0])


def dot_const(coeffs, ks, exact: bool = False, renorm: bool = True) -> DD:
    """Sum_i c_i * k_i with dd accuracy: Python-float coefficients are split
    to dd constants at trace time; exact zeros are skipped (Butcher tableaus
    are sparse).  ``coeffs`` is {stage_index: weight} or a dense sequence —
    the dd counterpart of methods/base.py::dotk.

    Default: fused dot accumulation (classic double-double ddot) — the
    products' hi words ride an exact TwoSum chain while every residue
    (TwoProd errors, cross terms, TwoSum errors) accumulates in plain f32,
    with one renormalization at the end instead of one dd add per term
    (fewer HLO ops than mul+add chaining; +6-9% on the DOPRI5 ensemble,
    measured A/B on a v5e).  The f32 residue stream carries accumulated
    rounding at the ~2^-45|k| level — fine for stage sums (y + h*sum a_ik,
    no cancellation) but measurably above the error-estimator floor of a
    deeply cancelling sum at tight tolerances.

    ``exact=True``: per-term renormalized mul+add chaining (every partial
    sum is a normalized dd pair, so a final cancellation is captured
    exactly by the TwoSum in the add).  Use for cancellation-critical sums:
    the E-weighted error vectors and the solution-bearing B-sums feeding
    an 8(5,3)-style error subtraction (measured: the fused form's residue
    floor reject-storms DOP853 at rtol <= 1e-9 on CPU).

    ``renorm=False`` (fused mode only) returns the raw (hi-chain, residue)
    pair without the final renormalization — valid when the result feeds
    straight into another dd op (see :func:`mul`); never use it for a
    value whose .hi is consumed alone."""
    if isinstance(coeffs, dict):
        items = coeffs.items()
    else:
        items = ((i, c) for i, c in enumerate(coeffs))
    if exact:
        acc = None
        for i, c in items:
            c = float(c)
            if c == 0.0:
                continue
            term = mul_const(ks[i], c)
            acc = term if acc is None else add(acc, term)
        if acc is None:
            return zeros(ks[0].shape)
        return acc
    s = None
    err = None
    for i, c in items:
        c = float(c)
        if c == 0.0:
            continue
        k = ks[i]
        hi, lo, ch, cl = _const_parts(c)
        p = k.hi * hi
        e = _prod_residue(k, hi, lo, ch, cl, p)
        if s is None:
            s, err = p, e
        else:
            s, e2 = _two_sum(s, p)
            err = err + (e2 + e)
    if s is None:
        return zeros(ks[0].shape)
    if not renorm:
        return DD(s, err)
    return DD(*_quick_two_sum(s, err))


