"""ddify — automatic double-float lifting of plain-JAX functions.

The ``dtype="dd"`` tier (core/ddmath.py) runs the ODE hot loop in the
framework's own double-f32 arithmetic, 2-3x faster than the platform's f64
emulation on this TPU.  Its original contract required the user to hand-write
the RHS in DD operators (``ddmath.stack`` etc.).  :func:`ddify` removes that
requirement: it traces the user's *plain* f64 function to a jaxpr and
re-executes it with dd arithmetic, so ``dtype="dd"`` accepts the exact same
callable as every other dtype.

Interpretation rules:

* arithmetic (add/sub/mul/div/neg/integer_pow/sqrt) and comparisons run as
  native dd ops — multiplies by trace-time literals use the one-split
  ``mul_const`` fast path, dd comparisons are exact (hi, lo) lexicographic;
* structural ops (slice/squeeze/broadcast/concatenate/reshape/transpose/
  gather/...) apply to both words;
* ``select_n``/``max``/``min``/``abs`` select whole dd pairs (no re-rounding);
* small ``reduce_sum`` unrolls a renormalized dd add chain;
* anything else (transcendentals, ``dot_general``, scans, ...) falls back to
  an exact round-trip through the platform's emulated f64 — ``hi + lo`` is
  representable exactly in f64, so the fallback is always *correct*, merely
  at emulation speed for that op.  ``log``/``exp``/``sin``/... thereby work
  out of the box and cost no more than they would in a plain-f64 solve.

No counterpart exists in the reference (reference src/ is native-f64 Rust);
this is TPU-first design: the lifting exists precisely because the TPU's f64
is software-emulated (docs/BENCH.md roofline: 34.4x op amplification).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.extend import core as jex_core

from . import ddmath as ddm
from .ddmath import DD


def _is_dd(v) -> bool:
    return isinstance(v, DD)


def _as_dd(v) -> DD:
    """Coerce an interpreter value to DD (exact for f64/f32/ints/bools cast
    upstream; DD passes through)."""
    if isinstance(v, DD):
        return v
    a = jnp.asarray(v)
    if a.dtype == jnp.float32:
        return DD(a, jnp.zeros_like(a))
    return ddm.from_f64(a.astype(jnp.float64))


def _to_plain(v):
    """Inverse coercion for the f64 fallback: DD -> exact f64."""
    return ddm.to_f64(v) if isinstance(v, DD) else v


def _literal_float(v) -> float | None:
    """Python float of a scalar trace-time constant, else None."""
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, (np.ndarray, np.generic)) and np.ndim(v) == 0:
        return float(v)
    return None


# ---------------------------------------------------------------------------
# dd comparison/selection helpers (exact on normalized pairs)
# ---------------------------------------------------------------------------

def _dd_lt(x: DD, y: DD):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def _dd_le(x: DD, y: DD):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo <= y.lo))


def _dd_is_neg(x: DD):
    return (x.hi < 0) | ((x.hi == 0) & (x.lo < 0))


# ---------------------------------------------------------------------------
# Primitive rules.  Each takes (eqn, invals) with at least one DD inval and
# returns the output value(s).  Raising KeyError (no rule) => f64 fallback.
# ---------------------------------------------------------------------------

def _rule_add(eqn, a, b):
    return ddm.add(_as_dd(a), _as_dd(b))


def _rule_sub(eqn, a, b):
    return ddm.add(_as_dd(a), ddm.neg(_as_dd(b)))


def _rule_mul(eqn, a, b):
    ca, cb = _literal_float(a), _literal_float(b)
    if cb is not None:
        return ddm.mul_const(_as_dd(a), cb)
    if ca is not None:
        return ddm.mul_const(_as_dd(b), ca)
    return ddm.mul(_as_dd(a), _as_dd(b))


def _rule_div(eqn, a, b):
    cb = _literal_float(b)
    if cb is not None and cb != 0.0:
        # 1/cb carries one f64 rounding (~2^-53 relative) — below the dd
        # noise floor (~2^-48), and one split cheaper than a full dd divide.
        return ddm.mul_const(_as_dd(a), 1.0 / cb)
    return ddm.div(_as_dd(a), _as_dd(b))


def _rule_neg(eqn, a):
    return ddm.neg(_as_dd(a))


def _rule_integer_pow(eqn, a):
    k = int(eqn.params["y"])
    x = _as_dd(a)
    if k == 0:
        return _as_dd(jnp.ones(x.shape, jnp.float32))
    inv = k < 0
    k = abs(k)
    # square-and-multiply keeps the op count logarithmic
    r = None
    base = x
    while k:
        if k & 1:
            r = base if r is None else ddm.mul(r, base)
        k >>= 1
        if k:
            base = ddm.mul(base, base)
    if inv:
        r = ddm.div(_as_dd(jnp.ones(x.shape, jnp.float32)), r)
    return r


def _rule_sqrt(eqn, a):
    return ddm.sqrt(_as_dd(a))


def _rule_abs(eqn, a):
    x = _as_dd(a)
    return ddm.where(_dd_is_neg(x), ddm.neg(x), x)


def _rule_sign(eqn, a):
    # Output stays DD: every dd-rule output must be DD so downstream plain
    # ops (traced at f64) never see a stray f32 operand.
    x = _as_dd(a)
    s = jnp.where(x.hi != 0, jnp.sign(x.hi), jnp.sign(x.lo))
    return DD(s, jnp.zeros_like(s))


def _rule_max(eqn, a, b):
    x, y = _as_dd(a), _as_dd(b)
    return ddm.where(_dd_lt(x, y), y, x)


def _rule_min(eqn, a, b):
    x, y = _as_dd(a), _as_dd(b)
    return ddm.where(_dd_lt(y, x), y, x)


def _rule_select_n(eqn, pred, *cases):
    cases = [_as_dd(c) for c in cases]
    return DD(lax.select_n(pred, *[c.hi for c in cases]),
              lax.select_n(pred, *[c.lo for c in cases]))


def _cmp_rule(op):
    def rule(eqn, a, b):
        return op(_as_dd(a), _as_dd(b))
    return rule


def _rule_eq(eqn, a, b):
    x, y = _as_dd(a), _as_dd(b)
    return (x.hi == y.hi) & (x.lo == y.lo)


def _rule_ne(eqn, a, b):
    return ~_rule_eq(eqn, a, b)


def _structural_rule(eqn, *invals):
    """Apply a shape-only primitive to both words (operands coerced to DD)."""
    dds = [_as_dd(v) for v in invals]
    his = eqn.primitive.bind(*[d.hi for d in dds], **eqn.params)
    los = eqn.primitive.bind(*[d.lo for d in dds], **eqn.params)
    return DD(his, los)


def _indexed_structural_rule(eqn, operand, *indices):
    """Structural primitives whose trailing operands are integer indices
    (gather, dynamic_slice): only the leading operand splits into words."""
    x = _as_dd(operand)
    hi = eqn.primitive.bind(x.hi, *indices, **eqn.params)
    lo = eqn.primitive.bind(x.lo, *indices, **eqn.params)
    return DD(hi, lo)


def _rule_convert(eqn, a):
    x = _as_dd(a)
    tgt = jnp.dtype(eqn.params["new_dtype"])
    if tgt == jnp.float64:
        return x
    if tgt == jnp.float32:
        return x.hi  # round-to-nearest f32 of the dd value (normalized pair)
    return ddm.to_f64(x).astype(tgt)


_REDUCE_UNROLL_MAX = 128


def _rule_reduce_sum(eqn, a):
    x = _as_dd(a)
    axes = tuple(eqn.params["axes"])
    if len(axes) != 1 or x.shape[axes[0]] > _REDUCE_UNROLL_MAX:
        raise KeyError  # fall back to f64
    ax = axes[0]
    acc = None
    for i in range(x.shape[ax]):
        part = DD(lax.index_in_dim(x.hi, i, ax, keepdims=False),
                  lax.index_in_dim(x.lo, i, ax, keepdims=False))
        acc = part if acc is None else ddm.add(acc, part)
    return acc


def _identity_rule(eqn, a):
    return a


_DD_RULES: dict[str, Callable] = {
    "add": _rule_add,
    "sub": _rule_sub,
    "mul": _rule_mul,
    "div": _rule_div,
    "neg": _rule_neg,
    "integer_pow": _rule_integer_pow,
    "sqrt": _rule_sqrt,
    "abs": _rule_abs,
    "sign": _rule_sign,
    "max": _rule_max,
    "min": _rule_min,
    "select_n": _rule_select_n,
    "lt": _cmp_rule(_dd_lt),
    "le": _cmp_rule(_dd_le),
    "gt": _cmp_rule(lambda x, y: _dd_lt(y, x)),
    "ge": _cmp_rule(lambda x, y: _dd_le(y, x)),
    "eq": _rule_eq,
    "ne": _rule_ne,
    "convert_element_type": _rule_convert,
    "reduce_sum": _rule_reduce_sum,
    "copy": _identity_rule,
    "stop_gradient": _identity_rule,
    # shape-only ops: split into per-word applications
    "slice": _structural_rule,
    "squeeze": _structural_rule,
    "broadcast_in_dim": _structural_rule,
    "concatenate": _structural_rule,
    "reshape": _structural_rule,
    "transpose": _structural_rule,
    "rev": _structural_rule,
    "pad": _structural_rule,
    "expand_dims": _structural_rule,
    "gather": _indexed_structural_rule,
    "dynamic_slice": _indexed_structural_rule,
}


def _eval_jaxpr_dd(jaxpr: jex_core.Jaxpr, consts, *args):
    """Interpret ``jaxpr`` with a mix of plain arrays and DD values."""
    env: dict[Any, Any] = {}

    def read(v):
        if isinstance(v, jex_core.Literal):
            return v.val
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name == "pjit":
            # jnp functions frequently arrive pjit-wrapped: recurse so the
            # body still gets dd rules (binding it would force f64).
            sub = eqn.params["jaxpr"]
            out = _eval_jaxpr_dd(sub.jaxpr, sub.consts, *invals)
        elif any(_is_dd(v) for v in invals):
            rule = _DD_RULES.get(name)
            out = None
            if rule is not None:
                try:
                    out = rule(eqn, *invals)
                except KeyError:
                    out = None
            if out is None:
                # Universal fallback: exact round-trip through emulated f64.
                plain = [_to_plain(v) for v in invals]
                res = eqn.primitive.bind(*plain, **eqn.params)
                outs = res if eqn.primitive.multiple_results else [res]
                outs = [_as_dd(o) if jnp.issubdtype(jnp.asarray(o).dtype,
                                                    jnp.floating) else o
                        for o in outs]
                out = outs if eqn.primitive.multiple_results else outs[0]
        else:
            out = eqn.primitive.bind(*invals, **eqn.params)
        if eqn.primitive.multiple_results:
            outs_list = (list(out)
                         if isinstance(out, (list, tuple))
                         and not isinstance(out, DD) else [out])
            for v, o in zip(eqn.outvars, outs_list):
                write(v, o)
        else:
            write(eqn.outvars[0], out)

    return [read(v) for v in jaxpr.outvars]


def _spec_of(v):
    if isinstance(v, DD):
        return jax.ShapeDtypeStruct(v.shape, jnp.float64)
    a = jnp.asarray(v)
    dt = jnp.float64 if a.dtype == jnp.float32 else a.dtype
    return jax.ShapeDtypeStruct(a.shape, dt)


def ddify(fun: Callable) -> Callable:
    """Lift a plain-JAX function to dd arithmetic.

    ``ddify(f)(t, y, *args)`` accepts a :class:`DD` state ``y`` (plus plain
    scalars/arrays for ``t`` and ``args``), traces ``f`` as if everything
    were f64, and re-executes the trace with dd rules — the returned pytree
    has every floating leaf as DD.  Use it to run ``dtype="dd"`` ensembles
    with the exact same RHS callable as the f64 path::

        solve_ivp_ensemble(f, (0, 10), y0, dtype="dd")   # auto-lifts f

    (the batch builders call this automatically when the RHS does not
    natively return DD).
    """
    jaxpr_cache: dict[Any, Any] = {}

    def lifted(*args):
        specs = tuple(_spec_of(a) for a in args)
        key = tuple((s.shape, str(s.dtype)) for s in specs)
        cached = jaxpr_cache.get(key)
        if cached is None:
            cj, out_shape = jax.make_jaxpr(fun, return_shape=True)(*specs)
            out_tree = jax.tree_util.tree_structure(out_shape)
            cached = (cj, out_tree)
            jaxpr_cache[key] = cached
        cj, out_tree = cached
        outs = _eval_jaxpr_dd(cj.jaxpr, cj.consts, *args)
        outs = [_as_dd(o) if jnp.issubdtype(jnp.asarray(_to_plain(o)).dtype,
                                            jnp.floating) else o
                for o in outs]
        return jax.tree_util.tree_unflatten(out_tree, outs)

    lifted.__name__ = f"ddify({getattr(fun, '__name__', 'fn')})"
    return lifted


def auto_dd_rhs(fun: Callable) -> Callable:
    """RHS adapter for the batch builders: call ``fun`` natively if it
    already speaks DD, otherwise :func:`ddify` it (decided once at first
    trace).  The returned callable always produces a DD."""
    state = {"lifted": None, "native": None}

    def rhs(t, y, *args):
        if state["native"] is None:
            try:
                out = fun(t, y, *args)
                if isinstance(out, DD):
                    state["native"] = True
                    return out
            except Exception:
                pass
            state["native"] = False
            state["lifted"] = ddify(fun)
        if state["native"]:
            return fun(t, y, *args)
        if state["lifted"] is None:
            state["lifted"] = ddify(fun)
        out = state["lifted"](t, y, *args)
        if not isinstance(out, DD):
            out = _as_dd(out)
        return out

    return rhs
