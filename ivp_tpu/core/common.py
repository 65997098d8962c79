"""Shared numerical utilities for the step engines.

Pure JAX functions designed to be traced inside ``lax.while_loop`` bodies and
to vmap cleanly over ensemble axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

UROUND = 2.3e-16  # machine rounding unit used by the controllers (f64)


def safe_pow(x, p):
    """x**p robust to non-finite bases.

    TPU's emulated f64 pow returns NaN for inf**p (IEEE: 0 for p<0, inf for
    p>0), which poisons branchless step controllers (e.g. the BDF order
    adaptation takes inf**(-1/order) at the order-1 boundary).  NaN bases stay
    NaN.
    """
    finite = jnp.isfinite(x)
    r = jnp.where(finite, x, 1.0) ** p
    inf_val = jnp.where(jnp.asarray(p) > 0, jnp.inf, 0.0)
    r = jnp.where(jnp.isinf(x) & (x > 0), inf_val, r)
    r = jnp.where(jnp.isnan(x) | (jnp.isinf(x) & (x < 0)), jnp.nan, r)
    return r


@jax.custom_jvp
def _ratio_sqrt(a, b):
    """sqrt(a/b) with a tangent that never squares its operands.

    The default jvp's quotient rule forms b**2; under the TPU's range-limited
    f64 emulation any product beyond the f32 range (~3.4e38) is NaN
    (docs/TPU_NOTES.md #14), so for hinit's dnf ~ 1e20+ (tight tolerances)
    the sensitivity/jvp path NaN-poisons while the primal is fine.  The
    custom tangent uses the log-derivative form d(sqrt(a/b)) =
    sqrt(a/b)/2 * (da/a - db/b) — ratios of like-magnitude quantities only.
    """
    return jnp.sqrt(a / b)


@_ratio_sqrt.defjvp
def _ratio_sqrt_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    r = jnp.sqrt(a / b)
    tiny = jnp.asarray(1e-300 if r.dtype == jnp.float64 else 1e-38, r.dtype)
    dr = 0.5 * r * (da / jnp.maximum(a, tiny) - db / jnp.maximum(b, tiny))
    return r, dr


@jax.custom_jvp
def _inv_pow(d, c, p):
    """(c/d)**p with a tangent in log-derivative form (no d**2).

    Same hazard as _ratio_sqrt: hinit's der12 can exceed ~1.8e19 at tight
    tolerances, and the default jvp of c/d forms d**2 -> NaN under the
    range-limited f64 emulation.  c and p are trace-time constants.
    """
    return (c / d) ** p


@_inv_pow.defjvp
def _inv_pow_jvp(primals, tangents):
    d, c, p = primals
    dd, _, _ = tangents
    r = (c / d) ** p
    tiny = jnp.asarray(1e-300 if r.dtype == jnp.float64 else 1e-38, r.dtype)
    dr = -p * r * dd / jnp.maximum(d, tiny)
    return r, dr


def error_scale(atol, rtol, y):
    """Component scale ``atol + rtol*|y|`` (one fused op on TPU)."""
    return atol + rtol * jnp.abs(y)


def scaled_rms(v, scale):
    """sqrt(mean((v/scale)^2)) — the weighted RMS error norm used everywhere."""
    r = v / scale
    return jnp.sqrt(jnp.mean(r * r))


def hinit(rhs, t, y, posneg, f0, iord, hmax, atol, rtol):
    """Automatic initial step size (Hairer's HINIT; reference
    src/methods/mod.rs:216-281).

    Returns (h, f1) where f1 = rhs at the Euler probe point (counted as one
    extra RHS evaluation by the caller).
    """
    sk = atol + rtol * jnp.abs(y)
    dnf = jnp.sum((f0 / sk) ** 2)
    dny = jnp.sum((y / sk) ** 2)

    h = jnp.where(
        (dnf <= 1e-10) | (dny <= 1e-10), 1.0e-6, _ratio_sqrt(dny, dnf) * 0.01
    )
    h = jnp.minimum(h, jnp.abs(hmax))
    h = jnp.abs(h) * jnp.sign(posneg)

    # Explicit Euler probe.
    y1 = y + h * f0
    f1 = rhs(t + h, y1)

    df = (f1 - f0) / sk
    der2 = jnp.sqrt(jnp.sum(df * df)) / jnp.abs(h)

    der12 = jnp.maximum(jnp.abs(der2), jnp.sqrt(dnf))
    h1 = jnp.where(
        der12 <= 1.0e-15,
        jnp.maximum(1.0e-6, jnp.abs(h) * 1.0e-3),
        _inv_pow(der12, 0.01, 1.0 / iord),
    )
    # min(|h|, 100|h|, h1, |hmax|) == min(|h|, h1, |hmax|)
    h_final = jnp.minimum(jnp.minimum(jnp.abs(h), h1), jnp.abs(hmax))
    return jnp.abs(h_final) * jnp.sign(posneg), f1


def brentq(gfun, a, b, fa, fb, xtol=2e-12, rtol=UROUND, maxiter=100):
    """Brent's root finder on a scalar function of t, matching scipy.brentq
    semantics (and reference src/solve/solout.rs:189-291).

    ``gfun`` is evaluated through the step interpolant, so every call is a
    traced (cheap, fused) expression.  Runs as a bounded ``lax.while_loop``;
    under vmap it executes in lock-step across lanes with converged lanes
    masked.  Returns the refined root.
    """
    dtype = jnp.result_type(a, b)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    fa = jnp.asarray(fa, dtype)
    fb = jnp.asarray(fb, dtype)

    # Endpoint short-circuits (reference solout.rs:199-203).
    a_is_root = jnp.abs(fa) <= xtol
    b_is_root = jnp.abs(fb) <= xtol

    def run_brent(_):
        init = dict(
            a=a, b=b, c=a, fa=fa, fb=fb, fc=fa, d=b - a, e=b - a,
            it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
        )

        def cond(s):
            return (~s["done"]) & (s["it"] < maxiter)

        def body(s):
            av, bv, cv = s["a"], s["b"], s["c"]
            fav, fbv, fcv = s["fa"], s["fb"], s["fc"]
            dv, ev = s["d"], s["e"]

            # Re-bracket.
            rebr = fbv * fcv > 0.0
            cv = jnp.where(rebr, av, cv)
            fcv = jnp.where(rebr, fav, fcv)
            dv = jnp.where(rebr, bv - av, dv)
            ev = jnp.where(rebr, dv, ev)

            # Swap so |fb| <= |fc|.
            swap = jnp.abs(fcv) < jnp.abs(fbv)
            av2 = jnp.where(swap, bv, av)
            bv2 = jnp.where(swap, cv, bv)
            cv2 = jnp.where(swap, av2, cv)
            fav2 = jnp.where(swap, fbv, fav)
            fbv2 = jnp.where(swap, fcv, fbv)
            fcv2 = jnp.where(swap, fav2, fcv)

            tol1 = 2.0 * rtol * jnp.abs(bv2) + 0.5 * xtol
            xm = 0.5 * (cv2 - bv2)
            converged = (jnp.abs(xm) <= tol1) | (fbv2 == 0.0)

            # Interpolation step (secant / inverse quadratic).
            use_interp = (jnp.abs(ev) >= tol1) & (jnp.abs(fav2) > jnp.abs(fbv2))

            s_lin = fbv2 / fav2
            p_lin = 2.0 * xm * s_lin
            q_lin = 1.0 - s_lin

            q_val = fav2 / fcv2
            r_val = fbv2 / fcv2
            s_q = fbv2 / fav2
            p_quad = s_q * (2.0 * xm * q_val * (q_val - r_val) - (bv2 - av2) * (r_val - 1.0))
            q_quad = (q_val - 1.0) * (r_val - 1.0) * (s_q - 1.0)

            linear = av2 == cv2
            p = jnp.where(linear, p_lin, p_quad)
            q = jnp.where(linear, q_lin, q_quad)
            p, q = jnp.where(q > 0.0, -p, p), jnp.where(q > 0.0, q, -q)

            ok = 2.0 * p < jnp.minimum(
                3.0 * xm * q - jnp.abs(tol1 * q), jnp.abs(ev * q)
            )
            d_new = jnp.where(use_interp & ok, p / q, xm)
            e_new = jnp.where(use_interp & ok, dv, d_new)

            a_next = bv2
            fa_next = fbv2
            b_next = jnp.where(
                jnp.abs(d_new) > tol1,
                bv2 + d_new,
                bv2 + jnp.where(xm > 0.0, tol1, -tol1),
            )
            fb_next = gfun(b_next)

            # Frozen once converged.
            upd = lambda new, old: jnp.where(converged | s["done"], old, new)
            return dict(
                a=upd(a_next, av2), b=upd(b_next, bv2), c=upd(cv2, cv2),
                fa=upd(fa_next, fav2), fb=upd(fb_next, fbv2), fc=upd(fcv2, fcv2),
                d=upd(d_new, dv), e=upd(e_new, ev),
                it=s["it"] + 1,
                done=s["done"] | converged,
            )

        out = lax.while_loop(cond, body, init)
        return out["b"]

    root = run_brent(None)
    root = jnp.where(b_is_root, b, root)
    root = jnp.where(a_is_root, a, root)
    return root


def tree_where(pred, a, b):
    """Elementwise select over a pytree (pred is a scalar/broadcastable bool)."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )
