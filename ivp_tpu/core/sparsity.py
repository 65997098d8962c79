"""Sparse-Jacobian support: greedy column grouping + grouped finite differences.

TPU-native equivalent of the reference's sparsity module
(reference src/python/sparsity.rs:30-202): the graph coloring runs once on the
host from the (static) sparsity pattern; the grouped FD evaluation is a traced
function doing ``n_groups`` vmapped RHS evaluations instead of ``n`` — for the
Medakzo problem (n=400, bandwidth ~2) that is 4 evaluations per Jacobian.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

FD_EPS = float(np.sqrt(np.finfo(np.float64).eps))


def _fd_eps(dtype) -> float:
    """sqrt(machine eps) of the FD compute dtype.

    The perturbation must scale with the dtype actually doing the
    differencing: the f64 constant (1.49e-8) is BELOW the f32 ulp of y ~ 1,
    so an f32 grouped-FD (the dd tier's Jacobian path, batch.py::_dd_jac_fn)
    would round ``y + dy`` back to ``y`` and return an identically zero
    Jacobian."""
    try:
        return float(np.sqrt(np.finfo(np.dtype(dtype)).eps))
    except ValueError:  # non-float dtype: keep the f64 default
        return FD_EPS


def _to_dense_pattern(sparsity) -> np.ndarray:
    if hasattr(sparsity, "toarray"):
        pat = sparsity.toarray()
    else:
        pat = np.asarray(sparsity)
    return pat != 0


def column_groups(sparsity) -> tuple[np.ndarray, int]:
    """Greedy column grouping (graph coloring): columns sharing no row go in
    the same group (reference sparsity.rs:110-154).

    Returns (group ids (n,), n_groups).
    """
    pat = _to_dense_pattern(sparsity)
    n = pat.shape[1]
    groups = np.full(n, -1, dtype=np.int64)
    group_rows: list[np.ndarray] = []
    for j in range(n):
        rows_j = pat[:, j]
        placed = False
        for g, used in enumerate(group_rows):
            if not np.any(used & rows_j):
                group_rows[g] = used | rows_j
                groups[j] = g
                placed = True
                break
        if not placed:
            group_rows.append(rows_j.copy())
            groups[j] = len(group_rows) - 1
    return groups, len(group_rows)


def detect_jac_sparsity(rhs, t0, y0, *, t1=None, probes: int = 3,
                        seed: int = 0) -> np.ndarray:
    """Detect the structural sparsity pattern of d(rhs)/dy by probing.

    Evaluates the dense Jacobian (``jax.jacfwd``) at ``probes`` jittered
    points around ``(t0, y0)`` and ORs the nonzero patterns — entries that
    are structurally zero stay exactly 0.0 under autodiff, while incidental
    zeros (cancellation at one particular state) survive the multi-probe OR
    with overwhelming probability.  One-time host cost of ``probes`` dense
    Jacobians; the result feeds the grouped-FD evaluator and the banded
    backend exactly like a user-supplied pattern (``jac_sparsity="auto"``
    in the facades).

    ``t`` is jittered as well as ``y``: for a nonautonomous system whose
    coupling terms vanish identically at ``t0`` (e.g. ``t0=0`` with
    t-scaled terms) a fixed-``t0`` probe would miss true entries.  Pass
    ``t1`` (the other span endpoint) so the t-probes land inside the
    actual integration interval; without it the probes jitter around
    ``t0`` at unit scale.

    The reference requires the user to hand over a scipy sparse pattern
    (src/python/sparsity.rs:30-92); detection is a TPU-build extension.
    """
    y0 = jnp.atleast_1d(jnp.asarray(y0))
    if y0.ndim > 1:  # batched ensembles: probe around the first lane
        y0 = y0[0]
    n = y0.shape[0]
    rng = np.random.default_rng(seed)
    scale = np.maximum(np.abs(np.asarray(y0, float)), 1.0)
    t0 = float(t0)
    if t1 is not None and np.isfinite(float(t1)) and float(t1) != t0:
        # interior fractions of the span (avoid both endpoints — either may
        # be a degenerate instant of the coupling terms)
        t_probes = [t0 + frac * (float(t1) - t0)
                    for frac in (0.37, 0.61, 0.83, 0.19, 0.52)]
    else:
        tsc = max(abs(t0), 1.0)
        t_probes = [t0 + frac * tsc for frac in (0.37, -0.29, 0.83, 0.11, 0.57)]
    pat = np.zeros((n, n), dtype=bool)
    jfun = jax.jit(jax.jacfwd(lambda tt, yy: rhs(tt, yy), argnums=1))
    for k in range(max(1, probes)):
        if k == 0:
            yp, tp = y0, t0
        else:
            yp = (y0 * (1.0 + 0.05 * rng.standard_normal(n))
                  + 0.01 * scale * rng.standard_normal(n)).astype(y0.dtype)
            tp = t_probes[(k - 1) % len(t_probes)]
        J = np.asarray(jfun(jnp.asarray(tp, y0.dtype), jnp.asarray(yp)))
        pat |= J != 0.0
    return pat


def resolve_jac_sparsity(jac_sparsity, rhs, t0, y0, t1=None):
    """Facade helper: pass through explicit patterns, detect on "auto"."""
    if isinstance(jac_sparsity, str):
        if jac_sparsity != "auto":
            raise ValueError(
                f"jac_sparsity must be a sparsity pattern or 'auto'; "
                f"got {jac_sparsity!r}")
        return detect_jac_sparsity(rhs, t0, y0, t1=t1)
    return jac_sparsity


def make_grouped_fd_jac(rhs, sparsity, n: int, dtype):
    """Build jac_fn(t, y) -> (n, n) using grouped forward differences.

    Perturbation size eps*max(|y_j|, 1) matches the reference's FD fallback
    (reference src/ivp.rs:67-107).
    """
    groups, n_groups = column_groups(sparsity)
    pat = _to_dense_pattern(sparsity)
    groups_j = jnp.asarray(groups)
    pat_j = jnp.asarray(pat, dtype)
    eps = _fd_eps(dtype)
    onehot = jnp.asarray(
        (groups[None, :] == np.arange(n_groups)[:, None]).astype(np.float64),
        dtype)  # (G, n): columns in each group

    def jac_fn(t, y):
        f0 = rhs(t, y)
        h = eps * jnp.maximum(jnp.abs(y), 1.0)  # (n,)
        perturbs = onehot * h[None, :]             # (G, n)
        fp = jax.vmap(lambda dy: rhs(t, y + dy))(perturbs)  # (G, n)
        df = fp - f0[None, :]                      # (G, n_rows)
        # J[i, j] = df[group[j], i] / h[j], masked by the sparsity pattern.
        Jt = df[groups_j, :] / h[:, None]          # (n_cols, n_rows)
        return Jt.T * pat_j

    return jac_fn, n_groups
