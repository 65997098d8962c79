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
