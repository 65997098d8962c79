"""jac_sparsity="auto": host-side structural pattern detection.

TPU-build extension: the reference requires an explicit scipy sparse pattern
(src/python/sparsity.rs:30-92); here jacfwd probes around y0 recover the
structure, which then feeds the same grouped-FD + banded-backend machinery
as a user pattern.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu import detect_jac_sparsity, solve_ivp, solve_ivp_ensemble
from ivp_tpu.batch import build_ensemble_solver

N = 6
n = 2 * N
C = 0.02 * (N + 1) ** 2


def brusselator(t, y):
    u = y[0::2]
    v = y[1::2]
    ul = jnp.concatenate([jnp.ones((1,), y.dtype), u[:-1]])
    ur = jnp.concatenate([u[1:], jnp.ones((1,), y.dtype)])
    vl = jnp.concatenate([jnp.full((1,), 3.0, y.dtype), v[:-1]])
    vr = jnp.concatenate([v[1:], jnp.full((1,), 3.0, y.dtype)])
    du = 1.0 + u * u * v - 4.0 * u + C * (ul - 2.0 * u + ur)
    dv = 3.0 * u - u * u * v + C * (vl - 2.0 * v + vr)
    return jnp.stack([du, dv], axis=1).reshape(n)


def _y0():
    x = np.arange(1, N + 1) / (N + 1)
    return np.stack([1.0 + np.sin(2 * np.pi * x), 3.0 * np.ones(N)],
                    axis=1).reshape(n)


def _expected_pattern():
    pat = np.zeros((n, n), bool)
    i = np.arange(N)
    iu, iv = 2 * i, 2 * i + 1
    pat[iu, iu] = pat[iu, iv] = pat[iv, iu] = pat[iv, iv] = True
    pat[iu[:-1], iu[1:]] = pat[iu[1:], iu[:-1]] = True
    pat[iv[:-1], iv[1:]] = pat[iv[1:], iv[:-1]] = True
    return pat


def test_detect_matches_structure():
    pat = detect_jac_sparsity(brusselator, 0.0, _y0())
    np.testing.assert_array_equal(pat, _expected_pattern())


def test_auto_equals_explicit_pattern_single_ivp():
    kw = dict(method="Radau", rtol=1e-5, atol=1e-7)
    r_auto = solve_ivp(brusselator, (0.0, 2.0), _y0(),
                       jac_sparsity="auto", **kw)
    r_expl = solve_ivp(brusselator, (0.0, 2.0), _y0(),
                       jac_sparsity=_expected_pattern(), **kw)
    assert r_auto.success and r_expl.success
    # identical machinery once the pattern is resolved
    assert r_auto.nstep == r_expl.nstep
    assert r_auto.nfev == r_expl.nfev
    np.testing.assert_array_equal(np.asarray(r_auto.y[:, -1]),
                                  np.asarray(r_expl.y[:, -1]))


def test_auto_ensemble():
    y0b = np.tile(_y0(), (4, 1)) + 0.01 * np.random.default_rng(0).standard_normal((4, n))
    res = solve_ivp_ensemble(brusselator, (0.0, 2.0), y0b, method="BDF",
                             rtol=1e-5, atol=1e-7, jac_sparsity="auto")
    assert bool(np.all(np.asarray(res.status) == 0))
    ref = solve_ivp_ensemble(brusselator, (0.0, 2.0), y0b, method="BDF",
                             rtol=1e-5, atol=1e-7,
                             jac_sparsity=_expected_pattern())
    np.testing.assert_array_equal(np.asarray(res.y), np.asarray(ref.y))


def test_builders_reject_auto():
    with pytest.raises(ValueError, match="initial state"):
        build_ensemble_solver(brusselator, "Radau", n=n, jac_sparsity="auto")


def test_bad_string_rejected():
    with pytest.raises(ValueError, match="jac_sparsity"):
        solve_ivp(brusselator, (0.0, 1.0), _y0(), method="Radau",
                  jac_sparsity="atuo")


def test_nonautonomous_coupling_vanishing_at_t0():
    # Coupling term t*y1 vanishes identically at t0=0: a fixed-t0 probe
    # would miss pattern entry (0, 1).  t is jittered inside the span
    # alongside y (ADVICE round 3, core/sparsity.py).
    def rhs(t, y):
        return jnp.array([-y[0] + t * y[1], -2.0 * y[1]])

    pat = detect_jac_sparsity(rhs, 0.0, np.array([1.0, 1.0]), t1=10.0)
    assert pat[0, 1], "t-dependent coupling must survive detection"
    expected = np.array([[True, True], [False, True]])
    np.testing.assert_array_equal(pat, expected)

    # And without t1: unit-scale jitter around t0 still catches it.
    pat2 = detect_jac_sparsity(rhs, 0.0, np.array([1.0, 1.0]))
    assert pat2[0, 1]
