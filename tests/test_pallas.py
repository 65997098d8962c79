"""Fused Pallas ensemble kernel vs the vmapped driver (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu.batch import solve_ivp_ensemble
from ivp_tpu.ops.pallas_erk import dopri5_ensemble_pallas
from ivp_tpu.types import Status


def vdp(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def test_pallas_matches_vmap_driver():
    rng = np.random.default_rng(0)
    B = 256
    y0 = np.array([2.0, 0.0]) + 0.05 * rng.standard_normal((B, 2))

    res = dopri5_ensemble_pallas(vdp, y0, 0.0, 20.0, rtol=1e-6, atol=1e-8,
                                 lanes_per_block=128, interpret=True)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    assert np.allclose(np.asarray(res.t), 20.0)

    ref = solve_ivp_ensemble(vdp, (0.0, 20.0), y0, method="RK45",
                             rtol=1e-6, atol=1e-8)
    # Same controller -> same step sequences -> tight agreement.  (The
    # driver evaluates the controller in f32 (controller_precision) while
    # interpret-mode Pallas computes it in f64, so per-step h differs in
    # the last ulps -> ~1e-10 trajectory spread at identical step counts.)
    np.testing.assert_array_equal(np.asarray(res.nstep), np.asarray(ref.nstep))
    np.testing.assert_allclose(np.asarray(res.y), np.asarray(ref.y),
                               rtol=1e-8, atol=1e-8)


def test_pallas_padding():
    """B not a multiple of the lane block."""
    B = 100
    y0 = np.tile([[1.5, 0.0]], (B, 1))
    res = dopri5_ensemble_pallas(vdp, y0, 0.0, 5.0, rtol=1e-6, atol=1e-8,
                                 lanes_per_block=128, interpret=True)
    assert res.y.shape == (B, 2)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.y)[0], np.asarray(res.y)[-1],
                               rtol=0, atol=0)
