"""Checkpoint/resume: the while-loop carry is the checkpoint (SURVEY.md §5)."""
import jax
import jax.numpy as jnp
import numpy as np

from ivp_tpu.batch import build_resumable_solver, solve_ivp_ensemble
from ivp_tpu.types import Status


def vdp(t, y):
    return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])


def test_resume_matches_uninterrupted():
    rng = np.random.default_rng(3)
    y0s = np.array([2.0, 0.0]) + 0.1 * rng.standard_normal((8, 2))

    start, resume, extract = build_resumable_solver(vdp, "RK45", n=2,
                                                    chunk_steps=50)
    carry, ra = start(y0s, 0.0, 20.0, 1e-6, 1e-8)

    n_resumes = 0
    while not bool(jnp.all(carry.done)):
        # Round-trip the carry through host memory: this is exactly what a
        # pytree checkpointer does.
        host = jax.tree_util.tree_map(np.asarray, carry)
        carry = jax.tree_util.tree_map(jnp.asarray, host)
        carry = resume(carry, ra)
        n_resumes += 1
        assert n_resumes < 1000

    assert n_resumes > 2  # the chunk bound actually interrupted integration
    res = extract(carry)
    assert np.all(np.asarray(res.status) == Status.SUCCESS)

    ref = solve_ivp_ensemble(vdp, (0.0, 20.0), y0s, method="RK45",
                             rtol=1e-6, atol=1e-8)
    # Same step sequence (counters exactly equal); values agree to fp
    # reassociation noise across the two compiled programs.
    np.testing.assert_array_equal(np.asarray(res.nfev), np.asarray(ref.nfev))
    np.testing.assert_array_equal(np.asarray(res.nstep), np.asarray(ref.nstep))
    np.testing.assert_allclose(np.asarray(res.y), np.asarray(ref.y),
                               rtol=1e-12, atol=1e-12)
