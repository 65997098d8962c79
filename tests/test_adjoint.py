"""Reverse-mode (continuous adjoint) differentiation: ivp_tpu/adjoint.py.

The reference library has no AD surface; these tests validate the adjoint
tier against closed forms, finite differences, and the existing forward-mode
(jvp/jacfwd) sensitivity path (tests/test_sensitivity.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivp_tpu.adjoint import odeint, odeint_adjoint


def vdp(t, y, mu):
    return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])


def test_exp_decay_all_grads():
    """Closed-form gradients of y(T) = y0 exp(-k T) wrt y0, k, t0 and T."""
    def f(t, y, k):
        return -k * y

    y0 = jnp.array([2.0])
    ts = jnp.array([0.0, 1.5])
    k = 0.7

    def loss(y0, ts, k):
        return odeint_adjoint(f, y0, ts, (k,), rtol=1e-10, atol=1e-12)[-1, 0]

    gy0, gts, gk = jax.grad(loss, argnums=(0, 1, 2))(y0, ts, k)
    e = np.exp(-k * 1.5)
    assert abs(gy0[0] - e) < 1e-8
    assert abs(gk - (-1.5 * 2.0 * e)) < 1e-8
    assert abs(gts[0] - k * 2.0 * e) < 1e-8      # dL/dt0 = -a(t0)·f(t0,y0)
    assert abs(gts[1] - (-k * 2.0 * e)) < 1e-8   # dL/dT  = ȳ·f(T, y(T))


def test_linear_system_grad_y0_vs_expm():
    """y' = A y: dL/dy0 = expm(A T)ᵀ w for L = w·y(T)."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(4, 4)) * 0.5)
    w = jnp.asarray(rng.normal(size=(4,)))
    y0 = jnp.asarray(rng.normal(size=(4,)))
    T = 1.3

    def loss(y0):
        ys = odeint_adjoint(lambda t, y, A: A @ y, y0, jnp.array([0.0, T]),
                            (A,), rtol=1e-10, atol=1e-12)
        return jnp.dot(w, ys[-1])

    g = jax.grad(loss)(y0)
    import scipy.linalg
    expected = scipy.linalg.expm(np.asarray(A) * T).T @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-7, atol=1e-9)


def test_jacrev_matches_jacfwd():
    """Full Jacobian dys/dy0 on Van der Pol: reverse (adjoint) vs forward
    (jvp through the while_loop — the existing sensitivity path)."""
    y0 = jnp.array([2.0, 0.0])
    ts = jnp.array([0.0, 2.0, 4.0])
    kw = dict(rtol=1e-10, atol=1e-12)

    jac_fwd = jax.jacfwd(lambda y0: odeint(vdp, y0, ts, (1.0,), **kw))(y0)
    jac_rev = jax.jacrev(
        lambda y0: odeint_adjoint(vdp, y0, ts, (1.0,), **kw))(y0)
    np.testing.assert_allclose(np.asarray(jac_rev), np.asarray(jac_fwd),
                               rtol=1e-6, atol=1e-8)


def test_multi_sample_loss_vs_fd():
    """Loss over several sample rows; parameter gradient vs central FD."""
    ts = jnp.array([0.0, 1.0, 2.5, 4.0])
    y0 = jnp.array([2.0, 0.0])
    target = jnp.ones((4, 2))

    def loss(mu):
        ys = odeint_adjoint(vdp, y0, ts, (mu,), rtol=1e-10, atol=1e-12)
        return jnp.sum((ys - target) ** 2)

    g = jax.grad(loss)(1.0)
    eps = 1e-6
    fd = (loss(1.0 + eps) - loss(1.0 - eps)) / (2 * eps)
    assert abs(g - fd) < 1e-5 * max(1.0, abs(float(fd)))


def test_pytree_args_grads():
    """args as a dict pytree: gradients reach every leaf."""
    params = {"A": jnp.array([[-0.3, 1.0], [-1.0, -0.3]]),
              "b": jnp.array([0.1, -0.2])}

    def f(t, y, p):
        return p["A"] @ y + p["b"]

    y0 = jnp.array([1.0, 0.5])
    ts = jnp.array([0.0, 2.0])

    def loss(p):
        return jnp.sum(odeint_adjoint(f, y0, ts, (p,),
                                      rtol=1e-10, atol=1e-12)[-1] ** 2)

    g = jax.grad(loss)(params)
    assert g["A"].shape == (2, 2) and g["b"].shape == (2,)
    # FD check one leaf entry of each
    eps = 1e-6
    for leaf, idx in (("A", (0, 1)), ("b", (1,))):
        p_p = jax.tree.map(lambda x: x, params)
        p_m = jax.tree.map(lambda x: x, params)
        p_p[leaf] = p_p[leaf].at[idx].add(eps)
        p_m[leaf] = p_m[leaf].at[idx].add(-eps)
        fd = (loss(p_p) - loss(p_m)) / (2 * eps)
        got = g[leaf][idx]
        assert abs(got - fd) < 1e-5 * max(1.0, abs(float(fd)))


def test_stiff_adjoint_radau():
    """Stiff linear decay (λ = -1000) with RADAU forward and backward: the
    adjoint of a stiff system is stiff, so the backward pass uses the same
    implicit machinery (jacfwd of the augmented RHS)."""
    lam = 1000.0

    def f(t, y, lam):
        return jnp.array([-lam * y[0], y[0] - y[1]])

    y0 = jnp.array([1.0, 0.0])
    T = 2.0

    def loss(y0, lam):
        ys = odeint_adjoint(f, y0, jnp.array([0.0, T]), (lam,),
                            method="RADAU", rtol=1e-8, atol=1e-10)
        return ys[-1, 1]

    gy0, glam = jax.grad(loss, argnums=(0, 1))(y0, lam)
    # y2(T) = y1(0)(e^{-T} - e^{-λT})/(λ-1) + y2(0)e^{-T}
    dy2_dy1 = (np.exp(-T) - np.exp(-lam * T)) / (lam - 1.0)
    assert abs(gy0[0] - dy2_dy1) < 1e-6
    assert abs(gy0[1] - np.exp(-T)) < 1e-6
    dlam = (-(np.exp(-T) - np.exp(-lam * T)) / (lam - 1.0) ** 2
            + T * np.exp(-lam * T) / (lam - 1.0))
    assert abs(glam - dlam) < 1e-6


def test_bdf_adjoint_smoke():
    """BDF as the adjoint method: gradient agrees with DOPRI5's."""
    y0 = jnp.array([2.0, 0.0])
    ts = jnp.array([0.0, 1.0])

    def loss(mu, **kw):
        return odeint_adjoint(vdp, y0, ts, (mu,), rtol=1e-8, atol=1e-10,
                              **kw)[-1, 0]

    g_ref = jax.grad(loss)(1.0)
    g_bdf = jax.grad(lambda mu: loss(mu, method="BDF",
                                     adjoint_method="BDF"))(1.0)
    assert abs(g_bdf - g_ref) < 1e-5


def test_vmap_grad():
    """Per-lane gradients: vmap(grad(loss)) over a batch of (y0, mu)."""
    ts = jnp.array([0.0, 2.0])

    def loss(y0, mu):
        return odeint_adjoint(vdp, y0, ts, (mu,), rtol=1e-9, atol=1e-11)[-1, 0]

    y0s = jnp.stack([jnp.array([2.0, 0.0]), jnp.array([1.0, 1.0]),
                     jnp.array([0.5, -0.5])])
    mus = jnp.array([0.5, 1.0, 2.0])
    gs_y0, gs_mu = jax.vmap(jax.grad(loss, argnums=(0, 1)))(y0s, mus)
    assert gs_y0.shape == (3, 2) and gs_mu.shape == (3,)
    # lane 1 equals the unbatched gradient
    g1_y0, g1_mu = jax.grad(loss, argnums=(0, 1))(y0s[1], mus[1])
    np.testing.assert_allclose(np.asarray(gs_y0[1]), np.asarray(g1_y0),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(gs_mu[1]), float(g1_mu),
                               rtol=1e-9, atol=1e-12)


def test_odeint_values_match_solve_ivp():
    """odeint's sample states agree with the solve_ivp facade's t_eval."""
    from ivp_tpu import solve_ivp
    ts = np.array([0.0, 1.0, 3.0, 5.0])
    y0 = np.array([2.0, 0.0])
    ys = odeint(vdp, jnp.asarray(y0), jnp.asarray(ts), (1.0,),
                rtol=1e-9, atol=1e-12)
    res = solve_ivp(lambda t, y: vdp(t, y, 1.0), (0.0, 5.0), y0,
                    method="DOPRI5", t_eval=ts, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ys).T, res.y, rtol=1e-7, atol=1e-9)


def test_odeint_backward_time():
    """Monotone-decreasing ts (backward integration) round-trips."""
    ts_f = jnp.array([0.0, 3.0])
    ys_f = odeint(vdp, jnp.array([2.0, 0.0]), ts_f, (1.0,),
                  rtol=1e-10, atol=1e-12)
    ys_b = odeint(vdp, ys_f[-1], ts_f[::-1], (1.0,), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ys_b[-1]), np.array([2.0, 0.0]),
                               atol=1e-7)

    def loss(y0):
        return odeint_adjoint(vdp, y0, ts_f[::-1], (1.0,),
                              rtol=1e-10, atol=1e-12)[-1, 0]

    g = jax.grad(loss)(ys_f[-1])
    fd = []
    for i in range(2):
        e = np.zeros(2); e[i] = 1e-6
        fd.append((loss(ys_f[-1] + e) - loss(ys_f[-1] - e)) / 2e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd),
                               rtol=1e-4, atol=1e-6)


def test_no_args_grad():
    """args=() — the zero-width quadrature component is well-formed."""
    def f(t, y):
        return jnp.array([y[1], -y[0]])

    def loss(y0):
        return odeint_adjoint(f, y0, jnp.array([0.0, jnp.pi / 2]),
                              rtol=1e-10, atol=1e-12)[-1, 0]

    g = jax.grad(loss)(jnp.array([1.0, 0.0]))
    # y1(π/2) = y1(0) cos(π/2) + y2(0) sin(π/2) → grad = [cos, sin](π/2)
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0], atol=1e-8)
