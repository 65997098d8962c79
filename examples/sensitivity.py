"""Forward sensitivity analysis through the compiled adaptive solver.

Because every integration driver is a pure traced JAX program,
``jax.jacfwd`` differentiates straight through the adaptive
``lax.while_loop`` — initial-condition and parameter sensitivities of the
numerical solution map with no hand-written variational equations:

    d y(T) / d y0      (the state-transition matrix)
    d y(T) / d theta   (parameter sensitivities)

Forward mode is the right direction for IVPs (few inputs, trajectory-sized
outputs); JAX cannot reverse-differentiate a while_loop directly — for
scalar-loss gradients over many parameters use the continuous-adjoint tier
(``ivp_tpu.odeint_adjoint``, examples/adjoint_fit.py).
Composes with vmap: per-lane Jacobians across an ensemble in one program.
"""
import numpy as np

import jax
import jax.numpy as jnp

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run examples without installing)

from ivp_tpu.batch import build_ensemble_solver


def main():
    # --- d y(T) / d y0 for the Van der Pol oscillator ------------------
    def vdp(t, y):
        return jnp.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])

    solver = build_ensemble_solver(vdp, "RK45", n=2)

    def final_state(y0):
        return solver(y0[None, :], 0.0, 5.0, 1e-10, 1e-12).y[0]

    y0 = jnp.asarray([2.0, 0.0])
    J = jax.jacfwd(final_state)(y0)
    print("state-transition matrix d y(5)/d y0:\n", np.asarray(J))

    # Monodromy-style growth: largest singular value over the interval.
    s = np.linalg.svd(np.asarray(J), compute_uv=False)
    print("singular values:", s)

    # --- parameter sensitivity d y(T) / d mu ---------------------------
    def vdp_mu(t, y, mu):
        return jnp.array([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])

    solver_mu = build_ensemble_solver(vdp_mu, "RK45", n=2,
                                      args=(jnp.ones(1),), args_batched=True)

    def final_mu(mu):
        return solver_mu(jnp.asarray([[2.0, 0.0]]), 0.0, 5.0, 1e-10, 1e-12,
                         batched_args=(mu[None],)).y[0]

    dmu = jax.jacfwd(final_mu)(jnp.asarray(1.0))
    print("d y(5)/d mu:", np.asarray(dmu))

    # --- per-lane Jacobians across an ensemble (vmap of jacfwd) --------
    y0s = jnp.asarray([[2.0, 0.0], [1.0, 0.5], [0.5, -0.2]])
    Js = jax.vmap(jax.jacfwd(final_state))(y0s)
    print("batched Jacobians shape:", Js.shape)


if __name__ == "__main__":
    main()
