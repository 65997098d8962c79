import time
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ivp_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import ivp_tpu
from ivp_tpu.batch import build_ensemble_solver

def lorenz(t, y):
    return jnp.array([10.0 * (y[1] - y[0]), y[0] * (28.0 - y[2]) - y[1],
                      y[0] * y[1] - (8.0/3.0) * y[2]])
B = 16384
rng = np.random.default_rng(0)
y0 = jnp.asarray(np.array([1.0,1.0,1.0]) + 1e-3*rng.standard_normal((B,3)))

for m, dt, rtol in ((100, jnp.float32, 1e-6), (100, None, 1e-6),
                    (100, None, 1e-8), (100, jnp.float64, 1e-8)):
    te = None if m == 0 else np.linspace(0.0, 100.0, m)
    s = jax.jit(build_ensemble_solver(lorenz, "DOP853", n=3,
                                      max_steps=200000, t_eval=te, dtype=dt))
    y0c = jnp.asarray(y0, jnp.float32) if dt == jnp.float32 else y0
    r = s(y0c, 0.0, 100.0, rtol, rtol*1e-2); int(np.asarray(r.nfev[0]))
    t0 = time.perf_counter()
    r = s(y0c+1e-9, 0.0, 100.0, rtol, rtol*1e-2); int(np.asarray(r.nfev[0]))
    dtw = time.perf_counter()-t0
    tag = {jnp.float32: "f32", jnp.float64: "f64", None: "default"}[dt]
    ns = int(np.asarray(r.n_samples[0]))
    print(f"{tag} rtol={rtol:g} m={m}: wall {dtw:.3f}s ivps {B/dtw:.0f} n_samples {ns}", flush=True)
