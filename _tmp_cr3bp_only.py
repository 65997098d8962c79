import time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ivp_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from ivp_tpu import solve_ivp

MU = 0.012277471
def cr3bp(t, s, mu):
    x, y_, vx, vy = s
    d1 = ((x + mu)**2 + y_**2) ** 1.5
    d2 = ((x - 1 + mu)**2 + y_**2) ** 1.5
    ax = x + 2*vy - (1-mu)*(x+mu)/d1 - mu*(x-1+mu)/d2
    ay = y_ - 2*vx - (1-mu)*y_/d1 - mu*y_/d2
    return jnp.stack([vx, vy, ax, ay])
period = 17.0652165601579625588917206249
s0 = [0.994, 0.0, 0.0, -2.00158510637908252240537862224]
t0 = time.time()
r = solve_ivp(cr3bp, (0, period), s0, method="DOP853", args=(MU,),
              rtol=1e-12, atol=1e-14, dense_output=True, dtype="dd")
print("CR3BP dd compile+run s:", round(time.time()-t0,1), "success", r.success,
      "nstep", int(r.nstep), "closure err",
      float(np.abs(r.y[:, -1] - np.asarray(s0)).max()), flush=True)
t0 = time.time()
rf = solve_ivp(cr3bp, (0, period), s0, method="DOP853", args=(MU,),
               rtol=1e-12, atol=1e-14, dense_output=True)
print("CR3BP f64 s:", round(time.time()-t0,1), "nstep", int(rf.nstep),
      "closure err", float(np.abs(rf.y[:, -1] - np.asarray(s0)).max()), flush=True)
tq2 = np.linspace(0.1, period-0.1, 97)
print("CR3BP dense dd-vs-f64 max diff:", float(np.abs(r.sol(tq2) - rf.sol(tq2)).max()))
