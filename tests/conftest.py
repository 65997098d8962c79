"""Test configuration: run on CPU with 8 virtual devices and float64.

Multi-chip sharding tests run on the virtual CPU mesh (SURVEY.md §4: the
single-host stand-in for multi-node testing).  Must set env vars before the
first jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform

# Pin each xdist worker to its own CPU.  XLA's CPU thunk runtime spin-waits
# on its thread pool; with N unpinned workers the oversubscribed spinners
# slow everything superlinearly (measured: one warm test 4.5 s alone,
# 50 s with 8 concurrent unpinned workers, 5 s with 8 pinned workers).
_w = os.environ.get("PYTEST_XDIST_WORKER", "")
if _w.startswith("gw"):
    try:
        os.sched_setaffinity(0, {int(_w[2:]) % (os.cpu_count() or 1)})
    except (ValueError, OSError, AttributeError):
        pass
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# override after import so the test suite runs on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is dominated by XLA CPU compiles of
# large while-loop programs; caching them makes re-runs minutes instead of
# ~45 min.
jax.config.update("jax_compilation_cache_dir", "/tmp/ivp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_xdist_auto_num_workers(config):
    """Resolve ``-n auto``: one worker per CPU, capped at 8 (compile
    parallelism saturates), floored at 2 (process isolation against the
    XLA CPU compiler's occasional segfault after many large compiles; xdist
    restarts a crashed worker).  On a 1-CPU host 8 spin-waiting XLA
    runtimes measured 3x slower than 2."""
    n = os.cpu_count() or 1
    return max(2, min(8, n))


def pytest_collection_modifyitems(config, items):
    """Schedule known-slow tests first (LPT-style): with xdist work-stealing
    a heavy test started last leaves 7 idle workers waiting on it; fronting
    the heavy files shortens the tail of cold runs by minutes."""
    slow_markers = (
        "events_full_matrix", "events_backward", "integration_const_jac",
        "linear_mode_equivalence", "mixed_precision",
        "sparse_difference", "test_args", "t_eval_early_event",
        "per_lane", "restart", "resume_matches",
    )

    def weight(item):
        name = item.nodeid
        return 0 if any(m in name for m in slow_markers) else 1

    items.sort(key=weight)
