"""Auto lane_chunk (VERDICT r4 #3) and the crash-region guard (r4 #2).

The default ``lane_chunk="auto"`` keeps every device call at the measured
saturating sub-batch for mid-size stiff ensembles (docs/TPU_NOTES.md #31,
docs/BENCH.md mid-size table) and keeps the big-B x big-n dense-f64-LU
region (which can crash the TPU worker, TPU_NOTES #2/#5) from ever being
dispatched in one call.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import ivp_tpu
from ivp_tpu import solve_ivp_ensemble
from ivp_tpu.batch import _auto_lane_chunk


class TestAutoLaneChunkTable:
    def test_explicit_methods_never_chunk(self):
        assert _auto_lane_chunk("RK45", 64, 65536, None, None) is None
        assert _auto_lane_chunk("DOP853", 128, 65536, None, None) is None

    def test_small_n_never_chunks(self):
        assert _auto_lane_chunk("Radau", 2, 131072, None, None) is None
        assert _auto_lane_chunk("BDF", 8, 131072, None, None) is None

    def test_midsize_cliff_chunking(self):
        # n=32 saturates at 4096-8192, halves at 16384 (TPU_NOTES #31).
        assert _auto_lane_chunk("Radau", 32, 16384, None, None) == 8192
        assert _auto_lane_chunk("Radau", 32, 8192, None, None) is None

    def test_crash_region_f64_dense(self):
        # n>=64 dense f64 LU at B>=4096 crashed the worker (TPU_NOTES #2/#5):
        # the auto table caps device calls at 1024 lanes there.
        assert _auto_lane_chunk("Radau", 64, 4096, None, None) == 1024
        assert _auto_lane_chunk("BDF", 64, 4096, None, None) == 1024
        assert _auto_lane_chunk("Radau", 64, 1024, None, None) is None

    def test_f32_factor_gets_larger_chunks(self):
        assert _auto_lane_chunk("Radau", 64, 8192, "dd", None) == 2048

    def test_device_kind_keying(self, monkeypatch):
        # Non-TPU backends (this CPU test runner): the table is a plain
        # bounded-memory default regardless of kind — no halving.
        assert _auto_lane_chunk("Radau", 32, 65536, None, None,
                                device_kind="TPU v6e") == 8192
        # On a TPU backend, the measured kind gets the v5e table while an
        # unvalidated kind gets chunks halved (safe bounded fallback,
        # round-5 VERDICT weak #4).
        import ivp_tpu.batch as batch_mod
        monkeypatch.setattr(batch_mod.jax, "default_backend", lambda: "tpu")
        assert _auto_lane_chunk("Radau", 32, 65536, None, None,
                                device_kind="TPU v5 lite") == 8192
        assert _auto_lane_chunk("Radau", 32, 65536, None, None,
                                device_kind="TPU v6e") == 4096
        assert _auto_lane_chunk("Radau", 128, 65536, None, None,
                                device_kind="TPU v6e") == 256
        # f32-grade factors on the measured kind keep the larger chunks.
        assert _auto_lane_chunk("Radau", 64, 8192, jnp.float32, None,
                                device_kind="TPU v5 lite") == 2048
        assert _auto_lane_chunk(
            "Radau", 64, 8192, None, {"newton_precision": "mixed"},
            device_kind="TPU v5 lite") == 2048

    def test_large_n(self):
        assert _auto_lane_chunk("Radau", 128, 4096, None, None) == 256

    def test_method_auto_treated_as_stiff(self):
        assert _auto_lane_chunk("auto", 64, 4096, None, None) == 1024


def test_facade_rejects_bad_string():
    with pytest.raises(ValueError, match="lane_chunk"):
        solve_ivp_ensemble(lambda t, y: -y, (0.0, 1.0), np.ones((4, 2)),
                           lane_chunk="bogus")


def test_auto_chunked_matches_unchunked():
    """The auto-chunked stiff path returns the same results as lane_chunk
    disabled (chunking is bit-transparent; small shapes forced through the
    dispatcher with an explicit chunk size)."""
    def vdp(t, y):
        return jnp.stack([y[1], 3.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    y0 = np.tile([2.0, 0.0], (12, 1)) + 0.01 * np.arange(24).reshape(12, 2)
    r_plain = solve_ivp_ensemble(vdp, (0.0, 5.0), y0, method="Radau",
                                 rtol=1e-6, atol=1e-9, lane_chunk=None)
    r_chunk = solve_ivp_ensemble(vdp, (0.0, 5.0), y0, method="Radau",
                                 rtol=1e-6, atol=1e-9, lane_chunk=5)
    np.testing.assert_array_equal(np.asarray(r_plain.y),
                                  np.asarray(r_chunk.y))
    np.testing.assert_array_equal(np.asarray(r_plain.nstep),
                                  np.asarray(r_chunk.nstep))


class TestWorkerCrashGuard:
    """Builder-level guard on the known TPU-worker-crash region (round-5
    VERDICT #4): dense f64 per-lane LU, n >= 64, B >= 4096 raises at trace
    time from every raw builder (the facades auto-chunk below the region)."""

    def _fake_tpu(self, monkeypatch):
        import ivp_tpu.batch as batch_mod
        monkeypatch.setattr(batch_mod.jax, "default_backend", lambda: "tpu")

    def test_ensemble_builder_raises(self, monkeypatch):
        from ivp_tpu.batch import build_ensemble_solver
        self._fake_tpu(monkeypatch)
        solver = build_ensemble_solver(lambda t, y: -y, "Radau", n=64,
                                       dtype=jnp.float64)
        with pytest.raises(ValueError, match="crash region"):
            solver(np.ones((4096, 64)), 0.0, 1.0, 1e-6, 1e-9)

    def test_resumable_builder_raises(self, monkeypatch):
        from ivp_tpu.batch import build_resumable_solver
        self._fake_tpu(monkeypatch)
        start, _, _ = build_resumable_solver(lambda t, y: -y, "BDF", n=64,
                                             dtype=jnp.float64)
        with pytest.raises(ValueError, match="crash region"):
            start(np.ones((4096, 64)), 0.0, 1.0, 1e-6, 1e-9)

    def test_recording_builder_raises(self, monkeypatch):
        from ivp_tpu.batch import build_recording_solver
        self._fake_tpu(monkeypatch)
        _, start, _, _, _ = build_recording_solver(
            lambda t, y: -y, "Radau", n=64, dtype=jnp.float64)
        with pytest.raises(ValueError, match="crash region"):
            start(np.ones((4096, 64)), 0.0, 1.0, 1e-6, 1e-9)

    def test_not_in_region_passes(self, monkeypatch):
        """Small B, f32-grade factors, banded patterns and the env escape
        hatch all skip the guard (guard logic only — no solve)."""
        from ivp_tpu.batch import _guard_worker_crash_region
        self._fake_tpu(monkeypatch)
        # in-region baseline raises
        with pytest.raises(ValueError):
            _guard_worker_crash_region("RADAU", 64, 4096, jnp.float64, None)
        _guard_worker_crash_region("RADAU", 64, 2048, jnp.float64, None)
        _guard_worker_crash_region("RADAU", 32, 65536, jnp.float64, None)
        _guard_worker_crash_region("RADAU", 64, 4096, jnp.float32, None)
        _guard_worker_crash_region("RADAU", 64, 4096, "dd", None)
        _guard_worker_crash_region(
            "RADAU", 64, 4096, jnp.float64, {"newton_precision": "mixed"})
        _guard_worker_crash_region("RADAU", 64, 4096, jnp.float64, None,
                                   jac_sparsity=np.eye(64))
        _guard_worker_crash_region("DOPRI5", 64, 65536, jnp.float64, None)
        monkeypatch.setenv("IVP_TPU_ALLOW_LARGE_DENSE_F64", "1")
        _guard_worker_crash_region("RADAU", 64, 4096, jnp.float64, None)

    def test_cpu_backend_never_guards(self):
        from ivp_tpu.batch import _guard_worker_crash_region
        _guard_worker_crash_region("RADAU", 128, 65536, jnp.float64, None)
