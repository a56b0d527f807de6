"""Runtime helper tests: device summary, batch sharding, default mesh."""

import jax
import numpy as np

from dewi_tpu.parallel import (
    DATA_AXIS,
    default_mesh,
    device_summary,
    initialize_runtime,
    make_mesh,
    shard_batch,
)


class TestRuntime:
    def test_initialize_noop_single_process(self):
        initialize_runtime()  # must not raise single-process
        initialize_runtime()  # idempotent

    def test_device_summary_fields(self):
        s = device_summary()
        assert s["n_devices"] == 8  # virtual CPU mesh from conftest
        assert s["process_count"] == 1
        assert s["platform"] == "cpu"

    def test_default_mesh_all_devices(self):
        mesh = default_mesh()
        assert mesh.shape[DATA_AXIS] == 8

    def test_shard_batch_pads_and_reports_length(self):
        mesh = make_mesh(n_data=4, n_model=2)
        x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
        arr, n = shard_batch(x, mesh)
        assert n == 10
        assert arr.shape == (12, 3)  # padded to multiple of 4
        np.testing.assert_array_equal(np.asarray(arr)[:10], x)
        np.testing.assert_array_equal(np.asarray(arr)[10:], 0)

    def test_shard_batch_exact_multiple(self):
        mesh = make_mesh(n_data=8, n_model=1)
        x = np.ones((16, 4), np.float32)
        arr, n = shard_batch(x, mesh)
        assert arr.shape == (16, 4) and n == 16
        # Sharded over the data axis: 8 addressable shards of 2 rows.
        assert len(arr.addressable_shards) == 8
        assert arr.addressable_shards[0].data.shape == (2, 4)

    def test_sharded_compute_matches_host(self):
        mesh = make_mesh(n_data=8, n_model=1)
        x = np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
        arr, n = shard_batch(x, mesh)
        out = np.asarray(jax.jit(lambda a: (a * 2).sum(axis=1))(arr))
        np.testing.assert_allclose(out[:n], (x * 2).sum(axis=1),
                                   rtol=1e-4, atol=1e-5)


class TestCompilationCache:
    def test_enable_idempotent(self, tmp_path, monkeypatch):
        import dewi_tpu.utils.compile_cache as cc

        monkeypatch.setattr(cc, "_enabled_dir", None)
        monkeypatch.setenv("DEWI_COMPILE_CACHE_DIR", str(tmp_path / "xla"))
        d1 = cc.enable_compilation_cache()
        assert d1 == str(tmp_path / "xla")
        # Second call is a no-op returning the same dir.
        assert cc.enable_compilation_cache("/elsewhere") == d1

    def test_disable_via_env(self, monkeypatch):
        import dewi_tpu.utils.compile_cache as cc

        monkeypatch.setattr(cc, "_enabled_dir", None)
        monkeypatch.setenv("DEWI_COMPILE_CACHE", "0")
        assert cc.enable_compilation_cache() is None
