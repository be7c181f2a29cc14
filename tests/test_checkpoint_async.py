"""Async checkpoint saves + f16 compaction (engine/checkpoint.py).

A full-scale run's stage-end checkpoint moves ~600 MB device->host; the
engine dispatches the save to a writer thread and serves same-process
readers from an in-memory device-side cache (PERF_LOG round 3). Master
state is f32; leaves >= _COMPACT_MIN_ELEMS are stored f16 and re-widened
on load.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.engine import checkpoint as ckpt_lib


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    ckpt_lib.wait_for_pending_saves()
    ckpt_lib._MEM_CACHE.clear()


def _payload(n_big=1 << 20):
    return {
        "global_step": 7,
        "model_kwargs": {"num_voxels": 99},
        "model_state_dict": {
            "density": jnp.linspace(-100.0, 10.0, n_big, dtype=jnp.float32),
            "rgbnet": {"w": jnp.ones((8, 8), jnp.float32) * 0.25},
        },
        "optimizer_state_dict": {
            "m": jnp.linspace(0.0, 1e-3, n_big, dtype=jnp.float32)},
    }


def test_async_save_cache_hit_and_file_roundtrip(tmp_path, monkeypatch):
    path = str(tmp_path / "fine_last.tar")
    payload = _payload()
    ckpt_lib.save_checkpoint_file(path, payload, async_=True)

    # Same-process read immediately after dispatch: served from the memory
    # cache, f32 restored, no wait on the writer.
    assert ckpt_lib.checkpoint_exists(path)
    st = ckpt_lib.load_checkpoint_file(path)
    dens = np.asarray(st["model_state_dict"]["density"])
    assert dens.dtype == np.float32
    ref = np.asarray(payload["model_state_dict"]["density"])
    np.testing.assert_allclose(dens, ref, rtol=1e-3, atol=1e-4)
    # small leaves stay exact
    np.testing.assert_array_equal(
        np.asarray(st["model_state_dict"]["rgbnet"]["w"]),
        np.asarray(payload["model_state_dict"]["rgbnet"]["w"]))

    # After the writer lands and the cache is dropped, the FILE carries f16
    # for big leaves and loads back f32.
    ckpt_lib.wait_for_pending_saves()
    ckpt_lib._MEM_CACHE.clear()
    st2 = ckpt_lib.load_checkpoint_file(path)
    d2 = np.asarray(st2["model_state_dict"]["density"])
    assert d2.dtype == np.float32
    np.testing.assert_allclose(d2, ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(st2["model_state_dict"]["rgbnet"]["w"]), 0.25)
    assert int(st2["global_step"]) == 7


def test_small_state_stays_exact(tmp_path):
    """Below the compaction threshold (every test-suite model) the
    round-trip is bit-exact — resume/parity tests rely on this."""
    path = str(tmp_path / "coarse_last.tar")
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(10_000).astype(np.float32)
    ckpt_lib.save_checkpoint_file(
        path, {"model_state_dict": {"density": jnp.asarray(vals)}},
        async_=True)
    ckpt_lib.wait_for_pending_saves()
    ckpt_lib._MEM_CACHE.clear()
    st = ckpt_lib.load_checkpoint_file(path)
    np.testing.assert_array_equal(
        np.asarray(st["model_state_dict"]["density"]), vals)


def test_sync_save_unaffected(tmp_path):
    path = str(tmp_path / "s.tar")
    ckpt_lib.save_checkpoint_file(path, _payload(8))
    st = ckpt_lib.load_checkpoint_file(path)
    assert isinstance(st["model_state_dict"]["density"], np.ndarray)
