"""2D-windowed NDC chunk rendering vs the plain chunked sweep path.

engine/render._render_rays_windowed_2d draws each Morton-tile segment of a
frame as a composed (gp, Wu, Wv) clip box instead of full-plane station
matmuls. The windows are exact by the same support argument as the training
draws (ops/sweep.build_ray_segments_2d: endpoint-bounded supports, +-1 voxel
interp margin), so the windowed render must match the unwindowed render to
float tolerance on every ray — including rays that fall in the full-sweep
fallback class and the padding tail.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.engine import render as render_lib
from directvoxgo_tpu.models.dmpigo import DirectMPIGO
from directvoxgo_tpu import rays as ray_lib


@pytest.fixture(scope="module")
def scene():
    model = DirectMPIGO(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1],
        num_voxels=96 * 96 * 48, mpi_depth=48,
        fast_color_thres=1e-4, rgbnet_dim=6, rgbnet_width=32,
        viewbase_pe=4, k_color=8, seed=3)
    rng = np.random.default_rng(11)
    # Structured (non-constant) grids so any window misalignment shows.
    model.params["density"] = jnp.asarray(
        rng.normal(0.0, 1.5, model.params["density"].shape)
        .astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0.0, 0.5, model.params["k0"].shape).astype(np.float32))
    H = W = 48
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 0.0
    ro, rd, vd = ray_lib.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    ro = np.asarray(ro).reshape(-1, 3).astype(np.float32)
    rd = np.asarray(rd).reshape(-1, 3).astype(np.float32)
    vd = np.asarray(vd).reshape(-1, 3).astype(np.float32)
    rk = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0)
    render_fn = render_lib.make_render_fn(model, rk)
    return model, render_fn, ro, rd, vd


def _render(render_fn, model, ro, rd, vd, chunk, monkeypatch, min_plane):
    monkeypatch.setattr(render_lib, "WINDOWED_RENDER_MIN_PLANE", min_plane)
    return render_lib.render_rays_chunked(render_fn, model, ro, rd, vd,
                                          chunk)


def test_windowed_matches_plain(scene, monkeypatch):
    model, render_fn, ro, rd, vd = scene
    rgb_p, dep_p = _render(render_fn, model, ro, rd, vd, 512, monkeypatch,
                           10 ** 9)
    rgb_w, dep_w = _render(render_fn, model, ro, rd, vd, 512, monkeypatch,
                           0)
    assert rgb_w.shape == rgb_p.shape and dep_w.shape == dep_p.shape
    np.testing.assert_allclose(rgb_w, rgb_p, atol=2e-3, rtol=0)
    np.testing.assert_allclose(dep_w, dep_p, atol=2e-3, rtol=0)
    # and actually different programs ran: windows must have been used
    err = np.abs(rgb_w - rgb_p).max()
    print(f"windowed-vs-plain max|drgb| = {err:.2e}")


def test_windowed_handles_nonmultiple_ray_count(scene, monkeypatch):
    """Ray counts that don't divide the chunk exercise the pad-with-ray-0
    path (pads must classify like real rays, then be dropped)."""
    model, render_fn, ro, rd, vd = scene
    n = 512 * 3 + 197
    rgb_p, dep_p = _render(render_fn, model, ro[:n], rd[:n], vd[:n], 512,
                           monkeypatch, 10 ** 9)
    rgb_w, dep_w = _render(render_fn, model, ro[:n], rd[:n], vd[:n], 512,
                           monkeypatch, 0)
    assert rgb_w.shape == (n, 3) and dep_w.shape == (n,)
    np.testing.assert_allclose(rgb_w, rgb_p, atol=2e-3, rtol=0)
    np.testing.assert_allclose(dep_w, dep_p, atol=2e-3, rtol=0)


def test_windowed_gate_respects_min_plane(scene, monkeypatch):
    """Below the plane-area gate the helper declines (returns None) and the
    plain path serves the frame — same results either way."""
    model, render_fn, ro, rd, vd = scene
    monkeypatch.setattr(render_lib, "WINDOWED_RENDER_MIN_PLANE", 10 ** 9)
    out = render_lib._render_rays_windowed_2d(
        render_fn, model, ro[:512], rd[:512], vd[:512], 512,
        int(model.forced_sweep_axis))
    assert out is None


def test_frame_ndc_tiles_matches_chunked(scene, monkeypatch):
    """render_frame_ndc_tiles (device raygen + corner-ray tile windows +
    batched pull) must match the chunked path on the full frame: the tile
    windows carry the same exactness guarantee (corner pixel centers bound
    every tile ray projectively; clip-box p faces bound every t), and the
    device NDC raygen mirrors the numpy formulas to float noise."""
    model, render_fn, ro, rd, vd = scene
    H = W = 48
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    c2w = np.eye(4, dtype=np.float32)
    rk = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0)
    rgb_p, dep_p = _render(render_fn, model, ro, rd, vd, 512, monkeypatch,
                           10 ** 9)
    monkeypatch.setattr(render_lib, "WINDOWED_RENDER_MIN_PLANE", 0)
    out = render_lib.render_frame_ndc_tiles(
        render_fn, model, H, W, K, c2w, rk, chunk=512, tile_hw=(16, 32),
        widths=(8, 16, 24, 48))
    assert out is not None
    rgb_f, dep_f = out
    assert rgb_f.shape == (H * W, 3) and dep_f.shape == (H * W,)
    np.testing.assert_allclose(rgb_f, rgb_p, atol=2e-3, rtol=0)
    np.testing.assert_allclose(dep_f, dep_p, atol=2e-3, rtol=0)
    err = np.abs(rgb_f - rgb_p).max()
    print(f"frame-ndc-tiles-vs-plain max|drgb| = {err:.2e}")


def test_frame_ndc_tiles_nonsweep_declines():
    """Models without a forced sweep axis return None (caller falls back)."""
    class _NoSweep:
        forced_sweep_axis = None
    assert render_lib.render_frame_ndc_tiles(
        None, _NoSweep(), 48, 48, np.eye(3), np.eye(4)[:3], {}) is None
