"""Camera-frame sweep renderer tests (engine/render_sweep.py + the fused
Pallas kernel in ops/pallas_render.py, run in interpreter mode on CPU).

The camera sweep must agree with the per-ray renderer (which itself matches
the reference's per-sample math) up to quadrature differences at silhouettes,
and the Pallas kernel must agree with the XLA scan formulation almost
exactly (same arithmetic, different schedule).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.models.dvgo import DirectVoxGO
from directvoxgo_tpu.engine import render_sweep
from directvoxgo_tpu.engine.render import make_render_fn, render_rays_chunked
from directvoxgo_tpu import rays as ray_lib


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=32 ** 3, num_voxels_base=32 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        rgbnet_depth=3, rgbnet_width=32,
                        k_density=None, k_color=0)
    pts = np.asarray(model.grid_points())
    r2 = (pts ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (10 * np.exp(-4 * r2) - 3).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()

    H = W = 48
    focal = 0.5 * W / np.tan(0.35)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.array([[1, 0, 0, 0],
                    [0, 1, 0, 0],
                    [0, 0, 1, 3.2]], np.float32)  # looking down -z? see rays
    # camera at +z looking toward origin (blender-style c2w with -z forward)
    c2w = np.array([[1, 0, 0, 0],
                    [0, -1, 0, 0],
                    [0, 0, -1, 3.2]], np.float32)
    rk = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5,
              inverse_y=False, flip_x=False, flip_y=False)
    return model, H, W, K, c2w, rk


def _render_per_ray(model, H, W, K, c2w, rk):
    fn = make_render_fn(model, rk)
    ro, rd, vd = ray_lib.get_rays_of_a_view(
        H, W, K, c2w, False, inverse_y=False, flip_x=False, flip_y=False)
    rgb, dep = render_rays_chunked(
        fn, model, np.asarray(ro).reshape(-1, 3),
        np.asarray(rd).reshape(-1, 3), np.asarray(vd).reshape(-1, 3), 2048)
    return rgb.reshape(H, W, 3), dep.reshape(H, W)


def test_camera_sweep_matches_per_ray(scene):
    model, H, W, K, c2w, rk = scene
    rgb_ray, _ = _render_per_ray(model, H, W, K, c2w, rk)
    out = render_sweep.render_frame_sweep(model, H, W, K, c2w, rk,
                                          backend="xla")
    assert out is not None, "plan unexpectedly rejected"
    rgb_sw, _ = out
    mse = float(np.mean((rgb_ray - rgb_sw) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 35, f"camera sweep vs per-ray disagreement: {psnr:.1f} dB"


def test_pallas_kernel_matches_xla(scene):
    model, H, W, K, c2w, rk = scene
    rgb_x, dep_x = render_sweep.render_frame_sweep(model, H, W, K, c2w, rk,
                                                   backend="xla")
    rgb_p, dep_p = render_sweep.render_frame_sweep(
        model, H, W, K, c2w, rk, backend="pallas_interpret")
    mse = float(np.mean((rgb_x - rgb_p) ** 2))
    assert -10 * np.log10(mse + 1e-12) > 55
    assert np.abs(dep_x - dep_p).max() < 1e-2


def test_pallas_v4_matches_v3(scene, monkeypatch):
    """The station-major v4 kernel (slabs stream once per frame, per-tile
    scratch accumulators) must agree with v3 to float noise — identical
    per-sample math, different grid order."""
    model, H, W, K, c2w, rk = scene
    monkeypatch.setenv("DVGO_RENDER_V", "3")
    rgb3, dep3 = render_sweep.render_frame_sweep(
        model, H, W, K, c2w, rk, backend="pallas_interpret")
    monkeypatch.setenv("DVGO_RENDER_V", "4")
    rgb4, dep4 = render_sweep.render_frame_sweep(
        model, H, W, K, c2w, rk, backend="pallas_interpret")
    # Scale-aware: v3 quantizes the hoisted shared1 view term to bf16
    # before the layer-1 add while v4 keeps it f32, so double-rounding can
    # legitimately exceed a fixed 1e-5 on scenes/weights other than this
    # fixture (same policy as the window-equivalence tests).
    rgb_tol = 1e-5 * max(1.0, float(np.abs(rgb3).max()))
    dep_tol = 1e-4 * max(1.0, float(np.abs(dep3).max()))
    assert np.abs(rgb3 - rgb4).max() < rgb_tol
    assert np.abs(dep3 - dep4).max() < dep_tol


def test_pallas_kernel_no_mlp_path(scene):
    model, H, W, K, c2w, rk = scene
    model.has_rgbnet = False  # coarse-style direct rgb from k0[:3]
    try:
        rgb_x, _ = render_sweep.render_frame_sweep(model, H, W, K, c2w, rk,
                                                   backend="xla")
        rgb_p, _ = render_sweep.render_frame_sweep(
            model, H, W, K, c2w, rk, backend="pallas_interpret")
    finally:
        model.has_rgbnet = True
    mse = float(np.mean((rgb_x - rgb_p) ** 2))
    assert -10 * np.log10(mse + 1e-12) > 55


def test_plan_rejects_wide_fov(scene):
    model, H, W, K, c2w, rk = scene
    K_wide = K.copy()
    K_wide[0, 0] = K_wide[1, 1] = W / 8  # absurd FOV
    plan = render_sweep.plan_camera_sweep(model, H, W, K_wide, c2w,
                                          rk["near"], rk["far"])
    assert plan is None


def test_device_yuv420_output(scene):
    """output='device_yuv420' must pack a planar I420 buffer [H*W*3//2]
    whose YUV->RGB reconstruction matches the rgb8 compact output up to
    chroma subsampling (luma must match tightly; full roundtrip PSNR-level).
    """
    model, H, W, K, c2w, rk = scene
    rgb8, dep8 = render_sweep.render_frame_sweep(
        model, H, W, K, c2w, rk, backend="pallas_interpret",
        output="device_compact")
    buf, dep_y = render_sweep.render_frame_sweep(
        model, H, W, K, c2w, rk, backend="pallas_interpret",
        output="device_yuv420")
    buf = np.asarray(buf)
    assert buf.dtype == np.uint8 and buf.shape == (H * W * 3 // 2,)
    assert np.abs(np.asarray(dep8, np.float32)
                  - np.asarray(dep_y, np.float32)).max() < 1e-3
    y = buf[:H * W].reshape(H, W) / 255.0
    u = buf[H * W:H * W + H * W // 4].reshape(H // 2, W // 2) / 255.0 - 0.5
    v = buf[H * W + H * W // 4:].reshape(H // 2, W // 2) / 255.0 - 0.5
    u = np.repeat(np.repeat(u, 2, 0), 2, 1)
    v = np.repeat(np.repeat(v, 2, 0), 2, 1)
    rec = np.stack([y + 1.402 * v,
                    y - 0.344136 * u - 0.714136 * v,
                    y + 1.772 * u], -1)
    ref = np.asarray(rgb8, np.float32) / 255.0
    # luma check (exact transform, no subsampling loss)
    y_ref = (0.299 * ref[..., 0] + 0.587 * ref[..., 1]
             + 0.114 * ref[..., 2])
    assert np.abs(y - y_ref).max() < 2.5 / 255.0
    mse = float(np.mean((np.clip(rec, 0, 1) - ref) ** 2))
    assert -10 * np.log10(mse + 1e-12) > 30, "I420 roundtrip diverged"
