"""Numerical parity against torch — the reference framework's math engine.

The real-dataset PSNR parity run (lego 160^3 vs IMPROVING_LOG.md:40) is
blocked in this environment: no nerf_synthetic on disk and zero network
egress (see PERF_LOG.md PARITY section). These tests are the closest
available proxy: they pin our grid sampling and ray-compositing math to
torch's, using the EXACT call pattern the reference uses —
``F.grid_sample(grid[1,C,X,Y,Z], ind_norm.flip(-1)*2-1,
align_corners=True)`` (lib/dvgo.py:312-328) and the
Raw2Alpha / Alphas2Weights kernels (lib/dvgo.py:618-661,
render_utils_kernel.cu:354-470). Since every reference render is just these
primitives composed, agreement here transfers PSNR parity to any scene whose
data both frameworks load identically (loaders are tested separately in
test_config_rays.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from directvoxgo_tpu.ops.grid import trilinear_sample_world  # noqa: E402
from directvoxgo_tpu.ops import raymarch as rm  # noqa: E402


def _torch_grid_sample_world(grid_xyzc, pts, xyz_min, xyz_max):
    """The reference's grid query, verbatim semantics (lib/dvgo.py:312-328):
    normalize to [-1,1], flip xyz->zyx, F.grid_sample align_corners=True."""
    C = grid_xyzc.shape[-1]
    g = torch.from_numpy(np.moveaxis(grid_xyzc, -1, 0)[None])  # [1,C,X,Y,Z]
    xyz = torch.from_numpy(pts)
    mn = torch.tensor(xyz_min, dtype=torch.float32)
    mx = torch.tensor(xyz_max, dtype=torch.float32)
    shape = xyz.shape[:-1]
    xyz = xyz.reshape(1, 1, 1, -1, 3)
    ind_norm = ((xyz - mn) / (mx - mn)).flip((-1,)) * 2 - 1
    out = F.grid_sample(g, ind_norm, mode="bilinear", align_corners=True)
    return out.reshape(C, -1).T.reshape(*shape, C).numpy()


@pytest.mark.parametrize("G,C", [((12, 10, 14), 3), ((17, 17, 9), 1),
                                 ((32, 32, 32), 12)])
def test_trilinear_matches_torch_grid_sample(G, C):
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(*G, C)).astype(np.float32)
    xyz_min = (-1.0, -0.8, -1.2)
    xyz_max = (1.0, 0.9, 1.1)
    # In-bbox points, including exactly-on-boundary and voxel-corner points.
    pts = rng.uniform(0, 1, (4096, 3)).astype(np.float32)
    pts = np.asarray(xyz_min) + pts * (np.asarray(xyz_max)
                                       - np.asarray(xyz_min))
    pts[:8] = [xyz_min, xyz_max, (xyz_min[0], xyz_max[1], xyz_min[2]),
               (0.0, 0.0, 0.0)] * 2
    pts = pts.astype(np.float32)

    ref = _torch_grid_sample_world(grid, pts, xyz_min, xyz_max)
    ours = np.asarray(trilinear_sample_world(
        jnp.asarray(grid), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(pts[:, 2]), xyz_min, xyz_max))
    if ours.ndim == 1:
        ours = ours[:, None]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=2e-5)


def test_raw2alpha_matches_torch_reference():
    """Raw2Alpha forward (lib/dvgo.py:618-631): alpha =
    1 - (1 + exp(density + shift))^(-interval)."""
    rng = np.random.default_rng(1)
    density = rng.normal(scale=4.0, size=(4096,)).astype(np.float32)
    density[:4] = [-80.0, 40.0, 0.0, -1e-3]
    shift = -2.3
    interval = 0.7
    d = torch.from_numpy(density).double()
    ref = 1 - (1 + torch.exp(d + shift)) ** (-interval)
    ours = np.asarray(rm.raw2alpha(jnp.asarray(density), shift, interval))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-6, atol=1e-7)


def test_alpha2weight_matches_torch_loop_oracle():
    """Alphas2Weights semantics (render_utils_kernel.cu:412-470): per-ray
    sequential compositing with T-based early termination."""
    rng = np.random.default_rng(2)
    n, s = 64, 40
    alpha = rng.uniform(0, 0.9, (n, s)).astype(np.float32)
    alpha[: n // 4] *= 0.01           # rays that never terminate
    alpha[n // 4: n // 2] = 0.6       # rays that terminate early
    valid = rng.uniform(size=(n, s)) > 0.2
    at = torch.from_numpy(alpha)

    w_ref = torch.zeros(n, s)
    ainv_ref = torch.ones(n)
    for i in range(n):
        T = 1.0
        for j in range(s):
            if not valid[i, j]:
                continue
            if T < 1e-3:
                break
            w_ref[i, j] = T * at[i, j]
            T = T * (1 - float(at[i, j]) + 1e-10)
        ainv_ref[i] = T

    w, ainv, live = rm.alpha2weight_dense(jnp.asarray(alpha),
                                          jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(w), w_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ainv), ainv_ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_max_pool_downscale_matches_torch():
    """Grid rescale uses trilinear interpolation align_corners=True
    (lib/dvgo.py:228-263 scale_volume_grid); pin it to torch
    F.interpolate."""
    from directvoxgo_tpu.ops.grid import resize_trilinear

    rng = np.random.default_rng(3)
    grid = rng.normal(size=(9, 11, 7, 4)).astype(np.float32)
    new_size = (17, 21, 13)
    ours = np.asarray(resize_trilinear(jnp.asarray(grid), new_size))
    g = torch.from_numpy(np.moveaxis(grid, -1, 0)[None])
    ref = F.interpolate(g, size=new_size, mode="trilinear",
                        align_corners=True)
    ref = np.moveaxis(ref.numpy()[0], 0, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
