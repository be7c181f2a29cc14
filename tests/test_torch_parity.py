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


# ---------------------------------------------------------------------------
# Composed full-forward parity: the exact reference composition
# (sample -> maskcache -> grid_sample -> Raw2Alpha -> Alphas2Weights ->
# grid_sample k0 -> color MLP -> segment_coo march, lib/dvgo.py:450-577 /
# lib/dmpigo.py:200-283) evaluated per-ray in torch float64, against our
# jitted forwards on the same random grids/rays. This turns "every primitive
# matches" (the tests above) into "the composition matches".
# ---------------------------------------------------------------------------


def _np_pe(x, n_freqs):
    """models/mlp.positional_encoding, numpy mirror."""
    if n_freqs <= 0:
        return x
    freqs = np.asarray([2.0 ** i for i in range(n_freqs)], x.dtype)
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return np.concatenate([x, np.sin(emb), np.cos(emb)], axis=-1)


def _torch_mlp(params, x64):
    """models/mlp.mlp_apply in torch float64 from our param pytree."""
    x = x64
    layers = params["layers"]
    for i, layer in enumerate(layers):
        w = torch.from_numpy(np.asarray(layer["w"], np.float64))
        b = torch.from_numpy(np.asarray(layer["b"], np.float64))
        x = x @ w + b
        if i != len(layers) - 1:
            x = torch.relu(x)
    return x


def _torch_trilinear64(grid_xyzc, pts64, xyz_min, xyz_max):
    """F.grid_sample float64, align_corners=True, zyx flip — the reference
    query (lib/dvgo.py:312-328). ``pts64`` [M, 3] float64."""
    C = grid_xyzc.shape[-1]
    g = torch.from_numpy(
        np.moveaxis(grid_xyzc.astype(np.float64), -1, 0)[None])
    xyz = torch.from_numpy(pts64)
    mn = torch.tensor(np.asarray(xyz_min, np.float64))
    mx = torch.tensor(np.asarray(xyz_max, np.float64))
    ind = ((xyz.reshape(1, 1, 1, -1, 3) - mn) / (mx - mn)).flip((-1,)) * 2 - 1
    out = F.grid_sample(g, ind, mode="bilinear", align_corners=True)
    return out.reshape(C, -1).T.numpy()


def _composite_ray(samples, bg, thres):
    """Sequential Alphas2Weights + weight filter + march for ONE ray.

    ``samples``: list of (alpha, rgb[3], depth_coord) already alpha-filtered,
    in march order. Returns (rgb_marched[3], alphainv_last, depth)."""
    T = 1.0
    rgb_m = np.zeros(3)
    depth = 0.0
    for alpha, rgb, dc in samples:
        if T < 1e-3:
            break
        w = T * alpha
        T = T * (1.0 - alpha + 1e-10)
        if w > thres:
            rgb_m += w * rgb
            depth += w * dc
    return rgb_m + T * bg, T, depth


def _make_dvgo(tmp_seed=0, **over):
    from directvoxgo_tpu.models.dvgo import DirectVoxGO

    kw = dict(xyz_min=(-1.0, -0.8, -1.2), xyz_max=(1.0, 0.9, 1.1),
              num_voxels=24 * 20 * 28, num_voxels_base=24 * 20 * 28,
              alpha_init=1e-2, fast_color_thres=1e-4,
              rgbnet_dim=9, rgbnet_direct=False, rgbnet_depth=3,
              rgbnet_width=32, viewbase_pe=4, k_density=None, k_color=0,
              sweep_color_topk=0, seed=7)
    kw.update(over)
    model = DirectVoxGO(**kw)
    rng = np.random.default_rng(tmp_seed)
    model.params["density"] = jnp.asarray(
        rng.normal(scale=3.0, size=model.world_size).astype(np.float32))
    model.params["k0"] = jnp.asarray(rng.normal(
        size=(*model.world_size, model.k0_dim)).astype(np.float32))
    model.mask = jnp.asarray(rng.uniform(size=model.world_size) < 0.8)
    return model


def _rays_toward_bbox(n, rng, xyz_min, xyz_max, spread=0.35):
    ctr = (np.asarray(xyz_min) + np.asarray(xyz_max)) / 2
    rad = float(np.linalg.norm(np.asarray(xyz_max) - ctr)) * 2.2
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = rng.uniform(-0.7, 0.7, n)
    ro = ctr + rad * np.stack([np.cos(theta) * np.cos(phi),
                               np.sin(theta) * np.cos(phi),
                               np.sin(phi)], -1)
    tgt = ctr + rng.uniform(-spread, spread, (n, 3)) \
        * (np.asarray(xyz_max) - np.asarray(xyz_min))
    rd = tgt - ro
    vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    return (ro.astype(np.float32), rd.astype(np.float32),
            vd.astype(np.float32))


def test_full_forward_composition_matches_torch():
    """DVGO gather forward vs the reference composition per-ray in float64
    (lib/dvgo.py:450-577: sample_pts_on_rays -> maskcache -> grid_sample ->
    Raw2Alpha -> [alpha>thres] -> Alphas2Weights -> [w>thres] -> k0 + MLP ->
    segment_coo + alphainv*bg)."""
    model = _make_dvgo()
    rng = np.random.default_rng(11)
    n = 48
    ro, rd, vd = _rays_toward_bbox(n, rng, model.xyz_min, model.xyz_max)
    near, far, bg = 0.2, 9.0, 1.0
    stepsize = 0.5
    ret = model.forward(model.params, model.mask, jnp.asarray(ro),
                        jnp.asarray(rd), jnp.asarray(vd),
                        near=near, far=far, bg=bg, stepsize=stepsize,
                        render_depth=True)
    rgb_ours = np.asarray(ret["rgb_marched"])
    ainv_ours = np.asarray(ret["alphainv_last"])
    depth_ours = np.asarray(ret["depth"])

    xyz_min = np.asarray(model.xyz_min, np.float64)
    xyz_max = np.asarray(model.xyz_max, np.float64)
    density = np.asarray(model.params["density"])[..., None]
    k0 = np.asarray(model.params["k0"])
    mask = np.asarray(model.mask)
    stepdist = stepsize * model.voxel_size
    interval = stepsize * model.voxel_size_ratio
    thres = model.fast_color_thres
    ws = np.asarray(model.world_size, np.float64)

    rgb_ref = np.zeros((n, 3))
    ainv_ref = np.zeros(n)
    depth_ref = np.zeros(n)
    for i in range(n):
        # Sampler geometry in float32 — the reference kernel computes
        # t_min/t_max/N_steps/points in f32 (render_utils_kernel.cu), and a
        # f64 oracle flips ceil() by one step on ~10% of rays.
        o, d = ro[i], rd[i]
        f32 = np.float32
        vec = np.where(d == 0, f32(1e-6), d)
        t_min = np.clip(np.max(np.minimum(
            (xyz_max.astype(f32) - o) / vec,
            (xyz_min.astype(f32) - o) / vec)), f32(near), f32(far))
        t_max = np.clip(np.min(np.maximum(
            (xyz_max.astype(f32) - o) / vec,
            (xyz_min.astype(f32) - o) / vec)), f32(near), f32(far))
        n_steps = int(max(np.ceil((t_max - t_min) / f32(stepdist)), 1))
        unit = d / f32(np.linalg.norm(d.astype(np.float64)))
        start = o + d * t_min
        vd_emb = _np_pe(vd[i].astype(np.float64), model.viewbase_pe)
        samples = []
        for j in range(n_steps):
            pt32 = start + unit * (f32(stepdist) * f32(j))
            if np.any(pt32 < xyz_min.astype(f32)) \
                    or np.any(pt32 > xyz_max.astype(f32)):
                continue  # mask_outbbox (lib/dvgo.py:444-447)
            pt = pt32.astype(np.float64)
            # nearest-voxel index exactly as occupancy_lookup_parts:
            # round_f32((v - lo) * s) with s the f64 (n-1)/(hi-lo) scalar
            ijk = np.round((pt32 - xyz_min.astype(f32))
                           * ((ws - 1) / (xyz_max - xyz_min)).astype(f32))
            if not mask[int(ijk[0]), int(ijk[1]), int(ijk[2])]:
                continue  # maskcache (cu:300-319 round-nearest)
            dens = _torch_trilinear64(density, pt[None], xyz_min,
                                      xyz_max)[0, 0]
            alpha = 1.0 - np.exp(-np.logaddexp(0.0, dens + model.act_shift)
                                 * interval)
            if alpha <= thres:
                continue
            k0v = _torch_trilinear64(k0, pt[None], xyz_min, xyz_max)[0]
            feat = np.concatenate([k0v[3:], vd_emb])
            logit = _torch_mlp(model.params["rgbnet"],
                               torch.from_numpy(feat[None])).numpy()[0]
            rgb = 1.0 / (1.0 + np.exp(-(logit + k0v[:3])))
            samples.append((alpha, rgb, float(j)))
        rgb_ref[i], ainv_ref[i], depth_ref[i] = _composite_ray(
            samples, bg, thres)

    np.testing.assert_allclose(rgb_ours, rgb_ref, atol=1e-4)
    np.testing.assert_allclose(ainv_ours, ainv_ref, atol=1e-4)
    np.testing.assert_allclose(depth_ours, depth_ref,
                               atol=1e-3 * max(1.0, np.abs(depth_ref).max()))


def test_full_forward_sweep_composition_matches_torch():
    """forward_sweep (the shipping TPU fast path) vs the same torch-f64
    composition evaluated AT THE STATION QUADRATURE: stations at half-voxel
    planes along the sweep axis, trilinear values via F.grid_sample,
    interpolated-mask validity, per-ray interval, bidirectional march."""
    model = _make_dvgo(tmp_seed=1)
    model.sweep_dtype = jnp.float32   # parity mode (ships bf16)
    model.mlp_dtype = None
    rng = np.random.default_rng(13)
    n = 48
    ro, rd, vd = _rays_toward_bbox(n, rng, model.xyz_min, model.xyz_max)
    axis = 0
    # make every ray dominant along the sweep axis, both signs
    sign = np.where(rng.uniform(size=n) < 0.5, 1.0, -1.0)
    rd[:, axis] = sign * (np.abs(rd).max(1) * 1.5 + 0.1)
    vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    near, far, bg = 0.2, 9.0, 0.0
    stepsize = 0.5
    ret = model.forward_sweep(model.params, model.mask, jnp.asarray(ro),
                              jnp.asarray(rd), jnp.asarray(vd), axis,
                              near=near, far=far, bg=bg, stepsize=stepsize,
                              render_depth=True)
    rgb_ours = np.asarray(ret["rgb_marched"])
    ainv_ours = np.asarray(ret["alphainv_last"])
    depth_ours = np.asarray(ret["depth"])

    xyz_min = np.asarray(model.xyz_min, np.float64)
    xyz_max = np.asarray(model.xyz_max, np.float64)
    density = np.asarray(model.params["density"])[..., None]
    k0 = np.asarray(model.params["k0"])
    maskf = np.asarray(model.mask, np.float64)[..., None]
    thres = model.fast_color_thres
    gp = model.world_size[axis]
    k = 2  # substeps for stepsize 0.5
    s_total = k * (gp - 1) + 1
    scale_p = (gp - 1.0) / (xyz_max[axis] - xyz_min[axis])

    rgb_ref = np.zeros((n, 3))
    ainv_ref = np.zeros(n)
    depth_ref = np.zeros(n)
    for i in range(n):
        # Validity geometry in float32, mirroring rays_to_voxel /
        # ray_aabb_tminmax exactly — stations 0 and S-1 sit ON the bbox
        # boundary (t == t_lo up to rounding), so a f64 oracle flips their
        # inclusion on a few rays.
        f32 = np.float32
        o, d = ro[i], rd[i]
        op = f32((o[axis] - f32(xyz_min[axis])) * f32(scale_p))
        dp = f32(d[axis] * f32(scale_p))
        dp_safe = dp if dp != 0 else f32(1e-10)
        d_norm = np.linalg.norm(d.astype(np.float64))
        interval = d_norm / (k * abs(float(dp_safe))) / model.voxel_size_base
        vec = np.where(d == 0, f32(1e-6), d)
        t_lo = np.clip(np.max(np.minimum(
            (xyz_max.astype(f32) - o) / vec,
            (xyz_min.astype(f32) - o) / vec)), f32(near), f32(far))
        t_hi = np.clip(np.min(np.maximum(
            (xyz_max.astype(f32) - o) / vec,
            (xyz_min.astype(f32) - o) / vec)), f32(near), f32(far))
        vd_emb = _np_pe(vd[i].astype(np.float64), model.viewbase_pe)
        order = range(s_total) if dp >= 0 else range(s_total - 1, -1, -1)
        samples = []
        for s in order:
            t = (f32(s / k) - op) / dp_safe
            if not (t_hi > t_lo and t_lo <= t <= t_hi):
                continue
            pt = (o + t * d).astype(np.float64)
            m = _torch_trilinear64(maskf, pt[None], xyz_min, xyz_max)[0, 0]
            if not m > 0:
                continue
            dens = _torch_trilinear64(density, pt[None], xyz_min,
                                      xyz_max)[0, 0]
            alpha = 1.0 - np.exp(-np.logaddexp(0.0, dens + model.act_shift)
                                 * interval)
            if alpha <= thres:
                continue
            k0v = _torch_trilinear64(k0, pt[None], xyz_min, xyz_max)[0]
            feat = np.concatenate([k0v[3:], vd_emb])
            logit = _torch_mlp(model.params["rgbnet"],
                               torch.from_numpy(feat[None])).numpy()[0]
            rgb = 1.0 / (1.0 + np.exp(-(logit + k0v[:3])))
            samples.append((alpha, rgb, t * d_norm))
        rgb_ref[i], ainv_ref[i], depth_ref[i] = _composite_ray(
            samples, bg, thres)

    np.testing.assert_allclose(rgb_ours, rgb_ref, atol=1e-4)
    np.testing.assert_allclose(ainv_ours, ainv_ref, atol=1e-4)
    np.testing.assert_allclose(depth_ours, depth_ref,
                               atol=1e-3 * max(1.0, np.abs(depth_ref).max()))


def test_dmpigo_forward_composition_matches_torch():
    """DMPIGO forward vs the reference composition (lib/dmpigo.py:200-283):
    regular NDC sampler, nearest-voxel occupancy, fixed interval."""
    from directvoxgo_tpu.models.dmpigo import DirectMPIGO

    model = DirectMPIGO(xyz_min=(-1.0, -1.0, -1.0), xyz_max=(1.0, 1.0, 1.0),
                        num_voxels=22 * 22 * 16, mpi_depth=16,
                        fast_color_thres=1e-4, rgbnet_dim=6, rgbnet_depth=3,
                        rgbnet_width=24, viewbase_pe=2, k_color=0, seed=5)
    rng = np.random.default_rng(17)
    model.params["density"] = jnp.asarray(
        rng.normal(scale=2.0, size=model.world_size).astype(np.float32))
    model.params["k0"] = jnp.asarray(rng.normal(
        size=(*model.world_size, model.k0_dim)).astype(np.float32))
    model.mask = jnp.asarray(rng.uniform(size=model.world_size) < 0.85)

    n = 48
    # NDC-style rays: origins on the near plane (z=-1), d_z = 2.
    ox = rng.uniform(-0.9, 0.9, n)
    oy = rng.uniform(-0.9, 0.9, n)
    ro = np.stack([ox, oy, -np.ones(n)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n),
                   2.0 * np.ones(n)], -1).astype(np.float32)
    vd = (rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(np.float32)
    near, far, bg = 0.0, 1.0, 1.0
    stepsize = 1.0
    ret = model.forward(model.params, model.mask, jnp.asarray(ro),
                        jnp.asarray(rd), jnp.asarray(vd),
                        near=near, far=far, bg=bg, stepsize=stepsize,
                        render_depth=True)
    rgb_ours = np.asarray(ret["rgb_marched"])
    ainv_ours = np.asarray(ret["alphainv_last"])
    depth_ours = np.asarray(ret["depth"])

    xyz_min = np.asarray(model.xyz_min, np.float64)
    xyz_max = np.asarray(model.xyz_max, np.float64)
    density = np.asarray(model.params["density"])[..., None]
    k0 = np.asarray(model.params["k0"])
    mask = np.asarray(model.mask)
    ws = np.asarray(model.world_size, np.float64)
    interval = stepsize * model.voxel_size_ratio
    thres = model.fast_color_thres
    n_s = model.n_samples(stepsize)

    rgb_ref = np.zeros((n, 3))
    ainv_ref = np.zeros(n)
    depth_ref = np.zeros(n)
    for i in range(n):
        o, d = ro[i].astype(np.float64), rd[i].astype(np.float64)
        vd_emb = _np_pe(vd[i].astype(np.float64), model.viewbase_pe)
        samples = []
        for j in range(n_s):
            pt = o + d * (j / (n_s - 1))
            if np.any(pt < xyz_min) or np.any(pt > xyz_max):
                continue
            ijk = np.round((pt - xyz_min) / (xyz_max - xyz_min) * (ws - 1))
            if not mask[int(ijk[0]), int(ijk[1]), int(ijk[2])]:
                continue
            dens = _torch_trilinear64(density, pt[None], xyz_min,
                                      xyz_max)[0, 0]
            alpha = 1.0 - np.exp(-np.logaddexp(0.0, dens + model.act_shift)
                                 * interval)
            if alpha <= thres:
                continue
            k0v = _torch_trilinear64(k0, pt[None], xyz_min, xyz_max)[0]
            feat = np.concatenate([k0v, vd_emb])
            logit = _torch_mlp(model.params["rgbnet"],
                               torch.from_numpy(feat[None])).numpy()[0]
            rgb = 1.0 / (1.0 + np.exp(-logit))
            samples.append((alpha, rgb, float(j)))
        rgb_ref[i], ainv_ref[i], depth_ref[i] = _composite_ray(
            samples, bg, thres)

    np.testing.assert_allclose(rgb_ours, rgb_ref, atol=1e-4)
    np.testing.assert_allclose(ainv_ours, ainv_ref, atol=1e-4)
    np.testing.assert_allclose(depth_ours, depth_ref,
                               atol=1e-3 * max(1.0, np.abs(depth_ref).max()))
