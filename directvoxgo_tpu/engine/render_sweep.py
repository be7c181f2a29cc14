"""Camera-frame station-sweep renderer (separable shear-warp, MXU-native).

The per-ray station sweep (ops/sweep.py) costs one [N, Gu] interp matmul per
station — fine for 8k-ray train batches, quadratic-ish for an 800x800 frame.
For a *camera* frame all rays share one center of projection, so the slab ->
image resampling factorizes (Lacroute & Levoy shear-warp, adapted to voxel
radiance fields):

  1. Parameterize rays by their intersection (Ur, Vr) with a reference plane
     p = p_ref perpendicular to the dominant view axis. A regular (Ur, Vr)
     grid = the *intermediate image*; each intermediate pixel is one ray
     through the camera center.
  2. At station p_s the ray grid lands on the slab at ``U = lam_s*(Ur - ou)
     + ou`` with ``lam_s = (p_s - op)/(p_ref - op)`` — an axis-aligned scale
     + shift, so the slab resample is two tiny shared 1-D interp matmuls
     ``Au_s @ D_s @ Av_s^T`` instead of per-ray weight rows.
  3. Stations are composited front-to-back in a streaming scan (transmittance
     carry, early termination at T < 1e-3 like the reference's alpha2weight,
     render_utils_kernel.cu:447-455), evaluating the color MLP per station on
     the warped features with the per-pixel view embedding's first-layer
     contribution hoisted out of the loop.
  4. The composited intermediate image is warped to screen pixels by the
     (single) homography between the reference plane and the image plane.

Per-sample math matches lib/dvgo.py:450-577 (same trilinear values at
stations, same raw2alpha with the per-ray interval, same compositing and
``fast_color_thres`` masking); only the quadrature points differ from the
reference's arbitrary-t samples, as in the per-ray sweep.

Restriction: every frame ray must share the dominant axis (|half FOV| < 45
degrees toward the grid); `plan_camera_sweep` detects violations and the
caller falls back to the per-ray sweep path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import rays as ray_lib
from ..models import mlp as mlp_lib
from ..ops import raymarch as rm
from ..ops import sweep as sweep_ops

# Intermediate-image oversampling vs screen pixel density, and the shape
# quantum that bounds recompiles across poses (orbit renders then share a
# handful of compiled shapes; the persistent compilation cache keeps warm
# starts cheap). Retuned round 3: 1.25/512 -> 1.1/128 cut the 800^2 x
# 160^3 frame 59.6 -> 39.3 ms at unchanged cross-implementation agreement
# (52.8 dB frame-vs-per-ray-sweep) — the 512 quantum was padding the
# 880-pixel intermediate back up to 1024, and oversampling also densifies
# stations (spacing /= OVERSAMPLE). 1.1 keeps a sharpness margin over 1.0
# (36.1 ms) for scenes with more high-frequency content than the fixture.
OVERSAMPLE = 1.1
SHAPE_QUANTUM = 128
# Station-count quantum (padded with inert mask=0 slabs).
S_QUANTUM = 64
# Minimum |unit_d_axis| over the frame's corner rays. Station spacing along
# a ray is stepsize/|unit_d_axis| voxels, so 0.25 allows up to 2-voxel
# spacing at the extreme frame corners (object-centered scenes keep their
# content near the center where spacing stays near the reference's 0.5);
# frames below the bound fall back to the per-ray sweep.
MIN_CORNER_UNIT_DP = 0.25


def _round_up(x, m):
    return int(np.ceil(x / m)) * m


def _active_bbox_vox(model):
    """Bounding box (voxel coords, padded by 1) of the occupancy mask.

    The TPU analogue of the reference's maskcache free-space skipping at the
    whole-frame level: stations and intermediate-image footprint are clipped
    to this box. Cached per mask array."""
    cache = getattr(model, "_active_bbox_cache", None)
    if cache is not None and cache[0] is model.mask:
        return cache[1]
    from ..ops.grid import mask_bbox_vox
    box = mask_bbox_vox(model.mask)
    model._active_bbox_cache = (model.mask, box)
    return box


def _rays_at_pixels(H, W, K, c2w, pix_ji, inverse_y, flip_x, flip_y):
    """Ray directions at selected (row, col) pixels — rays.get_rays 'center'
    mode semantics without materializing the full H x W grid (planning only
    needs corners/center, and the full grid costs ~45 ms per 800^2 frame)."""
    c2w = np.asarray(c2w, np.float64)
    K = np.asarray(K, np.float64)
    jj = np.asarray([p[0] for p in pix_ji], np.float64) + 0.5
    ii = np.asarray([p[1] for p in pix_ji], np.float64) + 0.5
    if flip_x:
        ii = W - ii
    if flip_y:
        jj = H - jj
    if inverse_y:
        dirs = np.stack([(ii - K[0][2]) / K[0][0],
                         (jj - K[1][2]) / K[1][1], np.ones_like(ii)], -1)
    else:
        dirs = np.stack([(ii - K[0][2]) / K[0][0],
                         -(jj - K[1][2]) / K[1][1], -np.ones_like(ii)], -1)
    return dirs @ c2w[:3, :3].T


def plan_camera_sweep(model, H, W, K, c2w, near, far, inverse_y=False,
                      flip_x=False, flip_y=False, stepsize=0.5):
    """Host-side geometry for one camera. Returns None when the separable
    sweep does not apply (rays disagree on the dominant axis)."""
    pix = [(0, 0), (0, W - 1), (H - 1, 0), (H - 1, W - 1),
           (H // 2, W // 2), (H // 2, W // 2 + 1), (H // 2 + 1, W // 2)]
    d7 = _rays_at_pixels(H, W, K, c2w, pix, inverse_y, flip_x, flip_y)
    rays_o00 = np.asarray(c2w, np.float64)[:3, 3]
    ws = np.asarray(model.world_size, np.float64)
    scale = (ws - 1.0) / (np.asarray(model.xyz_max, np.float64)
                          - np.asarray(model.xyz_min, np.float64))
    d_vox_corners = d7[:4] * scale
    d_vox_center = d7[4] * scale
    axis = int(np.argmax(np.abs(d_vox_center)))
    # all corner rays must march the same way along the axis, away from zero
    dp = np.concatenate([d_vox_corners[:, axis:axis + 1].ravel(),
                         d_vox_center[axis:axis + 1]])
    if not ((dp > 1e-6).all() or (dp < -1e-6).all()):
        return None
    unit_dp = np.abs(d_vox_corners[:, axis]) / np.linalg.norm(
        d_vox_corners, axis=1)
    if unit_dp.min() < MIN_CORNER_UNIT_DP:
        return None

    perm = sweep_ops._PERMS[axis]
    o_vox = (rays_o00 - np.asarray(model.xyz_min)) * scale
    op = float(o_vox[axis])
    gp = int(ws[axis])
    sign = 1.0 if dp[0] > 0 else -1.0
    # reference plane: the slab plane farthest from the camera
    p_ref = float(gp - 1) if sign > 0 else 0.0

    # Project the *occupied* bbox corners through the camera center onto the
    # ref plane (maskcache-driven footprint clipping).
    act_lo, act_hi = _active_bbox_vox(model)
    corners = np.stack(np.meshgrid(
        *[(act_lo[a], act_hi[a]) for a in perm],
        indexing="ij"), -1).reshape(-1, 3)
    o_pv = o_vox[list(perm)]
    denom = corners[:, 0] - o_pv[0]
    ok = np.abs(denom) > 1e-9
    lam = (p_ref - o_pv[0]) / denom[ok]
    lam = np.clip(lam, 0.0, 1e6)
    ur = o_pv[1] + lam * (corners[ok, 1] - o_pv[1])
    vr = o_pv[2] + lam * (corners[ok, 2] - o_pv[2])
    gu, gv = ws[perm[1]], ws[perm[2]]
    # ur/vr bounds of anything visible, clamped to the slab footprint scaled
    # by the worst-case magnification (<= full plane extent is enough).
    ur_lo, ur_hi = max(ur.min(), -gu), min(ur.max(), 2 * gu)
    vr_lo, vr_hi = max(vr.min(), -gv), min(vr.max(), 2 * gv)

    # Screen-pixel density on the reference plane: how far apart adjacent
    # pixel rays land on it (take the center pixel's spacing).
    d_pv = d7[4] * scale
    d_pv = d_pv[list(perm)]
    t_ref = (p_ref - o_pv[0]) / d_pv[0]
    du_px = (d7[5] - d7[4]) * scale
    dv_px = (d7[6] - d7[4]) * scale
    spacing = min(
        np.linalg.norm((du_px[list(perm)] * t_ref)[1:]),
        np.linalg.norm((dv_px[list(perm)] * t_ref)[1:]))
    spacing = max(spacing / OVERSAMPLE, 1e-3)
    hi = _round_up(min((ur_hi - ur_lo) / spacing + 2, 4 * max(H, W)),
                   SHAPE_QUANTUM)
    wi = _round_up(min((vr_hi - vr_lo) / spacing + 2, 4 * max(H, W)),
                   SHAPE_QUANTUM)

    return {
        "axis": axis, "perm": perm, "sign": sign, "p_ref": p_ref,
        "o_pv": tuple(float(v) for v in o_pv),
        "ur_range": (float(ur_lo), float(ur_hi)),
        "vr_range": (float(vr_lo), float(vr_hi)),
        "hi": int(hi), "wi": int(wi), "gp": gp,
        "gu": int(gu), "gv": int(gv),
        "p_active": (float(act_lo[axis]), float(act_hi[axis])),
    }


def _interp_matrix(coords, g, dtype):
    """[M] continuous coords -> [M, g] hat-function interp rows."""
    iota = jax.lax.broadcasted_iota(jnp.float32, (1, g), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - iota)
                       ).astype(dtype)


@functools.partial(jax.jit, static_argnames=(
    "c", "k", "guv", "sign", "rgb_mode"))
def _sweep_frame_core(grid_perm, rgbnet_params, vd_emb_map, dnorm_map,
                      dclip_map, ur_grid, vr_grid, sc, *, c, k, guv, sign,
                      rgb_mode):
    """Jitted streaming composite over stations.

    grid_perm: [Gp, Gu, Gv*C] (bf16) permuted stacked grid
    vd_emb_map: [Hi, Wi, E] per-intermediate-pixel view embedding (or None)
    dnorm_map:  [Hi, Wi] world-space |d| for the ray of each pixel, with d
                normalized so t=lam (the station fraction along o->ref).
    dclip_map:  [Hi, Wi] |d . f_cam| — lam * dclip is the reference ray
                parameter; near/far clip in it (matches the per-ray paths).
    ur_grid/vr_grid: [Hi], [Wi] reference-plane coordinates.
    sc: [10] f32 runtime scalars (op, ou, ov, p_ref, act_shift,
        voxel_size_base, fast_thres, near, far, bg) — runtime, not static,
        so orbit poses share one compiled program per shape.
    """
    op, ou, ov, p_ref = sc[0], sc[1], sc[2], sc[3]
    act_shift, interval_base = sc[4], sc[5]
    fast_thres, near, far, bg = sc[6], sc[7], sc[8], sc[9]
    gu, gv = guv
    hi, wi = ur_grid.shape[0], vr_grid.shape[0]

    slabs = sweep_ops._station_slabs(grid_perm, k)
    s_total = slabs.shape[0]
    p_stations = jnp.arange(s_total, dtype=jnp.float32) / k
    if sign < 0:  # march back-to-front in slab order -> reverse
        slabs = slabs[::-1]
        p_stations = p_stations[::-1]

    inv_span = 1.0 / (p_ref - op)
    bf16 = jnp.bfloat16

    # Hoist the view-dependent half of the MLP's first layer (constant per
    # pixel across stations). For the non-direct mode the MLP consumes only
    # k0[..., 3:] and its logits are offset by k0[..., :3]
    # (lib/dvgo.py:536-539).
    feat_lo = 5 if rgb_mode == "logit_plus_k0" else 2
    if rgbnet_params is not None:
        w1 = rgbnet_params["layers"][0]["w"]
        b1 = rgbnet_params["layers"][0]["b"]
        d1 = c - feat_lo  # MLP feature channels
        shared1 = jnp.dot(vd_emb_map.astype(bf16),
                          w1[d1:].astype(bf16),
                          preferred_element_type=jnp.float32) \
            + b1.astype(jnp.float32)
        w1a = w1[:d1].astype(bf16)
        rest = rgbnet_params["layers"][1:]

    def body(carry, inp):
        t_cum, rgb_acc, depth_acc = carry
        d_s, p_s = inp
        lam = (p_s - op) * inv_span  # in (0, 1]; t of this station
        u = ou + lam * (ur_grid - ou)   # [Hi]
        v = ov + lam * (vr_grid - ov)   # [Wi]
        au = _interp_matrix(u, gu, bf16)          # [Hi, Gu]
        av = _interp_matrix(v, gv, bf16)          # [Wi, Gv]
        t1 = jax.lax.dot(au, d_s, preferred_element_type=jnp.float32)
        t1 = t1.reshape(hi, gv, c)
        warped = jax.lax.dot_general(
            t1.astype(bf16), av,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [Hi, C, Wi]
        warped = jnp.transpose(warped, (0, 2, 1))  # [Hi, Wi, C]

        density = warped[..., 0]
        mask_s = warped[..., 1]
        dist = lam * dnorm_map                      # world distance along ray
        t_px = lam * dclip_map                      # reference ray parameter
        interval = (dnorm_map * (inv_span / k)) / interval_base
        alpha = rm.raw2alpha(density, act_shift, jnp.abs(interval))
        valid = (t_px >= near) & (t_px <= far) & (mask_s > 0) \
            & (alpha > fast_thres)
        active = t_cum >= rm.T_TERMINATE
        alpha = jnp.where(valid & active, alpha, 0.0)
        w = t_cum * alpha

        if rgbnet_params is not None:
            k0 = warped[..., feat_lo:]
            h = jax.lax.dot_general(
                k0.astype(bf16), w1a,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + shared1
            h = jax.nn.relu(h)
            for i, layer in enumerate(rest):
                h = jax.lax.dot_general(
                    h.astype(bf16), layer["w"].astype(bf16),
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) \
                    + layer["b"].astype(jnp.float32)
                if i < len(rest) - 1:
                    h = jax.nn.relu(h)
            if rgb_mode == "logit_plus_k0":
                rgb = jax.nn.sigmoid(h + warped[..., 2:5])
            else:
                rgb = jax.nn.sigmoid(h)
        else:
            rgb = jax.nn.sigmoid(warped[..., 2:5])

        rgb_acc = rgb_acc + w[..., None] * rgb
        depth_acc = depth_acc + w * dist
        t_cum = t_cum * (1.0 - alpha + rm.T_EPS)
        return (t_cum, rgb_acc, depth_acc), ()

    init = (jnp.ones((hi, wi), jnp.float32),
            jnp.zeros((hi, wi, 3), jnp.float32),
            jnp.zeros((hi, wi), jnp.float32))
    (t_cum, rgb_acc, depth_acc), _ = jax.lax.scan(
        body, init, (slabs, p_stations))
    rgb = rgb_acc + t_cum[..., None] * bg
    return rgb, depth_acc, t_cum


@functools.partial(jax.jit, static_argnames=(
    "axis", "sign", "k", "s_lo", "s_hi", "s_pad", "has_k0"))
def _build_slabs(density, mask, k0, *, axis, sign, k, s_lo, s_hi, s_pad,
                 has_k0):
    """Station slabs for the fused frame kernel, in march order + padded."""
    sdt = jnp.bfloat16
    geo = jnp.stack([density.astype(sdt), mask.astype(sdt)], -1)
    d_geo = sweep_ops._station_slabs(
        sweep_ops.permute_grid_cmajor(geo, axis, dtype=sdt),
        k)[s_lo:s_hi + 1]
    d_k0 = None
    if has_k0:
        # [Gp, F*Gu, Gv]: transposed channel-major slabs (v3 kernel layout;
        # row c*Gu+U, col V — one matmul warps all channels at once).
        perm = sweep_ops._PERMS[axis]
        k0p = jnp.transpose(k0.astype(sdt), (*perm, 3))
        gp, gu_, gv_, c_ = k0p.shape
        k0p = jnp.transpose(k0p, (0, 3, 1, 2)).reshape(gp, c_ * gu_, gv_)
        d_k0 = sweep_ops._station_slabs(k0p, k)[s_lo:s_hi + 1]
    if sign < 0:
        d_geo = d_geo[::-1]
        if d_k0 is not None:
            d_k0 = d_k0[::-1]
    if s_pad:
        d_geo = jnp.concatenate(
            [d_geo, jnp.zeros((s_pad, *d_geo.shape[1:]), d_geo.dtype)], 0)
        if d_k0 is not None:
            d_k0 = jnp.concatenate(
                [d_k0, jnp.zeros((s_pad, *d_k0.shape[1:]), d_k0.dtype)], 0)
    return d_geo, d_k0


def _get_render_slabs(model, axis, sign, k, s_lo, s_hi, s_pad):
    """Per-(params, axis, sign) cache: slabs are pose-independent, and an
    orbit alternates between a handful of (axis, sign) combinations, so all
    of them stay resident; the whole cache is dropped when the model arrays
    change (otherwise stale grids would be retained)."""
    key = (axis, float(sign), k, s_lo, s_hi, s_pad)
    arrs = (model.params["density"], model.params.get("k0"), model.mask)
    cache = getattr(model, "_render_slab_cache", None)
    if cache is None or not all(a is b for a, b in zip(cache[0], arrs)):
        cache = (arrs, {})
        model._render_slab_cache = cache
    if key not in cache[1]:
        cache[1][key] = _build_slabs(
            model.params["density"], model.mask, model.params.get("k0"),
            axis=axis, sign=float(sign), k=k, s_lo=s_lo, s_hi=s_hi,
            s_pad=s_pad, has_k0=model.k0_dim > 0)
    return cache[1][key]


@functools.partial(jax.jit, static_argnames=(
    "hw", "hiwi", "guv", "perm", "has_mlp", "rgb_mode", "viewbase_pe",
    "f_mlp", "inverse_y", "flip_x", "flip_y", "interpret", "compact",
    "kernel_v", "pix_fmt"))
def _render_frame_fused(d_geo, d_k0, rgbnet_params, km, c2w, sc, *, hw,
                        hiwi, guv, perm, has_mlp, rgb_mode, viewbase_pe,
                        f_mlp, inverse_y, flip_x, flip_y, interpret,
                        compact=False, kernel_v=3, pix_fmt="rgb8"):
    """One dispatch per frame: intermediate grids, view embeddings, the
    fused Pallas composite, and the homography warp to screen — everything
    pose-dependent is a runtime scalar/array so orbit poses share one
    compiled program per (shape, axis) pair."""
    from ..ops.pallas_render3 import render_frame_pallas3
    from ..ops.grid import bilinear_sample_parts
    h_px, w_px = hw
    hi, wi = hiwi
    axis = perm[0]
    bf16 = jnp.bfloat16
    (op, ou, ov) = sc[0], sc[1], sc[2]
    (ur0, dur, vr0, dvr) = sc[12], sc[13], sc[14], sc[15]
    (w_dp, inv_su, inv_sv) = sc[16], sc[17], sc[18]
    p_ref, bg = sc[19], sc[11]

    ur_grid = ur0 + dur * jnp.arange(hi, dtype=jnp.float32)
    vr_grid = vr0 + dvr * jnp.arange(wi, dtype=jnp.float32)
    du = (ur_grid - ou) * inv_su
    dv = (vr_grid - ov) * inv_sv
    dnorm = jnp.sqrt(w_dp ** 2 + du[:, None] ** 2 + dv[None, :] ** 2)
    # |d . f_cam|: the reference ray parameter of a station is
    # t = lam * dclip (pixel dirs are z-normalized in get_rays, so
    # |rays_d| = |d| / |d . f_cam|); near/far clip in t like the per-ray
    # paths (ADVICE round 1: the two paths previously disagreed by |rays_d|).
    fwd_axis = c2w[:3, 2]
    dclip = jnp.abs(w_dp * fwd_axis[axis]
                    + du[:, None] * fwd_axis[perm[1]]
                    + dv[None, :] * fwd_axis[perm[2]])

    shared1 = None
    vd_emb_cl = None
    mlp_params = None
    if has_mlp:
        comps = [None, None, None]
        comps[axis] = jnp.broadcast_to(w_dp, (hi, wi))
        comps[perm[1]] = jnp.broadcast_to(du[:, None], (hi, wi))
        comps[perm[2]] = jnp.broadcast_to(dv[None, :], (hi, wi))
        viewdirs = jnp.stack(comps, -1) / jnp.maximum(dnorm[..., None],
                                                      1e-12)
        vd_emb = mlp_lib.positional_encoding(viewdirs, viewbase_pe)
        layers = rgbnet_params["layers"]
        w1, b1 = layers[0]["w"], layers[0]["b"]
        mlp_params = {"w1a": w1[:f_mlp], "w2": layers[1]["w"],
                      "b2": layers[1]["b"], "w3": layers[2]["w"],
                      "b3": layers[2]["b"]}
        if kernel_v == 4:
            # v4 computes the hoisted first-layer view term in-kernel from
            # the channel-leading embedding (the [Hi,Wi,width] shared1
            # blocks would re-fetch on every step of its station-major
            # grid).
            vd_emb_cl = jnp.transpose(vd_emb, (2, 0, 1)).astype(bf16)
            mlp_params["w1b"] = w1[f_mlp:]
            mlp_params["b1"] = b1
        else:
            shared1 = (jnp.dot(vd_emb.astype(bf16),
                               w1[f_mlp:].astype(bf16),
                               preferred_element_type=jnp.float32)
                       + b1).astype(bf16)

    activity = _tile_activity(d_geo, ur_grid, vr_grid, sc, guv[0], guv[1])
    if kernel_v == 4:
        from ..ops.pallas_render4 import render_frame_pallas4
        rgb_cl, inter_depth, inter_ainv = render_frame_pallas4(
            d_geo, d_k0, vd_emb_cl, dnorm, dclip, ur_grid, vr_grid,
            mlp_params, sc[:12], activity=activity, guv=guv,
            has_mlp=has_mlp, rgb_mode=rgb_mode, interpret=interpret)
    else:
        rgb_cl, inter_depth, inter_ainv = render_frame_pallas3(
            d_geo, d_k0, shared1, dnorm, dclip, ur_grid, vr_grid,
            mlp_params, sc[:12], activity=activity, guv=guv,
            has_mlp=has_mlp, rgb_mode=rgb_mode, interpret=interpret)
    inter_rgb = jnp.transpose(rgb_cl, (1, 2, 0))

    # Homography warp to screen (ray convention of rays.get_rays).
    ii = jnp.arange(w_px, dtype=jnp.float32) + 0.5
    jj = jnp.arange(h_px, dtype=jnp.float32) + 0.5
    if flip_x:
        ii = ii[::-1]
    if flip_y:
        jj = jj[::-1]
    i2 = jnp.broadcast_to(ii[None, :], (h_px, w_px))
    j2 = jnp.broadcast_to(jj[:, None], (h_px, w_px))
    if inverse_y:
        dirs = jnp.stack([(i2 - km[0, 2]) / km[0, 0],
                          (j2 - km[1, 2]) / km[1, 1],
                          jnp.ones_like(i2)], -1)
    else:
        dirs = jnp.stack([(i2 - km[0, 2]) / km[0, 0],
                          -(j2 - km[1, 2]) / km[1, 1],
                          -jnp.ones_like(i2)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    scale3 = jnp.stack([sc[20], sc[21], sc[22]])
    d_pv = rays_d * scale3
    dp_px = d_pv[..., axis]
    dp_safe = jnp.where(jnp.abs(dp_px) < 1e-12, 1e-12, dp_px)
    t_ref = (p_ref - op) / dp_safe
    ur_px = ou + t_ref * d_pv[..., perm[1]]
    vr_px = ov + t_ref * d_pv[..., perm[2]]
    valid = (t_ref > 0) & (ur_px >= ur_grid[0]) & (ur_px <= ur_grid[-1]) \
        & (vr_px >= vr_grid[0]) & (vr_px <= vr_grid[-1])
    ur_l = (ur_px - ur0) / jnp.maximum(dur, 1e-12)
    vr_l = (vr_px - vr0) / jnp.maximum(dvr, 1e-12)
    packed = jnp.concatenate([inter_rgb, inter_depth[..., None],
                              inter_ainv[..., None]], -1)
    out = bilinear_sample_parts(packed, ur_l, vr_l)
    rgb = jnp.where(valid[..., None], out[..., :3], bg)
    depth = jnp.where(valid, out[..., 3], 0.0)
    if compact:
        depth = depth.astype(jnp.float16)
        if pix_fmt == "yuv420":
            # Planar I420 display stream: full-range BT.601 luma + 2x2
            # box-filtered chroma, packed [Y | U | V] uint8 — 1.5 B/px vs
            # rgb8's 3, i.e. half the device->host pull for a display/
            # encoder consumer (exactly the format video sinks ingest).
            r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            u = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
            v = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
            h2, w2 = h_px // 2, w_px // 2
            u = u[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2).mean((1, 3))
            v = v[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2).mean((1, 3))
            to8 = lambda a: jnp.round(  # noqa: E731
                jnp.clip(a, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            buf = jnp.concatenate(
                [to8(y).reshape(-1), to8(u).reshape(-1), to8(v).reshape(-1)])
            return buf, depth
        # Compact host-pull dtypes (the dev tunnel moves ~30 MB/s; a frame
        # of f32 rgb costs ~240 ms to fetch): to8b rgb + f16 depth.
        rgb = jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return rgb, depth


def _tile_activity(d_geo, ur_grid, vr_grid, sc, gu, gv):
    """Per-(image tile, station block) conservative occupancy test.

    The fused kernel's per-tile early termination only helps BEHIND
    content; rays crossing empty space never terminate, so every tile
    otherwise pays the geometry warp for all stations. This computes, per
    TILE x TILE intermediate tile and S_BLK station block, whether the
    tile's warped footprint (exact corner bounds — u is bilinear in
    (lam, ur)) padded by the 1-voxel interpolation support touches any
    occupied voxel, via a per-block 2D integral image of the slab mask
    channel. Inactive blocks contribute exactly zero (mask=0 -> alpha=0,
    transmittance unchanged), so the kernel skips them — the whole-frame
    analogue of the reference maskcache's per-sample skipping
    (render_utils_kernel.cu:447-455).
    """
    from ..ops.pallas_render3 import TILE, S_BLK
    nsb = d_geo.shape[0] // S_BLK
    hi, wi = ur_grid.shape[0], vr_grid.shape[0]
    nti, ntj = hi // TILE, wi // TILE
    occ = (d_geo[:, :, gv:] > 0).reshape(nsb, S_BLK, gu, gv).any(1)
    integ = jnp.cumsum(jnp.cumsum(occ.astype(jnp.int32), axis=1), axis=2)
    integ = jnp.pad(integ, ((0, 0), (1, 0), (1, 0)))
    op, ou, ov = sc[0], sc[1], sc[2]
    inv_span, p_first, p_step = sc[3], sc[4], sc[5]
    s0 = jnp.arange(nsb, dtype=jnp.float32) * S_BLK
    lam_a = (p_first + p_step * s0 - op) * inv_span
    lam_b = (p_first + p_step * (s0 + (S_BLK - 1)) - op) * inv_span
    urt = ur_grid.reshape(nti, TILE)
    vrt = vr_grid.reshape(ntj, TILE)

    def axis_range(o, r_lo, r_hi):
        cs = jnp.stack([o + l[None, :] * (r[:, None] - o)
                        for l in (lam_a, lam_b) for r in (r_lo, r_hi)])
        return cs.min(0), cs.max(0)          # [n_tiles, nsb]

    u_lo, u_hi = axis_range(ou, urt.min(1), urt.max(1))
    v_lo, v_hi = axis_range(ov, vrt.min(1), vrt.max(1))
    u0 = jnp.clip(jnp.ceil(u_lo - 1.0), 0, gu).astype(jnp.int32)
    u1 = jnp.clip(jnp.floor(u_hi + 1.0) + 1, 0, gu).astype(jnp.int32)
    v0 = jnp.clip(jnp.ceil(v_lo - 1.0), 0, gv).astype(jnp.int32)
    v1 = jnp.clip(jnp.floor(v_hi + 1.0) + 1, 0, gv).astype(jnp.int32)
    u1 = jnp.maximum(u1, u0)
    v1 = jnp.maximum(v1, v0)
    s_idx = jnp.broadcast_to(jnp.arange(nsb)[None, None, :],
                             (nti, ntj, nsb))
    U0 = jnp.broadcast_to(u0[:, None, :], (nti, ntj, nsb))
    U1 = jnp.broadcast_to(u1[:, None, :], (nti, ntj, nsb))
    V0 = jnp.broadcast_to(v0[None, :, :], (nti, ntj, nsb))
    V1 = jnp.broadcast_to(v1[None, :, :], (nti, ntj, nsb))
    cnt = (integ[s_idx, U1, V1] - integ[s_idx, U0, V1]
           - integ[s_idx, U1, V0] + integ[s_idx, U0, V0])
    return (cnt > 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("h", "w", "bg"))
def _warp_to_screen(inter_rgb, inter_depth, inter_alphainv, ur_px, vr_px,
                    valid_px, *, h, w, bg):
    """Homography resample: intermediate image -> screen pixels."""
    from ..ops.grid import bilinear_sample_parts
    packed = jnp.concatenate(
        [inter_rgb, inter_depth[..., None], inter_alphainv[..., None]], -1)
    out = bilinear_sample_parts(packed, ur_px, vr_px)
    rgb = jnp.where(valid_px[..., None], out[..., :3],
                    jnp.full((1, 1, 3), float(bg), jnp.float32))
    depth = jnp.where(valid_px, out[..., 3], 0.0)
    alphainv = jnp.where(valid_px, out[..., 4], 1.0)
    return rgb, depth, alphainv


def precompile_frames(model, cams, render_kwargs, max_workers=4,
                      backend=None, output="numpy"):
    """Compile every distinct frame-sweep program for ``cams`` concurrently.

    ``cams`` is a sequence of (H, W, K, c2w). Pose parameters are runtime
    scalars, so an orbit needs at most one compiled program per
    (axis, intermediate-shape, station-count) signature — usually two. The
    XLA service on this stack compiles remotely (~1-2 min per program,
    cold); overlapping the requests in threads makes warmup cost the max,
    not the sum. Returns the number of programs compiled.
    """
    import concurrent.futures as cf

    near = float(render_kwargs["near"])
    far = float(render_kwargs["far"])
    stepsize = float(render_kwargs["stepsize"])
    inverse_y = bool(render_kwargs.get("inverse_y", False))
    flip_x = bool(render_kwargs.get("flip_x", False))
    flip_y = bool(render_kwargs.get("flip_y", False))
    k = sweep_ops.substeps_for_stepsize(stepsize)
    seen = {}
    for (H, W, K, c2w) in cams:
        plan = plan_camera_sweep(model, int(H), int(W), np.asarray(K),
                                 np.asarray(c2w), near, far,
                                 inverse_y=inverse_y, flip_x=flip_x,
                                 flip_y=flip_y, stepsize=stepsize)
        if plan is None:
            continue
        p_lo, p_hi = plan["p_active"]
        s_n = int(np.ceil(p_hi * k)) - int(np.floor(p_lo * k)) + 1
        sig = (plan["axis"], plan["sign"], plan["hi"], plan["wi"],
               plan["gu"], plan["gv"],
            _round_up(s_n, S_QUANTUM))
        seen.setdefault(sig, (int(H), int(W), np.asarray(K),
                              np.asarray(c2w), plan))
    if not seen:
        return 0
    with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = [ex.submit(render_frame_sweep, model, H, W, K, c2w,
                          render_kwargs, plan=plan, backend=backend,
                          output=output)
                for (H, W, K, c2w, plan) in seen.values()]
        for f in futs:
            f.result()
    return len(seen)


def _use_pallas():
    import os
    if os.environ.get("DVGO_NO_PALLAS"):
        return False
    return jax.devices()[0].platform != "cpu"


def _pick_kernel_v(model, d_geo, d_k0, guv, hi, wi):
    """v4 (station-major grid: slabs stream once per frame) whenever its
    scratch + slab blocks fit scoped VMEM; v3 otherwise. DVGO_RENDER_V
    overrides for A/B runs."""
    import os
    env = os.environ.get("DVGO_RENDER_V")
    if env:
        return int(env)
    from ..ops.pallas_render4 import v4_vmem_estimate
    f_k0 = 0 if d_k0 is None else d_k0.shape[1] // guv[0]
    width = 0
    emb = 0
    if model.has_rgbnet:
        width = model.params["rgbnet"]["layers"][1]["w"].shape[0]
        emb = 3 + 6 * int(model.viewbase_pe)
    est = v4_vmem_estimate(d_geo.shape[0], guv[0], guv[1], f_k0, width,
                           emb, hi, wi)
    return 4 if est <= 100 * 1024 * 1024 else 3


def render_frame_sweep(model, H, W, K, c2w, render_kwargs, plan=None,
                       backend=None, output="numpy"):
    """Render one camera frame with the separable station sweep.

    ``backend``: 'pallas' (fused TPU kernel, default on accelerators),
    'pallas_interpret' (the same kernel interpreted — CPU tests), or 'xla'
    (scan-of-matmuls fallback, default on CPU).

    ``output``: 'numpy' (default) pulls f32 results to the host;
    'device' returns the jax arrays without syncing (callers can pipeline
    pulls against the next frame's dispatch); 'device_compact' additionally
    converts rgb to uint8 and depth to f16 in-kernel to shrink the pull
    (pallas backend only); 'device_yuv420' packs a planar I420 uint8
    display buffer [H*W*3//2] instead of rgb (half the pull bytes — what a
    display/video-encoder consumer ingests).

    Returns (rgb [H,W,3], depth [H,W]), or None when the camera geometry
    rules the sweep out (caller falls back to per-ray rendering).
    """
    near = float(render_kwargs["near"])
    far = float(render_kwargs["far"])
    bg = float(render_kwargs["bg"])
    stepsize = float(render_kwargs["stepsize"])
    inverse_y = bool(render_kwargs.get("inverse_y", False))
    flip_x = bool(render_kwargs.get("flip_x", False))
    flip_y = bool(render_kwargs.get("flip_y", False))
    if plan is None:
        plan = plan_camera_sweep(model, H, W, K, c2w, near, far,
                                 inverse_y=inverse_y, flip_x=flip_x,
                                 flip_y=flip_y, stepsize=stepsize)
    if plan is None:
        return None
    if model.has_rgbnet and (model.rgbnet_full_implicit
                             or model.posbase_pe > 0):
        return None  # rare variants: per-ray sweep fallback

    k = sweep_ops.substeps_for_stepsize(stepsize)
    perm = plan["perm"]
    hi, wi = plan["hi"], plan["wi"]
    op, ou, ov = plan["o_pv"]
    p_ref = plan["p_ref"]
    rgb_mode = "direct"
    if model.has_rgbnet and not model.rgbnet_direct:
        rgb_mode = "logit_plus_k0"
    if backend is None:
        backend = "pallas" if _use_pallas() else "xla"

    if backend.startswith("pallas"):
        sign = plan["sign"]
        p_lo, p_hi = plan["p_active"]
        s_lo = int(np.floor(p_lo * k))
        s_hi = int(np.ceil(p_hi * k))
        from ..ops.pallas_render3 import S_BLK
        s_pad = (-(s_hi - s_lo + 1)) % max(S_QUANTUM, S_BLK)
        d_geo, d_k0 = _get_render_slabs(model, plan["axis"], sign, k,
                                        s_lo, s_hi, s_pad)
        if sign > 0:
            p_first, p_step = s_lo / k, 1.0 / k
        else:
            p_first, p_step = s_hi / k, -1.0 / k
        inv_span = 1.0 / (p_ref - op)
        ws = np.asarray(model.world_size, np.float64)
        ext = (np.asarray(model.xyz_max, np.float64)
               - np.asarray(model.xyz_min, np.float64))
        inv_scale = ext / (ws - 1.0)  # voxel -> world per axis
        scale = (ws - 1.0) / ext
        ur_lo, ur_hi = plan["ur_range"]
        vr_lo, vr_hi = plan["vr_range"]
        sc = jnp.asarray([
            op, ou, ov, inv_span, p_first, p_step, model.act_shift,
            abs(p_step * inv_span) / model.voxel_size_base,
            model.fast_color_thres, near, far, bg,
            ur_lo, (ur_hi - ur_lo) / (hi - 1),
            vr_lo, (vr_hi - vr_lo) / (wi - 1),
            (p_ref - op) * inv_scale[plan["axis"]],
            inv_scale[perm[1]], inv_scale[perm[2]],
            p_ref, scale[0], scale[1], scale[2]], jnp.float32)
        f_mlp = 0
        rgbnet_params = None
        if model.has_rgbnet:
            rgbnet_params = model.params["rgbnet"]
            f_mlp = model.k0_dim - (3 if rgb_mode == "logit_plus_k0" else 0)
        kernel_v = _pick_kernel_v(model, d_geo, d_k0,
                                  (plan["gu"], plan["gv"]), hi, wi)
        rgb, depth = _render_frame_fused(
            d_geo, d_k0, rgbnet_params, jnp.asarray(K, jnp.float32),
            jnp.asarray(c2w, jnp.float32), sc, hw=(int(H), int(W)),
            hiwi=(hi, wi), guv=(plan["gu"], plan["gv"]), perm=perm,
            has_mlp=model.has_rgbnet, rgb_mode=rgb_mode,
            viewbase_pe=int(model.viewbase_pe), f_mlp=f_mlp,
            inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
            interpret=(backend == "pallas_interpret"),
            compact=(output in ("device_compact", "device_yuv420")),
            kernel_v=kernel_v,
            pix_fmt=("yuv420" if output == "device_yuv420" else "rgb8"))
        if output.startswith("device"):
            return rgb, depth
        return np.asarray(rgb), np.asarray(depth)

    # ------------------------------------------------- XLA fallback path
    sdt = jnp.bfloat16
    chans = [model.params["density"].astype(sdt)[..., None],
             model.mask.astype(sdt)[..., None]]
    if model.k0_dim > 0:
        chans.append(model.params["k0"].astype(sdt))
    grid_cat = jnp.concatenate(chans, -1)
    c = grid_cat.shape[-1]
    grid_perm = sweep_ops.permute_grid(grid_cat, plan["axis"], dtype=sdt)

    ur_grid = np.linspace(plan["ur_range"][0], plan["ur_range"][1], hi,
                          dtype=np.float32)
    vr_grid = np.linspace(plan["vr_range"][0], plan["vr_range"][1], wi,
                          dtype=np.float32)

    # Per-intermediate-pixel world direction d = P(ref) - o (t == lam).
    ws = np.asarray(model.world_size, np.float64)
    ext = (np.asarray(model.xyz_max, np.float64)
           - np.asarray(model.xyz_min, np.float64))
    inv_scale = ext / (ws - 1.0)  # voxel -> world per axis
    d_p = np.full((hi, wi), p_ref - op, np.float32) * inv_scale[plan["axis"]]
    d_u = ((ur_grid - ou)[:, None] * np.ones((1, wi), np.float32)
           * inv_scale[perm[1]])
    d_v = (np.ones((hi, 1), np.float32) * (vr_grid - ov)[None, :]
           * inv_scale[perm[2]])
    d_world = np.zeros((hi, wi, 3), np.float32)
    d_world[..., plan["axis"]] = d_p
    d_world[..., perm[1]] = d_u
    d_world[..., perm[2]] = d_v
    dnorm = np.linalg.norm(d_world, axis=-1)
    viewdirs = d_world / np.maximum(dnorm[..., None], 1e-12)
    dclip = np.abs(d_world @ np.asarray(c2w[:3, 2], np.float64)
                   ).astype(np.float32)

    vd_emb = None
    rgbnet_params = None
    if model.has_rgbnet:
        rgbnet_params = model.params["rgbnet"]
        vd_emb = mlp_lib.positional_encoding(jnp.asarray(viewdirs),
                                             model.viewbase_pe)

    sc = jnp.asarray([op, ou, ov, p_ref, model.act_shift,
                      model.voxel_size_base, model.fast_color_thres,
                      near, far, bg], jnp.float32)
    inter_rgb, inter_depth, inter_ainv = _sweep_frame_core(
        grid_perm, rgbnet_params, vd_emb, jnp.asarray(dnorm),
        jnp.asarray(dclip), jnp.asarray(ur_grid), jnp.asarray(vr_grid), sc,
        c=c, k=k, guv=(plan["gu"], plan["gv"]), sign=plan["sign"],
        rgb_mode=rgb_mode)

    # Homography to screen: each screen pixel's ray hits the ref plane at
    # (Ur, Vr); sample the intermediate image there (in grid coordinates of
    # the intermediate pixel lattice).
    rays_o, rays_d, _ = ray_lib.get_rays_of_a_view(
        H, W, K, c2w, ndc=False, inverse_y=inverse_y,
        flip_x=flip_x, flip_y=flip_y)
    rays_d = np.asarray(rays_d)
    scale = (ws - 1.0) / ext
    d_pv = rays_d * scale  # [H, W, 3] voxel-space dirs
    dp_px = d_pv[..., plan["axis"]]
    dp_safe = np.where(np.abs(dp_px) < 1e-12, 1e-12, dp_px)
    t_ref = (p_ref - op) / dp_safe
    ur_px = ou + t_ref * d_pv[..., perm[1]]
    vr_px = ov + t_ref * d_pv[..., perm[2]]
    valid_px = (t_ref > 0) & (ur_px >= ur_grid[0]) & (ur_px <= ur_grid[-1]) \
        & (vr_px >= vr_grid[0]) & (vr_px <= vr_grid[-1])
    ur_l = (ur_px - ur_grid[0]) / max(ur_grid[1] - ur_grid[0], 1e-12)
    vr_l = (vr_px - vr_grid[0]) / max(vr_grid[1] - vr_grid[0], 1e-12)
    rgb, depth, _ = _warp_to_screen(
        inter_rgb, inter_depth, inter_ainv,
        jnp.asarray(ur_l.astype(np.float32)),
        jnp.asarray(vr_l.astype(np.float32)),
        jnp.asarray(valid_px), h=H, w=W, bg=bg)
    return np.asarray(rgb), np.asarray(depth)
