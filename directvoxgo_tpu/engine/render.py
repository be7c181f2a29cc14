"""Viewpoint rendering / evaluation (reference run.py:57-143)."""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import metrics as metrics_lib
from .. import rays as ray_lib


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


# Minimum station-plane area (voxels) for 2D-windowed chunk rendering —
# below this the window bookkeeping can't pay for itself. Patchable so
# tests can force the windowed path on tiny grids.
WINDOWED_RENDER_MIN_PLANE = 128 * 128


def render_frame_ndc_tiles(render_fn, model, H, W, K, c2w, rk,
                           chunk=8192, tile_hw=(64, 128),
                           widths=(32, 48, 64, 96, 128)):
    """Whole-frame NDC (forced-axis MPI) render as device-resident pixel
    tiles.

    The generic chunked path (``render_rays_chunked``) is transport-bound
    for NDC frames on a remote device: ~95 chunks each pay a host->device
    ray upload and a device->host pull round trip, measured 7.7 s/frame at
    756x1008 while the per-chunk compute is ~5 ms (bench_dmpigo r5). This
    path removes every per-chunk transfer:

    * rays are generated ON DEVICE from the 3x3+3 camera
      (engine/train._rays_of_view_device, NDC branch) and tiled by device
      reshape — the host uploads only K and c2w;
    * each fixed-size pixel tile renders through the already-jitted
      ``render_fn`` as a composed (bp, eu, ev) clip window, exactly like
      the 2D-windowed chunk path. Per-tile windows come from the tile's
      extreme pixel-center rays: along a tile edge the station-plane
      coordinate is a Moebius function of the pixel index (NDC rays are
      projective in (i, j)) so edge extremes sit at the corner pixels, and
      per ray u(t) = o_u + t d_u is linear in t so traversal extremes sit
      at the clip-box p faces — 4 corners x 2 faces bound every interp row
      (same +-SEG_GUARD +-1 margins as ops/sweep.build_ray_segments_2d);
    * window extents snap UP to the ``widths`` lattice so tiles share
      compiled programs (and reuse the eval programs render_test already
      compiled);
    * all tile outputs are pulled in ONE batched ``jax.device_get``.

    Returns flat ``(rgb [H*W, 3], depth [H*W])`` like the chunked path, or
    None when the model has no forced sweep axis / the plane is tiny.
    """
    from ..ops import sweep as sweep_ops
    from .train import _rays_of_view_device

    axis = getattr(model, "forced_sweep_axis", None)
    if axis is None:
        return None
    perm = sweep_ops._PERMS[axis]
    gp = int(model.world_size[perm[0]])
    gu = int(model.world_size[perm[1]])
    gv = int(model.world_size[perm[2]])
    if gu * gv < WINDOWED_RENDER_MIN_PLANE:
        return None
    th, tw = tile_hw
    assert th * tw == chunk
    nth, ntw = -(-H // th), -(-W // tw)
    hp, wp = nth * th, ntw * tw

    if hasattr(model, "sweep_clip_for_axis"):
        csz, coff = model.sweep_clip_for_axis(axis)
    else:
        csz, coff = None, np.zeros(3, np.int32)
    if csz is not None:
        bp, bu, bv = (int(x) for x in csz)
        bpo, buo, bvo = (int(x) for x in np.asarray(coff))
    else:
        bp, bu, bv = gp, gu, gv
        bpo = buo = bvo = 0

    # --- host: per-tile windows from the corner pixel-center rays ---
    # (numpy raygen over the 4 corner pixels of every tile; padded tiles
    # use edge-clamped pixel indices, matching the device-side edge pad)
    r0 = np.arange(nth) * th
    r1 = np.minimum(r0 + th - 1, H - 1)
    c0 = np.arange(ntw) * tw
    c1 = np.minimum(c0 + tw - 1, W - 1)
    # [nth, ntw, 2, 2]: per tile, the 4 corner pixel centers
    jj = np.broadcast_to(
        np.stack([r0, r1], 1)[:, None, :, None].astype(np.float64),
        (nth, ntw, 2, 2)) + 0.5  # pixel row (j in raygen)
    ii = np.broadcast_to(
        np.stack([c0, c1], 1)[None, :, None, :].astype(np.float64),
        (nth, ntw, 2, 2)) + 0.5  # pixel col
    inverse_y = bool(rk.get("inverse_y", False))
    flip_x = bool(rk.get("flip_x", False))
    flip_y = bool(rk.get("flip_y", False))
    if flip_x:
        ii = W - ii
    if flip_y:
        jj = H - jj
    Kh = np.asarray(K, np.float64)
    c2wh = np.asarray(c2w, np.float64)
    if inverse_y:
        dirs = np.stack([(ii - Kh[0, 2]) / Kh[0, 0],
                         (jj - Kh[1, 2]) / Kh[1, 1],
                         np.ones_like(ii)], -1)
    else:
        dirs = np.stack([(ii - Kh[0, 2]) / Kh[0, 0],
                         -(jj - Kh[1, 2]) / Kh[1, 1],
                         -np.ones_like(ii)], -1)
    rd = dirs @ c2wh[:3, :3].T
    ro = np.broadcast_to(c2wh[:3, 3], rd.shape)
    focal, near_n = Kh[0, 0], 1.0
    t_sh = -(near_n + ro[..., 2]) / rd[..., 2]
    ros = ro + t_sh[..., None] * rd
    o0 = -1.0 / (W / (2.0 * focal)) * ros[..., 0] / ros[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * ros[..., 1] / ros[..., 2]
    o2 = 1.0 + 2.0 * near_n / ros[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (rd[..., 0] / rd[..., 2]
                                       - ros[..., 0] / ros[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rd[..., 1] / rd[..., 2]
                                       - ros[..., 1] / ros[..., 2])
    d2 = -2.0 * near_n / ros[..., 2]
    ondc = np.stack([o0, o1, o2], -1)
    dndc = np.stack([d0, d1, d2], -1)

    xyz_min = np.asarray(model.xyz_min, np.float64)
    xyz_max = np.asarray(model.xyz_max, np.float64)
    ws = np.asarray(model.world_size, np.float64)

    def vox(arr, ax):
        scale = (float(ws[ax]) - 1.0) / (xyz_max[ax] - xyz_min[ax])
        return (arr[..., ax] - xyz_min[ax]) * scale, scale

    op_, _ = vox(ondc, perm[0])
    ou_, su = vox(ondc, perm[1])
    ov_, sv = vox(ondc, perm[2])
    dp_ = dndc[..., perm[0]] * ((float(ws[perm[0]]) - 1.0)
                                / (xyz_max[perm[0]] - xyz_min[perm[0]]))
    du_ = dndc[..., perm[1]] * su
    dv_ = dndc[..., perm[2]] * sv
    dp_ = np.where(np.abs(dp_) < 1e-10, 1e-10, dp_)
    t0 = (float(bpo) - op_) / dp_
    t1 = (float(bpo + bp - 1) - op_) / dp_
    guard = sweep_ops.SEG_GUARD
    u_ends = np.stack([ou_ + t0 * du_, ou_ + t1 * du_])
    v_ends = np.stack([ov_ + t0 * dv_, ov_ + t1 * dv_])
    u_ends = np.clip(u_ends, buo - 1.0, float(buo + bu))
    v_ends = np.clip(v_ends, bvo - 1.0, float(bvo + bv))
    # u_ends axes: 0 = clip-box face, (1, 2) = (nth, ntw), (3, 4) = corners
    red = (0, 3, 4)
    u0t = np.maximum(0, np.floor(u_ends.min(axis=red) - guard))
    u1t = np.minimum(gu - 1, np.floor(u_ends.max(axis=red) + guard) + 1)
    v0t = np.maximum(0, np.floor(v_ends.min(axis=red) - guard))
    v1t = np.minimum(gv - 1, np.floor(v_ends.max(axis=red) + guard) + 1)
    need_u = (u1t - u0t + 1).astype(np.int64)
    need_v = (v1t - v0t + 1).astype(np.int64)

    def snap(need, g, box):
        ws_ = [w for w in sorted(widths) if w < box]
        out = np.full(need.shape, box, np.int64)
        for w in reversed(ws_):
            out = np.where(need <= w, w, out)
        return out

    eu_t = snap(need_u, gu, bu)
    ev_t = snap(need_v, gv, bv)

    # --- device: raygen once, tile by reshape (edge-pad to tile grid) ---
    ro_d, rd_d, vd_d = _rays_of_view_device(
        jnp.asarray(np.asarray(K, np.float32)),
        jnp.asarray(np.asarray(c2w, np.float32)), h=H, w=W, ndc=True,
        inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)

    def tiled(a):
        img = a.reshape(H, W, 3)
        img = jnp.pad(img, ((0, hp - H), (0, wp - W), (0, 0)), mode="edge")
        return img.reshape(nth, th, ntw, tw, 3).transpose(
            0, 2, 1, 3, 4).reshape(nth * ntw, th * tw, 3)

    ro_t, rd_t, vd_t = tiled(ro_d), tiled(rd_d), tiled(vd_d)

    outs = []
    for k in range(nth * ntw):
        ti, tj = divmod(k, ntw)
        eu = int(eu_t[ti, tj])
        ev = int(ev_t[ti, tj])
        if (eu, ev) == (bu, bv):
            sizes = (bp, bu, bv) if csz is not None else None
            off = np.asarray([bpo, buo, bvo], np.int32)
        else:
            sizes = (bp, eu, ev)
            off = np.asarray(
                [bpo,
                 min(max(int(u0t[ti, tj]), buo), buo + bu - eu),
                 min(max(int(v0t[ti, tj]), bvo), bvo + bv - ev)],
                np.int32)
        outs.append(render_fn(model.params, model.mask, ro_t[k], rd_t[k],
                              vd_t[k], axis, sizes, jnp.asarray(off)))
    # One batched transfer for every tile. (Per-tile copy_to_host_async
    # during the dispatch loop measured SLOWER here — 1.97 s vs 1.24 s —
    # the eager copy RPCs contend with the remaining dispatch RPCs on the
    # tunneled transport.)
    pulled = jax.device_get(outs)
    rgb = np.stack([p[0] for p in pulled]).reshape(
        nth, ntw, th, tw, 3).transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3)
    dep = np.stack([p[1] for p in pulled]).reshape(
        nth, ntw, th, tw).transpose(0, 2, 1, 3).reshape(hp, wp)
    return (np.ascontiguousarray(rgb[:H, :W]).reshape(-1, 3),
            np.ascontiguousarray(dep[:H, :W]).reshape(-1))


def render_viewpoints(model, render_poses, HW, Ks, ndc, render_kwargs,
                      gt_imgs=None, savedir=None, render_factor=0,
                      eval_ssim=False, eval_lpips_alex=False,
                      eval_lpips_vgg=False, chunk=8192,
                      flip_x=False, flip_y=False, verbose=True):
    """Render a list of poses; compute metrics when GT is given.

    Rays are processed in fixed-size padded chunks so a single jitted render
    function serves every view (the reference uses 8192-ray chunks,
    run.py:91-99; on TPU larger chunks amortize launch overhead better, so
    ``chunk`` is configurable).
    """
    assert len(render_poses) == len(HW) and len(HW) == len(Ks)
    if render_factor != 0:
        HW = np.copy(HW) // render_factor
        Ks = np.copy(Ks)
        Ks[:, :2, :3] = Ks[:, :2, :3] / render_factor

    render_fn = make_render_fn(model, render_kwargs)
    use_frame_sweep = (not ndc and getattr(render_fn, "use_sweep", False))
    if use_frame_sweep:
        from . import render_sweep as render_sweep_lib

    from .fetchguard import guarded, timeout_default
    rgbs, depths, psnrs, ssims, lp_alex, lp_vgg = [], [], [], [], [], []
    for i, c2w in enumerate(render_poses):
        H, W = HW[i]
        K = Ks[i]
        out = None
        # per-view watchdog guard (4x budget: covers first-view compiles
        # and the frame pull) — a wedged transport aborts for resume
        # instead of hanging the whole eval
        with guarded(f"eval view {i}", timeout=4 * timeout_default()):
            if use_frame_sweep:
                # Whole-frame separable sweep (MXU path); returns None when
                # the camera geometry rules it out -> per-ray fallback.
                out = render_sweep_lib.render_frame_sweep(
                    model, int(H), int(W), np.asarray(K), np.asarray(c2w),
                    render_kwargs)
            elif ndc and getattr(render_fn, "use_sweep", False):
                # Forced-axis MPI frames: device-resident tiled render (no
                # per-chunk transfers); None -> chunked fallback below.
                out = render_frame_ndc_tiles(
                    render_fn, model, int(H), int(W), np.asarray(K),
                    np.asarray(c2w),
                    {**render_kwargs, "flip_x": flip_x, "flip_y": flip_y})
            if out is not None:
                rgb, depth = out
            else:
                rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
                    H, W, K, c2w, ndc,
                    inverse_y=render_kwargs["inverse_y"],
                    flip_x=flip_x, flip_y=flip_y)
                rgb, depth = render_rays_chunked(
                    render_fn, model, rays_o.reshape(-1, 3),
                    rays_d.reshape(-1, 3), viewdirs.reshape(-1, 3), chunk)
        rgb = rgb.reshape(H, W, 3)
        depth = depth.reshape(H, W, 1)
        rgbs.append(rgb)
        depths.append(depth)
        if i == 0 and verbose:
            print("Testing", rgb.shape)
        if gt_imgs is not None and render_factor == 0:
            gt = np.asarray(gt_imgs[i], np.float32)
            psnrs.append(metrics_lib.psnr(rgb, gt))
            if eval_ssim:
                ssims.append(metrics_lib.rgb_ssim(rgb, gt, max_val=1))
            if eval_lpips_alex:
                lp_alex.append(metrics_lib.rgb_lpips(gt, rgb, "alex"))
            if eval_lpips_vgg:
                lp_vgg.append(metrics_lib.rgb_lpips(gt, rgb, "vgg"))

    if len(psnrs) and verbose:
        print("Testing psnr", np.mean(psnrs), "(avg)")
        if eval_ssim:
            print("Testing ssim", np.mean(ssims), "(avg)")
        if eval_lpips_vgg:
            print("Testing lpips (vgg)", np.mean(lp_vgg), "(avg)")
        if eval_lpips_alex:
            print("Testing lpips (alex)", np.mean(lp_alex), "(avg)")

    if savedir is not None:
        print(f"Writing images to {savedir}")
        import imageio.v2 as imageio
        for i, rgb in enumerate(rgbs):
            imageio.imwrite(os.path.join(savedir, f"{i:03d}.png"),
                            metrics_lib.to8b(rgb))

    stats = {"psnr": psnrs, "ssim": ssims,
             "lpips_alex": lp_alex, "lpips_vgg": lp_vgg}
    return np.array(rgbs), np.array(depths), stats


def make_render_fn(model, render_kwargs, mesh=None):
    """One jitted forward over (params, mask, ray chunk) -> (rgb, depth).

    For sweep-mode models the chunk's static dominant ``axis`` selects the
    station-sweep fast path (rays are grouped by axis in
    :func:`render_rays_chunked`). ``mesh`` (1-D 'data' mesh or None) shards
    the ray chunk across devices with grids/params replicated — same SPMD
    contract as the train step (engine/train.py make_train_step)."""
    kwargs = {k: v for k, v in render_kwargs.items()
              if k in ("near", "far", "bg", "stepsize")}
    use_sweep = (getattr(model, "query_mode", "gather") == "sweep"
                 and hasattr(model, "forward_sweep"))

    jit_kw = {}
    if mesh is not None:
        from ..parallel import replicate, shard_rays
        rep, rs = replicate(mesh), shard_rays(mesh)
        jit_kw = dict(in_shardings=(rep, rep, rs, rs, rs, rep),
                      out_shardings=(rs, shard_rays(mesh, ndim=1)))

    @functools.partial(jax.jit, static_argnums=(5, 6), **jit_kw)
    def render_chunk(params, mask, ro, rd, vd, axis, clip_sizes, clip_off):
        if axis is None:
            ret = model.forward(params, mask, ro, rd, vd,
                                render_depth=True, **kwargs)
        else:
            ret = model.forward_sweep(params, mask, ro, rd, vd, axis,
                                      render_depth=True,
                                      clip_sizes=clip_sizes,
                                      clip_offsets=clip_off, **kwargs)
        return ret["rgb_marched"], ret["depth"]

    render_chunk.use_sweep = use_sweep
    return render_chunk


def render_rays_chunked(render_fn, model, rays_o, rays_d, viewdirs, chunk):
    """Render a flat ray list in fixed-size padded chunks.

    Sweep-mode models require each chunk to share a dominant axis, so rays
    are partitioned host-side into (at most) three groups first; results are
    scattered back into frame order. Chunk results are pulled asynchronously
    (device arrays collected, one host sync at the end) to hide dispatch
    latency."""
    n = rays_o.shape[0]
    rgb_out = np.empty((n, 3), np.float32)
    dep_out = np.empty((n,), np.float32)
    if getattr(render_fn, "use_sweep", False):
        forced = getattr(model, "forced_sweep_axis", None)
        if forced is not None:
            out = _render_rays_windowed_2d(render_fn, model, rays_o, rays_d,
                                           viewdirs, chunk, int(forced))
            if out is not None:
                return out
            parts = [(int(forced), np.arange(n))]
        else:
            from ..ops import sweep as sweep_ops
            groups = sweep_ops.dominant_axis(rays_d, model.xyz_min,
                                             model.xyz_max, model.world_size)
            parts = [(int(ax), np.flatnonzero(groups == ax))
                     for ax in range(3)]
            parts = [(ax, idx) for ax, idx in parts if len(idx)]
    else:
        parts = [(None, np.arange(n))]
    for axis, idx in parts:
        if axis is not None and hasattr(model, "sweep_clip_for_axis"):
            clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
        else:
            clip_sizes, clip_off = None, np.zeros(3, np.int32)
        clip_off = jnp.asarray(clip_off)
        n_g = len(idx)
        n_pad = _round_up(max(n_g, 1), chunk)
        pad = n_pad - n_g
        ro = np.concatenate([rays_o[idx], np.zeros((pad, 3), np.float32)])
        rd = np.concatenate([rays_d[idx], np.ones((pad, 3), np.float32)])
        vd = np.concatenate([viewdirs[idx], np.ones((pad, 3), np.float32)])
        outs = []
        for i in range(0, n_pad, chunk):
            outs.append(render_fn(model.params, model.mask,
                                  jnp.asarray(ro[i:i + chunk]),
                                  jnp.asarray(rd[i:i + chunk]),
                                  jnp.asarray(vd[i:i + chunk]), axis,
                                  clip_sizes, clip_off))
        rgb_g = np.concatenate([np.asarray(o[0]) for o in outs])[:n_g]
        dep_g = np.concatenate([np.asarray(o[1]) for o in outs])[:n_g]
        rgb_out[idx] = rgb_g
        dep_out[idx] = dep_g
    return rgb_out, dep_out


def _render_rays_windowed_2d(render_fn, model, rays_o, rays_d, viewdirs,
                             chunk, axis):
    """2D (u, v)-windowed chunked rendering for forced-axis MPI sweeps.

    A z-station of an MPI grid is a whole image plane (LLFF fern:
    404x323 voxels vs a 4096-ray chunk), so an unwindowed chunk pays
    ``gu*gv`` FLOPs per station regardless of how few pixels it covers.
    Frame rays are forward-facing and near-parallel, so Morton-contiguous
    segments are image TILES with compact in-plane footprints across every
    depth — the same observation the training engine exploits
    (ops/sweep.build_ray_segments_2d; engine/train.py next_chunk). Each
    (Wu, Wv) class renders as a composed clip box with traced offsets
    through the already-jitted ``render_fn`` — one extra compile per class,
    shared across all frames of an eval run. Exact, not approximate: every
    interp row of every segment ray lies inside its box (endpoint-bounded
    supports, +-1 voxel margin), identical to the training-step guarantee.

    Returns ``(rgb, depth)`` numpy arrays, or None when windows can't help
    (tiny planes / everything falls back) — caller uses the plain path.
    """
    from ..ops import sweep as sweep_ops
    perm = sweep_ops._PERMS[axis]
    gp = int(model.world_size[perm[0]])
    gu = int(model.world_size[perm[1]])
    gv = int(model.world_size[perm[2]])
    if gu * gv < WINDOWED_RENDER_MIN_PLANE:
        return None
    n = rays_o.shape[0]
    n_pad = _round_up(max(n, 1), chunk)
    # The segment builder keeps only full n_rand-sized segments; pad with
    # copies of ray 0 (NOT zeros — pads must classify like real rays) so
    # every real ray lands in exactly one segment.
    pad = n_pad - n
    ro = np.concatenate([rays_o, np.repeat(rays_o[:1], pad, 0)]) \
        .astype(np.float32)
    rd = np.concatenate([rays_d, np.repeat(rays_d[:1], pad, 0)]) \
        .astype(np.float32)
    vd = np.concatenate([viewdirs, np.repeat(viewdirs[:1], pad, 0)]) \
        .astype(np.float32)
    # Compose with the occupancy clip box exactly like the training draws:
    # window offsets are clamped into the box; clamping never uncovers
    # support∩bbox (rows outside the bbox have interpolated mask == 0).
    if hasattr(model, "sweep_clip_for_axis"):
        csz, coff = model.sweep_clip_for_axis(axis)
    else:
        csz, coff = None, np.zeros(3, np.int32)
    if csz is not None:
        bp, bu, bv = (int(x) for x in csz)
        bpo, buo, bvo = (int(x) for x in np.asarray(coff))
    else:
        bp, bu, bv = gp, gu, gv
        bpo = buo = bvo = 0
    buckets = sweep_ops.build_ray_segments_2d(
        ro, rd, model.xyz_min, model.xyz_max, model.world_size, axis,
        n_rand=chunk, clip_box=(bpo, bpo + bp - 1, buo, buo + bu - 1,
                                bvo, bvo + bv - 1) if csz is not None
        else None)

    def eff(k):
        # a 0 slot (or a window >= the box extent) means full extent
        return (k[0] if 0 < k[0] < bu else bu,
                k[1] if 0 < k[1] < bv else bv)

    if not buckets or all(k == (0, 0) or eff(k) == (bu, bv)
                          for k in buckets):
        return None
    rgb_out = np.empty((n_pad, 3), np.float32)
    dep_out = np.empty((n_pad,), np.float32)
    pend = []
    full_off = jnp.asarray(np.asarray([bpo, buo, bvo], np.int32))
    for key in sorted(buckets):
        idx, ulo, vlo = buckets[key]
        wu, wv = eff(key)
        windowed = key != (0, 0) and (wu, wv) != (bu, bv)
        for s in range(idx.shape[0]):
            sel = idx[s]
            if windowed:
                off = np.asarray(
                    [bpo,
                     min(max(int(ulo[s]), buo), buo + bu - wu),
                     min(max(int(vlo[s]), bvo), bvo + bv - wv)], np.int32)
                sizes, off_j = (bp, wu, wv), jnp.asarray(off)
            else:
                sizes, off_j = (csz, full_off) if csz is not None \
                    else (None, full_off)
            o = render_fn(model.params, model.mask, jnp.asarray(ro[sel]),
                          jnp.asarray(rd[sel]), jnp.asarray(vd[sel]),
                          axis, sizes, off_j)
            pend.append((sel, o))
    from .fetchguard import guarded, timeout_default
    with guarded("eval frame chunks", timeout=4 * timeout_default()):
        for sel, (rgb, dep) in pend:  # one late sync: device pulls amortize
            rgb_out[sel] = np.asarray(rgb)
            dep_out[sel] = np.asarray(dep)
    return rgb_out[:n], dep_out[:n]
