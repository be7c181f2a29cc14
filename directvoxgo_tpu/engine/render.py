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
