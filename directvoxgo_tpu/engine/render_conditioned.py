"""Viewpoint rendering / evaluation for image-conditioned models.

The reference's conditioned drivers each clone ``render_viewpoints`` with the
same structure: encode the conditioning features ONCE (3 fixed train views,
``cfg.fine_train.fixed_lr_idx`` — run_multiscene.py:60-143,
run_tri_multiscene_v2.py:64-143), then render each pose in 8192-ray chunks
via ``model.render(feats, ...)``. The SR driver instead conditions on the
rendered view's own LR image (run_sr.py render_viewpoints, lr_imgs per view).

Here both shapes share one implementation: ``feats_for_view`` maps a view
index to an (already encoded, device-resident) conditioning-feature pytree;
drivers with shared conditioning pass a constant closure over a single
encode, the SR driver encodes per view.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import metrics as metrics_lib
from . import train_conditioned as cond_lib
from .. import rays as ray_lib


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


def make_cond_render_fn(model, render_kwargs, scene_id=None):
    """One jitted chunk renderer over (params, mask, feats, rays).

    For multiscene models ``scene_id`` selects the per-scene density grid
    and mask slice before rendering (tri_dvgo_multiscene forward semantics).
    """
    kwargs = {k: v for k, v in render_kwargs.items()
              if k in ("near", "far", "bg", "stepsize")}

    @jax.jit
    def render_chunk(params, mask, feats, ro, rd, vd):
        p, m = params, mask
        if scene_id is not None and getattr(p["density"], "ndim", 3) == 4:
            p = dict(params)
            p["density"] = params["density"][scene_id]
            m = mask[scene_id]
        ret = model.render(p, m, feats, ro, rd, vd, render_depth=True,
                           **kwargs)
        return ret["rgb_marched"], ret["depth"]

    return render_chunk


def encode_conditioning(model, params, images, poses, HW, Ks, view_ids,
                        cfg_data, scene_id=None, down=1):
    """Encode fixed conditioning views once (run_multiscene.py:84).

    Returns the feats pytree (and drops aux losses for models that emit
    them)."""
    rgb_lr, pose_lr = cond_lib.build_conditioning_batch(
        images, poses, HW, Ks, view_ids, cfg_data, down=down)
    rgb_lr = jnp.asarray(rgb_lr)
    pose_lr = jnp.asarray(pose_lr)
    try:
        out = model.encode_feat(params, rgb_lr, pose_lr, scene_id=scene_id) \
            if scene_id is not None \
            else model.encode_feat(params, rgb_lr, pose_lr)
    except TypeError:
        out = model.encode_feat(params, rgb_lr)
    if isinstance(out, tuple):  # (feats, consistency, cosine)
        out = out[0]
    return out


def render_viewpoints_conditioned(model, params, mask, feats_for_view,
                                  render_poses, HW, Ks, render_kwargs,
                                  gt_imgs=None, savedir=None,
                                  render_factor=0, eval_ssim=False,
                                  eval_lpips_alex=False,
                                  eval_lpips_vgg=False, chunk=8192,
                                  scene_id=None, verbose=True):
    """Render poses with per-view conditioning feats; metrics vs GT.

    Mirrors engine/render.render_viewpoints (reference run.py:57-143) with
    the conditioned chunk renderer; ``render_kwargs`` must carry
    inverse_y/flip_x/flip_y for ray generation.
    """
    assert len(render_poses) == len(HW) and len(HW) == len(Ks)
    HW = np.asarray(HW)
    Ks = np.asarray(Ks, np.float32)
    if render_factor != 0:
        HW = np.copy(HW) // render_factor
        Ks = np.copy(Ks)
        Ks[:, :2, :3] = Ks[:, :2, :3] / render_factor

    render_fn = make_cond_render_fn(model, render_kwargs, scene_id=scene_id)
    inverse_y = bool(render_kwargs.get("inverse_y", False))
    flip_x = bool(render_kwargs.get("flip_x", False))
    flip_y = bool(render_kwargs.get("flip_y", False))

    rgbs, depths = [], []
    psnrs, ssims, lp_alex, lp_vgg = [], [], [], []
    for i, c2w in enumerate(render_poses):
        H, W = int(HW[i][0]), int(HW[i][1])
        feats = feats_for_view(i)
        rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
            H, W, Ks[i], c2w, ndc=False, inverse_y=inverse_y,
            flip_x=flip_x, flip_y=flip_y)
        ro = np.asarray(rays_o).reshape(-1, 3)
        rd = np.asarray(rays_d).reshape(-1, 3)
        vd = np.asarray(viewdirs).reshape(-1, 3)
        n = ro.shape[0]
        n_pad = _round_up(n, chunk)
        pad = n_pad - n
        ro = np.concatenate([ro, np.zeros((pad, 3), np.float32)])
        rd = np.concatenate([rd, np.ones((pad, 3), np.float32)])
        vd = np.concatenate([vd, np.ones((pad, 3), np.float32)])
        outs = []
        for s in range(0, n_pad, chunk):
            outs.append(render_fn(params, mask, feats,
                                  jnp.asarray(ro[s:s + chunk]),
                                  jnp.asarray(rd[s:s + chunk]),
                                  jnp.asarray(vd[s:s + chunk])))
        rgb = np.concatenate([np.asarray(o[0]) for o in outs])[:n]
        dep = np.concatenate([np.asarray(o[1]) for o in outs])[:n]
        rgb = rgb.reshape(H, W, 3)
        dep = dep.reshape(H, W, 1)
        rgbs.append(rgb)
        depths.append(dep)
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


def eval_view_ids(cfg_train, i_train, k=3, render=False):
    """Conditioning views for eval: ``fixed_lr_idx`` (or
    ``fixed_lr_idx_render`` for render_test in v2 — v2:752) when configured,
    else the first k train views (deterministic)."""
    key = "fixed_lr_idx_render" if render else "fixed_lr_idx"
    idx = cfg_train.get(key) or cfg_train.get("fixed_lr_idx")
    if idx:
        return list(idx)[:k]
    return list(range(min(k, len(i_train))))


def save_videos(savedir, rgbs, depths, fps=30):
    """rgb + inverted-depth mp4 exports (run.py:614-615)."""
    import imageio.v2 as imageio
    imageio.mimwrite(os.path.join(savedir, "video.rgb.mp4"),
                     metrics_lib.to8b(rgbs), fps=fps, quality=8)
    dmax = max(float(np.max(depths)), 1e-9)
    imageio.mimwrite(os.path.join(savedir, "video.depth.mp4"),
                     metrics_lib.to8b(1.0 - depths / dmax), fps=fps,
                     quality=8)
