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

    rgbs, depths, psnrs, ssims, lp_alex, lp_vgg = [], [], [], [], [], []
    for i, c2w in enumerate(render_poses):
        H, W = HW[i]
        K = Ks[i]
        rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
            H, W, K, c2w, ndc, inverse_y=render_kwargs["inverse_y"],
            flip_x=flip_x, flip_y=flip_y)
        rgb, depth = render_rays_chunked(
            render_fn, model, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            viewdirs.reshape(-1, 3), chunk)
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


def make_render_fn(model, render_kwargs):
    """One jitted forward over (params, mask, ray chunk) -> (rgb, depth)."""
    kwargs = {k: v for k, v in render_kwargs.items()
              if k in ("near", "far", "bg", "stepsize")}

    @jax.jit
    def render_chunk(params, mask, ro, rd, vd):
        ret = model.forward(params, mask, ro, rd, vd,
                            render_depth=True, **kwargs)
        return ret["rgb_marched"], ret["depth"]

    return render_chunk


def render_rays_chunked(render_fn, model, rays_o, rays_d, viewdirs, chunk):
    n = rays_o.shape[0]
    n_pad = _round_up(max(n, 1), chunk)
    pad = n_pad - n
    ro = np.concatenate([rays_o, np.zeros((pad, 3), np.float32)])
    rd = np.concatenate([rays_d, np.ones((pad, 3), np.float32)])
    vd = np.concatenate([viewdirs, np.ones((pad, 3), np.float32)])
    rgb_out = np.empty((n_pad, 3), np.float32)
    dep_out = np.empty((n_pad,), np.float32)
    for i in range(0, n_pad, chunk):
        rgb, dep = render_fn(model.params, model.mask,
                             jnp.asarray(ro[i:i + chunk]),
                             jnp.asarray(rd[i:i + chunk]),
                             jnp.asarray(vd[i:i + chunk]))
        rgb_out[i:i + chunk] = np.asarray(rgb)
        dep_out[i:i + chunk] = np.asarray(dep)
    return rgb_out[:n], dep_out[:n]
