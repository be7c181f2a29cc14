#!/usr/bin/env python
"""Canonical experiment driver (behavioral port of the reference run.py).

Usage:
  python run.py --config configs/nerf/lego.py --render_test
"""

import argparse
import os
import random
import sys

import numpy as np

if os.environ.get("DVGO_FORCE_CPU"):
    # The container's sitecustomize programmatically overrides
    # jax_platforms, so JAX_PLATFORMS=cpu alone cannot detach the
    # accelerator; this hook can (used by tools/ab_count_views.py and as
    # a fallback when the device tunnel is degraded).
    import jax
    jax.config.update("jax_platforms", "cpu")

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data import load_everything
from directvoxgo_tpu.engine import checkpoint as ckpt_lib
from directvoxgo_tpu.engine import metrics as metrics_lib
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine.render import render_viewpoints
from directvoxgo_tpu.models.dvgo import DirectVoxGO
from directvoxgo_tpu import rays as ray_lib


def config_parser():
    """CLI flags 1:1 with the reference (run.py:17-54)."""
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--config', required=True, help='config file path')
    parser.add_argument('--seed', type=int, default=777, help='random seed')
    parser.add_argument('--data_parallel', action='store_true',
                        help='SPMD: shard ray batches over all devices '
                             '(grids/params replicated; TPU-native '
                             'capability, no reference analogue)')
    parser.add_argument('--no_reload', action='store_true',
                        help='do not reload weights from saved ckpt')
    parser.add_argument('--no_reload_optimizer', action='store_true',
                        help='do not reload optimizer state from saved ckpt')
    parser.add_argument('--ft_path', type=str, default='',
                        help='specific weights file to reload')
    parser.add_argument('--export_bbox_and_cams_only', type=str, default='',
                        help='export scene bbox and camera poses for 3d debug')
    parser.add_argument('--export_coarse_only', type=str, default='')
    parser.add_argument('--export_fine_only', type=str, default='')
    # testing options
    parser.add_argument('--render_only', action='store_true')
    parser.add_argument('--render_test', action='store_true')
    parser.add_argument('--render_train', action='store_true')
    parser.add_argument('--render_video', action='store_true')
    parser.add_argument('--render_video_factor', type=int, default=0)
    parser.add_argument('--eval_ssim', action='store_true')
    parser.add_argument('--eval_lpips_alex', action='store_true')
    parser.add_argument('--eval_lpips_vgg', action='store_true')
    # logging/saving options
    parser.add_argument('--i_print', type=int, default=500)
    parser.add_argument('--i_weights', type=int, default=100000)
    parser.add_argument('--profile_dir', type=str, default='',
                        help='capture a jax.profiler trace of training '
                             'into this directory (view with '
                             'tensorboard/xprof; host-side events always '
                             'record, device events where the runtime '
                             'supports them)')
    return parser


def seed_everything(seed):
    np.random.seed(seed)
    random.seed(seed)


def _export_alpha_rgb(cfg, stage, out_path):
    ckpt_path = os.path.join(cfg.basedir, cfg.expname, f'{stage}_last.tar')
    model = ckpt_lib.load_model(DirectVoxGO, ckpt_path)
    alpha = np.asarray(model.activate_density(model.params['density']))
    rgb = np.asarray(1.0 / (1.0 + np.exp(-np.asarray(model.params['k0']))))
    np.savez_compressed(out_path, alpha=alpha, rgb=rgb)
    print('done')


def main():
    args = config_parser().parse_args()
    cfg = Config.fromfile(args.config)
    seed_everything(args.seed)

    data_dict = load_everything(args=args, cfg=cfg)

    if args.export_bbox_and_cams_only:
        print('Export bbox and cameras...')
        xyz_min, xyz_max = train_lib.compute_bbox_by_cam_frustrm(
            cfg=cfg, **data_dict)
        poses, HW, Ks = data_dict['poses'], data_dict['HW'], data_dict['Ks']
        i_train = data_dict['i_train']
        near, far = data_dict['near'], data_dict['far']
        cam_lst = []
        for c2w, (H, W), K in zip(poses[i_train], HW[i_train], Ks[i_train]):
            rays_o, rays_d, _ = ray_lib.get_rays_of_a_view(
                H, W, K, c2w, cfg.data.ndc, inverse_y=cfg.data.inverse_y,
                flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y)
            cam_o = rays_o[0, 0]
            cam_d = rays_d[[0, 0, -1, -1], [0, -1, 0, -1]]
            cam_lst.append(np.array(
                [cam_o, *(cam_o + cam_d * max(near, far * 0.05))]))
        np.savez_compressed(args.export_bbox_and_cams_only,
                            xyz_min=xyz_min, xyz_max=xyz_max,
                            cam_lst=np.array(cam_lst))
        print('done')
        sys.exit()

    if args.export_coarse_only:
        print('Export coarse visualization...')
        _export_alpha_rgb(cfg, 'coarse', args.export_coarse_only)
        sys.exit()

    if args.export_fine_only:
        print('Export fine visualization...')
        _export_alpha_rgb(cfg, 'fine', args.export_fine_only)
        sys.exit()

    if not args.render_only:
        # wait_saves=False: the final checkpoint's device->host pull runs in
        # a writer thread that overlaps the evaluation below; main() joins
        # all writers before 'Done'.
        if args.profile_dir:
            import jax
            with jax.profiler.trace(args.profile_dir):
                train_lib.train(args, cfg, data_dict, wait_saves=False)
            print(f'profile: trace written to {args.profile_dir}')
        else:
            train_lib.train(args, cfg, data_dict, wait_saves=False)

    if args.render_test or args.render_train or args.render_video:
        if args.ft_path:
            ckpt_path = args.ft_path
        else:
            ckpt_path = os.path.join(cfg.basedir, cfg.expname,
                                     'fine_last.tar')
        ckpt_name = os.path.basename(ckpt_path)[:-4]
        model_class = train_lib._model_class_for(cfg)
        model = ckpt_lib.load_model(model_class, ckpt_path)
        render_viewpoints_kwargs = {
            'model': model,
            'ndc': cfg.data.ndc,
            'render_kwargs': {
                'near': data_dict['near'], 'far': data_dict['far'],
                'bg': 1 if cfg.data.white_bkgd else 0,
                'stepsize': cfg.fine_model_and_render.stepsize,
                'inverse_y': cfg.data.inverse_y,
                'flip_x': cfg.data.flip_x, 'flip_y': cfg.data.flip_y,
                'render_depth': True,
            },
            'flip_x': cfg.data.flip_x, 'flip_y': cfg.data.flip_y,
        }

    def _write_videos(savedir, rgbs, depths):
        import imageio.v2 as imageio
        try:
            imageio.mimwrite(os.path.join(savedir, 'video.rgb.mp4'),
                             metrics_lib.to8b(rgbs), fps=30, quality=8)
            imageio.mimwrite(os.path.join(savedir, 'video.depth.mp4'),
                             metrics_lib.to8b(1 - depths / np.max(depths)),
                             fps=30, quality=8)
        except (ValueError, ImportError) as e:
            # No ffmpeg backend available; frames are already saved as PNGs.
            print(f'video export skipped (no mp4 backend): {e}')

    if args.render_train:
        savedir = os.path.join(cfg.basedir, cfg.expname,
                               f'render_train_{ckpt_name}')
        os.makedirs(savedir, exist_ok=True)
        rgbs, depths, _ = render_viewpoints(
            render_poses=data_dict['poses'][data_dict['i_train']],
            HW=data_dict['HW'][data_dict['i_train']],
            Ks=data_dict['Ks'][data_dict['i_train']],
            gt_imgs=[np.asarray(data_dict['images'][i])
                     for i in data_dict['i_train']],
            savedir=savedir, eval_ssim=args.eval_ssim,
            eval_lpips_alex=args.eval_lpips_alex,
            eval_lpips_vgg=args.eval_lpips_vgg,
            **render_viewpoints_kwargs)
        _write_videos(savedir, rgbs, depths)

    if args.render_test:
        savedir = os.path.join(cfg.basedir, cfg.expname,
                               f'render_test_{ckpt_name}')
        os.makedirs(savedir, exist_ok=True)
        rgbs, depths, _ = render_viewpoints(
            render_poses=data_dict['poses'][data_dict['i_test']],
            HW=data_dict['HW'][data_dict['i_test']],
            Ks=data_dict['Ks'][data_dict['i_test']],
            gt_imgs=[np.asarray(data_dict['images'][i])
                     for i in data_dict['i_test']],
            savedir=savedir, eval_ssim=args.eval_ssim,
            eval_lpips_alex=args.eval_lpips_alex,
            eval_lpips_vgg=args.eval_lpips_vgg,
            **render_viewpoints_kwargs)
        _write_videos(savedir, rgbs, depths)

    if args.render_video:
        savedir = os.path.join(cfg.basedir, cfg.expname,
                               f'render_video_{ckpt_name}')
        os.makedirs(savedir, exist_ok=True)
        rgbs, depths, _ = render_viewpoints(
            render_poses=data_dict['render_poses'],
            HW=data_dict['HW'][data_dict['i_test']][[0]].repeat(
                len(data_dict['render_poses']), 0),
            Ks=data_dict['Ks'][data_dict['i_test']][[0]].repeat(
                len(data_dict['render_poses']), 0),
            render_factor=args.render_video_factor,
            savedir=savedir, **render_viewpoints_kwargs)
        _write_videos(savedir, rgbs, depths)

    # Join async checkpoint writers before declaring the run finished (the
    # interpreter would join the non-daemon threads anyway; doing it here
    # keeps 'Done' truthful and surfaces write errors in-run).
    ckpt_lib.wait_for_pending_saves()
    print('Done')


if __name__ == '__main__':
    main()
