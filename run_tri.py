#!/usr/bin/env python
"""Single-scene triplane-conditioned driver (reference run_tri.py).

Coarse stage: plain DirectVoxGO geometry search. Fine stage: TriDVGO whose
color comes from 3 randomly chosen conditioning views (rgb ⊕ rays_o ⊕
rays_d), with optional dynamic downsampling of the conditioning images
(run_tri.py:457-465) and optional fixed conditioning views.
"""

import argparse
import os
import random

import numpy as np

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data import load_everything
from directvoxgo_tpu.engine import checkpoint as ckpt_lib
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine import train_conditioned as cond_lib
from directvoxgo_tpu.models.tri_dvgo import TriDVGO


def config_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', required=True)
    parser.add_argument('--seed', type=int, default=777)
    parser.add_argument('--no_reload', action='store_true')
    parser.add_argument('--no_reload_optimizer', action='store_true')
    parser.add_argument('--ft_path', type=str, default='')
    parser.add_argument('--render_only', action='store_true')
    parser.add_argument('--render_test', action='store_true')
    parser.add_argument('--render_train', action='store_true')
    parser.add_argument('--render_video', action='store_true')
    parser.add_argument('--render_video_factor', type=int, default=0)
    parser.add_argument('--eval_ssim', action='store_true')
    parser.add_argument('--eval_lpips_alex', action='store_true')
    parser.add_argument('--eval_lpips_vgg', action='store_true')
    parser.add_argument('--i_print', type=int, default=500)
    parser.add_argument('--i_weights', type=int, default=100000)
    return parser


def fine_stage(args, cfg, data_dict, coarse_ckpt_path):
    cfg_model = cfg.fine_model_and_render
    cfg_train = cfg.fine_train
    xyz_min, xyz_max = train_lib.compute_bbox_by_cam_frustrm(
        cfg=cfg, **data_dict)
    if cfg_model.get('use_coarse_geo', True) and coarse_ckpt_path:
        xyz_min, xyz_max = train_lib.compute_bbox_by_coarse_geo(
            model_class=train_lib.DirectVoxGO, model_path=coarse_ckpt_path,
            thres=cfg_model.bbox_thres)

    model_kwargs = {k: v for k, v in dict(cfg_model).items()
                    if k not in ('num_voxels', 'maskout_near_cam_vox',
                                 'world_bound_scale', 'stepsize',
                                 'use_coarse_geo', 'bbox_thres')}
    model = TriDVGO(xyz_min=xyz_min, xyz_max=xyz_max,
                    num_voxels=cond_lib.initial_num_voxels(
                        args, cfg, cfg_model, cfg_train, 'fine'),
                    mask_cache_path=coarse_ckpt_path, **model_kwargs)
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    opt_state = optimizer.init(model.params)

    render_kwargs = {
        'near': float(data_dict['near']), 'far': float(data_dict['far']),
        'bg': 1 if cfg.data.white_bkgd else 0,
        'stepsize': cfg_model.stepsize,
    }
    hit_kwargs = dict(render_kwargs, inverse_y=cfg.data.inverse_y,
                      flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y)

    i_train = data_dict['i_train']
    scene = {
        'images': [data_dict['images'][i] for i in i_train],
        'poses': data_dict['poses'][i_train],
        'HW': data_dict['HW'][i_train], 'Ks': data_dict['Ks'][i_train],
    }
    pool = cond_lib.gather_scene_ray_pool(model, cfg, cfg_train, scene,
                                          hit_kwargs)

    dynamic_down = int(cfg_train.get('dynamic_down', 1))
    fixed_idx = cfg_train.get('fixed_lr_idx')

    def cond_source(rng, scene_id):
        views = cond_lib.pick_conditioning_views(
            rng, len(i_train), k=3, fixed_idx=fixed_idx)
        down = int(rng.integers(2, dynamic_down)) if dynamic_down > 2 else 1
        return cond_lib.build_conditioning_batch(
            scene['images'], scene['poses'], scene['HW'], scene['Ks'],
            views, cfg.data, down=down)

    model, opt_state = cond_lib.train_conditioned_stage(
        args, cfg, cfg_train, model, optimizer, opt_state, [pool],
        cond_source, render_kwargs, stage='fine')
    return model


def eval_stage(args, cfg, data_dict, model_class=TriDVGO):
    """Render/eval the test split with fixed conditioning views encoded
    once (reference run_tri.py eval; run_multiscene.py:60-143 shape)."""
    from directvoxgo_tpu.engine import render_conditioned as rc

    ckpt_path = args.ft_path or os.path.join(cfg.basedir, cfg.expname,
                                             'fine_last.tar')
    ckpt_name = os.path.basename(ckpt_path)[:-4]
    model = ckpt_lib.load_model(model_class, ckpt_path)
    render_kwargs = {
        'near': float(data_dict['near']), 'far': float(data_dict['far']),
        'bg': 1 if cfg.data.white_bkgd else 0,
        'stepsize': cfg.fine_model_and_render.stepsize,
        'inverse_y': cfg.data.inverse_y,
        'flip_x': cfg.data.flip_x, 'flip_y': cfg.data.flip_y,
    }
    i_train = data_dict['i_train']
    view_ids = rc.eval_view_ids(cfg.fine_train, i_train, render=True)
    cond_views = [i_train[v] for v in view_ids]
    feats = rc.encode_conditioning(
        model, model.params,
        [data_dict['images'][i] for i in cond_views],
        data_dict['poses'][cond_views], data_dict['HW'][cond_views],
        data_dict['Ks'][cond_views], list(range(len(cond_views))),
        cfg.data)

    def run_split(idx, savedir, render_factor=0, gt=True):
        os.makedirs(savedir, exist_ok=True)
        rgbs, depths, _ = rc.render_viewpoints_conditioned(
            model, model.params, model.mask, lambda i: feats,
            render_poses=data_dict['poses'][idx],
            HW=data_dict['HW'][idx], Ks=data_dict['Ks'][idx],
            render_kwargs=render_kwargs,
            gt_imgs=[np.asarray(data_dict['images'][i]) for i in idx]
            if gt else None,
            savedir=savedir, render_factor=render_factor,
            eval_ssim=args.eval_ssim, eval_lpips_alex=args.eval_lpips_alex,
            eval_lpips_vgg=args.eval_lpips_vgg)
        rc.save_videos(savedir, rgbs, depths)

    if getattr(args, 'render_train', False):
        run_split(data_dict['i_train'],
                  os.path.join(cfg.basedir, cfg.expname,
                               f'render_train_{ckpt_name}'))
    if args.render_test:
        run_split(data_dict['i_test'],
                  os.path.join(cfg.basedir, cfg.expname,
                               f'render_test_{ckpt_name}'))
    if getattr(args, 'render_video', False):
        run_split(data_dict['i_test'],
                  os.path.join(cfg.basedir, cfg.expname,
                               f'render_video_{ckpt_name}'),
                  render_factor=getattr(args, 'render_video_factor', 0),
                  gt=False)


def main():
    args = config_parser().parse_args()
    cfg = Config.fromfile(args.config)
    np.random.seed(args.seed)
    random.seed(args.seed)
    data_dict = load_everything(args=args, cfg=cfg)
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)

    coarse_ckpt_path = None
    if not args.render_only:
        xyz_min_c, xyz_max_c = train_lib.compute_bbox_by_cam_frustrm(
            cfg=cfg, **data_dict)
        if cfg.coarse_train.N_iters > 0:
            train_lib.scene_rep_reconstruction(
                args=args, cfg=cfg, cfg_model=cfg.coarse_model_and_render,
                cfg_train=cfg.coarse_train, xyz_min=xyz_min_c,
                xyz_max=xyz_max_c, data_dict=data_dict, stage='coarse')
            coarse_ckpt_path = os.path.join(cfg.basedir, cfg.expname,
                                            'coarse_last.tar')
        fine_stage(args, cfg, data_dict, coarse_ckpt_path)
    if args.render_test or getattr(args, 'render_train', False) \
            or getattr(args, 'render_video', False):
        eval_stage(args, cfg, data_dict)
    print('Done')


if __name__ == '__main__':
    main()
