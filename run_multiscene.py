#!/usr/bin/env python
"""Implicit-conditioned driver (reference run_multiscene.py).

Coarse stage: plain DirectVoxGO geometry search. Fine stage: the fully
implicit MultiSceneImplicitDVGO — triplane features + NeRF-MLP head, no
density grid (run_multiscene.py:268-278) — conditioned on 3 random views.
"""

import argparse
import os
import random

import numpy as np

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data import load_everything
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine import train_conditioned as cond_lib
from directvoxgo_tpu.models.multiscene_dvgo import MultiSceneImplicitDVGO


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


def main():
    args = config_parser().parse_args()
    cfg = Config.fromfile(args.config)
    np.random.seed(args.seed)
    random.seed(args.seed)
    data_dict = load_everything(args=args, cfg=cfg)
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    if args.render_only:
        # Eval path: encode fixed conditioning views once, render test
        # views per chunk (reference run_multiscene.py:60-143, 706-726).
        from run_tri import eval_stage
        eval_stage(args, cfg, data_dict, model_class=MultiSceneImplicitDVGO)
        print('Done')
        return

    xyz_min_c, xyz_max_c = train_lib.compute_bbox_by_cam_frustrm(
        cfg=cfg, **data_dict)
    coarse_ckpt_path = None
    if cfg.coarse_train.N_iters > 0:
        train_lib.scene_rep_reconstruction(
            args=args, cfg=cfg, cfg_model=cfg.coarse_model_and_render,
            cfg_train=cfg.coarse_train, xyz_min=xyz_min_c,
            xyz_max=xyz_max_c, data_dict=data_dict, stage='coarse')
        coarse_ckpt_path = os.path.join(cfg.basedir, cfg.expname,
                                        'coarse_last.tar')

    cfg_model = cfg.fine_model_and_render
    cfg_train = cfg.fine_train
    model_kwargs = {k: v for k, v in dict(cfg_model).items()
                    if k not in ('num_voxels', 'maskout_near_cam_vox',
                                 'world_bound_scale', 'stepsize',
                                 'use_coarse_geo', 'bbox_thres')}
    model = MultiSceneImplicitDVGO(
        xyz_min=xyz_min_c, xyz_max=xyz_max_c,
        num_voxels=cfg_model.num_voxels,
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

    def cond_source(rng, scene_id):
        views = cond_lib.pick_conditioning_views(rng, len(i_train), k=3)
        return cond_lib.build_conditioning_batch(
            scene['images'], scene['poses'], scene['HW'], scene['Ks'],
            views, cfg.data)

    cond_lib.train_conditioned_stage(
        args, cfg, cfg_train, model, optimizer, opt_state, [pool],
        cond_source, render_kwargs, stage='fine')
    if args.render_test or args.render_train or args.render_video:
        from run_tri import eval_stage
        eval_stage(args, cfg, data_dict, model_class=MultiSceneImplicitDVGO)
    print('Done')


if __name__ == '__main__':
    main()
