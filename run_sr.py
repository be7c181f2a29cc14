#!/usr/bin/env python
"""Super-resolution driver (reference run_sr.py).

Coarse stage: plain DirectVoxGO trained ON THE LR IMAGES (the coarse ray
gather pulls images_lr/HW_lr/Ks_lr — run_sr.py gather_training_rays_coarse).
Fine stage: SRDVGO trained on HR rays, conditioned each step on that view's
LR image normalized to [-1, 1] (run_sr.py:415-418).
"""

import argparse
import os
import random

import numpy as np
import jax.numpy as jnp

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data import load_everything
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine import train_conditioned as cond_lib
from directvoxgo_tpu.models.sr_dvgo import SRDVGO
from directvoxgo_tpu import rays as ray_lib


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


def eval_stage(args, cfg, data_dict):
    """Render/eval with per-view LR conditioning (run_sr.py:605-660)."""
    import jax.numpy as jnp
    import jax
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.engine import render_conditioned as rc

    ckpt_path = args.ft_path or os.path.join(cfg.basedir, cfg.expname,
                                             'fine_last.tar')
    ckpt_name = os.path.basename(ckpt_path)[:-4]
    model = ckpt_lib.load_model(SRDVGO, ckpt_path)
    render_kwargs = {
        'near': float(data_dict['near']), 'far': float(data_dict['far']),
        'bg': 1 if cfg.data.white_bkgd else 0,
        'stepsize': cfg.fine_model_and_render.stepsize,
        'inverse_y': cfg.data.inverse_y,
        'flip_x': cfg.data.flip_x, 'flip_y': cfg.data.flip_y,
    }
    encode = jax.jit(model.encode_feat)

    def run_split(split_name, idx, savedir, render_factor=0, gt=True):
        os.makedirs(savedir, exist_ok=True)
        lr_feats = []
        for i in idx:
            lr = np.asarray(data_dict['images_lr'][i], np.float32)
            lr_feats.append(encode(model.params,
                                   jnp.asarray(((lr - 0.5) / 0.5)[None])))
        rgbs, depths, _ = rc.render_viewpoints_conditioned(
            model, model.params, model.mask, lambda i: lr_feats[i],
            render_poses=data_dict['poses'][idx],
            HW=data_dict['HW'][idx], Ks=data_dict['Ks'][idx],
            render_kwargs=render_kwargs,
            gt_imgs=[np.asarray(data_dict['images'][i]) for i in idx]
            if gt else None,
            savedir=savedir, render_factor=render_factor,
            eval_ssim=args.eval_ssim, eval_lpips_alex=args.eval_lpips_alex,
            eval_lpips_vgg=args.eval_lpips_vgg)
        rc.save_videos(savedir, rgbs, depths)

    if args.render_train:
        run_split('train', data_dict['i_train'],
                  os.path.join(cfg.basedir, cfg.expname,
                               f'render_train_{ckpt_name}'))
    if args.render_test:
        run_split('test', data_dict['i_test'],
                  os.path.join(cfg.basedir, cfg.expname,
                               f'render_test_{ckpt_name}'))
    if args.render_video:
        # video path reuses test views' LR conditioning round-robin
        run_split('video', data_dict['i_test'],
                  os.path.join(cfg.basedir, cfg.expname,
                               f'render_video_{ckpt_name}'),
                  render_factor=args.render_video_factor, gt=False)


def coarse_on_lr(args, cfg, data_dict):
    """Coarse geometry from the LR views (run_sr.py coarse path)."""
    lr_dict = dict(data_dict)
    lr_dict['images'] = data_dict['images_lr']
    lr_dict['HW'] = data_dict['HW_lr']
    lr_dict['Ks'] = data_dict['Ks_lr']
    xyz_min_c, xyz_max_c = train_lib.compute_bbox_by_cam_frustrm(
        cfg=cfg, **{k: lr_dict[k] for k in
                    ('HW', 'Ks', 'poses', 'i_train', 'near', 'far')})
    train_lib.scene_rep_reconstruction(
        args=args, cfg=cfg, cfg_model=cfg.coarse_model_and_render,
        cfg_train=cfg.coarse_train, xyz_min=xyz_min_c, xyz_max=xyz_max_c,
        data_dict=lr_dict, stage='coarse')
    return os.path.join(cfg.basedir, cfg.expname, 'coarse_last.tar')


def fine_stage(args, cfg, data_dict, coarse_ckpt_path):
    cfg_model = cfg.fine_model_and_render
    cfg_train = cfg.fine_train
    xyz_min, xyz_max = train_lib.compute_bbox_by_coarse_geo(
        model_class=train_lib.DirectVoxGO, model_path=coarse_ckpt_path,
        thres=cfg_model.bbox_thres) if coarse_ckpt_path else \
        train_lib.compute_bbox_by_cam_frustrm(cfg=cfg, **data_dict)

    model_kwargs = {k: v for k, v in dict(cfg_model).items()
                    if k not in ('num_voxels', 'maskout_near_cam_vox',
                                 'world_bound_scale', 'stepsize',
                                 'use_coarse_geo', 'bbox_thres')}
    model = SRDVGO(xyz_min=xyz_min, xyz_max=xyz_max,
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

    # Per-view HR ray pools: conditioning is per-view, so rays are drawn
    # from one view per step (run_sr.py:376-387).
    i_train = data_dict['i_train']
    pools = []
    lr_imgs = []
    for i in i_train:
        scene = {'images': [data_dict['images'][i]],
                 'poses': data_dict['poses'][[i]],
                 'HW': data_dict['HW'][[i]], 'Ks': data_dict['Ks'][[i]]}
        pools.append(cond_lib.gather_scene_ray_pool(
            model, cfg, cfg_train, scene, hit_kwargs))
        lr = np.asarray(data_dict['images_lr'][i], np.float32)
        lr_imgs.append(((lr - 0.5) / 0.5)[None])  # [1, h, w, 3]

    def cond_source(rng, view_id):
        return lr_imgs[view_id], None

    model, opt_state = cond_lib.train_conditioned_stage(
        args, cfg, cfg_train, model, optimizer, opt_state, pools,
        cond_source, render_kwargs, stage='fine')
    return model


def main():
    args = config_parser().parse_args()
    cfg = Config.fromfile(args.config)
    np.random.seed(args.seed)
    random.seed(args.seed)
    data_dict = load_everything(args=args, cfg=cfg)
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    if not args.render_only:
        coarse_ckpt = None
        if cfg.coarse_train.N_iters > 0:
            coarse_ckpt = coarse_on_lr(args, cfg, data_dict)
        fine_stage(args, cfg, data_dict, coarse_ckpt)
    if args.render_test or args.render_train or args.render_video:
        eval_stage(args, cfg, data_dict)
    print('Done')


if __name__ == '__main__':
    main()
