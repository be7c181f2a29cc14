#!/usr/bin/env python
"""Joint multi-scene conditioned driver v2 — the maintained variant
(reference run_tri_multiscene_v2.py).

Coarse stage: DirectVoxGOMultiScene trained jointly over all scenes.
Fine stage: TriDVGOMultiScene conditioned per step on 3 random views of a
randomly drawn scene (9-channel rgb ⊕ rays_o ⊕ rays_d input, v2:437-466),
with consistency/cosine/distillation aux losses (v2:479-501), per-scene
mask renewal (v2:392-396) and a per-scene union bbox from the coarse stage
(v2:210-235).
"""

import argparse
import os
import random

import numpy as np
import jax.numpy as jnp

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data.datasets import (MultisceneBlenderDataset,
                                           MultisceneNSVFDataset)
from directvoxgo_tpu.engine import checkpoint as ckpt_lib
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine import train_conditioned as cond_lib
from directvoxgo_tpu.models.dvgo_multiscene import DirectVoxGOMultiScene
from directvoxgo_tpu.models.tri_dvgo_multiscene import TriDVGOMultiScene
from directvoxgo_tpu.optim import MaskedAdam
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


def eval_stage(args, cfg, train_dataset):
    """Per-scene render/eval: encode each scene's fixed conditioning views
    once, then chunk-render its test views (reference v2:678-760 — one
    render_test_{ckpt}/{scene} directory per scene)."""
    from directvoxgo_tpu.engine import render_conditioned as rc

    ckpt_path = args.ft_path or os.path.join(cfg.basedir, cfg.expname,
                                             'fine_last.tar')
    ckpt_name = os.path.basename(ckpt_path)[:-4]
    model = ckpt_lib.load_model(TriDVGOMultiScene, ckpt_path)
    kind = cfg.data.get('multiscene_dataset', 'multiscene_blender')
    kw = dict(basedir=cfg.data.datadir, down=cfg.data.get('down', 1),
              test_scenes=tuple(cfg.data.get('test_scenes', ())),
              white_bkgd=cfg.data.white_bkgd)
    cls = (MultisceneNSVFDataset if kind == 'multiscene_nsvf'
           else MultisceneBlenderDataset)
    test_dataset = cls(split='test', **kw)

    for s in range(min(train_dataset.n_scene, test_dataset.n_scene)):
        tr = train_dataset.scene_data(s)
        te = test_dataset.scene_data(s)
        render_kwargs = {
            'near': float(te['near']), 'far': float(te['far']),
            'bg': 1 if cfg.data.white_bkgd else 0,
            'stepsize': cfg.fine_model_and_render.stepsize,
            'inverse_y': cfg.data.inverse_y,
            'flip_x': cfg.data.flip_x, 'flip_y': cfg.data.flip_y,
        }
        view_ids = rc.eval_view_ids(cfg.fine_train,
                                    np.arange(len(tr['poses'])),
                                    render=True)
        feats = rc.encode_conditioning(
            model, model.params, tr['images'], tr['poses'], tr['HW'],
            tr['Ks'], view_ids, cfg.data, scene_id=s)
        name = train_dataset.scenes[s] if hasattr(train_dataset, 'scenes') \
            else str(s)
        savedir = os.path.join(cfg.basedir, cfg.expname,
                               f'render_test_{ckpt_name}', str(name))
        os.makedirs(savedir, exist_ok=True)
        rgbs, depths, _ = rc.render_viewpoints_conditioned(
            model, model.params, model.mask, lambda i: feats,
            render_poses=te['poses'], HW=te['HW'], Ks=te['Ks'],
            render_kwargs=render_kwargs, gt_imgs=te['images'],
            savedir=savedir, scene_id=s,
            eval_ssim=args.eval_ssim,
            eval_lpips_alex=args.eval_lpips_alex,
            eval_lpips_vgg=args.eval_lpips_vgg)
        rc.save_videos(savedir, rgbs, depths)


def load_multiscene(cfg):
    kind = cfg.data.get('multiscene_dataset', 'multiscene_blender')
    kw = dict(basedir=cfg.data.datadir, down=cfg.data.get('down', 1),
              test_scenes=tuple(cfg.data.get('test_scenes', ())),
              white_bkgd=cfg.data.white_bkgd)
    if kind == 'multiscene_nsvf':
        return MultisceneNSVFDataset(split='train', **{
            k: v for k, v in kw.items() if k != 'down'} | {
            'down': cfg.data.get('down', 1)})
    return MultisceneBlenderDataset(split='train', **kw)


def union_bbox(cfg, dataset):
    """Union of all scenes' camera-frustum bboxes (v2:210-235 analog)."""
    xyz_min = np.full(3, np.inf, np.float32)
    xyz_max = -xyz_min
    for s in range(dataset.n_scene):
        sc = dataset.scene_data(s)
        dd = dict(HW=sc['HW'], Ks=sc['Ks'], poses=sc['poses'],
                  i_train=np.arange(len(sc['poses'])),
                  near=sc['near'], far=sc['far'])
        mn, mx = train_lib.compute_bbox_by_cam_frustrm(cfg=cfg, **dd)
        xyz_min = np.minimum(xyz_min, mn)
        xyz_max = np.maximum(xyz_max, mx)
    return xyz_min, xyz_max


def coarse_stage(args, cfg, dataset, xyz_min, xyz_max):
    """Joint coarse training over all scenes with DirectVoxGOMultiScene."""
    import time
    cfg_model = cfg.coarse_model_and_render
    cfg_train = cfg.coarse_train
    model_kwargs = {k: v for k, v in dict(cfg_model).items()
                    if k not in ('num_voxels', 'maskout_near_cam_vox',
                                 'world_bound_scale', 'stepsize',
                                 'bbox_thres')}
    model = DirectVoxGOMultiScene(
        xyz_min=xyz_min, xyz_max=xyz_max, n_scene=dataset.n_scene,
        num_voxels=cfg_model.num_voxels, **model_kwargs)
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    opt_state = optimizer.init(model.params)

    scenes = [dataset.scene_data(s) for s in range(dataset.n_scene)]
    near = min(s['near'] for s in scenes)
    far = max(s['far'] for s in scenes)
    render_kwargs = {'near': float(near), 'far': float(far),
                     'bg': 1 if cfg.data.white_bkgd else 0,
                     'stepsize': cfg_model.stepsize}
    if cfg_model.maskout_near_cam_vox:
        for s, sc in enumerate(scenes):
            model.maskout_near_cam_vox(sc['poses'][:, :3, 3], near, s)

    pools = [cond_lib.gather_scene_ray_pool(
        model, cfg, cfg_train, sc, render_kwargs, scene_id=s)
        for s, sc in enumerate(scenes)]

    import jax

    @jax.jit
    def step(params, mask, opt_state, pool, sel, scene_id):
        target = jnp.take(pool['rgb'], sel, axis=0)
        ro = jnp.take(pool['rays_o'], sel, axis=0)
        rd = jnp.take(pool['rays_d'], sel, axis=0)
        vd = jnp.take(pool['viewdirs'], sel, axis=0)

        def loss_fn(params):
            ret = model.forward(params, mask, ro, rd, vd,
                                scene_id=scene_id, **render_kwargs)
            return cond_lib.conditioned_loss_terms(
                ret, target, cfg_train, cfg_train.N_rand)

        (loss, mse), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = optimizer.update(params, grads, opt_state)
        return params, opt_state, loss, mse

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for it in range(1, 1 + cfg_train.N_iters):
        if (it + 500) % 1000 == 0:
            model.update_occupancy_cache()
        sid = int(rng.integers(dataset.n_scene))
        pool = pools[sid]
        sel = jnp.asarray(rng.integers(0, pool['rgb'].shape[0],
                                       cfg_train.N_rand), jnp.int32)
        model.params, opt_state, loss, mse = step(
            model.params, model.mask, opt_state, pool, sel, sid)
        if it % args.i_print == 0:
            print(f"coarse joint: iter {it} / Loss {float(loss):.6f} / "
                  f"PSNR {-10*np.log10(float(mse)):.2f} / "
                  f"Eps {time.time()-t0:.0f}s", flush=True)
    path = os.path.join(cfg.basedir, cfg.expname, 'coarse_last.tar')
    ckpt_lib.save_model_checkpoint(path, model, cfg_train.N_iters, opt_state)
    return path, render_kwargs


def main():
    args = config_parser().parse_args()
    cfg = Config.fromfile(args.config)
    np.random.seed(args.seed)
    random.seed(args.seed)
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    dataset = load_multiscene(cfg)
    print(f"multiscene dataset: {dataset.n_scene} scenes: {dataset.scenes}")
    xyz_min, xyz_max = union_bbox(cfg, dataset)
    if args.render_only:
        if args.render_test:
            eval_stage(args, cfg, dataset)
        print('Done')
        return

    coarse_ckpt_path = None
    if cfg.coarse_train.N_iters > 0:
        coarse_ckpt_path, _ = coarse_stage(args, cfg, dataset, xyz_min,
                                           xyz_max)

    # Fine stage: conditioned triplane multiscene model.
    cfg_model = cfg.fine_model_and_render
    cfg_train = cfg.fine_train
    model_kwargs = {k: v for k, v in dict(cfg_model).items()
                    if k not in ('num_voxels', 'maskout_near_cam_vox',
                                 'world_bound_scale', 'stepsize',
                                 'use_coarse_geo', 'bbox_thres')}
    model = TriDVGOMultiScene(
        xyz_min=xyz_min, xyz_max=xyz_max, n_scene=dataset.n_scene,
        num_voxels=cond_lib.initial_num_voxels(
            args, cfg, cfg_model, cfg_train, 'fine'),
        mask_cache_path=None, **model_kwargs)
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    opt_state = optimizer.init(model.params)

    scenes = [dataset.scene_data(s) for s in range(dataset.n_scene)]
    near = min(s['near'] for s in scenes)
    far = max(s['far'] for s in scenes)
    render_kwargs = {'near': float(near), 'far': float(far),
                     'bg': 1 if cfg.data.white_bkgd else 0,
                     'stepsize': cfg_model.stepsize}
    pools = [cond_lib.gather_scene_ray_pool(model, cfg, cfg_train, sc,
                                            render_kwargs, scene_id=s)
             for s, sc in enumerate(scenes)]

    dynamic_down = int(cfg_train.get('dynamic_down', 1))

    def cond_source(rng, scene_id):
        sc = scenes[scene_id]
        views = cond_lib.pick_conditioning_views(rng, len(sc['poses']), k=3)
        down = int(rng.integers(2, dynamic_down)) if dynamic_down > 2 else 1
        return cond_lib.build_conditioning_batch(
            sc['images'], sc['poses'], sc['HW'], sc['Ks'], views, cfg.data,
            down=down)

    aux_weights = dict(
        weight_consistency=cfg_train.get('weight_consistency', 0.0),
        weight_cosine=cfg_train.get('weight_cosine', 0.0),
        weight_distillation=cfg_train.get('weight_distillation', 0.0))

    cond_lib.train_conditioned_stage(
        args, cfg, cfg_train, model, optimizer, opt_state, pools,
        cond_source, render_kwargs, stage='fine',
        aux_weights=aux_weights, multiscene=True)
    if args.render_test:
        eval_stage(args, cfg, dataset)
    print('Done')


if __name__ == '__main__':
    main()
