#!/usr/bin/env python
"""Joint multi-scene conditioned driver v1 (reference run_tri_multiscene.py).

Where v2 pre-gathers every scene's ray pool on device, v1 streams scenes
through a lazy data path (reference :335-342: a shuffled DataLoader yields
one scene per item, ``gather_training_rays`` runs per item, one batch is
taken, the item is dropped) — the variant that scales to scene counts whose
pooled rays don't fit in memory.

TPU re-design of that semantics:
  * scenes visit in shuffled epochs (sequential access, like the loader);
  * a small LRU of gathered pools plus a background prefetch thread that
    gathers the NEXT scheduled scene while the current one trains (the
    counterpart of the reference's ``num_workers=2``);
  * pools are wrap-tiled to power-of-two row counts so every scene shares
    one compiled train step (XLA recompiles per distinct pool shape).

Coarse stage, model setup, eval and aux losses are shared with v2.
"""

import os
import random
import threading

import numpy as np
import jax.numpy as jnp

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine import train_conditioned as cond_lib
from directvoxgo_tpu.models.tri_dvgo_multiscene import TriDVGOMultiScene
from run_tri_multiscene_v2 import (config_parser, coarse_stage, eval_stage,
                                   load_multiscene, union_bbox)


def _round_up_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


class LazyScenePools:
    """scene_id -> device ray pool, gathered on demand.

    Keeps at most ``max_cached`` pools resident; `prefetch(scene_id)`
    gathers in a background thread so the next scheduled scene's pool is
    ready when training reaches it.
    """

    def __init__(self, dataset, model, cfg, cfg_train, render_kwargs,
                 max_cached=2):
        self.dataset = dataset
        self.model = model
        self.cfg = cfg
        self.cfg_train = cfg_train
        self.render_kwargs = render_kwargs
        self.max_cached = max_cached
        self._pools = {}      # scene_id -> pool (insertion-ordered LRU)
        self._scene_cache = {}
        self._lock = threading.Lock()
        self._threads = {}

    def scene(self, scene_id):
        if scene_id not in self._scene_cache:
            if len(self._scene_cache) >= self.max_cached:
                self._scene_cache.pop(next(iter(self._scene_cache)))
            self._scene_cache[scene_id] = self.dataset.scene_data(scene_id)
        return self._scene_cache[scene_id]

    def _gather(self, scene_id):
        pool = cond_lib.gather_scene_ray_pool(
            self.model, self.cfg, self.cfg_train, self.scene(scene_id),
            self.render_kwargs, scene_id=scene_id)
        n = pool["rgb"].shape[0]
        n_pad = _round_up_pow2(max(n, 1))
        if n_pad > n:
            # wrap-tile so uniform sampling over the padded pool stays
            # (near-)uniform over real rays and shapes quantize
            idx = jnp.arange(n_pad, dtype=jnp.int32) % n
            pool = {k: jnp.take(v, idx, axis=0) for k, v in pool.items()}
        return pool

    def prefetch(self, scene_id):
        with self._lock:
            if scene_id in self._pools or scene_id in self._threads:
                return

            def work():
                p = self._gather(scene_id)
                with self._lock:
                    self._pools[scene_id] = p
                    self._threads.pop(scene_id, None)

            t = threading.Thread(target=work, daemon=True)
            self._threads[scene_id] = t
            t.start()

    def __call__(self, scene_id):
        with self._lock:
            t = self._threads.get(scene_id)
        if t is not None:
            t.join()
        with self._lock:
            pool = self._pools.get(scene_id)
        if pool is None:
            pool = self._gather(scene_id)
        with self._lock:
            self._pools.pop(scene_id, None)
            self._pools[scene_id] = pool  # (re-)insert at LRU tail
            self._evict()
        return pool

    def _evict(self):
        while len(self._pools) > self.max_cached:
            oldest = next(iter(self._pools))
            self._pools.pop(oldest)


class EpochSchedule:
    """Shuffled-epoch scene order with one-ahead prefetch (DataLoader
    semantics: every scene once per epoch, batch_per_scene steps each)."""

    def __init__(self, n_scene, pools, batch_per_scene=1, seed=0):
        self.n_scene = n_scene
        self.pools = pools
        self.batch_per_scene = max(int(batch_per_scene), 1)
        self.rng = np.random.default_rng(seed)
        self.order = []
        self.i = 0

    def __call__(self, rng, step):
        slot = (self.i // self.batch_per_scene)
        if not self.order or slot >= len(self.order):
            self.order = list(self.rng.permutation(self.n_scene))
            self.i = 0
            slot = 0
        sid = self.order[slot]
        nxt_slot = slot + 1
        if nxt_slot < len(self.order):
            self.pools.prefetch(self.order[nxt_slot])
        self.i += 1
        return sid


def main():
    args = config_parser().parse_args()
    cfg = Config.fromfile(args.config)
    np.random.seed(args.seed)
    random.seed(args.seed)
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    dataset = load_multiscene(cfg)
    print(f"multiscene dataset (v1 lazy): {dataset.n_scene} scenes: "
          f"{dataset.scenes}")
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

    # near/far policy without touching every scene eagerly: probe scene 0
    # (blender-style multiscene shares near/far; v2 reduces over all).
    sc0 = dataset.scene_data(0)
    render_kwargs = {'near': float(sc0['near']), 'far': float(sc0['far']),
                     'bg': 1 if cfg.data.white_bkgd else 0,
                     'stepsize': cfg_model.stepsize}

    pools = LazyScenePools(dataset, model, cfg, cfg_train, render_kwargs,
                           max_cached=int(cfg.data.get('cache_scenes', 2)))
    schedule = EpochSchedule(dataset.n_scene, pools,
                             batch_per_scene=int(cfg.data.get('batch_size',
                                                              1)),
                             seed=args.seed)

    dynamic_down = int(cfg_train.get('dynamic_down', 1))

    def cond_source(rng, scene_id):
        sc = pools.scene(scene_id)
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
        aux_weights=aux_weights, multiscene=True,
        n_scene=dataset.n_scene, scene_sampler=schedule)
    if args.render_test or args.render_train or args.render_video:
        eval_stage(args, cfg, dataset)
    print('Done')


if __name__ == '__main__':
    main()
