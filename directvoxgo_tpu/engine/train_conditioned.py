"""Training engine for the image-conditioned variants.

Shared skeleton behind run_sr.py / run_tri.py / run_multiscene.py /
run_tri_multiscene{,_v2}.py — each reference driver clones run.py's
``scene_rep_reconstruction`` with a different fine-stage model and
conditioning-batch construction (SURVEY.md §2 P22-P26); here the common loop
is one function parameterized by a ``make_batch_cond`` callback and the
model's forward signature.

Key reference semantics kept:
  * conditioning input is rgb ⊕ rays_o ⊕ rays_d, 9 channels, normalized
    images shifted to [-1, 1] (run_tri_multiscene_v2.py:437-444, 466;
    run_sr.py:415-418 for the 3-channel SR case)
  * 3 random (or fixed) conditioning views per step; optional dynamic
    downsampling ``down ~ U[2, dynamic_down)`` (run_tri.py:457-465)
  * total loss = main + entropy_last + rgbper + weighted consistency /
    cosine / distillation aux losses (run_tri_multiscene_v2.py:479-501)
  * per-scene occupancy renewal every 1000 steps (v2:392-396)
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from .. import rays as ray_lib
from . import checkpoint as ckpt_lib
from .train import create_optimizer_or_freeze_model


def make_conditioning_image(image, rays_o, rays_d, normalize=True):
    """rgb ⊕ rays_o ⊕ rays_d 9-channel conditioning input
    (run_tri_multiscene_v2.py:437-444)."""
    img = np.asarray(image, np.float32)
    if normalize:
        img = (img - 0.5) / 0.5
    return np.concatenate([img, rays_o, rays_d], axis=-1).astype(np.float32)


def pick_conditioning_views(rng, n_views, k=3, fixed_idx=None):
    """3 random conditioning views (or fixed, run_tri.py fixed_lr_idx)."""
    if fixed_idx is not None:
        return np.asarray(fixed_idx)[:k]
    return rng.choice(n_views, size=k, replace=False)


def build_conditioning_batch(images, poses, HW, Ks, view_ids, cfg_data,
                             down=1):
    """Stack conditioning views into [k, H, W, 9] + poses [k, 4, 4]."""
    rgb_ch, pose_ch = [], []
    for v in view_ids:
        H, W = HW[v]
        img = np.asarray(images[v], np.float32)
        if down > 1:
            import cv2
            H, W = int(H // down), int(W // down)
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
            K = np.array(Ks[v], np.float32).copy()
            K[:2] /= down
        else:
            K = Ks[v]
        rays_o, rays_d, _ = ray_lib.get_rays_of_a_view(
            H, W, K, poses[v], ndc=cfg_data.ndc,
            inverse_y=cfg_data.inverse_y, flip_x=cfg_data.flip_x,
            flip_y=cfg_data.flip_y)
        rgb_ch.append(make_conditioning_image(img, rays_o, rays_d))
        pose4 = np.eye(4, dtype=np.float32)
        pose4[:3, :4] = poses[v][:3, :4]
        pose_ch.append(pose4)
    return np.stack(rgb_ch, 0), np.stack(pose_ch, 0)


def conditioned_loss_terms(ret, target, cfg_train, n_rand):
    """main + entropy + rgbper (run.py:377-386 shape, shared by all
    drivers)."""
    mse = jnp.mean((ret["rgb_marched"] - target) ** 2)
    loss = cfg_train.weight_main * mse
    if cfg_train.weight_entropy_last > 0:
        pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
        loss = loss + cfg_train.weight_entropy_last * ent
    if cfg_train.weight_rgbper > 0:
        if "raw_rgb_cl" in ret:  # sweep path: [3, N, S]
            rgbper = jnp.sum(
                (ret["raw_rgb_cl"] - target.T[:, :, None]) ** 2, axis=0)
        else:
            rgbper = jnp.sum(
                (ret["raw_rgb"] - target[:, None, :]) ** 2, -1)
        rl = jnp.sum(rgbper * jax.lax.stop_gradient(ret["weights"])) / n_rand
        loss = loss + cfg_train.weight_rgbper * rl
    return loss, mse


def find_resume_checkpoint(args, cfg, stage):
    """Path of the checkpoint a resume would load, or None
    (run_tri_multiscene_v2.py:258-266 scan: ft_path > {stage}_last.tar >
    latest numbered ckpt)."""
    expdir = os.path.join(cfg.basedir, cfg.expname)
    path = None
    if getattr(args, "ft_path", ""):
        path = args.ft_path
    elif not getattr(args, "no_reload", False):
        last = os.path.join(expdir, f"{stage}_last.tar")
        if os.path.isfile(last):
            path = last
        elif os.path.isdir(expdir):
            cands = sorted(f for f in os.listdir(expdir)
                           if f.startswith(f"{stage}_")
                           and f.endswith(".tar"))
            if cands:
                path = os.path.join(expdir, cands[-1])
    if path is None or not os.path.isfile(path):
        return None
    return path


def initial_num_voxels(args, cfg, cfg_model, cfg_train, stage):
    """Grid resolution to construct the fine model at.

    Reference semantics (run_tri.py:255-267): training from scratch with
    ``pg_scale`` starts the grid at ``num_voxels / 2^len(pg_scale)`` and
    doubles at each pg event; resuming constructs at the checkpoint's own
    resolution (its kwargs manifest) so the loaded state matches and an
    already-upscaled grid is never downscaled by the first pg event.
    """
    path = find_resume_checkpoint(args, cfg, stage)
    if path is not None:
        st = ckpt_lib.load_checkpoint_file(path)
        nv = st.get("model_kwargs", {}).get("num_voxels")
        if nv:
            return int(nv)
    pg = list(cfg_train.get("pg_scale", ()) or ())
    return int(cfg_model.num_voxels / (2 ** len(pg)))


def resume_latest_checkpoint(args, cfg, model, optimizer, stage):
    """Reload the newest ``{stage}_*.tar`` if one exists (see
    ``find_resume_checkpoint``). Returns (opt_state_or_None, start_step)."""
    path = find_resume_checkpoint(args, cfg, stage)
    if path is None:
        print(f"train_conditioned ({stage}): train from scratch")
        return None, 0
    st = ckpt_lib.load_checkpoint_file(path)
    ckpt_lib.load_model_state(model, st["model_state_dict"])
    start = int(st.get("global_step", 0))
    opt_state = None
    if not getattr(args, "no_reload_optimizer", False) \
            and st.get("optimizer_state_dict") is not None:
        opt_state = jax.tree_util.tree_map(jnp.asarray,
                                           st["optimizer_state_dict"])
    print(f"train_conditioned ({stage}): resumed {path} at step {start}")
    return opt_state, start


def train_conditioned_stage(args, cfg, cfg_train, model, optimizer,
                            opt_state, scene_ray_pools, cond_source,
                            render_kwargs, stage, start=0,
                            aux_weights=None, multiscene=False,
                            n_scene=None, scene_sampler=None):
    """Fine-stage loop for conditioned models.

    Args:
      scene_ray_pools: list (per scene) of dicts with device arrays
        rgb/rays_o/rays_d/viewdirs (flat [N,3]) — pre-gathered as in
        run_tri_multiscene_v2.py:367-382 — OR a callable
        ``scene_id -> pool`` for lazy per-scene loading (the v1 driver's
        DataLoader semantics, run_tri_multiscene.py:335-342; pass
        ``n_scene`` then).
      cond_source: callable (rng, scene_id) -> (rgb_lr [k,H,W,C],
        pose_lr [k,4,4]) conditioning batch on the host.
      aux_weights: dict with weight_consistency/weight_cosine/
        weight_distillation (v2:495-501); None for models without aux
        losses (SR).
      scene_sampler: callable (rng, step) -> scene_id overriding the
        default uniform draw (the v1 driver passes a shuffled-epoch
        schedule so lazy loading stays sequential).

    Supports ``cfg_train.pg_scale`` for models with explicit grids
    (run_tri.py:389-400: upscale grids at the listed steps, fresh optimizer)
    and auto-resume from the latest stage checkpoint (v2:258-266).
    """
    if callable(scene_ray_pools):
        get_pool = scene_ray_pools
        assert n_scene is not None, "n_scene required with a pool provider"
    else:
        get_pool = scene_ray_pools.__getitem__
        n_scene = len(scene_ray_pools)
    n_rand = int(cfg_train.N_rand)
    rng = np.random.default_rng(getattr(args, "seed", 777))
    aux = aux_weights or {}
    w_cons = float(aux.get("weight_consistency", 0.0))
    w_cos = float(aux.get("weight_cosine", 0.0))
    w_dist = float(aux.get("weight_distillation", 0.0))
    if w_dist > 0 and not getattr(model, "use_anchor_liif", False):
        # The reference's distillation needs the frozen anchor-LIIF teacher
        # (lib/tri_dvgo_multiscene.py:314-322, 769-775); without it the
        # loss term would silently be 0 every step.
        raise ValueError(
            "weight_distillation > 0 but the model has no anchor-LIIF "
            "teacher; set use_anchor_liif=True (+ liif_state_dict) in "
            "fine_model_and_render, or zero the weight")
    trainable = [n for n in optimizer.group_cfg if n in model.params]
    frozen = [n for n in model.params if n not in trainable]
    has_aux = hasattr(model, "encode_feat") and multiscene

    if start == 0:
        resumed_opt, start = resume_latest_checkpoint(args, cfg, model,
                                                      optimizer, stage)
        if resumed_opt is not None:
            opt_state = resumed_opt

    pg_scale = list(cfg_train.get("pg_scale", ()) or ())

    @jax.jit
    def train_step(params, mask, opt_state, pool, sel, rgb_lr, pose_lr,
                   scene_id):
        target = jnp.take(pool["rgb"], sel, axis=0)
        rays_o = jnp.take(pool["rays_o"], sel, axis=0)
        rays_d = jnp.take(pool["rays_d"], sel, axis=0)
        viewdirs = jnp.take(pool["viewdirs"], sel, axis=0)
        tr = {n: params[n] for n in trainable}
        fz = {n: params[n] for n in frozen}

        def loss_fn(tr):
            p = {**tr, **fz}
            if multiscene:
                ret, cons, cos, dist = model.forward(
                    p, mask, rgb_lr, pose_lr, rays_o, rays_d, viewdirs,
                    scene_id=scene_id, **render_kwargs)
            elif pose_lr is not None:
                ret = model.forward(p, mask, rgb_lr, pose_lr, rays_o,
                                    rays_d, viewdirs, **render_kwargs)
                cons = cos = dist = 0.0
            else:
                ret = model.forward(p, mask, rgb_lr, rays_o, rays_d,
                                    viewdirs, **render_kwargs)
                cons = cos = dist = 0.0
            loss, mse = conditioned_loss_terms(ret, target, cfg_train,
                                               n_rand)
            loss = loss + w_cons * cons + w_cos * cos + w_dist * dist
            return loss, mse

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr)
        new_tr, new_opt = optimizer.update(tr, grads, opt_state)
        return {**params, **new_tr}, new_opt, loss, mse

    psnr_lst = []
    time0 = time.time()
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    last_ckpt_path = os.path.join(cfg.basedir, cfg.expname,
                                  f"{stage}_last.tar")
    global_step = -1
    for global_step in range(1 + start, 1 + cfg_train.N_iters):
        if (global_step + 500) % 1000 == 0 and \
                hasattr(model, "update_occupancy_cache"):
            model.update_occupancy_cache()

        # Progressive grid scaling (run_tri.py:389-400): upscale explicit
        # grids, then a fresh optimizer over the new shapes.
        if global_step in pg_scale and hasattr(model, "scale_volume_grid"):
            n_rest = len(pg_scale) - pg_scale.index(global_step) - 1
            cur_voxels = int(cfg.fine_model_and_render.num_voxels
                             / (2 ** n_rest))
            model.scale_volume_grid(cur_voxels)
            optimizer = create_optimizer_or_freeze_model(model, cfg_train)
            opt_state = optimizer.init(
                {n: model.params[n] for n in trainable})

        if scene_sampler is not None:
            scene_id = int(scene_sampler(rng, global_step))
        else:
            scene_id = int(rng.integers(n_scene)) if n_scene > 1 else 0
        pool = get_pool(scene_id)
        sel = jnp.asarray(rng.integers(0, pool["rgb"].shape[0], n_rand),
                          jnp.int32)
        rgb_lr, pose_lr = cond_source(rng, scene_id)
        rgb_lr = jnp.asarray(rgb_lr)
        pose_lr = jnp.asarray(pose_lr) if pose_lr is not None else None

        model.params, opt_state, loss, mse = train_step(
            model.params, model.mask, opt_state, pool, sel, rgb_lr,
            pose_lr, scene_id)
        psnr_lst.append(-10.0 * jnp.log10(mse))

        if global_step % args.i_print == 0:
            eps = time.time() - time0
            psnr_avg = float(np.mean([float(p) for p in psnr_lst]))
            print(f"train_conditioned ({stage}): iter {global_step:6d} / "
                  f"Loss: {float(loss):.9f} / PSNR: {psnr_avg:5.2f} / "
                  f"Eps: {eps:.0f}s", flush=True)
            psnr_lst = []
        if global_step % args.i_weights == 0:
            path = os.path.join(cfg.basedir, cfg.expname,
                                f"{stage}_{global_step:06d}.tar")
            ckpt_lib.save_model_checkpoint(path, model, global_step,
                                           opt_state)

    if global_step != -1:
        ckpt_lib.save_model_checkpoint(last_ckpt_path, model, global_step,
                                       opt_state)
    return model, opt_state


def gather_scene_ray_pool(model, cfg, cfg_train, scene, render_kwargs,
                          scene_id=None):
    """Flatten one scene's training rays to a device pool (pre-gathered for
    all scenes as in run_tri_multiscene_v2.py:367-382)."""
    images, poses, HW, Ks = (scene["images"], scene["poses"], scene["HW"],
                             scene["Ks"])
    chunks_rgb, chunks_o, chunks_d, chunks_v = [], [], [], []
    for img, c2w, (H, W), K in zip(images, poses, HW, Ks):
        rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
            H, W, K, c2w, ndc=cfg.data.ndc, inverse_y=cfg.data.inverse_y,
            flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y)
        if cfg_train.ray_sampler == "in_maskcache":
            kw = dict(render_kwargs)
            if scene_id is not None:
                kw["scene_id"] = scene_id
            mask = np.asarray(model.hit_coarse_geo(
                rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
                **{k: kw[k] for k in ("near", "far", "stepsize", "scene_id")
                   if k in kw})).reshape(H, W)
        else:
            mask = np.ones((H, W), bool)
        chunks_rgb.append(np.asarray(img, np.float32)[mask])
        chunks_o.append(rays_o[mask])
        chunks_d.append(rays_d[mask])
        chunks_v.append(viewdirs[mask])
    return {
        "rgb": jnp.asarray(np.concatenate(chunks_rgb)),
        "rays_o": jnp.asarray(np.concatenate(chunks_o)),
        "rays_d": jnp.asarray(np.concatenate(chunks_d)),
        "viewdirs": jnp.asarray(np.concatenate(chunks_v)),
    }
