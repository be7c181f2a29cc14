"""Training driver: coarse->fine per-scene optimization.

Behavioral port of run.py:155-492 (``compute_bbox_by_cam_frustrm``,
``compute_bbox_by_coarse_geo``, ``scene_rep_reconstruction``, ``train``) in a
jit-first structure: the whole hot step — forward, loss, backward, TV
gradient injection, MaskedAdam update — is one compiled function over
(params, opt_state, batch indices); the training-ray pool lives on device and
batches are gathered there. Progressive scaling and the coarse->fine
transition change array shapes, so each phase re-jits (a handful of
compilations per run, amortized over thousands of steps).
"""

from __future__ import annotations

import copy
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from .. import rays as ray_lib
from ..models.dvgo import DirectVoxGO
from ..optim import MaskedAdam
from . import checkpoint as ckpt_lib
from . import metrics as metrics_lib


def compute_bbox_by_cam_frustrm(cfg, HW, Ks, poses, i_train, near, far,
                                **kwargs):
    """Union of train-view frustum corners at near/far (run.py:155-173)."""
    print("compute_bbox_by_cam_frustrm: start")
    xyz_min = np.full(3, np.inf, np.float32)
    xyz_max = -xyz_min
    for (H, W), K, c2w in zip(HW[i_train], Ks[i_train], poses[i_train]):
        rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
            H=H, W=W, K=K, c2w=c2w, ndc=cfg.data.ndc,
            inverse_y=cfg.data.inverse_y,
            flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y)
        if cfg.data.ndc:
            pts_nf = np.stack([rays_o + rays_d * near, rays_o + rays_d * far])
        else:
            pts_nf = np.stack([rays_o + viewdirs * near,
                               rays_o + viewdirs * far])
        xyz_min = np.minimum(xyz_min, pts_nf.min(axis=(0, 1, 2)))
        xyz_max = np.maximum(xyz_max, pts_nf.max(axis=(0, 1, 2)))
    print("compute_bbox_by_cam_frustrm: xyz_min", xyz_min)
    print("compute_bbox_by_cam_frustrm: xyz_max", xyz_max)
    print("compute_bbox_by_cam_frustrm: finish")
    return xyz_min, xyz_max


def compute_bbox_by_coarse_geo(model_class, model_path, thres):
    """Shrink the fine bbox to the coarse alpha>thres region
    (run.py:175-196)."""
    print("compute_bbox_by_coarse_geo: start")
    t0 = time.time()
    model = ckpt_lib.load_model(model_class, model_path)
    alpha = np.asarray(model.activate_density(model.params["density"]))
    mask = alpha > thres
    pts = np.asarray(model.grid_points())
    if not mask.any():
        xyz_min, xyz_max = np.asarray(model.xyz_min), np.asarray(model.xyz_max)
    else:
        active = pts[mask]
        xyz_min = active.min(0)
        xyz_max = active.max(0)
        # Guard against a degenerate (near-zero-extent) bbox when very few
        # voxels crossed the threshold — pad to at least one voxel per axis.
        pad = np.maximum(model.voxel_size - (xyz_max - xyz_min), 0.0) / 2
        xyz_min = xyz_min - pad
        xyz_max = xyz_max + pad
    print("compute_bbox_by_coarse_geo: xyz_min", xyz_min)
    print("compute_bbox_by_coarse_geo: xyz_max", xyz_max)
    print(f"compute_bbox_by_coarse_geo: finish (eps time: {time.time()-t0} s)")
    return xyz_min, xyz_max


def create_optimizer_or_freeze_model(model, cfg_train):
    """The ``lrate_<name>`` convention (lib/utils.py:20-48): keys with lr>0
    become param groups; lr==0 means frozen (excluded from grads)."""
    group_cfg = {}
    for k in list(cfg_train.keys()):
        if not k.startswith("lrate_"):
            continue
        name = k[len("lrate_"):]
        if name not in model.params:
            continue
        lr = float(cfg_train[k])
        if lr > 0:
            print(f"create_optimizer_or_freeze_model: param {name} lr {lr}")
            group_cfg[name] = {
                "lr": lr,
                "skip_zero_grad": name in cfg_train.get(
                    "skip_zero_grad_fields", []),
            }
        else:
            print(f"create_optimizer_or_freeze_model: param {name} freeze")
    decay_steps = cfg_train.lrate_decay * 1000
    optimizer = MaskedAdam(group_cfg,
                           lr_decay_factor=0.1 ** (1.0 / decay_steps))
    return optimizer


def make_train_step(model, optimizer, cfg_train, render_kwargs,
                    apply_tv, tv_dense, axis=None, clip_sizes=None,
                    mesh=None, n_steps=1, donate=False, wv=0):
    """Build the jitted full train step for the current phase.

    ``apply_tv``/``tv_dense`` are baked in statically; the host flips them at
    the tv_before/tv_after/tv_dense_before boundaries (run.py:389-395), which
    costs at most a few retraces per stage. ``axis`` (static) selects the
    station-sweep fast path: the batch's rays must share that dominant axis
    (the engine groups the pool host-side). ``clip_sizes`` (static) bounds
    the sweep to the occupancy bbox; the runtime offsets travel as the
    ``clip_off`` step argument so mask renewals that keep the same quantized
    size don't recompile.

    ``mesh`` (a 1-D ``jax.sharding.Mesh`` over the 'data' axis, or None)
    turns the step SPMD: the per-step ray-index batch ``sel`` is sharded
    across chips, grids/MLP params/optimizer state/pool stay replicated,
    and the replicated out_shardings make XLA insert the gradient
    all-reduce over ICI. The math is bit-for-bit the single-chip step
    (same rays, same reduction semantics) — only the batch dimension is
    split. This is a new capability over the strictly single-GPU reference
    (SURVEY.md §2.2: no torch.distributed anywhere).

    ``n_steps > 1`` returns a **step-batched** variant: ``sel`` becomes
    ``[n_steps, N_rand]`` and a ``lax.scan`` runs that many optimizer steps
    in ONE dispatch, returning per-step ``(loss[K], psnr[K])``. On a
    remote-attached TPU the per-call dispatch latency (~27 ms over the
    tunnel, PERF_LOG.md) dominates the ~7 ms step compute, so the host
    can't feed single steps fast enough; batching K steps amortizes the
    round-trip K-fold. Identical math to K sequential calls (MaskedAdam
    carries its step counter/lr decay in-state).

    ``wv > 0`` (static) enables per-ray-tile v-windowed sweeps: the step
    gains a ``v_base`` argument ([n_tiles] int32, or [n_steps, n_tiles]
    when step-batched) with each tile's v-window start, produced by the
    engine's spatially-bucketed batch sampler (see ops/sweep.station_sweep
    on the exactness guarantee).
    """
    kwargs = {k: render_kwargs[k] for k in ("near", "far", "bg", "stepsize")}
    w_main = float(cfg_train.weight_main)
    w_entropy = float(cfg_train.weight_entropy_last)
    w_rgbper = float(cfg_train.weight_rgbper)
    w_tv_density = float(cfg_train.weight_tv_density)
    w_tv_k0 = float(cfg_train.weight_tv_k0)
    trainable_names = [n for n in optimizer.group_cfg if n in model.params]
    frozen_names = [n for n in model.params if n not in trainable_names]
    n_rand = int(cfg_train.N_rand)

    # Region-grad mode: slice the trainable grids to the occupancy clip box
    # BEFORE differentiating, so grid gradients (and the whole backward) stay
    # box-sized — the dynamic_slice VJP otherwise pads them back to the full
    # grid with a layout copy (~1.5 ms/step at 160^3, tools/trace_train_step)
    # only for the region-sliced Adam to re-slice the box. Exact because the
    # sweep reads nothing outside the box AND skip_zero_grad Adam leaves
    # zero-grad voxels untouched. Plain Adam (coarse stage:
    # skip_zero_grad_fields=[]) decays moments everywhere each step, so
    # box-limited updates would diverge from reference semantics — those
    # steps keep the legacy clip path (full-size grads via the slice VJP,
    # full-grid Adam). TV steps likewise need full-grid gradients.
    grid_names = [n for n in ("density", "k0") if n in trainable_names]
    all_skip = all(
        bool(optimizer.group_cfg.get(n, {}).get("skip_zero_grad", False))
        for n in grid_names)
    # Blocked draws: clip_sizes ('blk', B, eu, ev) selects the per-p-block
    # windowed sweep (ops/sweep.sweep_samples_blocked); the step's clip_off
    # argument then carries the [B, 2] per-block (u, v) window starts.
    blocked = None
    if clip_sizes is not None and clip_sizes[0] == "blk":
        blocked = tuple(int(x) for x in clip_sizes[1:])  # (B, eu, ev)
        clip_sizes = None
    # Fused-kernel draws: clip_sizes ('fblk', wu, wv, bp, bu, bv) selects
    # the fully fused Pallas train step (model.forward_sweep_fused) with
    # per-(station-block, ray-tile) (wu, wv) windowed slab reads on the
    # (bp, bu, bv) occupancy box; (wu, wv) == (0, 0) is the fused
    # full-window program. Batches must be same-tile-class and
    # direction-uniform (ops/sweep.build_ray_tiles_blocktile).
    fused_win = None
    if clip_sizes is not None and clip_sizes[0] == "fblk":
        wu_f, wv_f = int(clip_sizes[1]), int(clip_sizes[2])
        fused_win = (wu_f, wv_f) if (wu_f or wv_f) else None
        clip_sizes = tuple(int(x) for x in clip_sizes[3:6])
        fused = True
    else:
        fused = False
    # Sparse TV keeps region mode: ``where(grad != 0)`` gates the TV term,
    # and batch grid gradients are nonzero only inside the drawn box, so
    # the term is computed on a 1-voxel-haloed slice of the box (below)
    # instead of forcing full-size grads + full-grid Adam. Full-grid sparse
    # TV cost ~24 ms/iter at the fern-scale k0 alone (tools/
    # tv_step_profile.py) — the entire reason the realized fern pace was
    # 72.8 ms/iter vs the 9 ms TV-free bench. Dense TV really does inject
    # out-of-box gradients and stays on the legacy full path.
    tv_boxed = (apply_tv and not tv_dense
                and hasattr(model, "tv_axis_scales"))
    region_mode = (axis is not None and clip_sizes is not None
                   and (not apply_tv or tv_boxed)
                   and all_skip and grid_names != [])
    assert not fused or region_mode, \
        "fused step keys require region mode (pre-clipped box grids)"
    if region_mode:
        from ..ops import sweep as sweep_ops
        perm = sweep_ops._PERMS[axis]
        inv = {ax: i for i, ax in enumerate(perm)}
        sizes_xyz = tuple(int(clip_sizes[inv[a]]) for a in range(3))

    def train_step(params, mask, opt_state, pool, sel, clip_off,
                   v_base=None):
        target = jnp.take(pool["rgb"], sel, axis=0)
        rays_o = jnp.take(pool["rays_o"], sel, axis=0)
        rays_d = jnp.take(pool["rays_d"], sel, axis=0)
        viewdirs = jnp.take(pool["viewdirs"], sel, axis=0)

        trainable = {n: params[n] for n in trainable_names}
        frozen = {n: params[n] for n in frozen_names}
        mask_g = mask
        if region_mode:
            offs_xyz = tuple(clip_off[inv[a]] for a in range(3))
            for n in grid_names:
                g = trainable[n]
                trainable[n] = jax.lax.dynamic_slice(
                    g, (*offs_xyz, *([jnp.int32(0)] * (g.ndim - 3))),
                    (*sizes_xyz, *g.shape[3:]))
            mask_g = jax.lax.dynamic_slice(mask, offs_xyz, sizes_xyz)

        def loss_fn(trainable):
            if axis is None:
                ret = model.forward({**trainable, **frozen}, mask,
                                    rays_o, rays_d, viewdirs, **kwargs)
            elif fused:
                ret = model.forward_sweep_fused(
                    {**trainable, **frozen}, mask_g, rays_o, rays_d,
                    viewdirs, axis, target, clip_offsets=clip_off,
                    window=fused_win, **kwargs)
            elif blocked is not None:
                nb, eu, ev = blocked
                ret = model.forward_sweep(
                    {**trainable, **frozen}, mask_g, rays_o, rays_d,
                    viewdirs, axis,
                    block_windows=((nb, eu, ev),
                                   (clip_off[:, 0], clip_off[:, 1])),
                    **kwargs)
            else:
                ret = model.forward_sweep({**trainable, **frozen}, mask_g,
                                          rays_o, rays_d, viewdirs, axis,
                                          clip_sizes=clip_sizes,
                                          clip_offsets=clip_off,
                                          grids_pre_clipped=region_mode,
                                          tile_windows=(
                                              (v_base, wv)
                                              if wv and v_base is not None
                                              else None),
                                          **kwargs)
            mse = jnp.mean((ret["rgb_marched"] - target) ** 2)
            loss = w_main * mse
            if w_entropy > 0:
                pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
                entropy = -jnp.mean(pout * jnp.log(pout)
                                    + (1 - pout) * jnp.log(1 - pout))
                loss = loss + w_entropy * entropy
            if w_rgbper > 0:
                if "rgbper_sum" in ret:  # fused path: per-ray pre-reduced
                    rgbper_loss = jnp.sum(ret["rgbper_sum"]) / n_rand
                else:
                    if "raw_rgb_cl" in ret:  # sweep path: [3, N, S]
                        rgbper = jnp.sum(
                            (ret["raw_rgb_cl"] - target.T[:, :, None])
                            ** 2, axis=0)
                    else:
                        rgbper = jnp.sum(
                            (ret["raw_rgb"] - target[:, None, :]) ** 2,
                            -1)
                    rgbper_loss = jnp.sum(
                        rgbper
                        * jax.lax.stop_gradient(ret["weights"])) / n_rand
                loss = loss + w_rgbper * rgbper_loss
            return loss, mse

        if fused and mesh is not None:
            # The fused step's Pallas kernels are opaque to XLA's automatic
            # SPMD partitioner, so under --data_parallel the forward +
            # backward run inside an explicit shard_map over the 'data'
            # axis: rays/targets arrive batch-sharded, grids/MLP params
            # replicated, and the replicated-param cotangents (partial
            # sums per shard) are pmean'd over ICI before the optimizer.
            # Loss terms mirror loss_fn's fused branch with LOCAL-batch
            # normalization, so pmean(local loss) == the global loss
            # (equal shards: global mean = mean of local means, and
            # sum(rgbper)/N_rand = mean_d[sum_local/n_local]).
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def _local(tr, fz, mg, ro, rd, vd, tg, co):
                def lf(tr):
                    ret = model.forward_sweep_fused(
                        {**tr, **fz}, mg, ro, rd, vd, axis, tg,
                        clip_offsets=co, window=fused_win, **kwargs)
                    mse = jnp.mean((ret["rgb_marched"] - tg) ** 2)
                    loss = w_main * mse
                    if w_entropy > 0:
                        pout = jnp.clip(ret["alphainv_last"],
                                        1e-6, 1 - 1e-6)
                        ent = -jnp.mean(pout * jnp.log(pout)
                                        + (1 - pout) * jnp.log(1 - pout))
                        loss = loss + w_entropy * ent
                    if w_rgbper > 0:
                        loss = loss + w_rgbper * (
                            jnp.sum(ret["rgbper_sum"]) / ro.shape[0])
                    return loss, mse
                (l_, m_), g_ = jax.value_and_grad(
                    lf, has_aux=True)(tr)
                pm = lambda t: jax.lax.pmean(t, "data")  # noqa: E731
                return pm(l_), pm(m_), jax.tree_util.tree_map(pm, g_)

            loss, mse, grads = shard_map(
                _local, mesh=mesh,
                in_specs=(P(), P(), P(), P("data"), P("data"),
                          P("data"), P("data"), P()),
                out_specs=(P(), P(), P()),
                check_vma=False)(trainable, frozen, mask_g, rays_o,
                                 rays_d, viewdirs, target, clip_off)
        else:
            (loss, mse), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)

        if apply_tv and region_mode:
            # Boxed sparse TV: evaluate the term on a 1-voxel-haloed slice
            # of the clip box read from the FULL params (the box's edge
            # voxels need true out-of-box neighbors), then slice the box
            # back out. _axis_term edge-replicates at the halo slice's
            # borders; those border rows are only KEPT when the box itself
            # touches the grid border (the halo start clamps exactly then),
            # so the semantics match the full-grid op everywhere. Gating by
            # the MSE grad (before the add) preserves the reference's
            # sparse rule (total_variation_kernel.cu:21).
            from ..ops import tv as tv_ops
            sx, sy, sz = model.tv_axis_scales()
            for name, wn in (("density", w_tv_density), ("k0", w_tv_k0)):
                if wn <= 0 or name not in grads:
                    continue
                full = params[name]
                g3 = tuple(int(d) for d in full.shape[:3])
                hs = tuple(min(s + 2, g) for s, g in zip(sizes_xyz, g3))
                start = tuple(
                    jnp.clip(o - 1, 0, g - h)
                    for o, g, h in zip(offs_xyz, g3, hs))
                tail = [jnp.int32(0)] * (full.ndim - 3)
                halo = jax.lax.dynamic_slice(
                    full, (*start, *tail), (*hs, *full.shape[3:]))
                tv_h = tv_ops.tv_term(halo, wn / n_rand * sx,
                                      wn / n_rand * sy, wn / n_rand * sz)
                j = tuple(o - s for o, s in zip(offs_xyz, start))
                tv_box = jax.lax.dynamic_slice(
                    tv_h, (*j, *tail), (*sizes_xyz, *full.shape[3:]))
                grads[name] = grads[name] + jnp.where(
                    grads[name] != 0, tv_box, 0.0)
        elif apply_tv:
            if w_tv_density > 0 and "density" in grads:
                grads["density"] = model.density_total_variation_grad(
                    trainable["density"], grads["density"],
                    w_tv_density / n_rand, tv_dense)
            if w_tv_k0 > 0 and "k0" in grads:
                grads["k0"] = model.k0_total_variation_grad(
                    trainable["k0"], grads["k0"],
                    w_tv_k0 / n_rand, tv_dense)

        # Region-sliced Adam: with the sweep clipped to the occupancy bbox,
        # grid gradients are exactly zero outside it, so skip_zero_grad
        # params can skip the full-grid moment read/write. In region mode
        # the grid grads arrive already box-shaped (see above); the
        # optimizer detects that by shape. TV steps inject out-of-box
        # gradients -> full update those steps.
        regions = None
        opt_trainable = trainable
        if region_mode:
            offs = tuple(clip_off[inv[a]] for a in range(3))
            regions = {n: (offs, sizes_xyz) for n in grid_names}
            # full-size params for the update; grads stay box-shaped
            opt_trainable = {**trainable,
                             **{n: params[n] for n in grid_names}}
        new_trainable, new_opt_state = optimizer.update(
            opt_trainable, grads, opt_state, regions=regions)
        new_params = {**params, **new_trainable}
        psnr = -10.0 * jnp.log10(mse)
        return new_params, new_opt_state, loss, psnr

    if n_steps > 1:
        single = train_step

        def train_step(params, mask, opt_state, pool, sels, clip_off,
                       v_bases=None):
            def body(carry, xs):
                p, o = carry
                sel, co, vb = xs
                p, o, loss, psnr = single(p, mask, o, pool, sel, co, vb)
                return (p, o), (loss, psnr)

            if v_bases is None:
                v_bases = jnp.zeros((n_steps, 0), jnp.int32)
            # clip_off may vary per sub-step (the segment-window sampler's
            # per-batch v offsets); a single [3] is broadcast.
            cos = clip_off if clip_off.ndim == 2 \
                else jnp.broadcast_to(clip_off, (n_steps, 3))
            (params, opt_state), (losses, psnrs) = jax.lax.scan(
                body, (params, opt_state), (sels, cos, v_bases))
            return params, opt_state, losses, psnrs

    # ``donate`` aliases params + optimizer state into the outputs, saving
    # the copy XLA must otherwise insert around the region-sliced
    # dynamic-update-slices (~3 ms at 160^3). Opt-in: the engine loop
    # reassigns model.params/opt_state from the return so donation is safe
    # there, but direct callers (tests, dryruns) may reuse the inputs.
    donate_kw = {"donate_argnums": (0, 2)} if donate else {}
    if mesh is None:
        return jax.jit(train_step, **donate_kw)
    from ..parallel import replicate, shard_rays
    rep = replicate(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sel_shard = (NamedSharding(mesh, P(None, "data")) if n_steps > 1
                 else shard_rays(mesh, ndim=1))
    in_sh = (rep, rep, rep, rep, sel_shard, rep)
    if wv:
        # v-window starts are per ray tile; tiles shard with the rays
        # (N_rand/devices stays a multiple of TILE_N, checked by the loop).
        vb_shard = (NamedSharding(mesh, P(None, "data")) if n_steps > 1
                    else NamedSharding(mesh, P("data")))
        in_sh = in_sh + (vb_shard,)
    return jax.jit(train_step,
                   in_shardings=in_sh,
                   out_shardings=(rep, rep, rep, rep),
                   **donate_kw)


@functools.partial(jax.jit, static_argnames=("h", "w", "ndc", "inverse_y",
                                              "flip_x", "flip_y"))
def _rays_of_view_device(K, c2w, *, h, w, ndc, inverse_y, flip_x, flip_y):
    """jnp mirror of rays.get_rays_of_a_view (center mode): regenerate a
    view's flat ray pool ON DEVICE from its 3x3+3 camera — the flatten
    pool's host->device upload (620 MB at fern scale) otherwise drains at
    tunnel mercy (measured 20 s healthy, 7-10 min degraded — every r5 fern
    run stalled at 'initial refresh_clip' behind it). Same f32 formulas as
    the numpy version; XLA fusion/FMA may differ in the last ulp, which
    the segment builders absorb with a guard band (ops/sweep.SEG_GUARD)."""
    j, i = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    i, j = i + 0.5, j + 0.5
    if flip_x:
        i = i[:, ::-1]
    if flip_y:
        j = j[::-1, :]
    if inverse_y:
        dirs = jnp.stack([(i - K[0, 2]) / K[0, 0],
                          (j - K[1, 2]) / K[1, 1], jnp.ones_like(i)], -1)
    else:
        dirs = jnp.stack([(i - K[0, 2]) / K[0, 0],
                          -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if ndc:
        focal, near_n = K[0, 0], 1.0
        t = -(near_n + rays_o[..., 2]) / rays_d[..., 2]
        ro = rays_o + t[..., None] * rays_d
        o0 = -1.0 / (w / (2.0 * focal)) * ro[..., 0] / ro[..., 2]
        o1 = -1.0 / (h / (2.0 * focal)) * ro[..., 1] / ro[..., 2]
        o2 = 1.0 + 2.0 * near_n / ro[..., 2]
        d0 = -1.0 / (w / (2.0 * focal)) * (
            rays_d[..., 0] / rays_d[..., 2] - ro[..., 0] / ro[..., 2])
        d1 = -1.0 / (h / (2.0 * focal)) * (
            rays_d[..., 1] / rays_d[..., 2] - ro[..., 1] / ro[..., 2])
        d2 = -2.0 * near_n / ro[..., 2]
        rays_o = jnp.stack([o0, o1, o2], -1)
        rays_d = jnp.stack([d0, d1, d2], -1)
    return (rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            viewdirs.reshape(-1, 3))


def gather_training_rays(model, cfg, cfg_train, data_dict, render_kwargs):
    """Assemble the training ray pool per the configured sampler
    (run.py:278-308)."""
    images = data_dict["images"]
    HW, Ks, poses = data_dict["HW"], data_dict["Ks"], data_dict["poses"]
    i_train = data_dict["i_train"]
    if data_dict["irregular_shape"]:
        rgb_tr_ori = [np.asarray(images[i], np.float32) for i in i_train]
    else:
        rgb_tr_ori = np.asarray(images, np.float32)[i_train]

    sampler = cfg_train.ray_sampler
    if sampler == "in_maskcache":
        rgb_tr, rays_o_tr, rays_d_tr, viewdirs_tr, imsz = \
            ray_lib.get_training_rays_in_maskcache_sampling(
                rgb_tr_ori=rgb_tr_ori, train_poses=poses[i_train],
                HW=HW[i_train], Ks=Ks[i_train], ndc=cfg.data.ndc,
                inverse_y=cfg.data.inverse_y,
                flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
                model=model, render_kwargs=render_kwargs)
        if len(rgb_tr) == 0:
            # Coarse geometry below mask_cache_thres everywhere (e.g. a very
            # short coarse stage) would starve training; fall back to the
            # full-ray pool rather than crashing.
            print("gather_training_rays: in_maskcache pool empty, "
                  "falling back to 'flatten'")
            sampler = "flatten"
    if sampler == "flatten":
        rgb_tr, rays_o_tr, rays_d_tr, viewdirs_tr, imsz = \
            ray_lib.get_training_rays_flatten(
                rgb_tr_ori=rgb_tr_ori, train_poses=poses[i_train],
                HW=HW[i_train], Ks=Ks[i_train], ndc=cfg.data.ndc,
                inverse_y=cfg.data.inverse_y,
                flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y)
    elif sampler == "random":
        rgb_tr, rays_o_tr, rays_d_tr, viewdirs_tr, imsz = \
            ray_lib.get_training_rays(
                rgb_tr=rgb_tr_ori, train_poses=poses[i_train],
                HW=HW[i_train], Ks=Ks[i_train], ndc=cfg.data.ndc,
                inverse_y=cfg.data.inverse_y,
                flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y)
    return rgb_tr, rays_o_tr, rays_d_tr, viewdirs_tr, imsz


def scene_rep_reconstruction(args, cfg, cfg_model, cfg_train, xyz_min,
                             xyz_max, data_dict, stage,
                             coarse_ckpt_path=None):
    """One optimization stage (run.py:199-437)."""
    # Stage phase timers: the first measured full-length run spent ~40% of
    # its coarse-stage wall-clock OUTSIDE the training loop; keep the
    # breakdown visible so setup regressions surface (PERF_LOG round 3).
    _t_stage = time.time()
    _t_mark = [_t_stage]

    def _phase(name):
        now = time.time()
        print(f"scene_rep_reconstruction ({stage}): [phase] {name} "
              f"{now - _t_mark[0]:.1f} s (t+{now - _t_stage:.1f})")
        _t_mark[0] = now
    if stage == "fine" and not cfg.fine_model_and_render.get(
            "use_coarse_geo", True):
        coarse_ckpt_path = None
    if abs(cfg_model.world_bound_scale - 1) > 1e-9:
        xyz_shift = (xyz_max - xyz_min) * (cfg_model.world_bound_scale - 1) / 2
        xyz_min = xyz_min - xyz_shift
        xyz_max = xyz_max + xyz_shift
    near, far = data_dict["near"], data_dict["far"]
    poses, i_train = data_dict["poses"], data_dict["i_train"]

    last_ckpt_path = os.path.join(cfg.basedir, cfg.expname,
                                  f"{stage}_last.tar")
    if args.no_reload:
        reload_ckpt_path = None
    elif getattr(args, "ft_path", ""):
        reload_ckpt_path = args.ft_path
    elif ckpt_lib.checkpoint_exists(last_ckpt_path):
        reload_ckpt_path = last_ckpt_path
    else:
        # Interrupted-run resume: i_weights checkpoints land as
        # {stage}_{step:06d}.tar (atomic tmp+rename, so any file found is
        # complete). A run aborted mid-stage — e.g. by the fetchguard
        # watchdog on a wedged transport (tools/resilient_run.py) — resumes
        # from the newest one instead of restarting the stage.
        import glob as _glob
        numbered = sorted(_glob.glob(os.path.join(
            cfg.basedir, cfg.expname, f"{stage}_[0-9]*.tar")))
        reload_ckpt_path = numbered[-1] if numbered else None

    model_class = _model_class_for(cfg)
    if reload_ckpt_path is None:
        print(f"scene_rep_reconstruction ({stage}): train from scratch")
        start = 0
        model_kwargs = copy.deepcopy(dict(cfg_model))
        num_voxels = model_kwargs.pop("num_voxels")
        if len(cfg_train.pg_scale):
            num_voxels = int(num_voxels / (2 ** len(cfg_train.pg_scale)))
        model = model_class(
            xyz_min=xyz_min, xyz_max=xyz_max, num_voxels=num_voxels,
            mask_cache_path=coarse_ckpt_path, **model_kwargs)
        if not cfg.data.ndc and cfg_model.maskout_near_cam_vox:
            model.maskout_near_cam_vox(poses[i_train, :3, 3], near)
        optimizer = create_optimizer_or_freeze_model(model, cfg_train)
        opt_state = optimizer.init(model.params)
    else:
        print(f"scene_rep_reconstruction ({stage}): reload from "
              f"{reload_ckpt_path}")
        st = ckpt_lib.load_checkpoint_file(reload_ckpt_path)
        model = model_class(**st["model_kwargs"])
        ckpt_lib.load_model_state(model, st["model_state_dict"])
        optimizer = create_optimizer_or_freeze_model(model, cfg_train)
        opt_state = optimizer.init(model.params)
        start = int(st["global_step"])
        if not args.no_reload_optimizer and st.get("optimizer_state_dict"):
            opt_state = jax.tree_util.tree_map(
                lambda x: None if x is None else jnp.asarray(x),
                st["optimizer_state_dict"], is_leaf=lambda x: x is None)

    render_kwargs = {
        "near": float(near), "far": float(far),
        "bg": 1 if cfg.data.white_bkgd else 0,
        "stepsize": cfg_model.stepsize,
        "inverse_y": cfg.data.inverse_y,
        "flip_x": cfg.data.flip_x, "flip_y": cfg.data.flip_y,
    }

    _phase("model+optimizer init")
    rgb_tr, rays_o_tr, rays_d_tr, viewdirs_tr, imsz = gather_training_rays(
        model, cfg, cfg_train, data_dict, render_kwargs)
    _phase("gather_training_rays")

    # SPMD data parallelism over a 1-D 'data' mesh (opt-in via
    # --data_parallel): ray batches shard across chips, everything else is
    # replicated; jit's explicit in_shardings reshard the step inputs, so
    # the host loop below is unchanged.
    mesh = None
    if getattr(args, "data_parallel", False) and len(jax.devices()) > 1:
        from ..parallel import make_mesh
        if cfg_train.N_rand % len(jax.devices()) != 0:
            print(f"data_parallel: N_rand={cfg_train.N_rand} not divisible "
                  f"by {len(jax.devices())} devices; running single-chip")
        else:
            mesh = make_mesh()
            print(f"data_parallel: sharding ray batches over "
                  f"{len(mesh.devices.ravel())} devices")

    # Device-resident ray pool (flat [N, 3] each); batches are gathered on
    # device by index, so the per-step host->device transfer is just the
    # int32 index vector. (This is the TPU counterpart of the reference's
    # load2gpu_on_the_fly choice, configs/default.py:19.)
    rays_o_np = np.asarray(rays_o_tr).reshape(-1, 3)
    rays_d_np = np.asarray(rays_d_tr).reshape(-1, 3)
    pool = {"rgb": jnp.asarray(
        np.asarray(rgb_tr, np.float32).reshape(-1, 3))}
    # Flatten pools regenerate rays ON DEVICE from the cameras (21
    # dynamic_update_slice dispatches) instead of uploading ~3x the rgb
    # bytes through the tunnel; the host copies above still drive the
    # segment sorts. Guarded by SEG_GUARD in the builders against
    # last-ulp host/device float skew. Mesh runs keep the upload (pool
    # must replicate via device_put; mesh = local CPU devices, no tunnel).
    if cfg_train.ray_sampler == "flatten" \
            and not data_dict["irregular_shape"] and mesh is None:
        i_train = data_dict["i_train"]
        n_pool = rays_o_np.shape[0]
        bufs = [jnp.zeros((n_pool, 3), jnp.float32) for _ in range(3)]
        off = 0
        for vi in i_train:
            H, W = (int(x) for x in data_dict["HW"][vi])
            ro, rd, vd = _rays_of_view_device(
                jnp.asarray(data_dict["Ks"][vi], jnp.float32),
                jnp.asarray(data_dict["poses"][vi], jnp.float32),
                h=H, w=W, ndc=bool(cfg.data.ndc),
                inverse_y=bool(cfg.data.inverse_y),
                flip_x=bool(cfg.data.flip_x), flip_y=bool(cfg.data.flip_y))
            for b, part in zip(range(3), (ro, rd, vd)):
                bufs[b] = jax.lax.dynamic_update_slice(
                    bufs[b], part, (off, 0))
            off += H * W
        assert off == n_pool
        pool.update(rays_o=bufs[0], rays_d=bufs[1], viewdirs=bufs[2])
    else:
        pool.update(
            rays_o=jnp.asarray(rays_o_np), rays_d=jnp.asarray(rays_d_np),
            viewdirs=jnp.asarray(np.asarray(viewdirs_tr).reshape(-1, 3)))
    if mesh is not None:
        from ..parallel import replicate
        pool = jax.device_put(pool, replicate(mesh))
    n_pool = pool["rgb"].shape[0]
    jax.block_until_ready(pool["rgb"])
    _phase("ray pool device put")
    rng = np.random.default_rng(getattr(args, "seed", 777))

    # Station-sweep fast path: group the pool by each ray's dominant axis so
    # every batch shares a static sweep axis (directvoxgo_tpu/ops/sweep.py).
    use_sweep = (getattr(model, "query_mode", "gather") == "sweep"
                 and hasattr(model, "forward_sweep"))
    sweep_axes = []   # axes with rays (precompile_steps enumerates these)
    bucket_ok = False
    bucket2d_ok = False
    fused_tiles = False
    buckets = {}
    bucket_compile_hook = {}
    if use_sweep:
        from ..ops import sweep as sweep_ops
        forced = getattr(model, "forced_sweep_axis", None)
        if forced is not None:
            # MPI grids sweep along z regardless of ray direction (the NDC
            # sampler is a z-station sweep; models/dmpigo.py forward_sweep).
            groups = np.full(int(pool["rays_d"].shape[0]), forced, np.int64)
        else:
            # rays_d_np is the host copy the pool was built from — pulling
            # pool["rays_d"] back off the device costs a 77 MB tunnel
            # round-trip (measured up to ~70 s in a bandwidth trough).
            groups = sweep_ops.dominant_axis(
                rays_d_np, model.xyz_min, model.xyz_max, model.world_size)
        group_idx = [np.flatnonzero(groups == ax) for ax in range(3)]
        group_p = np.array([len(g) for g in group_idx], np.float64)
        group_p = group_p / group_p.sum()
        sweep_axes = [ax for ax in range(3) if len(group_idx[ax]) > 0]
        print("gather_training_rays: sweep axis groups",
              [len(g) for g in group_idx])
        group_gens = []
        for g in group_idx:
            if len(g) >= cfg_train.N_rand:
                gen = ray_lib.batch_indices_generator(
                    len(g), cfg_train.N_rand, rng=rng)
                group_gens.append(lambda g=g, gen=gen: g[np.asarray(next(gen))])
            elif len(g) > 0:
                group_gens.append(
                    lambda g=g: g[rng.integers(0, len(g), cfg_train.N_rand)])
            else:
                group_gens.append(None)

        # Spatially-sorted ray SEGMENTS for v-windowed sweeps: each batch is
        # one segment (N_rand consecutive rays of the v-endpoint Morton
        # order) from ONE window-width class, so the compiled step's static
        # width covers every tile's forward window AND the batch-level
        # window the backward uses (ops/sweep.build_ray_segments). Sampling
        # stays unbiased: class chosen proportional to its ray count,
        # segments uniform within the class — every pool ray keeps the same
        # marginal probability as the uniform sampler; only the
        # within-batch correlation structure changes (rays arrive
        # spatially clustered).
        n_tile = cfg_train.N_rand // sweep_ops.TILE_N
        bucket_ok = (bool(cfg_train.get("bucket_tiles", True))
                     and forced is None
                     and cfg_train.N_rand % sweep_ops.TILE_N == 0
                     and (mesh is None
                          or (cfg_train.N_rand
                              // int(np.prod(mesh.devices.shape)))
                          % sweep_ops.TILE_N == 0))
        # Forced-axis (MPI z-sweep) models window BOTH in-plane dims:
        # station planes are whole images there (LLFF fern: 404x323 voxels
        # per plane vs 4096 rays — an unwindowed step costs 59 ms), and
        # forward-facing batches drawn as Morton segments are image tiles
        # with compact (u, v) footprints (ops/sweep.build_ray_segments_2d).
        bucket2d_ok = (bool(cfg_train.get("bucket_tiles", True))
                       and forced is not None and mesh is None)
        # Perspective sweeps window BOTH in-plane dims too (segment-level
        # (wu, wv) composed boxes; 0 in a slot = full extent). Same sort
        # machinery as the 1D v-windows it supersedes.
        persp2d = bucket_ok and bool(cfg_train.get("bucket_2d", True))
        # Fused-kernel tile classes supersede the composed-box classes for
        # perspective sweeps when the model supports the fused step: the
        # sampling unit becomes the 512-ray tile and batches regroup
        # same-class tiles, so the kernels' per-(station-block, tile)
        # windows realize the 7-10%-of-segment-box cell footprints the
        # whole-traversal classes cannot (ops/pallas_train_fused).
        from ..ops import pallas_train_fused as _ptf
        # Under --data_parallel the fused step runs per-shard inside a
        # shard_map (make_train_step), so each device's slice of the batch
        # must still tile into 512-ray kernel tiles.
        _ndev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
        fused_tiles = (persp2d
                       and bool(cfg_train.get("fused_tiles", True))
                       and cfg_train.N_rand % (512 * _ndev) == 0
                       and _ptf.fused_enabled()
                       and hasattr(model, "supports_fused_step")
                       and model.supports_fused_step())
        # buckets: ax -> {W | (Wu, Wv): (idx, lo(s)...)}; the compile hook
        # is filled in once the compile machinery below exists

        # The segment sort is pure host work (3 argsorts over the pool,
        # ~10-20 s at lego scale) on data that never changes within a pg
        # stage — build it in a background thread and draw unbucketed (full
        # sweeps) until it lands, instead of stalling the stage start and
        # every pg_scale event (measured 15-74 s per build on the shared
        # CPU, PERF_LOG round 3).
        import threading
        bucket_builds = {"thread": None, "epoch": 0}

        def build_buckets():
            if not (bucket_ok or bucket2d_ok):
                return
            bucket_builds["epoch"] += 1
            epoch = bucket_builds["epoch"]
            # Speculative stage-start precompile: the window-class mix is
            # geometry-driven and stable across pg stages, so resubmit the
            # previous stage's plain-2D classes for the NEW grid shapes
            # while the fresh Morton sort runs in this thread — draws stop
            # paying the full-sweep fallback as soon as the sort lands
            # instead of (sort + serialized compiles) later.
            prev2d = {ax: [k for k in bk if isinstance(k, tuple)
                           and len(k) == 2 and k != (0, 0)]
                      for ax, bk in buckets.items() if bk}
            buckets.clear()
            hook_k = bucket_compile_hook.get("submit_keys")
            if hook_k is not None:
                for ax, ks in prev2d.items():
                    if ks:
                        hook_k(ax, ks)
            xyz_min, xyz_max = model.xyz_min, model.xyz_max
            world_size = tuple(int(x) for x in model.world_size)

            def work2d():
                ax = int(forced)
                g = group_idx[ax]
                if len(g) < cfg_train.N_rand:
                    return
                # widths: 48 carries ~44% of the fern-scale NDC pool
                # (tools/analyze_ndc_windows.py) and 128 is the cp*wv=2048
                # XLA lane-tiling cliff (PERF_LOG r3) — use the same list
                # as the perspective path, not the builder default.
                b = sweep_ops.build_ray_segments_2d(
                    rays_o_np[g], rays_d_np[g], xyz_min, xyz_max,
                    world_size, ax, n_rand=cfg_train.N_rand,
                    widths=(32, 48, 64, 96))
                out = {wuv: (g[idx], ulo, vlo)
                       for wuv, (idx, ulo, vlo) in b.items()
                       if idx.shape[0] > 0} or None
                if bucket_builds["epoch"] != epoch:
                    return
                buckets[ax] = out
                hook = bucket_compile_hook.get("submit")
                if hook is not None and out:
                    hook(ax)

            def work():
                for ax in range(3):
                    g = group_idx[ax]
                    if len(g) < cfg_train.N_rand:
                        out = None
                    else:
                        # Support classes measured over the occupancy clip
                        # box when one is active: contributions outside it
                        # are zero, so box-clipped supports stay exact and
                        # classify far more rays into narrow window classes
                        # (engine composes the window with the clip box).
                        csz, coff = clip_plan.get(ax, (None, None))
                        box = box6 = None
                        if csz is not None:
                            _o = np.asarray(coff)
                            box = (float(_o[0]),
                                   float(_o[0]) + float(csz[0]) - 1.0,
                                   float(_o[2]),
                                   float(_o[2]) + float(csz[2]) - 1.0)
                            box6 = (box[0], box[1],
                                    float(_o[1]),
                                    float(_o[1]) + float(csz[1]) - 1.0,
                                    box[2], box[3])
                        if fused_tiles:
                            tb = sweep_ops.build_ray_tiles_blocktile(
                                rays_o_np[g], rays_d_np[g], xyz_min,
                                xyz_max, world_size, ax, near, far,
                                cfg_model.stepsize, nt=512,
                                max_classes=int(cfg_train.get(
                                    "fused_tile_classes", 4)),
                                clip_box=box6)
                            # Classes the fused gate rejects (VMEM at this
                            # box) fold into the remainder NOW so their
                            # tiles stay drawable via the plain program
                            # (the compile hook would silently skip them
                            # and the draw path never sees unlanded keys).
                            if csz is not None:
                                _bu, _bv = int(csz[1]), int(csz[2])
                            else:
                                _pm = sweep_ops._PERMS[ax]
                                _bu = int(world_size[_pm[1]])
                                _bv = int(world_size[_pm[2]])
                            _fdim = (model.k0_dim if model.rgbnet_direct
                                     else model.k0_dim - 3)
                            keep, rest = {}, []
                            for kk, idx in tb.items():
                                if idx.shape[0] == 0:
                                    continue
                                ok = (kk[0] == 0 and kk[1] == 0) or \
                                    _ptf.fused_available(
                                        int(cfg_train.N_rand) // _ndev,
                                        _bu, _bv,
                                        _fdim, int(model.rgbnet_width),
                                        float(model.fast_color_thres),
                                        int(model.rgbnet_depth),
                                        wu=int(kk[0]), wv=int(kk[1]))
                                if ok:
                                    keep[("fblk", *kk)] = g[idx]
                                else:
                                    rest.append(g[idx])
                            if rest:
                                rk0 = ("fblk", 0, 0, 0)
                                if rk0 in keep:
                                    rest.append(keep[rk0])
                                keep[rk0] = np.concatenate(rest, axis=0)
                            # Remainder tiles (wider cell support than any
                            # kept fused class) re-bucket through the XLA
                            # composed-box 2D windows instead of training
                            # as plain draws: at the final grid the clip
                            # plan is None (the fine grid IS the coarse
                            # bbox) so a plain draw is a FULL-GRID sweep
                            # (~35-100 ms realized) while a (96,96)-class
                            # composed box costs 13-19 ms (PERF_LOG r3).
                            # Measured run r4b: remainder was 17-34% of
                            # rays at the final grid and plain draws were
                            # ~55% of the stage's realized wall.
                            rk0 = ("fblk", 0, 0, 0)
                            rest_rays = keep.get(rk0)
                            if rest_rays is not None:
                                rr = np.asarray(rest_rays).reshape(-1)
                                if rr.size < cfg_train.N_rand:
                                    # Small remainders used to skip the
                                    # re-bucket and draw as FULL-GRID plain
                                    # sweeps (35-100 ms realized, r4b) —
                                    # pad with resampled group rays so one
                                    # composed-box segment always forms
                                    # (the pad rays are legitimate training
                                    # rays, merely oversampled).
                                    pad = np.random.default_rng(0).choice(
                                        g, size=cfg_train.N_rand - rr.size)
                                    rr = np.concatenate([rr, pad])
                                # default widths exclude 128: wv=128
                                # measured pathological (cp*wv = 2048-lane
                                # XLA tiling cliff, PERF_LOG r3)
                                b2 = sweep_ops.build_ray_segments_2d(
                                    rays_o_np[rr], rays_d_np[rr],
                                    xyz_min, xyz_max, world_size, ax,
                                    n_rand=cfg_train.N_rand,
                                    widths=tuple(cfg_train.get(
                                        "remainder2d_widths",
                                        (48, 64, 96))),
                                    max_classes=3, clip_box=box6)
                                if b2:
                                    keep.pop(rk0, None)
                                    for wuv, (idx2, ulo, vlo) in b2.items():
                                        if idx2.shape[0] == 0:
                                            continue
                                        if wuv == (0, 0):
                                            # keep the fblk remainder's
                                            # [tiles, 512] row shape
                                            keep[rk0] = rr[idx2].reshape(
                                                -1, 512)
                                        else:
                                            keep[wuv] = (rr[idx2], ulo,
                                                         vlo)
                                # Rays too wide even for the 2D classes
                                # still drew as FULL-GRID plain sweeps —
                                # measured 57-68 ms at 24% of draws, 37%
                                # of the r5 clean-run fine blend. Per-
                                # p-BLOCK windows shrink the traversal
                                # drift B-fold (measured 0.16x of a full
                                # sweep, tools/analyze_blocked_windows),
                                # so push the leftovers through the
                                # blocked builder; only rays failing THAT
                                # remain plain draws.
                                lf = keep.get(rk0)
                                if lf is not None and lf.size > 0:
                                    lff = np.asarray(lf).reshape(-1)
                                    bb = sweep_ops.\
                                        build_ray_segments_blocked(
                                            rays_o_np[lff],
                                            rays_d_np[lff],
                                            xyz_min, xyz_max, world_size,
                                            ax, n_rand=cfg_train.N_rand,
                                            n_blocks=int(cfg_train.get(
                                                "bucket_blocks", 6)),
                                            widths=(32, 48, 64, 96),
                                            max_classes=4, clip_box=box6)
                                    if bb:
                                        keep.pop(rk0, None)
                                        for wuv, (bi, uo, vo) in \
                                                bb.items():
                                            if bi.shape[0] == 0:
                                                continue
                                            if wuv == (0, 0):
                                                keep[rk0] = lff[bi]\
                                                    .reshape(-1, 512)
                                            else:
                                                keep[("blk", *wuv)] = (
                                                    lff[bi], uo, vo)
                            out = keep or None
                        elif persp2d and bool(cfg_train.get(
                                "bucket_blocked", False)):
                            # Per-p-BLOCK (u, v) windows: the full-traversal
                            # drift that forces 2D classes to ~full-u
                            # shrinks B-fold per block, and the 4-endpoint
                            # sort groups same-direction rays — measured
                            # blend 0.16x of the full sweep vs 0.59x for
                            # the whole-traversal 2D classes
                            # (tools/analyze_blocked_windows.py).
                            bb = sweep_ops.build_ray_segments_blocked(
                                rays_o_np[g], rays_d_np[g], xyz_min,
                                xyz_max, world_size, ax,
                                n_rand=cfg_train.N_rand,
                                n_blocks=int(cfg_train.get(
                                    "bucket_blocks", 6)),
                                widths=(32, 48, 64, 96),
                                max_classes=6, clip_box=box6)
                            out = {("blk", *wuv): (g[idx], uo, vo)
                                   for wuv, (idx, uo, vo) in bb.items()
                                   if idx.shape[0] > 0} or None
                        elif persp2d:
                            # BOTH in-plane dims windowed for perspective
                            # sweeps too: a Morton segment's u support over
                            # its clip-box traversal is often compact as
                            # well, and (wu, wv) composed boxes cut the
                            # remaining ~bu/wu FLOP factor the v-only
                            # windows leave on the table. Keys with a 0
                            # slot mean full extent for that dim (the old
                            # v-only classes come back as (0, wv)).
                            b2 = sweep_ops.build_ray_segments_2d(
                                rays_o_np[g], rays_d_np[g], xyz_min,
                                xyz_max, world_size, ax,
                                n_rand=cfg_train.N_rand,
                                widths=(32, 48, 64, 96),
                                max_classes=6, clip_box=box6)
                            out = {wuv: (g[idx], ulo, vlo)
                                   for wuv, (idx, ulo, vlo) in b2.items()
                                   if idx.shape[0] > 0} or None
                        else:
                            b = sweep_ops.build_ray_segments(
                                rays_o_np[g], rays_d_np[g], xyz_min,
                                xyz_max, world_size, ax,
                                n_rand=cfg_train.N_rand, clip_box=box)
                            out = {w: (g[idx], svlo, tvlo)
                                   for w, (idx, svlo, tvlo) in b.items()
                                   if idx.shape[0] > 0} or None
                    if bucket_builds["epoch"] != epoch:
                        return  # superseded by a pg_scale rebuild
                    buckets[ax] = out
                    if out:
                        shares = {k: (v.size if isinstance(v, np.ndarray)
                                      else v[0].size)
                                  for k, v in out.items()}
                        tot = max(sum(shares.values()), 1)
                        print(f"scene_rep_reconstruction ({stage}): [phase]"
                              f" segment classes ax{ax}: "
                              + " ".join(f"{k}:{c/tot:.2f}" for k, c in
                                         sorted(shares.items(),
                                                key=lambda kv: -kv[1])))
                    if persp2d and out:
                        # 2D classes aren't enumerable in advance —
                        # background-compile what the sort produced
                        # (forced-axis models do the same, work2d above).
                        hook = bucket_compile_hook.get("submit")
                        if hook is not None:
                            hook(ax)

            def _guard(fn):
                # A daemon thread dying silently leaves the stage drawing
                # full sweeps forever — surface the traceback.
                def run():
                    try:
                        fn()
                    except Exception:
                        import traceback
                        print(f"scene_rep_reconstruction ({stage}): "
                              "[phase] segment sort FAILED:")
                        traceback.print_exc()
                return run

            t = threading.Thread(target=_guard(work2d if bucket2d_ok
                                               else work),
                                 daemon=True, name="segment-sort")
            bucket_builds["thread"] = t
            t.start()

        pick_state = {"limited": 0}

        def _pick_axis(n_sub):
            # Prefer axes whose fallback program for this dispatch width
            # already landed: stage/pg starts sync-compile ONE axis and land
            # the rest in background (remote XLA serializes compiles — six
            # up-front cost 17-33 s per pg event), so early chunks draw from
            # whichever axis can run without a blocking compile. Steady
            # state (all landed, a few seconds in) is exactly the group_p
            # draw; the brief single-axis skew self-corrects over the pool
            # epoch (groups partition the pool; marginal ray probability
            # within a group is unchanged). Bounded: if background compiles
            # stall (one run starved axes 1/2 for 135 s when 18 window
            # programs queued ahead of their fallbacks), 400 limited draws
            # (~10-15 s) force the full distribution — one inline compile
            # beats minutes of single-axis training.
            avail = [ax for ax in range(3) if group_p[ax] > 0]
            ready = [ax for ax in avail
                     if (ax, n_sub, clip_plan.get(ax, (None, None))[0])
                     in train_steps]
            if ready and len(ready) < len(avail):
                pick_state["limited"] += 1
                if pick_state["limited"] <= 400:
                    p = np.asarray([group_p[ax] for ax in ready],
                                   np.float64)
                    return int(ready[int(rng.choice(len(ready),
                                                    p=p / p.sum()))])
            else:
                pick_state["limited"] = 0
            return int(rng.choice(3, p=group_p))

        def next_chunk(n_sub, no_window=False):
            # The axis is chosen ONCE per chunk and all n_sub batches are
            # drawn from that axis group: each sel is coupled to its group's
            # sweep axis (spacing 0.5*voxel/|d_axis| assumes the dominant
            # axis), so mixing draws from different groups under one static
            # axis would march mismatched rays with blown-up spacing.
            #
            # Segment draws return a WINDOW CLIP: the batch's v support fits
            # a (full p, full u, W) box, which rides the existing clip
            # machinery — static sizes + traced offsets — so region-grad
            # mode and region-sliced Adam shrink every full-grid pass (cast/
            # permute/slab-blend/backward/optimizer) by ~Gv/W as well.
            ax = _pick_axis(n_sub)
            bk = buckets.get(ax)
            if bk is not None and not no_window \
                    and any(isinstance(k, tuple) and k
                            and k[0] == "fblk" for k in bk):
                # Fused-kernel tile draws: a batch is N_rand/512 tiles of
                # ONE (wu, wv, sign) class (direction-uniform, every
                # per-(station-block, tile) cell fits the class — see
                # ops/sweep.build_ray_tiles_blocktile). Classes whose
                # program landed draw proportional to ray count; the
                # (0, 0, 0) remainder trains through the plain fallback.
                csz, coff = clip_plan.get(ax, (None, None))
                if csz is not None:
                    bp, bu, bv = (int(x) for x in csz)
                    offs3 = np.asarray(coff, np.int32)
                else:
                    perm = sweep_ops._PERMS[ax]
                    bp = int(model.world_size[perm[0]])
                    bu = int(model.world_size[perm[1]])
                    bv = int(model.world_size[perm[2]])
                    offs3 = np.zeros(3, np.int32)
                def eff2(k):
                    eu = k[0] if 0 < k[0] < bu else bu
                    ev = k[1] if 0 < k[1] < bv else bv
                    return eu, ev

                cands, counts = [], []
                for kk in bk:
                    if not isinstance(kk, tuple) or not kk:
                        continue
                    if kk[0] == "fblk":
                        wu_k, wv_k = int(kk[1]), int(kk[2])
                        if wu_k == 0 and wv_k == 0:
                            cands.append((kk, None))
                            counts.append(bk[kk].size)
                            continue
                        skey = ("fblk", wu_k, wv_k, bp, bu, bv)
                        if (ax, 1, skey) in train_steps:
                            cands.append((kk, skey))
                            counts.append(bk[kk].size)
                    elif len(kk) == 2:
                        # remainder tiles re-bucketed as composed-box 2D
                        # window segments (see build_buckets)
                        eu, ev = eff2(kk)
                        if (eu, ev) == (bu, bv):
                            continue
                        if (ax, 1, (bp, eu, ev)) in train_steps:
                            cands.append((kk, (bp, eu, ev)))
                            counts.append(bk[kk][0].size)
                    elif len(kk) == 3 and kk[0] == "blk":
                        # 2D-leftover rays re-bucketed once more through
                        # per-p-block windows (see build_buckets)
                        eu, ev = eff2((int(kk[1]), int(kk[2])))
                        nb_b = bk[kk][1].shape[1]
                        skey_b = ("blk", nb_b, eu, ev)
                        if (ax, 1, skey_b) in train_steps:
                            cands.append((kk, skey_b))
                            counts.append(bk[kk][0].size)
                if not cands or all(s is None for _, s in cands):
                    return ([group_gens[ax]() for _ in range(n_sub)], ax,
                            None, None)
                counts = np.asarray(counts, np.float64)
                kk, skey = cands[int(rng.choice(len(cands),
                                                p=counts / counts.sum()))]
                if kk[0] == "blk":    # per-p-block windowed leftover draw
                    bidx, buo_a, bvo_a = bk[kk]
                    r = int(rng.integers(0, bidx.shape[0]))
                    offs_b = np.stack([buo_a[r], bvo_a[r]],
                                      axis=1).astype(np.int32)
                    return [bidx[r]], ax, skey, offs_b[None]
                if kk[0] != "fblk":   # 2D composed-box remainder draw
                    eu, ev = eff2(kk)
                    idx2, ulo, vlo = bk[kk]
                    r = int(rng.integers(0, idx2.shape[0]))
                    bpo, buo, bvo = (int(x) for x in offs3)
                    offs = np.asarray(
                        [[bpo,
                          min(max(int(ulo[r]), buo), buo + bu - eu),
                          min(max(int(vlo[r]), bvo), bvo + bv - ev)]],
                        np.int32)
                    return [idx2[r]], ax, skey, offs
                idx = bk[kk]
                n_draw = cfg_train.N_rand // 512
                rows = rng.choice(idx.shape[0], size=n_draw,
                                  replace=idx.shape[0] < n_draw)
                sel = idx[rows].reshape(-1)
                if skey is None:   # remainder tiles -> plain clipped draw
                    return [sel], ax, None, None
                return [sel], ax, skey, offs3[None]
            if bk is not None and not no_window \
                    and any(isinstance(k, tuple) and len(k) == 3
                            and k[0] == "blk" for k in bk):
                # Blocked per-p-block (u, v)-windowed draws (perspective
                # cube sweeps): a segment trains as B composed clip boxes
                # concatenated along the station axis
                # (ops/sweep.build_ray_segments_blocked). Classes whose
                # program landed draw proportional to ray count; the
                # fallback ('blk', 0, 0) class draws through the plain
                # fallback program so its rays keep training.
                perm = sweep_ops._PERMS[ax]
                gu_f = int(model.world_size[perm[1]])
                gv_f = int(model.world_size[perm[2]])

                def eff_blk(kk):
                    eu = kk[1] if 0 < kk[1] < gu_f else gu_f
                    ev = kk[2] if 0 < kk[2] < gv_f else gv_f
                    return eu, ev

                cands, counts = [], []
                for kk in bk:
                    if not (isinstance(kk, tuple) and len(kk) == 3
                            and kk[0] == "blk"):
                        continue
                    if kk[1] == 0 and kk[2] == 0:
                        cands.append((kk, None))   # fallback class
                        counts.append(bk[kk][0].size)
                        continue
                    eu, ev = eff_blk(kk)
                    nb_b = bk[kk][1].shape[1]
                    skey = ("blk", nb_b, eu, ev)
                    if (ax, 1, skey) in train_steps:
                        cands.append((kk, skey))
                        counts.append(bk[kk][0].size)
                if not cands or all(s is None for _, s in cands):
                    return ([group_gens[ax]() for _ in range(n_sub)], ax,
                            None, None)
                counts = np.asarray(counts, np.float64)
                kk, skey = cands[int(rng.choice(len(cands),
                                                p=counts / counts.sum()))]
                idx, uo, vo = bk[kk]
                r = int(rng.integers(0, idx.shape[0]))
                if skey is None:  # fallback class -> plain (clipped) draw
                    return [idx[r]], ax, None, None
                offs = np.stack([uo[r], vo[r]], axis=1).astype(np.int32)
                return [idx[r]], ax, skey, offs[None]
            if bk is not None and not no_window \
                    and any(isinstance(k, tuple) for k in bk):
                # 2D (u, v)-windowed draws for forced-axis MPI sweeps: a
                # segment is an image tile; its batch trains a
                # (p, Wu, Wv) composed box (see build_ray_segments_2d).
                perm = sweep_ops._PERMS[ax]
                csz, coff = clip_plan.get(ax, (None, None))
                if csz is not None:
                    bp, bu, bv = (int(x) for x in csz)
                    bpo, buo, bvo = (int(x) for x in np.asarray(coff))
                else:
                    bp = int(model.world_size[perm[0]])
                    bu = int(model.world_size[perm[1]])
                    bv = int(model.world_size[perm[2]])
                    bpo = buo = bvo = 0
                if forced is not None:
                    # Pin windowed forced-axis (MPI) programs to the FULL
                    # station extent: mask renewals shrink the p clip
                    # mid-stage (128 -> 96 on the fern fixture), which
                    # changes this key and orphans every landed window
                    # program — draws then fell back to the clipped full
                    # sweep (142 ms vs 5-9 ms windowed, r5 fern run) until
                    # recompiles landed. gp is renewal- AND pg-invariant
                    # for MPI grids (mpi_depth never rescales), so pinned
                    # keys survive; sweeping the clipped-out planes is
                    # exact (mask-channel zeros) and costs ~wu*wv extra
                    # per plane vs the ~20x fallback penalty.
                    bp = int(model.world_size[perm[0]])
                    bpo = 0
                def eff(k):
                    # a 0 slot (and any window >= the box extent) means
                    # full extent for that dim
                    eu = k[0] if 0 < k[0] < bu else bu
                    ev = k[1] if 0 < k[1] < bv else bv
                    return eu, ev

                ws = [k for k in bk
                      if isinstance(k, tuple) and k != (0, 0)
                      and eff(k) != (bu, bv)
                      and (ax, 1, (bp, *eff(k))) in train_steps]
                if not ws:
                    return ([group_gens[ax]() for _ in range(n_sub)], ax,
                            None, None)
                counts = np.array([bk[k][0].size for k in ws], np.float64)
                key2d = ws[int(rng.choice(len(ws),
                                          p=counts / counts.sum()))]
                eu, ev = eff(key2d)
                idx, ulo, vlo = bk[key2d]
                rows = [int(rng.integers(0, idx.shape[0]))
                        for _ in range(n_sub)]
                sels = [idx[r] for r in rows]
                offs = [[bpo,
                         min(max(int(ulo[r]), buo), buo + bu - eu),
                         min(max(int(vlo[r]), bvo), bvo + bv - ev)]
                        for r in rows]
                return (sels, ax, (bp, eu, ev),
                        np.asarray(offs, np.int32))
            if bk is not None and not no_window:
                # Segment v-windows COMPOSE with the occupancy clip box:
                # both are (static sizes, traced offsets) boxes, so a
                # windowed clipped draw uses sizes (clip_p, clip_u, W) with
                # the v start clamped into the clip box. Exact: the batch's
                # v support lies in [svlo, svlo+W] and everything outside
                # the occupancy bbox contributes zero (interpolated mask
                # == 0), so the clamped window covers support∩bbox — see
                # the clamp-coverage argument below. Without a clip box the
                # same formula degenerates to the grid-bounds clamp.
                perm = sweep_ops._PERMS[ax]
                csz, coff = clip_plan.get(ax, (None, None))
                if csz is not None:
                    bp, bu, bv = (int(x) for x in csz)
                    bpo, buo, bvo = (int(x) for x in np.asarray(coff))
                else:
                    bp = int(model.world_size[perm[0]])
                    bu = int(model.world_size[perm[1]])
                    bv = int(model.world_size[perm[2]])
                    bpo = buo = bvo = 0
                # Window classes that (a) actually shrink the v extent and
                # (b) whose program already landed from the background
                # compiler — draws never stall on a compile.
                ws = [w for w in bk.keys()
                      if 0 < int(w) < bv
                      and (ax, 1, (bp, bu, int(w))) in train_steps]
                if not ws:
                    return ([group_gens[ax]() for _ in range(n_sub)], ax,
                            None, None)
                counts = np.array([bk[w][0].size for w in ws], np.float64)
                w = int(ws[int(rng.choice(len(ws), p=counts / counts.sum()))])
                idx, svlo, _ = bk[w]
                sels, offs = [], []
                for _ in range(n_sub):
                    r = int(rng.integers(0, idx.shape[0]))
                    sels.append(idx[r])
                    # clamp(svlo, bvo, bvo+bv-w): if the segment window
                    # pokes out of the clip box, shifting it back in never
                    # uncovers support∩bbox (the uncovered rows have
                    # mask == 0).
                    offs.append([bpo, buo,
                                 min(max(int(svlo[r]), bvo), bvo + bv - w)])
                return (sels, ax, (bp, bu, w),
                        np.asarray(offs, np.int32))
            sels = [group_gens[ax]() for _ in range(n_sub)]
            return sels, ax, None, None

        # (the initial build_buckets() runs AFTER the first refresh_clip()
        # below — box-clipped supports need the clip plan)
    elif cfg_train.ray_sampler in ("flatten", "in_maskcache") \
            and n_pool >= cfg_train.N_rand:
        index_gen = ray_lib.batch_indices_generator(
            n_pool, cfg_train.N_rand, rng=rng)

        def next_chunk(n_sub, no_window=False):
            return ([np.asarray(next(index_gen)) for _ in range(n_sub)],
                    None, None, None)

        def build_buckets():
            pass
    else:
        def next_chunk(n_sub, no_window=False):
            return ([rng.integers(0, n_pool, cfg_train.N_rand)
                     for _ in range(n_sub)], None, None, None)

        def build_buckets():
            pass

    # Queue the mask bbox BEFORE voxel_count_views floods the dispatch
    # queue: the initial clip plan needs it, and the host-side bbox form
    # (full mask pull) had to drain the whole backlog first — the coarse
    # stage measured 48 s waiting at 'initial refresh_clip'. Computed
    # first, the 6-scalar pull returns immediately.
    bbox0_dev = None
    if use_sweep and getattr(model.mask, "ndim", 0) == 3 \
            and hasattr(model, "sweep_clip_for_axis"):
        from ..ops import grid as grid_ops
        bbox0_dev = grid_ops.mask_bbox_vox_device(model.mask)

    # View-count-based per-voxel lr (run.py:311-320). The device pool rays
    # are the same flattened arrays — passing them lets the sweep count
    # slice views ON DEVICE instead of re-uploading ~200 MB of rays.
    if cfg_train.pervoxel_lr:
        cnt = model.voxel_count_views(
            rays_o_tr=rays_o_tr, rays_d_tr=rays_d_tr, imsz=imsz,
            near=near, far=far, stepsize=cfg_model.stepsize,
            downrate=cfg_train.pervoxel_lr_downrate,
            irregular_shape=data_dict["irregular_shape"],
            rays_dev=(pool["rays_o"], pool["rays_d"]))
        opt_state = MaskedAdam.set_pervoxel_lr(opt_state, cnt)
        model.params["density"] = jnp.where(
            cnt <= 2, -100.0, model.params["density"])
        _phase("voxel_count_views / pervoxel lr")

    psnr_lst = []
    # (axis, windowed) -> [sum dispatch s, n steps] per i_print window
    axis_stats = {}
    draw_counts = {}  # step key -> iters drawn, whole stage
    # REALIZED per-key step time: async dispatch hides per-program device
    # time (the queue absorbs it; only the i_print pull blocks), so sample
    # it directly — every REALIZED_EVERY-th draw of a key, drain the queue,
    # dispatch, and block. ~200 samples over a 20k stage at 2 tunnel RTTs
    # each (~12 s total); the drain itself is work that had to finish
    # anyway. This is the number VERDICT r3 asked to see per class: the
    # engine blend is the ray-share-weighted mean of these, not of the
    # bench's flatten-pool classes.
    realized_stats = {}  # step key -> [sum s, n samples], reset at pg
    realized_every = int(os.environ.get("DVGO_REALIZED_EVERY", "101"))
    draw_base = {}  # draw_counts snapshot at the last pg event
    # Unbiased per-key attribution: a single synced sample carries the
    # tunnel round trip (~30-60 ms on a remote chip), which steady-state
    # async dispatch hides. Between consecutive drains, draws of mixed
    # keys run fully pipelined; each (duration, per-key draw counts)
    # window is one equation T_w = sum_k n_wk * c_k (+ ~2 RTT spread over
    # ~realized_every iters), so a nonnegative least squares over the
    # stage's windows recovers true per-key device ms. Windows containing
    # a compile, renewal, pg event, or i_print pull are dropped.
    lsq_windows = []   # (duration_s, {key: draws}) clean windows
    win_state = {"t": None, "counts": {}, "dirty": False}
    loss = None
    time0 = time.time()
    global_step = -1
    train_steps = {}  # (axis or None) -> jitted step for current tv state
    tv_state = None

    # Occupancy-bbox sweep clipping (free-space skipping for training): the
    # quantized clip sizes are static per compiled step; refresh them when
    # the mask changes and drop only the steps whose shape bucket moved.
    clip_plan = {}  # axis -> (sizes or None, offsets int32[3])
    refresh_state = {}  # renewal-queued device bbox awaiting the next pull

    def compute_clip_plan(bbox=None):
        """New clip plan for every axis. ``bbox`` ((lo, hi) host rows):
        reuse a device-computed mask bbox (the renewal path queues
        grid_ops.mask_bbox_vox_device and pulls it with the i_print batch
        — a direct host-side bbox pull waits behind the whole dispatch
        backlog, ~19 s per renewal over the remote link)."""
        if not use_sweep or not hasattr(model, "sweep_clip_for_axis"):
            return {}
        plan = {}
        for ax in range(3):
            if forced is not None and ax != forced:
                # forced-axis (MPI) models sweep one axis only; planning the
                # others submits background compiles that assert inside
                # make_train_step (observed: 2 doomed ~50 s compile-queue
                # slots per pg event on the fern schedule)
                continue
            new = model.sweep_clip_for_axis(ax, bbox=bbox)
            old = clip_plan.get(ax)
            if old is not None and old[0] is not None \
                    and new[0] is not None and old[0] != new[0]:
                # Mask renewals only intersect the mask, so extents only
                # shrink within a stage. Recompiling the axis program cost
                # ~20 s per renewal on the remote service; keep the
                # compiled box shape (offsets refit) unless tightening buys
                # >= 30% sweep volume.
                if np.prod(new[0]) > 0.7 * np.prod(old[0]):
                    kept = model.sweep_clip_for_axis(ax, fixed_sizes=old[0],
                                                     bbox=bbox)
                    if kept[0] is not None:
                        plan[ax] = kept
                        continue
            plan[ax] = new
        return plan

    pending_clip = {}  # ax -> staged (sizes, offsets) awaiting programs

    def _clip_need_keys(ax, csz):
        """Step-program keys the draw path needs under clip sizes ``csz``:
        both fallback dispatch widths plus the current bucket window
        classes re-keyed (mirrors next_chunk's gating, incl. the
        forced-axis bp pin)."""
        from ..ops import sweep as sweep_ops
        csz_t = tuple(int(x) for x in csz) if csz is not None else None
        keys = [(ax, ns, csz_t) for ns in sorted({1, n_dispatch})]
        bk = buckets.get(ax)
        if bk and csz_t is not None:
            bp, bu, bv = csz_t
            perm = sweep_ops._PERMS[ax]
            bp_k = int(model.world_size[perm[0]]) \
                if forced is not None else bp
            for k in bk:
                if isinstance(k, tuple) and len(k) == 2 and k != (0, 0):
                    eu = k[0] if 0 < k[0] < bu else bu
                    ev = k[1] if 0 < k[1] < bv else bv
                    if (eu, ev) != (bu, bv):
                        keys.append((ax, 1, (bp_k, eu, ev)))
                elif isinstance(k, (int, np.integer)) and 0 < int(k) < bv:
                    keys.append((ax, 1, (bp, bu, int(k))))
        return keys

    def apply_clip_plan(plan):
        for ax, new in plan.items():
            old = clip_plan.get(ax)
            if old is None or old[0] == new[0]:
                clip_plan[ax] = new
                pending_clip.pop(ax, None)
                continue
            # Sizes change mid-stage. The old box stays exact (renewals
            # only shrink the mask within a stage), so STAGE the swap
            # behind background compiles of the new-size programs — an
            # immediate swap orphans every landed program for this axis
            # and draws fall back 10-20x slower until serialized
            # recompiles land (the r5 fern run lost whole pg stages to
            # exactly this).
            need = _clip_need_keys(ax, new[0])
            if all(k in train_steps for k in need):
                for key in [k for k in train_steps
                            if k[0] == ax and k not in need]:
                    train_steps.pop(key)
                clip_plan[ax] = new
                pending_clip.pop(ax, None)
                continue
            pending_clip[ax] = new
            epoch = compile_state["epoch"]
            avals = (_tree_avals(model.params), _tree_avals(opt_state),
                     _Aval(model.mask) if hasattr(model.mask, "shape")
                     else model.mask)
            sub = compile_state.setdefault("submitted", set())
            for key in need:
                if key not in train_steps and (epoch, key) not in sub:
                    sub.add((epoch, key))
                    fut = compile_state["bg"].submit(
                        _build_and_warm, key, tv_state, epoch, avals)
                    fut.add_done_callback(_bg_done(key, time.time()))
                    compile_state["futs"].append(fut)

    def refresh_clip():
        plan = compute_clip_plan()
        # fold staged swaps from earlier renewals back in (their programs
        # may have landed since; compute_clip_plan's hysteresis works off
        # the APPLIED plan, so staged sizes re-propose identically)
        for ax, new in list(pending_clip.items()):
            plan.setdefault(ax, new)
        apply_clip_plan(plan)

    if bbox0_dev is not None:
        from . import fetchguard
        bb0 = np.asarray(fetchguard.guarded_get(bbox0_dev, "initial bbox"))
        apply_clip_plan(compute_clip_plan(
            bbox=(bb0[0].astype(np.float64), bb0[1].astype(np.float64))))
    else:
        refresh_clip()
    _phase("initial refresh_clip")
    # (build_buckets runs after precompile_steps below — fallback programs
    # must reach the serialized compile queue before the sort thread's
    # window submissions, or non-majority axes starve)

    # Step batching: up to K optimizer steps per dispatch via lax.scan (see
    # make_train_step). On a remote-attached chip the per-dispatch latency
    # (~27 ms over the tunnel) dominates the step compute, so single-step
    # dispatch caps throughput at the round-trip rate. Chunks never cross
    # an event boundary (mask renewal, pg_scale, tv-state change) and end
    # exactly on i_print/i_weights steps, so console/checkpoint cadence is
    # unchanged; the one behavioral difference is that a chunk's steps
    # share the sweep axis — chosen once per chunk, with every batch in
    # the chunk drawn from that axis group (see next_chunk).
    # Default: batch dispatches only while the step is dispatch-bound
    # (small grids; the lego-scale coarse loop at 106^3 ran 2.3x faster at
    # K=8 — 94.5 -> 40.3 s per 1500 iters, /tmp/coarse_k{1,8} probes). At
    # 160^3 the step is device-bound and scanning measurably HURTS (31 ->
    # 40 ms/step: the scan body can't alias the region-sliced updates as
    # well); cfg_train.steps_per_dispatch overrides either way. The 1.1M
    # threshold deliberately covers the reference's default 100^3-class
    # coarse stage.
    def dispatch_width():
        # Re-evaluated at every pg_scale event: progressive scaling grows
        # the grid across the threshold mid-stage (67^3 -> 170^3 for the
        # lego schedule), and a stale K=8 left the device-bound late stage
        # scanning (slower) with windows never engaging (full run C).
        small_grid = int(np.prod(model.world_size)) <= 1_100_000
        return max(int(cfg_train.get("steps_per_dispatch",
                                     8 if small_grid else 1)), 1)

    n_dispatch = dispatch_width()
    pg_set = set(cfg_train.pg_scale)

    def tv_state_of(j):
        apply_tv = (j < cfg_train.tv_before and j > cfg_train.tv_after
                    and j % cfg_train.tv_every == 0
                    and (cfg_train.weight_tv_density > 0
                         or cfg_train.weight_tv_k0 > 0))
        return (apply_tv, j < cfg_train.tv_dense_before)

    def chunk_len(i):
        length = 1
        while length < n_dispatch:
            j = i + length
            if (j > cfg_train.N_iters or j in pg_set
                    or (j + 500) % 1000 == 0
                    or tv_state_of(j) != tv_state_of(i)
                    or (j - 1) % args.i_print == 0
                    or (j - 1) % args.i_weights == 0):
                break
            length += 1
        # Quantize to {1, n_dispatch}: every distinct scan length is a
        # separately compiled program (the lax.scan trip count is static),
        # and the first full-length run showed the (axis, n_sub, clip-class)
        # cross-product exploding into 100+ XLA programs — more wall-clock
        # in compiles than in training. Boundary-adjacent steps dispatch
        # singly instead (<= n_dispatch-1 extra dispatches per boundary,
        # ~30 ms each — noise next to a single ~2-6 s compile).
        return length if length == n_dispatch else 1

    # Compile-ahead machinery. Two tiers (measured, probe4/5: the remote
    # XLA service serializes compile requests, so 12 windowed programs cost
    # 68-149 s even submitted concurrently — stalling the stage/pg start
    # that long is worse than briefly training without windows):
    #   * FALLBACK programs (per-axis clip/full sweeps, both dispatch
    #     widths) compile synchronously-concurrently — the loop needs one
    #     to run its first step.
    #   * WINDOW programs compile in a background thread while the loop
    #     trains on fallbacks; each inserts into train_steps as it lands,
    #     and next_chunk only draws window classes whose program is ready.
    # Throwaway warm-up calls run each program once on copies, so jit's
    # internal cache (not the AOT path) holds the executable the loop hits.
    import concurrent.futures as cf
    import threading as _threading
    compile_state = {"epoch": 0, "futs": [],
                     "warm_lock": _threading.Lock(),
                     "bg": cf.ThreadPoolExecutor(
                         max_workers=2, thread_name_prefix="step-compile")}

    def _bump_compile_epoch():
        # pg_scale / tv flips change param shapes or program semantics:
        # queued warms for the old epoch are dead weight in the SERIALIZED
        # remote compile queue (one backlog measured 240 s before the new
        # epoch's fallbacks landed). Cancel what hasn't started; running/
        # uncancellable ones early-exit on the stale-epoch check instead
        # of crashing on inconsistent shapes.
        compile_state["epoch"] += 1
        for f in compile_state["futs"]:
            f.cancel()
        compile_state["futs"].clear()

    class _Aval:  # unregistered class -> a pytree LEAF carrying shape/dtype
        __slots__ = ("shape", "dtype")

        def __init__(self, x):
            self.shape, self.dtype = tuple(x.shape), x.dtype

    def _tree_avals(tree):
        return jax.tree_util.tree_map(
            lambda x: _Aval(x) if hasattr(x, "shape") else x, tree)

    def _build_and_warm(key, tv_pair, epoch, avals):
        # AOT: lower + compile against ShapeDtypeStructs and store the
        # COMPILED executable — zero device allocations. The previous
        # zeros-warm execution transiently held ~2x(params+opt)+full grads
        # of HBM per warm; at the fern-scale final grid that exhausted the
        # chip grant even with warms serialized (RESOURCE_EXHAUSTED in the
        # MAIN loop, r5 fern runs 3-6). The engine loop calls
        # train_steps[key] positionally, which a jax Compiled accepts
        # exactly like the jitted fn (donation preserved).
        if compile_state["epoch"] != epoch:
            return False  # stale before it even started — skip the build
        ax, ns, csizes = key
        fn = make_train_step(
            model, optimizer, cfg_train, render_kwargs, tv_pair[0],
            tv_pair[1], axis=ax, clip_sizes=csizes, mesh=mesh,
            n_steps=ns, donate=True)
        n_rand = int(cfg_train.N_rand)
        p_avals, o_avals, m_aval = avals
        sds = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            if isinstance(a, _Aval) else a, t)
        p = sds(p_avals)
        o = sds(o_avals)
        # mask from the SAME snapshot as the params: the live model.mask
        # may already be upscaled by a pg event that queued behind this
        # warm, and mismatched grid/mask shapes crash the trace (observed:
        # zeros-params (105,102,95) vs live mask (167,162,151))
        m = (jax.ShapeDtypeStruct(m_aval.shape, m_aval.dtype)
             if isinstance(m_aval, _Aval) else m_aval)
        pool_sds = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(tuple(x.shape), x.dtype), pool)
        sel = jax.ShapeDtypeStruct(
            (ns, n_rand) if ns > 1 else (n_rand,), jnp.int32)
        if csizes is not None and csizes[0] == "blk":
            co = jax.ShapeDtypeStruct((int(csizes[1]), 2), jnp.int32)
        else:
            co = jax.ShapeDtypeStruct((ns, 3) if ns > 1 else (3,),
                                      jnp.int32)
        # warm_lock kept: the remote XLA service serializes compiles, and
        # one-at-a-time keeps the stale-epoch early-exit prompt.
        with compile_state["warm_lock"]:
            if compile_state["epoch"] != epoch:
                return False
            compiled = fn.lower(p, m, o, pool_sds, sel, co).compile()
        if compile_state["epoch"] == epoch:  # stale after pg_scale/tv flip
            train_steps[key] = compiled
            return True
        return False

    def _bg_done(key, t0):
        def cb(fut):
            if fut.cancelled():  # stage end / pg_scale cancels the queue
                return
            err = fut.exception()
            if err is not None:
                print(f"scene_rep_reconstruction ({stage}): [phase] "
                      f"background compile FAILED for {key}: {err!r}")
            elif fut.result():
                print(f"scene_rep_reconstruction ({stage}): [phase] "
                      f"background program {key} landed after "
                      f"{time.time()-t0:.1f} s")
        return cb

    def precompile_steps(at_step):
        if getattr(cfg_train, "precompile", True) is False:
            return
        apply_tv_n, tv_dense_n = tv_state_of(at_step)
        epoch = compile_state["epoch"]
        fallback, windowed = [], []
        if use_sweep and sweep_axes:
            from ..ops import sweep as sweep_ops
            for ax in sweep_axes:
                csizes = clip_plan.get(ax, (None, None))[0]
                for ns in sorted({1, n_dispatch}):
                    fallback.append((ax, ns, csizes))
                if (bucket_ok and n_dispatch == 1 and not apply_tv_n
                        and not fused_tiles
                        and not (bool(cfg_train.get("bucket_2d", True))
                                 and bool(cfg_train.get("bucket_blocked",
                                                        False)))):
                    # (static 1D v-window classes are superseded by the
                    # hook-submitted blocked classes when those are on)
                    perm = sweep_ops._PERMS[ax]
                    if csizes is not None:
                        gp, gu, gv = (int(x) for x in csizes)
                    else:
                        gp = int(model.world_size[perm[0]])
                        gu = int(model.world_size[perm[1]])
                        gv = int(model.world_size[perm[2]])
                    for w in (32, 48, 64, 96):
                        if w < gv:  # window-as-clip composes with the bbox
                            windowed.append((ax, 1, (gp, gu, w)))
        else:
            fallback.append((None, 1, None))
            if n_dispatch > 1:
                fallback.append((None, n_dispatch, None))
        tv_pair = (apply_tv_n, tv_dense_n)
        avals = (_tree_avals(model.params), _tree_avals(opt_state),
                 _Aval(model.mask) if hasattr(model.mask, "shape")
                 else model.mask)
        fallback = [k for k in fallback if k not in train_steps]
        # The remote XLA service serializes compile requests, so blocking on
        # every axis's program costs 17-33 s per stage/pg start. Compile
        # only the MAJORITY axis synchronously (the loop needs one program
        # to run its first chunk); the other axes land in background while
        # training proceeds on ready axes (next_chunk._pick_axis).
        sub = compile_state.setdefault("submitted", set())
        if use_sweep and sweep_axes and len(fallback) > 2:
            ax_major = max(sweep_axes,
                           key=lambda ax: len(group_idx[ax]))
            sync_keys = [k for k in fallback if k[0] == ax_major]
        else:
            sync_keys = fallback
        t0 = time.time()
        if sync_keys:
            with cf.ThreadPoolExecutor(max_workers=4) as ex:
                list(ex.map(
                    lambda k: _build_and_warm(k, tv_pair, epoch, avals),
                    sync_keys))
            print(f"scene_rep_reconstruction ({stage}): [phase] "
                  f"precompiled {len(sync_keys)} fallback step programs in "
                  f"{time.time()-t0:.1f} s "
                  f"({len(fallback)-len(sync_keys)} backgrounded)")
        # Submit the non-majority axes AFTER the sync compiles: the remote
        # XLA service serializes requests, so submitting first would queue
        # the programs the loop is waiting on behind the deferred ones.
        for k in fallback:
            if k not in sync_keys and (epoch, k) not in sub:
                sub.add((epoch, k))
                fut = compile_state["bg"].submit(
                    _build_and_warm, k, tv_pair, epoch, avals)
                fut.add_done_callback(_bg_done(k, time.time()))
                compile_state["futs"].append(fut)
        for k in windowed:
            if k not in train_steps and (epoch, k) not in sub:
                sub.add((epoch, k))
                fut = compile_state["bg"].submit(_build_and_warm, k,
                                                 tv_pair, epoch, avals)
                fut.add_done_callback(_bg_done(k, time.time()))
                compile_state["futs"].append(fut)
        # 2D bucket classes (forced-axis models) are only known once the
        # segment sort lands; re-submit any already-landed ones here so
        # renewal/pg re-precompiles (and hook-set races) cover them too.
        hook = bucket_compile_hook.get("submit")
        if hook is not None:
            for _ax in list(buckets):
                hook(_ax)

    def _submit_window_keys(ax, keys2d):
        """Background-compile plain 2D window-class programs for ``ax``.

        Called with the classes a finished segment sort produced, AND
        speculatively at stage starts with the PREVIOUS stage's classes:
        the class mix is geometry-driven and stable across pg stages, so
        compiling the likely programs while the new 13M-ray Morton sort
        runs (~30 s host work) removes the window where every draw pays
        the full-sweep fallback (~20x a windowed step on MPI grids)."""
        from ..ops import sweep as sweep_ops
        perm = sweep_ops._PERMS[ax]
        csz = clip_plan.get(ax, (None, None))[0]
        if csz is not None:
            bp, bu, bv = (int(x) for x in csz)
        else:
            bp = int(model.world_size[perm[0]])
            bu = int(model.world_size[perm[1]])
            bv = int(model.world_size[perm[2]])
        epoch = compile_state["epoch"]
        avals = (_tree_avals(model.params), _tree_avals(opt_state),
                 _Aval(model.mask) if hasattr(model.mask, "shape")
                 else model.mask)
        sub = compile_state.setdefault("submitted", set())
        for k in keys2d:
            eu = k[0] if 0 < k[0] < bu else bu
            ev = k[1] if 0 < k[1] < bv else bv
            if (eu, ev) == (bu, bv):
                continue  # wouldn't shrink anything
            bp_k = bp
            if forced is not None:
                # renewal-proof key: see the pin in next_chunk's
                # forced-axis windowed draw (bp = full gp for MPI).
                bp_k = int(model.world_size[perm[0]])
            key = (ax, 1, (bp_k, eu, ev))
            if key not in train_steps and (epoch, key) not in sub:
                sub.add((epoch, key))
                fut = compile_state["bg"].submit(
                    _build_and_warm, key, tv_state, epoch, avals)
                fut.add_done_callback(_bg_done(key, time.time()))
                compile_state["futs"].append(fut)

    def _submit_bucket_classes(ax):
        """Background-compile the window classes a finished segment sort
        actually produced (called from the sort thread — 2D classes aren't
        known until the build lands)."""
        bk = buckets.get(ax)
        if not bk:
            return
        from ..ops import sweep as sweep_ops
        perm = sweep_ops._PERMS[ax]
        csz = clip_plan.get(ax, (None, None))[0]
        if csz is not None:
            bp, bu, bv = (int(x) for x in csz)
        else:
            bp = int(model.world_size[perm[0]])
            bu = int(model.world_size[perm[1]])
            bv = int(model.world_size[perm[2]])
        epoch = compile_state["epoch"]
        avals = (_tree_avals(model.params), _tree_avals(opt_state),
                 _Aval(model.mask) if hasattr(model.mask, "shape")
                 else model.mask)
        sub = compile_state.setdefault("submitted", set())
        gu_f = int(model.world_size[perm[1]])
        gv_f = int(model.world_size[perm[2]])
        for k in bk:
            if isinstance(k, tuple) and k and k[0] == "fblk":
                wu_k, wv_k = int(k[1]), int(k[2])
                if wu_k == 0 and wv_k == 0:
                    continue  # remainder tiles use the plain program
                key = (ax, 1, ("fblk", wu_k, wv_k, bp, bu, bv))
                if key not in train_steps and (epoch, key) not in sub:
                    from ..ops import pallas_train_fused as ptf
                    fdim = (model.k0_dim if model.rgbnet_direct
                            else model.k0_dim - 3)
                    if not ptf.fused_available(
                            int(cfg_train.N_rand) // _ndev, bu, bv, fdim,
                            int(model.rgbnet_width),
                            float(model.fast_color_thres),
                            int(model.rgbnet_depth), wu=wu_k, wv=wv_k):
                        continue
                    sub.add((epoch, key))
                    fut = compile_state["bg"].submit(
                        _build_and_warm, key, tv_state, epoch, avals)
                    fut.add_done_callback(_bg_done(key, time.time()))
                    compile_state["futs"].append(fut)
                continue
            if isinstance(k, tuple) and len(k) == 3 and k[0] == "blk":
                if k[1] == 0 and k[2] == 0:
                    continue  # fallback class uses the plain program
                # Inside an fblk bucket (leftover re-bucket) the draw path
                # maps window extents against the CLIP box (eff2 w/ bu,bv);
                # the standalone blocked path maps against the full grid.
                in_fblk = any(isinstance(j, tuple) and j
                              and j[0] == "fblk" for j in bk)
                cu, cv = (bu, bv) if in_fblk else (gu_f, gv_f)
                eu = k[1] if 0 < k[1] < cu else cu
                ev = k[2] if 0 < k[2] < cv else cv
                nb_b = bk[k][1].shape[1]
                key = (ax, 1, ("blk", nb_b, eu, ev))
                if key not in train_steps and (epoch, key) not in sub:
                    sub.add((epoch, key))
                    fut = compile_state["bg"].submit(
                        _build_and_warm, key, tv_state, epoch, avals)
                    fut.add_done_callback(_bg_done(key, time.time()))
                    compile_state["futs"].append(fut)
                continue
            if isinstance(k, tuple) and k != (0, 0):
                _submit_window_keys(ax, [k])

    bucket_compile_hook["submit"] = _submit_bucket_classes
    bucket_compile_hook["submit_keys"] = _submit_window_keys

    # Seed tv_state with the first iteration's value BEFORE precompiling:
    # the loop clears train_steps on any tv-state change, and a None seed
    # made the first iteration wipe every just-precompiled program (probe5:
    # 12 x ~2.5 s re-jits right after a 68 s precompile).
    tv_state = tv_state_of(start + 1)
    precompile_steps(start + 1)
    _phase("precompile_steps")
    build_buckets()  # background segment sort (box-clipped supports)

    global_step = start
    ran_any = False
    while global_step < cfg_train.N_iters:
        global_step += 1
        ran_any = True
        # Occupancy cache renewal (run.py:330-332).
        if (global_step + 500) % 1000 == 0:
            _t_r = time.time()
            model.update_occupancy_cache()  # device-side, queues async
            # Queue the mask bbox ON DEVICE; the 6 scalars ride the next
            # i_print batched pull and the clip plan updates then. Exact
            # with lag: renewals only INTERSECT the mask, so a stale box
            # still covers the (shrunken) bbox.
            from ..ops import grid as grid_ops
            if use_sweep and getattr(model.mask, "ndim", 0) == 3:
                refresh_state["bbox_dev"] = grid_ops.mask_bbox_vox_device(
                    model.mask)
            _t_r = time.time() - _t_r
            win_state["dirty"] = True  # renewal sync in this window
            if _t_r > 1.0:
                print(f"scene_rep_reconstruction ({stage}): [phase] "
                      f"renewal at {global_step}: {_t_r:.2f} s")

        # Progressive scaling (run.py:335-345).
        if global_step in pg_set:
            n_rest_scales = len(cfg_train.pg_scale) \
                - list(cfg_train.pg_scale).index(global_step) - 1
            cur_voxels = int(cfg_model.num_voxels / (2 ** n_rest_scales))
            _t_pg = time.time()
            if hasattr(model, "mpi_depth"):
                model.scale_volume_grid(cur_voxels, model.mpi_depth)
            else:
                model.scale_volume_grid(cur_voxels)
            optimizer = create_optimizer_or_freeze_model(model, cfg_train)
            opt_state = optimizer.init(model.params)
            model.params["density"] = model.params["density"] - 1
            _t_pg1 = time.time()
            _bump_compile_epoch()  # in-flight compiles now stale
            train_steps = {}  # shapes changed -> re-jit
            realized_stats.clear()  # per-grid-stage realized times
            lsq_windows.clear()
            win_state.update(t=None, counts={}, dirty=False)
            draw_base.clear()
            draw_base.update(draw_counts)
            clip_plan.clear()
            pending_clip.clear()  # staged swaps are stale at new shapes
            refresh_clip()
            _t_pg2 = time.time()
            n_dispatch = dispatch_width()  # grid may have crossed the
            # dispatch-bound/device-bound threshold
            tv_state = tv_state_of(global_step)  # keep precompiles (above)
            # precompile BEFORE spawning the segment sort: the sort thread
            # hook-submits up to 18 window programs as it lands, and those
            # queued ahead of the other axes' fallbacks once starved axes
            # 1/2 for ~135 s of single-axis training (remote XLA serializes
            # compiles; fallbacks must reach the queue first)
            precompile_steps(global_step)
            _t_pg3 = time.time()
            build_buckets()  # window stats are in voxel units
            print(f"scene_rep_reconstruction ({stage}): [phase] pg_scale "
                  f"at {global_step}: rescale+opt {_t_pg1-_t_pg:.1f} s / "
                  f"refresh_clip {_t_pg2-_t_pg1:.1f} s / precompile "
                  f"{_t_pg3-_t_pg2:.1f} s")

        apply_tv, tv_dense = tv_state_of(global_step)
        if tv_state != (apply_tv, tv_dense):
            _bump_compile_epoch()
            train_steps = {}
            tv_state = (apply_tv, tv_dense)
            # re-land fallbacks + the current window classes under the new
            # tv state (programs bake apply_tv/tv_dense statically); without
            # this, draws fall back to full sweeps until the next pg event
            precompile_steps(global_step)
            hook = bucket_compile_hook.get("submit")
            if hook is not None:
                for _ax in list(buckets):
                    hook(_ax)

        n_sub = chunk_len(global_step)
        # Windows only in single-step dispatch mode (big grids): at small
        # grids the full sweep is cheap and dispatch-bound (that's why
        # n_dispatch > 1 there), while windows would multiply the compiled-
        # program count by the number of width classes. TV steps window
        # too — make_train_step runs them with region mode OFF (full-size
        # grads via the slice VJP) so dense/sparse TV + full-grid Adam see
        # reference-exact gradients while the SWEEP fwd/bwd stays windowed
        # (the fern-scale NDC schedule applies TV every step, llff_default
        # tv_before=1e9 — the unwindowed full sweep there is 139 ms vs
        # 5-9 ms windowed). Fused-tile draws keep requiring region mode.
        chunk_sels, axis, wsizes, woffs = next_chunk(
            n_sub, no_window=(n_sub > 1 or n_dispatch > 1
                              or (apply_tv and fused_tiles)))
        sels = np.stack([np.asarray(s) for s in chunk_sels]) if n_sub > 1 \
            else chunk_sels[0]
        if wsizes is not None:
            # Segment-window clip: static (full, full, W) box, per-batch
            # traced v offset (see next_chunk).
            clip_sizes = wsizes
            clip_off = woffs if n_sub > 1 else woffs[0]
        else:
            clip_sizes, clip_off = clip_plan.get(
                axis, (None, np.zeros(3, np.int32)))
            if n_sub > 1:
                clip_off = np.broadcast_to(np.asarray(clip_off, np.int32),
                                           (n_sub, 3))
        key = (axis, n_sub, clip_sizes)
        if key not in train_steps:
            train_steps[key] = make_train_step(
                model, optimizer, cfg_train, render_kwargs, apply_tv,
                tv_dense, axis=axis, clip_sizes=clip_sizes, mesh=mesh,
                n_steps=n_sub, donate=True)
        sels = jnp.asarray(sels, jnp.int32)
        _t_k = None
        _dk = draw_counts.get(key, 0) - draw_base.get(key, 0)
        if (realized_every > 0 and loss is not None and _dk > 0
                and _dk % realized_every == 0):
            # _dk > 0 skips a key's first draw (it compiles inline; a
            # 10-20 s compile sample would swamp the mean)
            jax.block_until_ready(loss)  # drain the in-flight queue
            _t_k = time.time()
            if win_state["t"] is not None and win_state["counts"] \
                    and not win_state["dirty"]:
                lsq_windows.append((_t_k - win_state["t"],
                                    dict(win_state["counts"])))
        _t_d = time.time()
        model.params, opt_state, loss, psnr = train_steps[key](
            model.params, model.mask, opt_state, pool, sels,
            jnp.asarray(clip_off))
        _t_d = time.time() - _t_d
        if _t_k is not None:
            jax.block_until_ready(loss)
            rs = realized_stats.setdefault(key, [0.0, 0])
            rs[0] += time.time() - _t_k
            rs[1] += n_sub
            win_state["t"] = time.time()
            win_state["counts"] = {}
            win_state["dirty"] = False
        else:
            wc = win_state["counts"]
            wc[key] = wc.get(key, 0) + n_sub
            if _t_d > 0.5:
                win_state["dirty"] = True  # inline compile in this window
        # Per-axis dispatch-time accounting (printed each i_print window).
        # Async dispatch means _t_d is enqueue time, but at steady state the
        # in-flight queue backpressures, so the window sums track real
        # per-axis throughput — surfacing axis-imbalance regressions (the
        # three clip shapes differ per axis) without extra syncs.
        st = axis_stats.setdefault(
            (axis, wsizes is not None), [0.0, 0])
        st[0] += _t_d
        st[1] += n_sub
        draw_counts[key] = draw_counts.get(key, 0) + n_sub
        if _t_d > 1.0:
            # A dispatch call only blocks this long when it compiled (or a
            # renewal sync drained the queue) — keep compiles visible, they
            # dominated the first full-length run (PERF_LOG round 3).
            print(f"scene_rep_reconstruction ({stage}): [phase] slow "
                  f"dispatch at {global_step}: {_t_d:.1f} s key={key}")
        psnr_lst.append(psnr)  # scalar (n_sub==1) or [n_sub]
        global_step += n_sub - 1

        if global_step % args.i_print == 0:
            eps_time = time.time() - time0
            eps_str = (f"{eps_time//3600:02.0f}:{eps_time//60%60:02.0f}:"
                       f"{eps_time%60:02.0f}")
            # ONE batched pull for the i_print window's psnr scalars + the
            # loss (+ any renewal-queued mask bbox): per-element np.asarray
            # paid a tunnel round trip each (500 x RTT — run D lost ~16 min
            # to one i_print during a bandwidth trough).
            bbox_dev = refresh_state.pop("bbox_dev", None)
            from . import fetchguard
            pulled = fetchguard.guarded_get(
                [*psnr_lst, loss] + ([bbox_dev] if bbox_dev is not None
                                     else []),
                f"i_print@{global_step}")
            win_state["dirty"] = True  # queue drained by the pull
            if bbox_dev is not None:
                bb = pulled[-1]
                pulled = pulled[:-1]
                n_keys = len(train_steps)
                apply_clip_plan(compute_clip_plan(
                    bbox=(bb[0].astype(np.float64),
                          bb[1].astype(np.float64))))
                if len(train_steps) < n_keys:
                    # a clip shape bucket moved: rebuild dropped programs
                    precompile_steps(global_step)
            psnr_avg = float(np.mean(np.concatenate(
                [np.atleast_1d(p) for p in pulled[:-1]])))
            last_loss = float(np.atleast_1d(pulled[-1])[-1])
            # 'w' marks segment-windowed draws — fallback-only lines after
            # a stage/pg start mean the window programs haven't landed
            ax_str = " / ".join(
                f"ax{a if a is not None else '-'}{'w' if w else ''} "
                f"{1e3 * t / max(n, 1):.1f}ms*{n}"
                for (a, w), (t, n) in sorted(
                    axis_stats.items(), key=lambda kv: str(kv[0])))
            print(f"scene_rep_reconstruction ({stage}): iter "
                  f"{global_step:6d} / Loss: {last_loss:.9f} / "
                  f"PSNR: {psnr_avg:5.2f} / Eps: {eps_str}"
                  + (f" / {ax_str}" if ax_str else ""))
            if realized_stats:
                dd = {k: draw_counts.get(k, 0) - draw_base.get(k, 0)
                      for k in realized_stats}
                tot_d = max(sum(draw_counts.values())
                            - sum(draw_base.values()), 1)
                rows = sorted(realized_stats.items(),
                              key=lambda kv: -dd.get(kv[0], 0))[:8]
                print(f"scene_rep_reconstruction ({stage}): [phase] "
                      "realized ms/iter (sampled): "
                      + " ".join(
                          f"{k[2] if k[2] is not None else 'full'}"
                          f"@ax{k[0]}:"
                          f"{1e3 * t / max(n, 1):.1f}x"
                          f"{dd.get(k, 0) / tot_d:.2f}"
                          for k, (t, n) in rows))
            psnr_lst = []
            axis_stats = {}

        if global_step % args.i_weights == 0:
            path = os.path.join(cfg.basedir, cfg.expname,
                                f"{stage}_{global_step:06d}.tar")
            ckpt_lib.save_model_checkpoint(path, model, global_step,
                                           opt_state, async_=True)

    if draw_counts:
        tot_d = max(sum(draw_counts.values()), 1)
        top = sorted(draw_counts.items(), key=lambda kv: -kv[1])[:12]
        print(f"scene_rep_reconstruction ({stage}): [phase] draw classes: "
              + " ".join(f"{k}:{c/tot_d:.2f}" for k, c in top))
    if realized_stats:
        # Draw-share-weighted blend of the sampled realized per-key times
        # over the FINAL grid stage (stats reset at pg events): the true
        # steady-state ms/iter (excludes compiles/renewals, which the Eps
        # wall clock includes).
        num = den = 0.0
        for k, (t, n) in realized_stats.items():
            dk = draw_counts.get(k, 0) - draw_base.get(k, 0)
            if n and dk:
                num += dk * (t / n)
                den += dk
        if den:
            print(f"scene_rep_reconstruction ({stage}): [phase] realized "
                  f"blend {1e3 * num / den:.1f} ms/iter over "
                  f"{int(den)} final-stage draws "
                  f"({len(realized_stats)} keys)")
    if len(lsq_windows) >= 8:
        # Nonnegative least squares over the clean async windows: true
        # per-key device ms at steady state, free of the per-sample
        # tunnel RTT that inflates the synced samples above.
        kset = {}
        for _, cts in lsq_windows:
            for k, c in cts.items():
                kset[k] = kset.get(k, 0) + c
        keys_l = [k for k, c in kset.items() if c >= 64]
        if keys_l:
            A = np.zeros((len(lsq_windows), len(keys_l)))
            b_v = np.zeros(len(lsq_windows))
            for i, (dur, cts) in enumerate(lsq_windows):
                b_v[i] = dur
                for j, k in enumerate(keys_l):
                    A[i, j] = cts.get(k, 0)
            try:
                from scipy.optimize import nnls
                c_ms, _ = nnls(A, b_v)
            except Exception:
                c_ms = np.clip(np.linalg.lstsq(A, b_v, rcond=None)[0],
                               0, None)
            tot_w = sum(kset[k] for k in keys_l)
            blend = sum(c_ms[j] * kset[k]
                        for j, k in enumerate(keys_l)) / max(tot_w, 1)
            print(f"scene_rep_reconstruction ({stage}): [phase] lsq "
                  f"per-key ms/iter over {len(lsq_windows)} async "
                  f"windows (blend {1e3 * blend:.1f}): "
                  + " ".join(
                      f"{k[2] if k[2] is not None else 'full'}@ax{k[0]}:"
                      f"{1e3 * c_ms[j]:.1f}x{kset[k] / max(tot_w, 1):.2f}"
                      for j, k in sorted(
                          enumerate(keys_l),
                          key=lambda jk: -kset[jk[1]])[:10]))
    _phase("train loop")
    compile_state["epoch"] += 1
    compile_state["bg"].shutdown(wait=False, cancel_futures=True)
    if ran_any:
        # Async: the ~600 MB device->host pull (minutes over a remote
        # tunnel) overlaps the next stage's setup/compiles or eval; readers
        # of the path get the device payload from the in-memory cache.
        ckpt_lib.save_model_checkpoint(last_ckpt_path, model, global_step,
                                       opt_state, async_=True)
        _phase("final checkpoint dispatch (async)")
    return model


def _model_class_for(cfg):
    if cfg.data.ndc:
        from ..models.dmpigo import DirectMPIGO
        return DirectMPIGO
    return DirectVoxGO


def train(args, cfg, data_dict, wait_saves=True):
    """Full coarse->fine pipeline (run.py:440-492).

    ``wait_saves``: join async checkpoint writers before returning — the
    library contract is "checkpoints exist on disk when train() returns".
    run.py passes False and waits at its own exit instead, so the final
    fine-checkpoint pull overlaps evaluation rendering.
    """
    print("train: start")
    eps_time = time.time()
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    with open(os.path.join(cfg.basedir, cfg.expname, "args.txt"), "w") as f:
        for arg in sorted(vars(args)):
            f.write(f"{arg} = {getattr(args, arg)}\n")
    cfg.dump(os.path.join(cfg.basedir, cfg.expname, "config.py"))

    # Coarse geometry searching.
    eps_coarse = time.time()
    xyz_min_coarse, xyz_max_coarse = compute_bbox_by_cam_frustrm(
        cfg=cfg, **data_dict)
    if cfg.coarse_train.N_iters > 0:
        scene_rep_reconstruction(
            args=args, cfg=cfg, cfg_model=cfg.coarse_model_and_render,
            cfg_train=cfg.coarse_train, xyz_min=xyz_min_coarse,
            xyz_max=xyz_max_coarse, data_dict=data_dict, stage="coarse")
        eps_coarse = time.time() - eps_coarse
        print(f"train: coarse geometry searching in {eps_coarse:.1f} s")
        coarse_ckpt_path = os.path.join(cfg.basedir, cfg.expname,
                                        "coarse_last.tar")
    else:
        print("train: skip coarse geometry searching")
        coarse_ckpt_path = None

    # Fine detail reconstruction.
    eps_fine = time.time()
    if cfg.data.ndc:
        xyz_min_fine, xyz_max_fine = xyz_min_coarse, xyz_max_coarse
    elif cfg.fine_model_and_render.get("use_coarse_geo", True) \
            and coarse_ckpt_path:
        xyz_min_fine, xyz_max_fine = compute_bbox_by_coarse_geo(
            model_class=DirectVoxGO, model_path=coarse_ckpt_path,
            thres=cfg.fine_model_and_render.bbox_thres)
    else:
        xyz_min_fine, xyz_max_fine = xyz_min_coarse, xyz_max_coarse
    model = scene_rep_reconstruction(
        args=args, cfg=cfg, cfg_model=cfg.fine_model_and_render,
        cfg_train=cfg.fine_train, xyz_min=xyz_min_fine,
        xyz_max=xyz_max_fine, data_dict=data_dict, stage="fine",
        coarse_ckpt_path=coarse_ckpt_path)
    eps_fine = time.time() - eps_fine
    print(f"train: fine detail reconstruction in {eps_fine:.1f} s")
    if wait_saves:
        ckpt_lib.wait_for_pending_saves()
    print(f"train: finish (eps time {time.time()-eps_time:.1f} s)")
    return model
