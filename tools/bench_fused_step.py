#!/usr/bin/env python
"""Fused train kernels vs the XLA chain at the REAL e2e shape.

Loads the sparse-fixture fine checkpoint, builds a direction-uniform
8192-ray batch per (axis, window-class) box, and times value_and_grad of
the full training loss through (a) forward_sweep + the XLA chain and
(b) forward_sweep_fused (ops/pallas_train_fused.py). This is the decision
bench for wiring the fused path into make_train_step.

Usage: python tools/bench_fused_step.py [boxes: wide|full|narrow ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


W_MAIN, W_ENT, W_RGBPER = 1.0, 1e-3, 1e-2


def main():
    from directvoxgo_tpu.config import Config
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu import rays as ray_lib

    model = ckpt_lib.load_model(
        DirectVoxGO, "logs/synthetic/fixture_lego_sparse/fine_last.tar")
    cfg = Config.fromfile("configs/synthetic/fixture_lego_sparse.py")
    data = load_data(cfg.data)
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    rk0 = dict(near=float(data["near"]), far=float(data["far"]),
               stepsize=cfg.fine_model_and_render.stepsize)
    rgb, ro, rd, vd, _ = \
        ray_lib.get_training_rays_in_maskcache_sampling(
            rgb_tr_ori=images, train_poses=data["poses"][i_train],
            HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y, model=model, render_kwargs=rk0)
    ro, rd, vd, rgb = map(np.asarray, (ro, rd, vd, rgb))
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    axis = 0
    g = np.flatnonzero(groups == axis)
    # direction-uniform 8192-ray batch (one sign)
    sgn = rd[g, axis] >= 0
    g = g[sgn] if sgn.sum() >= 8192 else g[~sgn]
    rng = np.random.default_rng(0)
    n_rand = 8192
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    perm = sweep_ops._PERMS[axis]
    if clip_sizes is None:
        clip_sizes = tuple(int(model.world_size[a]) for a in perm)
        clip_off = np.zeros(3, np.int32)
    bp, bu, bv = (int(x) for x in clip_sizes)
    log(f"clip box ({bp},{bu},{bv}) off {tuple(np.asarray(clip_off))}, "
        f"{g.size} rays axis {axis}")

    which = sys.argv[1:] or ["wide", "full"]
    boxes = {}
    if "full" in which:
        boxes["full"] = (bp, bu, bv)
    if "wide" in which:
        boxes["wide_96x96"] = (bp, min(96, bu), min(96, bv))
    if "narrow" in which:
        boxes["narrow_32x32"] = (bp, 32, 32)

    rk = dict(near=rk0["near"], far=rk0["far"], bg=1.0,
              stepsize=rk0["stepsize"])
    inv = {ax: i for i, ax in enumerate(perm)}

    for name, sizes in boxes.items():
        sizes_xyz = tuple(int(sizes[inv[a]]) for a in range(3))
        offs = np.asarray(clip_off, np.int32)
        # keep window inside the full clip box
        offs_xyz = tuple(int(offs[inv[a]]) for a in range(3))
        sel = g[rng.integers(0, g.size, n_rand)]
        b_ro, b_rd, b_vd, b_gt = (jnp.asarray(ro[sel]),
                                  jnp.asarray(rd[sel]),
                                  jnp.asarray(vd[sel]),
                                  jnp.asarray(rgb[sel]))
        offs_d = jnp.asarray(offs_xyz, jnp.int32)
        offs_pm = jnp.asarray([offs[0], offs[1], offs[2]], jnp.int32)

        dens_box = jax.lax.dynamic_slice(
            model.params["density"], tuple(offs_d), sizes_xyz)
        k0_box = jax.lax.dynamic_slice(
            model.params["k0"], (*offs_d, jnp.int32(0)),
            (*sizes_xyz, model.k0_dim))
        mask_box = jax.lax.dynamic_slice(model.mask, tuple(offs_d),
                                         sizes_xyz)
        trainable = {"density": dens_box, "k0": k0_box,
                     "rgbnet": model.params["rgbnet"]}

        def loss_xla(tr, mask_box=mask_box, b_ro=b_ro, b_rd=b_rd,
                     b_vd=b_vd, b_gt=b_gt, sizes=sizes, offs_pm=offs_pm):
            ret = model.forward_sweep(
                {**model.params, **tr}, mask_box, b_ro, b_rd, b_vd, axis,
                clip_sizes=sizes, clip_offsets=offs_pm,
                grids_pre_clipped=True, **rk)
            mse = jnp.mean((ret["rgb_marched"] - b_gt) ** 2)
            pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
            ent = -jnp.mean(pout * jnp.log(pout)
                            + (1 - pout) * jnp.log(1 - pout))
            rgbper = jnp.sum((ret["raw_rgb_cl"] - b_gt.T[:, :, None]) ** 2,
                             axis=0)
            rl = jnp.sum(rgbper
                         * jax.lax.stop_gradient(ret["weights"])) / n_rand
            return W_MAIN * mse + W_ENT * ent + W_RGBPER * rl

        def loss_fused(tr, mask_box=mask_box, b_ro=b_ro, b_rd=b_rd,
                       b_vd=b_vd, b_gt=b_gt, offs_pm=offs_pm):
            ret = model.forward_sweep_fused(
                {**model.params, **tr}, mask_box, b_ro, b_rd, b_vd, axis,
                b_gt, clip_offsets=offs_pm, **rk)
            mse = jnp.mean((ret["rgb_marched"] - b_gt) ** 2)
            pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
            ent = -jnp.mean(pout * jnp.log(pout)
                            + (1 - pout) * jnp.log(1 - pout))
            rl = jnp.sum(ret["rgbper_sum"]) / n_rand
            return W_MAIN * mse + W_ENT * ent + W_RGBPER * rl

        for lname, fn in (("xla", loss_xla), ("fused", loss_fused)):
            vg = jax.jit(jax.value_and_grad(fn))
            t0 = time.time()
            try:
                loss, grads = vg(trainable)
                loss = float(loss)
            except Exception as e:  # noqa: BLE001
                log(f"{name} {lname}: FAILED {type(e).__name__}: "
                    f"{str(e)[:300]}")
                continue
            log(f"{name} {lname}: compile+first {time.time()-t0:.1f}s "
                f"loss {loss:.6f}")
            t0 = time.time()
            iters = 30
            for _ in range(iters):
                loss, grads = vg(trainable)
            jax.block_until_ready(grads)
            dt = (time.time() - t0) / iters * 1000
            log(f"{name} {lname}: {dt:.2f} ms/iter (fwd+bwd, no Adam)")


if __name__ == "__main__":
    main()
