#!/usr/bin/env python
"""Block-resolved fused train kernels vs the shipping XLA paths, on the
REAL maskcache-filtered pool regrouped by tile class.

The VERDICT r3 #1 decision bench: loads the sparse-fixture fine
checkpoint, rebuilds the engine's maskcache-filtered ray pool, cuts it
into 512-ray tiles grouped by fused-kernel cell class
(ops/sweep.build_ray_tiles_blocktile — max (u, v) support any
(station-block, tile) cell needs), then per class times value_and_grad
of the full training loss through:

  (a) fusedblk — fused kernels on the occupancy box with the class's
                 per-(station-block, tile) windows,
  (b) xla      — forward_sweep + XLA chain on the batch's composed
                 whole-traversal segment box (what the engine's 2D
                 window classes realize for the same rays today).

Prints the ray-share-weighted blend for both and the projected 20k-iter
fine stage.

Usage: python tools/bench_fused_blocktile.py [axis] [n_classes] [s_blk] [max_classes]
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
N_RAND = 8192
NT = 512


def main():
    from directvoxgo_tpu.config import Config
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu import rays as ray_lib

    axis = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_classes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    s_blk = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    max_classes = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    model = ckpt_lib.load_model(
        DirectVoxGO, "logs/synthetic/fixture_lego_sparse/fine_last.tar")
    cfg = Config.fromfile("configs/synthetic/fixture_lego_sparse.py")
    data = load_data(cfg.data)
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    stepsize = cfg.fine_model_and_render.stepsize
    rk0 = dict(near=float(data["near"]), far=float(data["far"]),
               stepsize=stepsize)
    rgb, ro, rd, vd, _ = \
        ray_lib.get_training_rays_in_maskcache_sampling(
            rgb_tr_ori=images, train_poses=data["poses"][i_train],
            HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y, model=model, render_kwargs=rk0)
    ro, rd, vd, rgb = map(np.asarray, (ro, rd, vd, rgb))
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    g = np.flatnonzero(groups == axis)

    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    perm = sweep_ops._PERMS[axis]
    if clip_sizes is None:
        clip_sizes = tuple(int(model.world_size[a]) for a in perm)
        clip_off = np.zeros(3, np.int32)
    offs = np.asarray(clip_off, np.int64)
    bp, bu, bv = (int(x) for x in clip_sizes)
    box6 = (float(offs[0]), float(offs[0]) + bp - 1.0,
            float(offs[1]), float(offs[1]) + bu - 1.0,
            float(offs[2]), float(offs[2]) + bv - 1.0)
    log(f"clip box ({bp},{bu},{bv}) off {tuple(offs)}, {g.size} rays "
        f"axis {axis}")

    xyz_min, xyz_max = model.xyz_min, model.xyz_max
    world_size = tuple(int(x) for x in model.world_size)
    t0 = time.time()
    tiles = sweep_ops.build_ray_tiles_blocktile(
        ro[g], rd[g], xyz_min, xyz_max, world_size, axis,
        rk0["near"], rk0["far"], stepsize, nt=NT, s_blk=s_blk,
        max_classes=max_classes, clip_box=box6)
    log(f"tile build {time.time()-t0:.1f} s")
    tot = sum(v.shape[0] for v in tiles.values())
    classes = sorted(tiles.items(), key=lambda kv: -kv[1].shape[0])
    log("tile classes: "
        + " ".join(f"{k}:{v.shape[0] / tot:.3f}" for k, v in classes))

    inv = {ax: i for i, ax in enumerate(perm)}
    rk = dict(near=rk0["near"], far=rk0["far"], bg=1.0,
              stepsize=stepsize)
    rng = np.random.default_rng(0)

    offs_d = jnp.asarray([offs[inv[a]] for a in range(3)], jnp.int32)
    sizes_xyz_box = tuple(int(clip_sizes[inv[a]]) for a in range(3))
    dens_fb = jax.lax.dynamic_slice(model.params["density"],
                                    tuple(offs_d), sizes_xyz_box)
    k0_fb = jax.lax.dynamic_slice(
        model.params["k0"], (*offs_d, jnp.int32(0)),
        (*sizes_xyz_box, model.k0_dim))
    mask_fb = jax.lax.dynamic_slice(model.mask, tuple(offs_d),
                                    sizes_xyz_box)
    offs_pm_box = jnp.asarray([offs[0], offs[1], offs[2]], jnp.int32)
    tr_fb = {"density": dens_fb, "k0": k0_fb,
             "rgbnet": model.params["rgbnet"]}

    def timeit(fn, arg, label, iters=30):
        t0 = time.time()
        try:
            loss, grads = fn(arg)
            jax.block_until_ready(grads)
            loss = float(loss)
        except Exception as e:  # noqa: BLE001
            log(f"  {label}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None, None
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            loss_, grads = fn(arg)
        jax.block_until_ready(grads)
        dt = (time.time() - t0) / iters * 1000
        log(f"  {label}: {dt:6.2f} ms/iter  (compile+first {tc:.1f}s, "
            f"loss {loss:.6f})")
        return dt, loss

    def losses_of(ret, gt):
        mse = jnp.mean((ret["rgb_marched"] - gt) ** 2)
        pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout)
                        + (1 - pout) * jnp.log(1 - pout))
        return mse, ent

    blend_f, blend_x, share_cov = 0.0, 0.0, 0.0
    for (wu_t, wv_t, sg), idx in classes[:n_classes]:
        share = idx.shape[0] / tot
        n_draw = N_RAND // NT
        rows = rng.choice(idx.shape[0], size=n_draw,
                          replace=idx.shape[0] < n_draw)
        sel = g[idx[rows].ravel()]
        b_ro, b_rd, b_vd, b_gt = (jnp.asarray(ro[sel]),
                                  jnp.asarray(rd[sel]),
                                  jnp.asarray(vd[sel]),
                                  jnp.asarray(rgb[sel]))
        log(f"class ({wu_t},{wv_t},sg{sg:+d}) share {share:.3f} "
            f"({idx.shape[0]} tiles)")

        def loss_fused(tr, gt=b_gt, ro_=b_ro, rd_=b_rd, vd_=b_vd,
                       win=(wu_t, wv_t)):
            ret = model.forward_sweep_fused(
                {**model.params, **tr}, mask_fb, ro_, rd_, vd_, axis, gt,
                clip_offsets=offs_pm_box, s_blk=s_blk,
                window=win if win != (0, 0) else None, **rk)
            mse, ent = losses_of(ret, gt)
            rl = jnp.sum(ret["rgbper_sum"]) / N_RAND
            return W_MAIN * mse + W_ENT * ent + W_RGBPER * rl

        dt_f, lf = timeit(jax.jit(jax.value_and_grad(loss_fused)), tr_fb,
                          f"fusedblk({wu_t},{wv_t})")

        # XLA comparator: the composed whole-batch segment box (today's
        # realized step for these rays)
        o_pv, d_pv = sweep_ops.rays_to_voxel(
            np.asarray(b_ro), np.asarray(b_rd),
            tuple(float(v) for v in xyz_min),
            tuple(float(v) for v in xyz_max), world_size, axis)
        dpn = np.where(np.abs(d_pv[0]) < 1e-10, 1e-10, d_pv[0])
        t0e = (box6[0] - o_pv[0]) / dpn
        t1e = (box6[1] - o_pv[0]) / dpn
        su, sv = [], []
        for o_c, d_c, lo_c, hi_c in ((o_pv[1], d_pv[1], box6[2], box6[3]),
                                     (o_pv[2], d_pv[2], box6[4], box6[5])):
            e = np.stack([o_c + t0e * d_c, o_c + t1e * d_c])
            lo = np.clip(np.floor(e.min(0)).min() - 1, lo_c, hi_c)
            hi = np.clip(np.ceil(e.max(0)).max() + 1, lo_c, hi_c)
            su.append((lo, hi))
        wu_c = int(su[0][1] - su[0][0]) + 1
        wv_c = int(su[1][1] - su[1][0]) + 1
        u0 = int(np.clip(su[0][0], offs[1], offs[1] + bu - wu_c))
        v0 = int(np.clip(su[1][0], offs[2], offs[2] + bv - wv_c))
        sizes_pm = (bp, wu_c, wv_c)
        offs_pm = np.asarray([offs[0], u0, v0], np.int64)
        sizes_xyz = tuple(int(sizes_pm[inv[a]]) for a in range(3))
        offs_xyz = jnp.asarray([offs_pm[inv[a]] for a in range(3)],
                               jnp.int32)
        dens_sb = jax.lax.dynamic_slice(model.params["density"],
                                        tuple(offs_xyz), sizes_xyz)
        k0_sb = jax.lax.dynamic_slice(
            model.params["k0"], (*offs_xyz, jnp.int32(0)),
            (*sizes_xyz, model.k0_dim))
        mask_sb = jax.lax.dynamic_slice(model.mask, tuple(offs_xyz),
                                        sizes_xyz)
        tr_sb = {"density": dens_sb, "k0": k0_sb,
                 "rgbnet": model.params["rgbnet"]}
        offs_pm_j = jnp.asarray(offs_pm, jnp.int32)

        def loss_xla(tr, gt=b_gt, ro_=b_ro, rd_=b_rd, vd_=b_vd,
                     sizes=sizes_pm, op=offs_pm_j, msk=mask_sb):
            ret = model.forward_sweep(
                {**model.params, **tr}, msk, ro_, rd_, vd_, axis,
                clip_sizes=sizes, clip_offsets=op,
                grids_pre_clipped=True, **rk)
            mse, ent = losses_of(ret, gt)
            rgbper = jnp.sum((ret["raw_rgb_cl"] - gt.T[:, :, None]) ** 2,
                             axis=0)
            rl = jnp.sum(rgbper * jax.lax.stop_gradient(
                ret["weights"])) / N_RAND
            return W_MAIN * mse + W_ENT * ent + W_RGBPER * rl

        dt_x, lx = timeit(jax.jit(jax.value_and_grad(loss_xla)), tr_sb,
                          f"xla box ({bp},{wu_c},{wv_c})")
        if lf is not None and lx is not None:
            log(f"  loss agreement: {abs(lf - lx):.2e}")
        if dt_f is not None and dt_x is not None:
            blend_f += share * dt_f
            blend_x += share * dt_x
            share_cov += share
    if share_cov > 0:
        bf, bx = blend_f / share_cov, blend_x / share_cov
        log(f"blend over {share_cov:.2f} ray share: fusedblk {bf:.2f} "
            f"ms/iter vs xla-composed-box {bx:.2f} ms/iter")
        log(f"projected 20k fine (fusedblk, this axis): "
            f"{bf * 20000 / 60000:.2f} min")


if __name__ == "__main__":
    main()
