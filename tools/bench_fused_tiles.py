#!/usr/bin/env python
"""Fused per-TILE-windowed train kernels vs the shipping paths, on REAL
engine segments.

Loads the sparse-fixture fine checkpoint, rebuilds the engine's
maskcache-filtered ray pool and its endpoint-Morton segment classes
(ops/sweep.build_ray_segments_2d with the occupancy clip box — exactly
engine/train.build_buckets), then for the top classes times
value_and_grad of the full training loss through:

  (a) xla      — forward_sweep + XLA chain on the composed segment box
                 (the shipping windowed step),
  (b) fusedbox — fused kernels on the same composed box, no tile windows,
  (c) fusedtile— fused kernels on the FULL occupancy box with per-512-ray
                 -tile (wu, wv) windows sized from the segment's measured
                 tile footprints (+15/+7 alignment budget).

(c) is the VERDICT r3 #1 candidate: a Morton segment's 512-ray tiles have
footprints ~4x narrower per axis than the 8192-ray batch, so the
contraction work shrinks by the area ratio while ONE compiled program
serves every segment of the class (offsets are runtime scalars).

Usage: python tools/bench_fused_tiles.py [n_classes] [axis]
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


def quant_up(x, q, lo, hi):
    v = max(lo, (int(x) + q - 1) // q * q)
    return min(v, hi)


def main():
    from directvoxgo_tpu.config import Config
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu.ops import raymarch as rm
    from directvoxgo_tpu.ops import pallas_train_fused as ptf
    from directvoxgo_tpu import rays as ray_lib

    n_classes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    axis = int(sys.argv[2]) if len(sys.argv) > 2 else 0

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
    b2 = sweep_ops.build_ray_segments_2d(
        ro[g], rd[g], xyz_min, xyz_max, world_size, axis,
        n_rand=N_RAND, widths=(32, 48, 64, 96), max_classes=6,
        clip_box=box6)
    shares = {k: v[0].size for k, v in b2.items() if v[0].shape[0] > 0}
    tot = max(sum(shares.values()), 1)
    log("segment classes: "
        + " ".join(f"{k}:{c / tot:.2f}" for k, c in
                   sorted(shares.items(), key=lambda kv: -kv[1])))

    inv = {ax: i for i, ax in enumerate(perm)}
    rng = np.random.default_rng(0)
    rk = dict(near=rk0["near"], far=rk0["far"], bg=1.0,
              stepsize=rk0["stepsize"])

    # full occupancy-box grids for the fused-tile path (one slice, reused)
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

    def losses_of(ret, gt, n):
        mse = jnp.mean((ret["rgb_marched"] - gt) ** 2)
        pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout)
                        + (1 - pout) * jnp.log(1 - pout))
        return mse, ent

    classes = sorted(shares.items(), key=lambda kv: -kv[1])[:n_classes]
    results = {}
    for (wu_s, wv_s), _cnt in classes:
        idx, ulo, vlo = b2[(wu_s, wv_s)]
        si = rng.integers(0, idx.shape[0])
        sel = g[idx[si]]
        b_ro, b_rd, b_vd, b_gt = (jnp.asarray(ro[sel]),
                                  jnp.asarray(rd[sel]),
                                  jnp.asarray(vd[sel]),
                                  jnp.asarray(rgb[sel]))
        # composed segment box (engine next_chunk semantics)
        wu_c = wu_s if wu_s and wu_s < bu else bu
        wv_c = wv_s if wv_s and wv_s < bv else bv
        su = int(np.clip(ulo[si], offs[1], offs[1] + bu - wu_c))
        sv = int(np.clip(vlo[si], offs[2], offs[2] + bv - wv_c))
        sizes_pm = (bp, wu_c, wv_c)
        offs_pm = np.asarray([offs[0], su, sv], np.int64)
        sizes_xyz = tuple(int(sizes_pm[inv[a]]) for a in range(3))
        offs_xyz = jnp.asarray([offs_pm[inv[a]] for a in range(3)],
                               jnp.int32)
        offs_pm_j = jnp.asarray(offs_pm, jnp.int32)

        dens_sb = jax.lax.dynamic_slice(model.params["density"],
                                        tuple(offs_xyz), sizes_xyz)
        k0_sb = jax.lax.dynamic_slice(
            model.params["k0"], (*offs_xyz, jnp.int32(0)),
            (*sizes_xyz, model.k0_dim))
        mask_sb = jax.lax.dynamic_slice(model.mask, tuple(offs_xyz),
                                        sizes_xyz)

        # ---- per-tile footprints -> fused tile class (box frame)
        o_pv, d_pv = sweep_ops.rays_to_voxel(
            b_ro, b_rd, tuple(float(v) for v in xyz_min),
            tuple(float(v) for v in xyz_max), world_size, axis)
        o_pv = tuple(o - jnp.float32(offs_pm_box[i])
                     for i, o in enumerate(o_pv))
        tlo, thi = rm.ray_aabb_tminmax(
            b_ro, b_rd, jnp.asarray(xyz_min), jnp.asarray(xyz_max),
            rk["near"], rk["far"])
        z = jnp.zeros((N_RAND,), jnp.float32)
        r16 = jnp.stack([o_pv[0], o_pv[1], o_pv[2],
                         jnp.where(d_pv[0] == 0, 1e-10, d_pv[0]),
                         d_pv[1], d_pv[2], tlo, thi, z, z, z, z, z, z,
                         z, z])
        gu_p = (bu + 15) // 16 * 16
        gv_p = (bv + 7) // 8 * 8
        r = np.asarray(r16)
        hit = r[7] > r[6]
        fp = []
        for o_i, d_i in ((1, 4), (2, 5)):
            a = r[o_i] + r[6] * r[d_i]
            b = r[o_i] + r[7] * r[d_i]
            lo_ = np.where(hit, np.minimum(a, b) - 1, np.inf)
            hi_ = np.where(hit, np.maximum(a, b) + 1, -np.inf)
            lo_t = lo_.reshape(-1, NT).min(1)
            hi_t = hi_.reshape(-1, NT).max(1)
            fp.append((lo_t, hi_t))
        # width after align-down: ceil(hi) - aligndown(floor(lo))
        need_u = np.ceil(fp[0][1]) - (np.floor(
            np.clip(fp[0][0], 0, None)) // 16) * 16
        need_v = np.ceil(fp[1][1]) - (np.floor(
            np.clip(fp[1][0], 0, None)) // 8) * 8
        wu_t = quant_up(np.nanmax(np.where(np.isfinite(need_u), need_u,
                                           0)), 16, 16, gu_p)
        wv_t = quant_up(np.nanmax(np.where(np.isfinite(need_v), need_v,
                                           0)), 8, 8, gv_p)
        log(f"class ({wu_s},{wv_s}) seg box ({bp},{wu_c},{wv_c}) -> "
            f"tile class ({wu_t},{wv_t}); tile u-needs "
            f"p50/p90/max {np.percentile(need_u[np.isfinite(need_u)], [50, 90]).round(0)}"
            f"/{need_u[np.isfinite(need_u)].max():.0f}, v "
            f"{np.percentile(need_v[np.isfinite(need_v)], [50, 90]).round(0)}"
            f"/{need_v[np.isfinite(need_v)].max():.0f}")

        tr_sb = {"density": dens_sb, "k0": k0_sb,
                 "rgbnet": model.params["rgbnet"]}
        tr_fb = {"density": dens_fb, "k0": k0_fb,
                 "rgbnet": model.params["rgbnet"]}

        def loss_xla(tr, mask=mask_sb, sizes=sizes_pm, op=offs_pm_j,
                     gt=b_gt, ro_=b_ro, rd_=b_rd, vd_=b_vd):
            ret = model.forward_sweep(
                {**model.params, **tr}, mask, ro_, rd_, vd_, axis,
                clip_sizes=sizes, clip_offsets=op,
                grids_pre_clipped=True, **rk)
            mse, ent = losses_of(ret, gt, N_RAND)
            rgbper = jnp.sum((ret["raw_rgb_cl"] - gt.T[:, :, None]) ** 2,
                             axis=0)
            rl = jnp.sum(rgbper * jax.lax.stop_gradient(
                ret["weights"])) / N_RAND
            return W_MAIN * mse + W_ENT * ent + W_RGBPER * rl

        def loss_fused(tr, mask, op, window, gt=b_gt, ro_=b_ro,
                       rd_=b_rd, vd_=b_vd):
            ret = model.forward_sweep_fused(
                {**model.params, **tr}, mask, ro_, rd_, vd_, axis, gt,
                clip_offsets=op, window=window, **rk)
            mse, ent = losses_of(ret, gt, N_RAND)
            rl = jnp.sum(ret["rgbper_sum"]) / N_RAND
            return W_MAIN * mse + W_ENT * ent + W_RGBPER * rl

        row = {}
        row["xla"], lx = timeit(jax.jit(jax.value_and_grad(loss_xla)),
                                tr_sb, "xla      (seg box)")
        row["fusedbox"], lfb = timeit(
            jax.jit(jax.value_and_grad(
                lambda tr: loss_fused(tr, mask_sb, offs_pm_j, None))),
            tr_sb, "fusedbox (seg box)")
        row["fusedtile"], lft = timeit(
            jax.jit(jax.value_and_grad(
                lambda tr: loss_fused(tr, mask_fb, offs_pm_box,
                                      (wu_t, wv_t)))),
            tr_fb, f"fusedtile({wu_t},{wv_t})")
        if lx is not None and lft is not None:
            log(f"  loss agreement xla vs fusedtile: "
                f"{abs(lx - lft):.2e}")
        results[(wu_s, wv_s)] = row
    log("summary:", results)


if __name__ == "__main__":
    main()
