#!/usr/bin/env python
"""Footprint ceiling for per-(station-block, ray-tile) windows.

The decision data for extending the fused train kernels with
block-resolved windows: for each realized segment class of the engine's
maskcache-filtered pool, computes the (u, v) window each (8-station
block, 512-ray tile) cell would need — tile spread at that depth plus
8 stations of per-ray drift, +-1 hat margin and the 16/8 alignment
budget — and the resulting FLOP ratio vs (a) the composed segment box
and (b) the full clip box. Pure numpy; no TPU needed.

Usage: python tools/analyze_blocktile_windows.py [axis] [s_blk]
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

N_RAND = 8192
NT = 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from directvoxgo_tpu.config import Config
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu import rays as ray_lib
    import jax

    axis = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    s_blk = int(sys.argv[2]) if len(sys.argv) > 2 else 8

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
    ro, rd = np.asarray(ro), np.asarray(rd)
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    g = np.flatnonzero(groups == axis)

    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    perm = sweep_ops._PERMS[axis]
    world_size = tuple(int(x) for x in model.world_size)
    if clip_sizes is None:
        clip_sizes = tuple(int(world_size[a]) for a in perm)
        clip_off = np.zeros(3, np.int64)
    offs = np.asarray(clip_off, np.int64)
    bp, bu, bv = (int(x) for x in clip_sizes)
    box6 = (float(offs[0]), float(offs[0]) + bp - 1.0,
            float(offs[1]), float(offs[1]) + bu - 1.0,
            float(offs[2]), float(offs[2]) + bv - 1.0)
    xyz_min, xyz_max = model.xyz_min, model.xyz_max
    k = sweep_ops.substeps_for_stepsize(rk0["stepsize"])
    b2 = sweep_ops.build_ray_segments_2d(
        ro[g], rd[g], xyz_min, xyz_max, world_size, axis,
        n_rand=N_RAND, widths=(32, 48, 64, 96), max_classes=6,
        clip_box=box6)

    # voxel-space rays (permuted, box-frame)
    opv, dpv = [], []
    for i, ax in enumerate(perm):
        scale = (world_size[ax] - 1.0) / (float(xyz_max[ax])
                                          - float(xyz_min[ax]))
        opv.append((ro[:, ax] - float(xyz_min[ax])) * scale
                   - float(offs[i]))
        dpv.append(rd[:, ax] * scale)
    op, ou, ov = opv
    dp, du, dv = dpv
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)

    nsb = (k * (bp - 1) + 1 + s_blk - 1) // s_blk
    tot_cells = 0
    log(f"axis {axis} box ({bp},{bu},{bv}) S={k * (bp - 1) + 1} "
        f"nsb={nsb} s_blk={s_blk}")
    rows = []
    for key_, (idx, ulo, vlo) in sorted(
            b2.items(), key=lambda kv: -kv[1][0].size):
        if idx.shape[0] == 0:
            continue
        wu_s, wv_s = key_
        wu_c = wu_s if wu_s and wu_s < bu else bu
        wv_c = wv_s if wv_s and wv_s < bv else bv
        sel = g[idx]                          # [n_seg, N_RAND]
        n_seg = sel.shape[0]
        # per-(seg, block, tile) footprints via block-boundary endpoints
        # p stations at (j*s_blk .. j*s_blk+s_blk-1)/k voxels
        pb = np.arange(nsb + 1) * s_blk / k   # block-boundary voxel p
        pb = np.clip(pb, 0, bp - 1)
        o_p = op[sel]                         # [n_seg, N]
        d_p = dp_s[sel]
        o_u, d_u = ou[sel], du[sel]
        o_v, d_v = ov[sel], dv[sel]
        # t at block boundaries: [n_seg, N, nsb+1]
        t_b = (pb[None, None, :] - o_p[..., None]) / d_p[..., None]
        t0 = np.minimum(t_b[..., :-1], t_b[..., 1:])
        t1 = np.maximum(t_b[..., :-1], t_b[..., 1:])
        u0 = o_u[..., None] + t0 * d_u[..., None]
        u1 = o_u[..., None] + t1 * d_u[..., None]
        v0 = o_v[..., None] + t0 * d_v[..., None]
        v1 = o_v[..., None] + t1 * d_v[..., None]
        ulo_c = np.minimum(u0, u1).clip(-1, bu) - 1
        uhi_c = np.maximum(u0, u1).clip(-1, bu) + 1
        vlo_c = np.minimum(v0, v1).clip(-1, bv) - 1
        vhi_c = np.maximum(v0, v1).clip(-1, bv) + 1
        sh = (n_seg, N_RAND // NT, NT, nsb)
        need_u = (np.ceil(uhi_c.reshape(sh).max(2))
                  - (np.floor(vloor := ulo_c.reshape(sh).min(2)).clip(0)
                     // 16) * 16)
        need_v = (np.ceil(vhi_c.reshape(sh).max(2))
                  - (np.floor(vlo_c.reshape(sh).min(2)).clip(0)
                     // 8) * 8)
        nu = np.clip(need_u, 8, bu)
        nv = np.clip(need_v, 8, bv)
        # quantize to classes the kernel would compile (16/8 multiples),
        # max over cells = the static class; also report blockwise-mean
        # area (the realized FLOP proxy if windows were per-cell dynamic)
        area_cells = (nu * nv).mean()
        area_stat_u = np.ceil(np.percentile(nu, 100) / 16) * 16
        area_stat_v = np.ceil(np.percentile(nv, 100) / 8) * 8
        p95_u = np.ceil(np.percentile(nu, 95) / 16) * 16
        p95_v = np.ceil(np.percentile(nv, 95) / 8) * 8
        seg_area = wu_c * wv_c
        box_area = bu * bv
        rows.append((key_, idx.size,
                     f"cellmean {area_cells:7.0f} "
                     f"max ({area_stat_u:.0f},{area_stat_v:.0f}) "
                     f"p95 ({p95_u:.0f},{p95_v:.0f}) "
                     f"| segbox ({wu_c},{wv_c}) {seg_area} "
                     f"| ratio cell/seg {area_cells / seg_area:.2f} "
                     f"cell/full {area_cells / box_area:.2f}"))
        tot_cells += idx.size
        # Realizable STATIC classes: the kernel window is per-program, so
        # a tile's class = its max cell footprint over all blocks; report
        # the tile-class histogram and the realized FLOP blend if batches
        # regroup tiles by class (16 same-class tiles per batch).
        tu = np.ceil(nu.max(axis=2) / 16) * 16      # [n_seg, n_tiles]
        tv = np.ceil(nv.max(axis=2) / 8) * 8
        tu = np.minimum(tu, np.ceil(bu / 16) * 16)
        tv = np.minimum(tv, np.ceil(bv / 8) * 8)
        cls, cnts = np.unique(
            np.stack([tu.ravel(), tv.ravel()], 1), axis=0,
            return_counts=True)
        order = np.argsort(-cnts)
        blend = float((tu * tv).mean())
        log(f"  tile classes (area blend {blend:.0f}, "
            f"{blend / seg_area:.2f} of segbox): "
            + " ".join(f"({int(a)},{int(b)}):{c / tu.size:.2f}"
                       for (a, b), c in zip(cls[order[:8]],
                                            cnts[order[:8]])))
    for key_, cnt, s in rows:
        log(f"class {key_} share {cnt / max(tot_cells, 1):.2f}: {s}")


if __name__ == "__main__":
    main()
