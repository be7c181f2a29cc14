#!/usr/bin/env python
"""Size the FLOP win of (a) endpoint-sorted segments and (b) per-p-block
(u, v) windows, host-side, on the real fixture training pool.

The training sweep's cost per batch is ~ 2*N*Wu*(Wv*C)*S: the blend over
window classes is the steady-state step time. build_ray_segments_2d
currently sorts rays by the Morton code of their (u, v) MIDPOINTS —
mixed-view perspective pools then fan out toward the traversal ends, and
a segment's full-traversal u support lands at 96..full. Two candidate
levers, measured here before any kernel work:

  1. endpoint sort: Morton over (u, v) at BOTH clip planes — rays agreeing
     at both ends share a view/direction, so segments tighten.
  2. p-blocks: windows measured per p-block of the traversal; a ray's
     in-block drift is (p_blk/p_total) of its full drift, so per-block
     supports shrink ~B-fold for the drift term.

Prints the ray-share-weighted relative cost (fallback = 1.0) per variant.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def load_pool():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from directvoxgo_tpu.config import Config
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu import rays as ray_lib

    cfg = Config.fromfile("configs/synthetic/fixture_lego_sparse.py")
    data = load_data(cfg.data)
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    rgb, ro, rd, vd, _ = ray_lib.get_training_rays_flatten(
        rgb_tr_ori=images, train_poses=data["poses"][i_train],
        HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)
    return np.asarray(ro), np.asarray(rd)


def seg_cost(idx_rays, wu, wv, gu, gv, s_frac=1.0):
    """Relative per-ray cost of a (wu, wv) class (0 = full extent)."""
    eu = wu if wu else gu
    ev = wv if wv else gv
    return idx_rays * (eu * ev) / (gu * gv) * s_frac


def analyze(ro, rd, xyz_min, xyz_max, world_size, axis, n_rand=8192,
            widths=(32, 48, 64, 96), sort="mid", n_blocks=1):
    from directvoxgo_tpu.ops import sweep as sweep_ops
    perm = sweep_ops._PERMS[axis]
    opv, dpv = [], []
    for ax in perm:
        scale = (float(world_size[ax]) - 1.0) / (float(xyz_max[ax])
                                                 - float(xyz_min[ax]))
        opv.append((ro[:, ax] - float(xyz_min[ax])) * scale)
        dpv.append(rd[:, ax] * scale)
    op, ou, ov = opv
    dp, du, dv = dpv
    gp = int(world_size[perm[0]])
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])
    n = ro.shape[0]
    n_seg = n // n_rand
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
    # p-block boundaries (voxel coords along the sweep axis)
    edges = np.linspace(0.0, gp - 1.0, n_blocks + 1)
    t_at = lambda pv: (pv - op) / dp_s  # noqa: E731
    u_at = lambda t: np.clip(ou + t * du, -1.0, gu)  # noqa: E731
    v_at = lambda t: np.clip(ov + t * dv, -1.0, gv)  # noqa: E731

    t0, t1 = t_at(edges[0]), t_at(edges[-1])
    u_ends = np.stack([u_at(t0), u_at(t1)])
    v_ends = np.stack([v_at(t0), v_at(t1)])

    def quant(x, g):
        return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

    if sort == "mid":
        keys = [quant(0.5 * (u_ends[0] + u_ends[1]), gu),
                quant(0.5 * (v_ends[0] + v_ends[1]), gv)]
    else:  # 4-endpoint
        keys = [quant(u_ends[0], gu), quant(v_ends[0], gv),
                quant(u_ends[1], gu), quant(v_ends[1], gv)]
    code = np.zeros(n, np.int64)
    for b in range(10):
        for d_i, kk in enumerate(keys):
            code |= ((kk >> b) & 1) << (b * len(keys) + d_i)
    order = np.argsort(code, kind="stable")
    idx = order[: n_seg * n_rand].reshape(n_seg, n_rand)

    # Per-block per-segment supports. Two cost policies:
    #  perblock: each (segment, block) fits its own class (ideal bound)
    #  segmax:   ONE static (wu, wv) class per segment = max over its
    #            blocks (what a single compiled step program can do)
    need_u_bl = np.zeros((n_blocks, n_seg))
    need_v_bl = np.zeros((n_blocks, n_seg))
    for b in range(n_blocks):
        tb0, tb1 = t_at(edges[b]), t_at(edges[b + 1])
        ub = np.stack([u_at(tb0), u_at(tb1)])
        vb = np.stack([v_at(tb0), v_at(tb1)])

        def rng_of(ends, g):
            lo = np.maximum(0, np.floor(np.minimum(ends[0], ends[1])))
            hi = np.minimum(g - 1.0,
                            np.floor(np.maximum(ends[0], ends[1])) + 1)
            return lo[idx].min(1), hi[idx].max(1)

        u0, u1 = rng_of(ub, gu)
        v0, v1 = rng_of(vb, gv)
        need_u_bl[b] = u1 - u0 + 1
        need_v_bl[b] = v1 - v0 + 1

    def fit(nd, g):
        for w in sorted(widths):
            if w < g and nd <= w:
                return w
        return 0  # full extent

    tot_cost = 0.0
    class_counts = {}
    for b in range(n_blocks):
        for s in range(n_seg):
            wu = fit(need_u_bl[b, s], gu)
            wv = fit(need_v_bl[b, s], gv)
            eu = wu if wu else gu
            ev = wv if wv else gv
            tot_cost += (eu * ev) / (gu * gv) / n_blocks
    segmax_cost = 0.0
    for s in range(n_seg):
        wu = fit(need_u_bl[:, s].max(), gu)
        wv = fit(need_v_bl[:, s].max(), gv)
        class_counts[(wu, wv)] = class_counts.get((wu, wv), 0) + 1
        eu = wu if wu else gu
        ev = wv if wv else gv
        segmax_cost += (eu * ev) / (gu * gv)
    return tot_cost / n_seg, segmax_cost / n_seg, class_counts, n_seg


def main():
    ro, rd = load_pool()
    log(f"pool: {ro.shape[0]} rays")
    # run3 fine-stage geometry (log: grid (167,162,151))
    world = (167, 162, 151)
    # fixture bbox: read from the checkpoint if present, else unit-ish cube
    try:
        from directvoxgo_tpu.engine import checkpoint as ckpt_lib
        st = ckpt_lib.load_checkpoint_file(
            "logs/synthetic/fixture_lego_sparse/fine_last.tar")
        kw = st["model_kwargs"]
        xyz_min = np.asarray(kw["xyz_min"], np.float64)
        xyz_max = np.asarray(kw["xyz_max"], np.float64)
        world = tuple(int(x) for x in np.asarray(
            st["model_state_dict"]["density"]).shape[:3])
        log(f"ckpt bbox {xyz_min} .. {xyz_max}, world {world}")
    except Exception as e:
        log(f"no ckpt ({e}); using data bbox")
        xyz_min = ro.min(0) - 1.0
        xyz_max = ro.max(0) + 1.0

    from directvoxgo_tpu.ops import sweep as sweep_ops
    axes = sweep_ops.dominant_axis(rd, xyz_min, xyz_max, world)
    for axis in range(3):
        g = np.flatnonzero(axes == axis)
        if len(g) < 8192:
            continue
        log(f"\n== axis {axis}: {len(g)} rays ==")
        for sort in ("mid", "ends"):
            for nb in (1, 4, 6, 8):
                cost, smax, classes, n_seg = analyze(
                    ro[g], rd[g], xyz_min, xyz_max, world, axis,
                    sort=sort, n_blocks=nb)
                top = sorted(classes.items(), key=lambda kv: -kv[1])[:5]
                log(f"  sort={sort:4s} blocks={nb}: perblock {cost:.3f} "
                    f"segmax {smax:.3f} ({n_seg} segs) "
                    f"segmax classes {top}")


if __name__ == "__main__":
    main()
