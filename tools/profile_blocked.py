#!/usr/bin/env python
"""Decompose the blocked-sweep step's cost: fwd vs bwd, and per-block
marginal overhead — the B-sub-sweep composition measured a REGRESSION in
bench (32x32 at 18.9 ms vs 8-12 for whole-traversal 2D windows) even
though its matmul FLOPs are ~4x lower; this isolates where the time goes.

Variants per class:
  plain:    monolithic clipped sweep (the engine fallback)
  comp2d:   one composed (bp, eu, ev) clip box (the old 2D window draw)
  blk{B}:   B-sub-sweep blocked draw at the same (eu, ev)
Each timed forward-only and value_and_grad.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod
    from directvoxgo_tpu.ops import sweep as sweep_ops

    model = bench_mod.build_fine_model()
    ro, rd, vd, rgb = bench_mod._make_training_pool()
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    axis = 0
    g = np.flatnonzero(groups == axis)
    n_rand = 8192
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    bp, bu, bv = (int(x) for x in clip_sizes)
    bpo, buo, bvo = (int(x) for x in np.asarray(clip_off))
    log(f"axis {axis} clip=({bp},{bu},{bv}) off=({bpo},{buo},{bvo})")

    bk = sweep_ops.build_ray_segments_blocked(
        ro[g], rd[g], model.xyz_min, model.xyz_max, model.world_size,
        axis, n_rand=n_rand, n_blocks=6, widths=(32, 48, 64, 96),
        max_classes=6,
        clip_box=(bpo, bpo + bp - 1, buo, buo + bu - 1, bvo, bvo + bv - 1))
    wins = sorted([k for k in bk if k != (0, 0) and k[0] and k[1]
                   and bk[k][0].shape[0] > 0])
    (wu, wv) = wins[0]
    idx, uo6, vo6 = bk[(wu, wv)]
    sel = g[idx[0]]
    log(f"class ({wu},{wv}), {idx.shape[0]} segs")

    o_j = jnp.asarray(ro[sel])
    d_j = jnp.asarray(rd[sel])
    v_j = jnp.asarray(vd[sel])
    tgt = jnp.asarray(rgb[sel])
    kw = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)

    def timed(name, fn, *args):
        fn(*args)  # compile
        r = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, r)
        t0 = time.time()
        iters = 30
        for _ in range(iters):
            r = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, r)
        log(f"  {name}: {(time.time()-t0)/iters*1000:.2f} ms")

    def fwd_plain(params):
        return model.forward_sweep(params, model.mask, o_j, d_j, v_j, axis,
                                   clip_sizes=(bp, bu, bv),
                                   clip_offsets=jnp.asarray(
                                       [bpo, buo, bvo], jnp.int32),
                                   **kw)["rgb_marched"]

    # composed 2D box at the same class extents (old draw)
    co2 = jnp.asarray([bpo,
                       min(max(int(uo6[0].min()), buo), buo + bu - wu),
                       min(max(int(vo6[0].min()), bvo), bvo + bv - wv)],
                      jnp.int32)

    def fwd_comp2d(params):
        return model.forward_sweep(params, model.mask, o_j, d_j, v_j, axis,
                                   clip_sizes=(bp, wu, wv),
                                   clip_offsets=co2,
                                   **kw)["rgb_marched"]

    def make_fwd_blk(nb):
        bkb = sweep_ops.build_ray_segments_blocked(
            ro[sel], rd[sel], model.xyz_min, model.xyz_max,
            model.world_size, axis, n_rand=n_rand, n_blocks=nb,
            widths=(wu,) if wu == wv else (min(wu, wv), max(wu, wv)),
            max_classes=1,
            clip_box=(bpo, bpo + bp - 1, buo, buo + bu - 1,
                      bvo, bvo + bv - 1))
        kk = [k for k in bkb if k != (0, 0)]
        if not kk:
            return None, None
        (wub, wvb) = kk[0]
        _, uoB, voB = bkb[kk[0]]
        eu = wub if wub else bu
        ev = wvb if wvb else bv
        uoj, voj = jnp.asarray(uoB[0]), jnp.asarray(voB[0])

        def f(params):
            return model.forward_sweep(
                params, model.mask, o_j, d_j, v_j, axis,
                block_windows=((uoB.shape[1], eu, ev), (uoj, voj)),
                **kw)["rgb_marched"]
        return f, (wub, wvb, uoB.shape[1])

    def loss_of(fwd):
        def loss(params):
            return jnp.mean((fwd(params) - tgt) ** 2)
        return loss

    variants = [("plain", fwd_plain), ("comp2d", fwd_comp2d)]
    for nb in (1, 2, 4, 6):
        f, info = make_fwd_blk(nb)
        if f is not None:
            variants.append((f"blk{nb} {info}", f))

    for name, fwd in variants:
        jf = jax.jit(fwd)
        jg = jax.jit(jax.grad(loss_of(fwd)))
        timed(f"{name} fwd", jf, model.params)
        timed(f"{name} grad", jg, model.params)


if __name__ == "__main__":
    main()
