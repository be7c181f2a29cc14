#!/usr/bin/env python
"""A/B sweep_color_topk (48 vs 0) at the REALIZED wide window classes.

configs/default.py ships fine_model_and_render.sweep_color_topk=48 (the
static top-K station compaction before the color MLP — the sweep-path
analogue of the reference's fast_color_thres pruning, lib/dvgo.py:478-494).
Round-3 verdict asked for the on/off measurement at the wide classes the
maskcache-filtered pool actually draws ((96,96)+ and the clipped-full
fallback), where the MLP's [N, S, width] traffic is largest and the
compaction should matter most.

Times the ENGINE's make_train_step (donated buffers, device pool, host sel
upload) on the 160^3 bench model at classes (96,96), (64,64) and the
clipped-full fallback, topk=48 vs topk=0. One JSON line per arm to stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(iters=30, n_rand=8192):
    import jax
    import jax.numpy as jnp
    import bench as bench_mod
    from directvoxgo_tpu.config import ConfigDict
    from directvoxgo_tpu.engine.train import make_train_step
    from directvoxgo_tpu.optim import MaskedAdam
    from directvoxgo_tpu.ops import sweep as sweep_ops

    model = bench_mod.build_fine_model()
    ro, rd, vd, rgb = bench_mod._make_training_pool()
    hit = model.hit_coarse_geo(ro, rd, 2.0, 6.0, 0.5)
    keep = np.flatnonzero(np.asarray(hit))
    ro, rd, vd, rgb = ro[keep], rd[keep], vd[keep], rgb[keep]
    pool = {"rays_o": jnp.asarray(ro), "rays_d": jnp.asarray(rd),
            "viewdirs": jnp.asarray(vd), "rgb": jnp.asarray(rgb)}
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    axis = int(np.bincount(groups, minlength=3).argmax())
    g = np.flatnonzero(groups == axis)
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    perm = sweep_ops._PERMS[axis]
    if clip_sizes is None:
        clip_sizes = tuple(int(model.world_size[a]) for a in perm)
        clip_off = np.zeros(3, np.int32)
    bp, bu, bv = (int(x) for x in clip_sizes)
    bpo, buo, bvo = (int(x) for x in np.asarray(clip_off))
    box6 = (bpo, bpo + bp - 1, buo, buo + bu - 1, bvo, bvo + bv - 1)
    bk = sweep_ops.build_ray_segments_2d(
        ro[g], rd[g], model.xyz_min, model.xyz_max, model.world_size,
        axis, n_rand=n_rand, widths=(32, 48, 64, 96), max_classes=6,
        clip_box=box6)
    rng = np.random.default_rng(0)
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=0.001, weight_rgbper=0.01,
        weight_tv_density=0.0, weight_tv_k0=0.0, N_rand=n_rand))
    rk = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)
    results = {}
    for topk in (48, 0):
        model.sweep_color_topk = topk
        optimizer = MaskedAdam({
            "density": {"lr": 1e-1, "skip_zero_grad": True},
            "k0": {"lr": 1e-1, "skip_zero_grad": True},
            "rgbnet": {"lr": 1e-3}}, lr_decay_factor=0.1 ** (1 / 20000))
        for label, sizes, seg in [
                ("full", (bp, bu, bv), None),
                ("96x96", (bp, 96, 96), bk.get((96, 96))),
                ("64x64", (bp, 64, 64), bk.get((64, 64)))]:
            if label != "full" and (seg is None or seg[0].shape[0] == 0):
                log(f"ab_topk: class {label} empty on this pool; skipped")
                continue
            step = make_train_step(model, optimizer, cfg_train, rk,
                                   apply_tv=False, tv_dense=False,
                                   axis=axis, clip_sizes=sizes, n_steps=1,
                                   donate=True)
            params = jax.tree_util.tree_map(jnp.copy, model.params)
            opt_state = optimizer.init(model.params)

            def draw():
                if seg is None:
                    sel = g[rng.integers(0, g.size, n_rand)]
                    off = np.asarray([bpo, buo, bvo], np.int32)
                else:
                    idx, ulo, vlo = seg
                    r = int(rng.integers(0, idx.shape[0]))
                    sel = g[idx[r]]
                    eu, ev = sizes[1], sizes[2]
                    off = np.asarray(
                        [bpo, min(max(int(ulo[r]), buo), buo + bu - eu),
                         min(max(int(vlo[r]), bvo), bvo + bv - ev)],
                        np.int32)
                return sel.astype(np.int32), off
            batches = [draw() for _ in range(iters + 1)]
            t0 = time.time()
            params, opt_state, loss, _ = step(
                params, model.mask, opt_state, pool,
                jnp.asarray(batches[0][0]), jnp.asarray(batches[0][1]))
            log(f"ab_topk: topk={topk} {label} compile+first "
                f"{time.time()-t0:.1f}s")
            t0 = time.time()
            for i in range(iters):
                sel, off = batches[i + 1]
                params, opt_state, loss, _ = step(
                    params, model.mask, opt_state, pool,
                    jnp.asarray(sel), jnp.asarray(off))
            float(jnp.sum(loss))
            dt = (time.time() - t0) / iters * 1000
            results[f"topk{topk}_{label}_ms"] = round(dt, 2)
            log(f"ab_topk: topk={topk} class {label} {dt:.2f} ms/iter")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
