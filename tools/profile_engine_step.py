#!/usr/bin/env python
"""Time the SHIPPING engine train step (make_train_step, region-grad mode)
at the bench shape on the real chip — the number run.py actually sees."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os
    if os.environ.get("DVGO_COMPACT_GATHER"):
        from directvoxgo_tpu.ops import sweep as sweep_ops
        sweep_ops.COMPACT_GATHER = os.environ["DVGO_COMPACT_GATHER"]
        log("compact gather mode:", sweep_ops.COMPACT_GATHER)
    log("devices:", jax.devices())
    from bench import build_fine_model, _make_batches
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.config import ConfigDict

    model = build_fine_model()
    n_rand = 8192
    cfg_train = ConfigDict(
        N_rand=n_rand, weight_main=1.0, weight_entropy_last=0.001,
        weight_rgbper=0.01, weight_tv_density=0.0, weight_tv_k0=0.0,
        lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1,
        lrate_rgbnet=1e-3, skip_zero_grad_fields=["density", "k0"])
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    render_kwargs = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)

    for axis in range(3):
        clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
        step = train_lib.make_train_step(
            model, optimizer, cfg_train, render_kwargs, apply_tv=False,
            tv_dense=False, axis=axis, clip_sizes=clip_sizes, donate=True)
        b = _make_batches(n_rand, axis, 1, seed=1)[0]
        pool = {"rays_o": jnp.asarray(b[0]), "rays_d": jnp.asarray(b[1]),
                "viewdirs": jnp.asarray(b[2]), "rgb": jnp.asarray(b[3])}
        sel = jnp.arange(n_rand, dtype=jnp.int32)
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        opt_state = optimizer.init(model.params)
        co = jnp.asarray(clip_off)
        t0 = time.time()
        params, opt_state, loss, psnr = step(params, model.mask, opt_state,
                                             pool, sel, co)
        log(f"axis {axis}: clip={clip_sizes} compile+first "
            f"{time.time()-t0:.1f}s loss={float(loss):.4f}")
        t0 = time.time()
        iters = 30
        for _ in range(iters):
            params, opt_state, loss, psnr = step(params, model.mask,
                                                 opt_state, pool, sel, co)
        float(loss)
        log(f"axis {axis}: engine step {(time.time()-t0)/iters*1000:.2f} "
            f"ms/iter")




def scan_probe(num_voxels=None, K=8):
    """K=8 step batching at 160^3 with the region-grad step (round-2 found
    scan HURT at 160^3: 31 -> 40 ms; re-check after the restructure)."""
    import jax
    import jax.numpy as jnp
    from bench import build_fine_model, _make_batches
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.config import ConfigDict

    model = build_fine_model()
    if num_voxels is not None:
        from directvoxgo_tpu.ops.grid import resize_trilinear
        import jax.numpy as _j
        side = int(round(num_voxels ** (1 / 3)))
        model2 = type(model)(
            xyz_min=[-1.0, -1.0, -1.0], xyz_max=[1.0, 1.0, 1.0],
            num_voxels=num_voxels, num_voxels_base=num_voxels,
            alpha_init=1e-2, fast_color_thres=1e-4,
            rgbnet_dim=12, rgbnet_direct=True, rgbnet_depth=3,
            rgbnet_width=128)
        model2.params["density"] = resize_trilinear(
            model.params["density"], model2.world_size)
        model2.params["k0"] = _j.zeros((*model2.world_size, 12))
        model2.update_occupancy_cache()
        model = model2
    n_rand = 8192
    cfg_train = ConfigDict(
        N_rand=n_rand, weight_main=1.0, weight_entropy_last=0.001,
        weight_rgbper=0.01, weight_tv_density=0.0, weight_tv_k0=0.0,
        lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1,
        lrate_rgbnet=1e-3, skip_zero_grad_fields=["density", "k0"])
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    render_kwargs = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)
    axis = 2
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    step = train_lib.make_train_step(
        model, optimizer, cfg_train, render_kwargs, apply_tv=False,
        tv_dense=False, axis=axis, clip_sizes=clip_sizes, n_steps=K,
        donate=True)
    bs = _make_batches(n_rand, axis, 1, seed=1)[0]
    pool = {"rays_o": jnp.asarray(bs[0]), "rays_d": jnp.asarray(bs[1]),
            "viewdirs": jnp.asarray(bs[2]), "rgb": jnp.asarray(bs[3])}
    rng = np.random.default_rng(0)
    sels = jnp.asarray(
        np.stack([rng.permutation(n_rand) for _ in range(K)]), jnp.int32)
    params = jax.tree_util.tree_map(jnp.copy, model.params)
    opt_state = optimizer.init(model.params)
    co = jnp.asarray(clip_off)
    t0 = time.time()
    params, opt_state, losses, psnrs = step(params, model.mask, opt_state,
                                            pool, sels, co)
    log(f"scan K={K}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        params, opt_state, losses, psnrs = step(params, model.mask,
                                                opt_state, pool, sels, co)
    float(jnp.sum(losses))
    log(f"scan K={K}: {(time.time()-t0)/(reps*K)*1000:.2f} ms/step")


if __name__ == "__main__":
    if "--scan" in sys.argv:
        nv = None
        for a in sys.argv[1:]:
            if a.isdigit():
                nv = int(a) ** 3
        for K in (1, 8):
            scan_probe(num_voxels=nv, K=K)
        raise SystemExit
    main()
