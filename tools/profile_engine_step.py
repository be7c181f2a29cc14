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


if __name__ == "__main__":
    main()
