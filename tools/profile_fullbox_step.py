#!/usr/bin/env python
"""Engine train step at the REAL e2e shape: the fixture_lego fine
checkpoint's full-grid (clip=None) sweep — the shape the bench blob's tight
clip box hides (trained mask occupancy ~40%, bbox = whole grid).

Usage: python tools/profile_fullbox_step.py [ckpt] [topk]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.config import ConfigDict
    from bench import _make_batches

    ckpt = sys.argv[1] if len(sys.argv) > 1 \
        else "logs/synthetic/fixture_lego/fine_last.tar"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    model = ckpt_lib.load_model(DirectVoxGO, ckpt)
    model.sweep_color_topk = topk
    print(f"occ={float(np.asarray(model.mask).mean()):.3f} topk={topk}",
          flush=True)
    n_rand = 8192
    cfg_train = ConfigDict(
        N_rand=n_rand, weight_main=1.0, weight_entropy_last=0.001,
        weight_rgbper=0.01, weight_tv_density=0.0, weight_tv_k0=0.0,
        lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1, lrate_rgbnet=1e-3,
        skip_zero_grad_fields=["density", "k0"])
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    rk = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)
    for axis in range(3):
        cs, co = model.sweep_clip_for_axis(axis)
        step = train_lib.make_train_step(
            model, optimizer, cfg_train, rk, apply_tv=False, tv_dense=False,
            axis=axis, clip_sizes=cs, donate=True)
        b = _make_batches(n_rand, axis, 1, seed=1)[0]
        pool = {"rays_o": jnp.asarray(b[0]), "rays_d": jnp.asarray(b[1]),
                "viewdirs": jnp.asarray(b[2]), "rgb": jnp.asarray(b[3])}
        sel = jnp.arange(n_rand, dtype=jnp.int32)
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        opt_state = optimizer.init(model.params)
        co = jnp.asarray(np.asarray(co))
        t0 = time.time()
        out = step(params, model.mask, opt_state, pool, sel, co)
        params, opt_state = out[0], out[1]
        print(f"axis {axis}: clip={cs} compile+first {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        for _ in range(20):
            params, opt_state, loss, psnr = step(
                params, model.mask, opt_state, pool, sel, co)
        float(loss)
        print(f"axis {axis}: step {(time.time()-t0)/20*1000:.2f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
