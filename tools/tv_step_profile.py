#!/usr/bin/env python
"""Decompose the TV-on train-step cost at the fern-scale NDC grid.

The realized fern run paces 72.8 ms/iter while bench_dmpigo's TV-free
step times 9 ms on the same grid/classes — and the LLFF schedule applies
TV on EVERY step (reference run.py:389-395; llff_default tv_before=1e9),
which our engine runs with region mode OFF (full-size grads + full-grid
Adam, engine/train.py make_train_step). This tool times one windowed
class under each TV configuration to locate the gap:

  base        apply_tv=False (region-sliced Adam)          — bench arm
  sparse      apply_tv, tv_dense=False, tv on density+k0   — iters >=10k
  dense       apply_tv, tv_dense=True,  tv on density+k0   — iters <10k
  sparse_d    sparse, weight_tv_k0=0 (density only)
  dense_d     dense,  weight_tv_k0=0

One JSON line to stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(iters=20, n_rand=4096):
    import jax
    import jax.numpy as jnp
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_dmpigo", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "bench_dmpigo.py"))
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu.config import ConfigDict

    model = bd.build_model()
    ro, rd, vd, rgb = bd.ndc_pool(model)
    bk = sweep_ops.build_ray_segments_2d(
        ro, rd, model.xyz_min, model.xyz_max, model.world_size, 2,
        n_rand=n_rand)
    perm = sweep_ops._PERMS[2]
    gp, gu, gv = (int(model.world_size[a]) for a in perm)
    # the biggest proper window class on this pool
    wins = [(k, v) for k, v in bk.items()
            if k != (0, 0) and 0 < k[0] < gu and 0 < k[1] < gv
            and v[0].size > 0]
    (wu, wv), (idx, ulo, vlo) = max(wins, key=lambda kv: kv[1][0].size)
    log(f"tv_profile: class ({wu},{wv}) of grid ({gp},{gu},{gv})")
    rng = np.random.default_rng(1)
    render_kwargs = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0)
    arms = {
        "base": (False, False, 1e-5, 1e-5),
        "sparse": (True, False, 1e-5, 1e-5),
        "dense": (True, True, 1e-5, 1e-5),
        "sparse_d": (True, False, 1e-5, 0.0),
        "dense_d": (True, True, 1e-5, 0.0),
    }
    out = {}
    for name, (atv, dns, wd, wk) in arms.items():
        cfg_train = ConfigDict(
            N_rand=n_rand, weight_main=1.0, weight_entropy_last=0.001,
            weight_rgbper=0.01, weight_tv_density=wd, weight_tv_k0=wk,
            lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1,
            lrate_rgbnet=1e-3, skip_zero_grad_fields=["density", "k0"])
        optimizer = train_lib.create_optimizer_or_freeze_model(
            model, cfg_train)
        step = train_lib.make_train_step(
            model, optimizer, cfg_train, render_kwargs, apply_tv=atv,
            tv_dense=dns, axis=2, clip_sizes=(gp, wu, wv), donate=True)
        r = int(rng.integers(0, idx.shape[0]))
        sel = idx[r]
        off = jnp.asarray(np.asarray(
            [0, min(int(ulo[r]), gu - wu), min(int(vlo[r]), gv - wv)],
            np.int32))
        pool = {"rays_o": jnp.asarray(ro[sel]),
                "rays_d": jnp.asarray(rd[sel]),
                "viewdirs": jnp.asarray(vd[sel]),
                "rgb": jnp.asarray(rgb[sel])}
        selj = jnp.arange(n_rand, dtype=jnp.int32)
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        opt_state = optimizer.init(model.params)
        t0 = time.time()
        params, opt_state, loss, psnr = step(
            params, model.mask, opt_state, pool, selj, off)
        jax.block_until_ready(loss)
        log(f"tv_profile: {name} compile+first {time.time()-t0:.1f}s "
            f"loss={float(loss):.4f}")
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, loss, psnr = step(
                params, model.mask, opt_state, pool, selj, off)
        float(jnp.sum(loss))
        dt = (time.time() - t0) / iters * 1000
        out[f"{name}_ms"] = round(dt, 2)
        log(f"tv_profile: {name} {dt:.2f} ms/iter")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
