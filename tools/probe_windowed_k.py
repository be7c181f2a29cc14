#!/usr/bin/env python
"""Does step-batching (lax.scan over K steps) pay WITH segment-window clips
at the big-grid e2e shape? Round-2 measured scanning HURTS for full-grid
steps at 160^3 (31->40 ms: worse aliasing of region updates); windowed steps
are ~22 ms device vs the ~27 ms tunnel dispatch floor, so K>1 may now win.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def main():
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu import rays as ray_lib
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu.config import Config, ConfigDict

    cfg = Config.fromfile("configs/synthetic/fixture_lego.py")
    data = load_data(cfg.data)
    model = ckpt_lib.load_model(
        DirectVoxGO, "logs/synthetic/fixture_lego/fine_last.tar")
    model.sweep_color_topk = 48
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    rgb, ro, rd, vd, _ = ray_lib.get_training_rays_flatten(
        rgb_tr_ori=images, train_poses=data["poses"][i_train],
        HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)
    rgb = np.asarray(rgb).reshape(-1, 3)
    ro = np.asarray(ro).reshape(-1, 3)
    rd = np.asarray(rd).reshape(-1, 3)
    vd = np.asarray(vd).reshape(-1, 3)
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    n_rand = 8192
    cfg_train = ConfigDict(
        N_rand=n_rand, weight_main=1.0, weight_entropy_last=0.001,
        weight_rgbper=0.01, weight_tv_density=0.0, weight_tv_k0=0.0,
        lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1, lrate_rgbnet=1e-3,
        skip_zero_grad_fields=["density", "k0"])
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    rk = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)
    pool = {"rgb": jnp.asarray(rgb), "rays_o": jnp.asarray(ro),
            "rays_d": jnp.asarray(rd), "viewdirs": jnp.asarray(vd)}
    rng = np.random.default_rng(0)

    axis = 0
    wv = 32
    gidx = np.flatnonzero(groups == axis)
    bk = sweep_ops.build_ray_segments(
        ro[gidx], rd[gidx], model.xyz_min, model.xyz_max,
        model.world_size, axis, n_rand=n_rand)
    idx, svlo, _ = bk[wv]
    perm = sweep_ops._PERMS[axis]
    gv = int(model.world_size[perm[2]])
    sizes = (int(model.world_size[perm[0]]),
             int(model.world_size[perm[1]]), wv)

    for K in (1, 2, 4, 8):
        step = train_lib.make_train_step(
            model, optimizer, cfg_train, rk, apply_tv=False,
            tv_dense=False, axis=axis, clip_sizes=sizes, donate=True,
            n_steps=K)
        rows = rng.integers(0, idx.shape[0], K)
        sels = np.stack([gidx[idx[r]] for r in rows])
        cos = np.stack([[0, 0, min(int(svlo[r]), gv - wv)] for r in rows])
        sels_j = jnp.asarray(sels if K > 1 else sels[0], jnp.int32)
        cos_j = jnp.asarray(cos if K > 1 else cos[0], jnp.int32)
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        opt_state = optimizer.init(model.params)
        t0 = time.time()
        out = step(params, model.mask, opt_state, pool, sels_j, cos_j)
        params, opt_state = out[0], out[1]
        float(jnp.sum(out[2]))
        log(f"K={K}: compile+first {time.time()-t0:.1f}s")
        iters = max(24 // K, 3)
        t0 = time.time()
        for _ in range(iters):
            out = step(params, model.mask, opt_state, pool, sels_j, cos_j)
            params, opt_state = out[0], out[1]
        float(jnp.sum(out[2]))
        dt = (time.time() - t0) / (iters * K)
        log(f"K={K}: {dt*1000:.2f} ms/optimizer-step "
            f"({iters} dispatches of {K})")


if __name__ == "__main__":
    main()
