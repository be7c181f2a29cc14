#!/usr/bin/env python
"""Decompose the train-step backward at the bench shape (160^3, 8192 rays).

Round-2 decomposition (PERF_LOG.md): forward 7.6 ms, value_and_grad 22.5,
Adam 1.8, full step ~28-34. The backward (~15 ms) is the round-3 target;
this probe isolates its pieces on the real chip:

  A  forward_sweep only                         (baseline fwd)
  B  value_and_grad of the full loss            (the 22.5 ms)
  C  station_sweep fwd+bwd alone (vjp with a realistic-sparsity cotangent)
  D  value_and_grad with the grid channels stop_gradient'ed (MLP + alpha
     chain backward only)
  E  like B but loss uses density only (no MLP/color) -> alpha-chain bwd
  F  _sweep_bwd variants (dtype of the rhs multiply, etc.)

Timing: axon block_until_ready is a no-op -> sync via a scalar pull.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(fn, *args, iters=20, digest=sync):
    t0 = time.time()
    out = fn(*args)
    digest(out)
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    digest(out)
    dt = (time.time() - t0) / iters
    return comp, dt


def main():
    log("devices:", jax.devices())
    from bench import build_fine_model
    from directvoxgo_tpu.ops import sweep as sweep_ops

    model = build_fine_model()
    n_rand = 8192
    rng = np.random.default_rng(0)
    rays_o = np.tile([[0.0, 0.0, 3.5]], (n_rand, 1)).astype(np.float32)
    ang = rng.uniform(-0.3, 0.3, (n_rand, 2))
    rays_d = np.stack([np.tan(ang[:, 0]), np.tan(ang[:, 1]),
                       -np.ones(n_rand)], -1).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)
    rays_o, rays_d, viewdirs, target = map(jnp.asarray,
                                           (rays_o, rays_d, viewdirs, target))
    axis = 2
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    clip_off = jnp.asarray(clip_off)
    log(f"clip sizes={clip_sizes} off={list(np.asarray(clip_off))}")
    kw = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)

    params = model.params
    mask = model.mask

    # ---------------------------------------------------------------- A
    @jax.jit
    def fwd_only(params):
        ret = model.forward_sweep(params, mask, rays_o, rays_d, viewdirs,
                                  axis, clip_sizes=clip_sizes,
                                  clip_offsets=clip_off, **kw)
        return ret["rgb_marched"]

    comp, dt = timeit(fwd_only, params)
    log(f"A forward_sweep:                 {dt*1000:7.2f} ms (compile {comp:.0f}s)")

    def full_loss(params):
        ret = model.forward_sweep(params, mask, rays_o, rays_d, viewdirs,
                                  axis, clip_sizes=clip_sizes,
                                  clip_offsets=clip_off, **kw)
        mse = jnp.mean((ret["rgb_marched"] - target) ** 2)
        pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
        rgbper = jnp.sum((ret["raw_rgb_cl"] - target.T[:, :, None]) ** 2,
                         axis=0)
        rl = jnp.sum(rgbper * jax.lax.stop_gradient(ret["weights"])) / n_rand
        return mse + 0.001 * ent + 0.01 * rl

    # ---------------------------------------------------------------- B
    g_full = jax.jit(jax.value_and_grad(full_loss))
    comp, dt = timeit(g_full, params, digest=lambda o: float(o[0]))
    log(f"B value_and_grad full:           {dt*1000:7.2f} ms (compile {comp:.0f}s)")

    # ---------------------------------------------------------------- C
    # station_sweep fwd+bwd alone, cotangent shaped like the real one
    # (dense on density channel where mask>0, sparse on k0 where weights
    # pass the threshold -- here just a random sparse pattern).
    sdt = jnp.bfloat16
    chans = [params["density"].astype(sdt)[..., None],
             mask.astype(sdt)[..., None], params["k0"].astype(sdt)]
    grid_cat = jnp.concatenate(chans, axis=-1)

    def sweep_only(grid_cat):
        out = sweep_ops.sweep_samples(
            grid_cat, None, rays_o, rays_d,
            tuple(float(v) for v in model.xyz_min),
            tuple(float(v) for v in model.xyz_max), axis,
            stepsize=0.5, march_order=False,
            clip_sizes=clip_sizes, clip_offsets=clip_off)
        return out["vals"]

    fwd_sweep_j = jax.jit(sweep_only)
    comp, dt = timeit(fwd_sweep_j, grid_cat,
                      digest=lambda o: float(o[0, 0, 0]))
    log(f"C1 sweep_samples fwd:            {dt*1000:7.2f} ms (compile {comp:.0f}s)")

    vals = fwd_sweep_j(grid_cat)
    ct = (np.asarray(rng.uniform(0, 1, vals.shape), np.float32)
          * (rng.uniform(0, 1, vals.shape) < 0.08)).astype(np.float32)
    ct = jnp.asarray(ct)

    @jax.jit
    def sweep_vjp(grid_cat, ct):
        _, f_vjp = jax.vjp(sweep_only, grid_cat)
        return f_vjp(ct)[0]

    comp, dt = timeit(sweep_vjp, grid_cat, ct,
                      digest=lambda o: float(o[0, 0, 0, 0]))
    log(f"C2 sweep fwd+bwd:                {dt*1000:7.2f} ms (compile {comp:.0f}s)")

    # ---------------------------------------------------------------- D
    def loss_nogrid(params):
        p = dict(params)
        p["density"] = jax.lax.stop_gradient(p["density"])
        p["k0"] = jax.lax.stop_gradient(p["k0"])
        return full_loss(p)

    g_ng = jax.jit(jax.value_and_grad(loss_nogrid))
    comp, dt = timeit(g_ng, params, digest=lambda o: float(o[0]))
    log(f"D v&g grids stopped (MLP bwd):   {dt*1000:7.2f} ms (compile {comp:.0f}s)")

    # ---------------------------------------------------------------- E
    def loss_density_only(params):
        ret = model.forward_sweep(params, mask, rays_o, rays_d, viewdirs,
                                  axis, clip_sizes=clip_sizes,
                                  clip_offsets=clip_off, **kw)
        pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
        return jnp.sum(ret["weights"] ** 2) / n_rand + 0.001 * ent

    def loss_density_only_k0stop(params):
        p = dict(params)
        p["k0"] = jax.lax.stop_gradient(p["k0"])
        return loss_density_only(p)

    g_e = jax.jit(jax.value_and_grad(loss_density_only_k0stop))
    comp, dt = timeit(g_e, params, digest=lambda o: float(o[0]))
    log(f"E v&g density-only loss:         {dt*1000:7.2f} ms (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
