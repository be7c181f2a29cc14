#!/usr/bin/env python
"""Benchmark: fine-stage (lego-scale) render latency and train throughput.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: 800x800 render seconds/frame on a 160^3 fine model — the
reference's headline inference number is 0.36-0.07 s/frame on an RTX 2080 Ti
(README.md:7, BASELINE.md). vs_baseline = reference_best / ours (>1 = faster
than the reference's best GPU number). Train-step throughput and a projected
lego fine-stage wall-clock go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_fine_model():
    import jax.numpy as jnp
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.data.synthetic import teacher_grids

    model = DirectVoxGO(
        xyz_min=[-1.0, -1.0, -1.0], xyz_max=[1.0, 1.0, 1.0],
        num_voxels=160 ** 3, num_voxels_base=160 ** 3,
        alpha_init=1e-2, fast_color_thres=1e-4,
        rgbnet_dim=12, rgbnet_direct=True, rgbnet_depth=3, rgbnet_width=128,
        k_density=256, k_color=64)
    # Populate with a realistic occupancy pattern (the fixture blobs at grid
    # resolution) so free-space skipping / early termination behave like a
    # trained scene rather than an empty or solid grid.
    density, rgb = teacher_grids(model.world_size[0])
    # teacher grid is cubic; broadcast-resample to the actual world_size
    from directvoxgo_tpu.ops.grid import resize_trilinear
    density = np.asarray(resize_trilinear(jnp.asarray(density),
                                          model.world_size))
    model.params["density"] = jnp.asarray(density)
    rng = np.random.default_rng(0)
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.3, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()
    occ = float(np.asarray(model.mask).mean())
    log(f"bench: world_size={model.world_size} mask occupancy={occ:.3f}")
    return model


def bench_render(model, H=800, W=800, frames=3, chunk=65536):
    import jax
    from directvoxgo_tpu.engine.render import (make_render_fn,
                                               render_rays_chunked)
    from directvoxgo_tpu import rays as ray_lib
    from directvoxgo_tpu.data.load_blender import pose_spherical

    focal = 0.5 * W / np.tan(0.5 * 0.6911)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    render_kwargs = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5,
                         inverse_y=False)
    render_fn = make_render_fn(model, render_kwargs)

    def one_frame(theta):
        c2w = pose_spherical(theta, -30.0, 4.0)[:3, :4]
        rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
            H, W, K, c2w, ndc=False, inverse_y=False,
            flip_x=False, flip_y=False)
        return render_rays_chunked(
            render_fn, model, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            viewdirs.reshape(-1, 3), chunk)

    # warmup / compile
    t0 = time.time()
    one_frame(0.0)
    log(f"bench: render compile+first frame {time.time()-t0:.2f}s")
    times = []
    for i in range(frames):
        t0 = time.time()
        rgb, dep = one_frame(10.0 * (i + 1))
        times.append(time.time() - t0)
    sec = float(np.median(times))
    log(f"bench: render {H}x{W} median {sec*1000:.1f} ms/frame "
        f"(times: {[f'{t*1000:.0f}' for t in times]})")
    return sec


def bench_train(model, n_rand=8192, iters=50):
    import jax
    import jax.numpy as jnp
    from directvoxgo_tpu.optim import MaskedAdam

    optimizer = MaskedAdam({
        "density": {"lr": 1e-1, "skip_zero_grad": True},
        "k0": {"lr": 1e-1, "skip_zero_grad": True},
        "rgbnet": {"lr": 1e-3},
    }, lr_decay_factor=0.1 ** (1 / 20000))
    opt_state = optimizer.init(model.params)

    rng = np.random.default_rng(0)
    rays_o = np.tile([[0.0, 0.0, 3.5]], (n_rand, 1)).astype(np.float32)
    rays_d = rng.normal(size=(n_rand, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)
    batch = tuple(jnp.asarray(x) for x in (rays_o, rays_d, viewdirs, target))

    @jax.jit
    def step(params, mask, opt_state, rays_o, rays_d, viewdirs, target):
        def loss_fn(params):
            ret = model.forward(params, mask, rays_o, rays_d, viewdirs,
                                near=2.0, far=6.0, bg=1.0, stepsize=0.5)
            mse = jnp.mean((ret["rgb_marched"] - target) ** 2)
            pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
            ent = -jnp.mean(pout * jnp.log(pout)
                            + (1 - pout) * jnp.log(1 - pout))
            rgbper = jnp.sum((ret["raw_rgb"] - target[:, None, :]) ** 2, -1)
            rl = jnp.sum(rgbper * jax.lax.stop_gradient(ret["weights"])) \
                / n_rand
            return mse + 0.001 * ent + 0.01 * rl
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params, new_opt = optimizer.update(params, grads, opt_state)
        return new_params, new_opt, loss

    params, mask = model.params, model.mask
    t0 = time.time()
    params, opt_state, loss = step(params, mask, opt_state, *batch)
    jax.block_until_ready(loss)
    log(f"bench: train compile+first step {time.time()-t0:.2f}s")
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, mask, opt_state, *batch)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / iters
    log(f"bench: train step {dt*1000:.2f} ms/iter ({1/dt:.1f} it/s, "
        f"N_rand={n_rand})")
    log(f"bench: projected 20k-iter fine stage: {dt*20000/60:.2f} min")
    return dt


def main():
    import jax
    log(f"bench: devices {jax.devices()}")
    model = build_fine_model()
    train_dt = bench_train(model)
    render_sec = bench_render(model)
    baseline = 0.07  # best published reference render latency (README.md:7)
    print(json.dumps({
        "metric": "render_800x800_fine160_secs_per_frame",
        "value": round(render_sec, 5),
        "unit": "s/frame",
        "vs_baseline": round(baseline / render_sec, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
