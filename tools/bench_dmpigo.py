#!/usr/bin/env python
"""LLFF-shaped DMPIGO benchmark (fern-like): NDC z-sweep train step + render.

Shape follows configs/llff/llff_default.py (= the reference's): 4096-ray
batches, num_voxels=256^3 with mpi_depth=128 (world_size comes out
anisotropic, roughly [1039, 762, 128] for fern's 756x1008 aspect — here we
use the same aspect), fast_color_thres=1e-4, rgbnet_dim=9-ish per llff
default. Baselines (BASELINE.md): reference trains an LLFF scene in
~5.5 min/scene (IMPROVING_LOG.md:119-132) over 30k iters (coarse 0 +
fine 30000 per llff_default N_iters), renders 0.36 s-class frames.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_model():
    from directvoxgo_tpu.models.dmpigo import DirectMPIGO
    # fern-ish NDC bbox: xyz_min/max from compute_bbox_by_cam_frustrm on
    # NDC rays ~ [-1.5, -1.2, -1] .. [1.5, 1.2, 1] (aspect 1008/756 = 4:3).
    model = DirectMPIGO(
        xyz_min=[-1.5, -1.2, -1.0], xyz_max=[1.5, 1.2, 1.0],
        num_voxels=256 ** 3, mpi_depth=128,
        fast_color_thres=1e-4, rgbnet_dim=9, rgbnet_depth=3,
        rgbnet_width=64, viewbase_pe=0)
    # Occupancy like a trained forward-facing scene: most planes partially
    # occupied (LLFF content fills much of the frustum).
    rng = np.random.default_rng(0)
    d = np.asarray(model.params["density"])
    blobs = rng.normal(0, 1, (24, 3)) * [0.8, 0.6, 0.45] + [0, 0, -0.1]
    ws = model.world_size
    lin = [np.linspace(-1, 1, ws[i]) for i in range(3)]
    x, y, z = np.meshgrid(*lin, indexing="ij")
    dens = np.full(ws, -6.0, np.float32)
    for cx, cy, cz in blobs:
        d2 = ((x - cx) / 0.25) ** 2 + ((y - cy) / 0.25) ** 2 \
            + ((z - cz) / 0.3) ** 2
        dens = np.maximum(dens, 6.0 * np.exp(-d2).astype(np.float32) - 6.0)
    model.params["density"] = jnp.asarray(dens)
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.3, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()
    occ = float(np.asarray(model.mask).mean())
    log(f"dmpigo bench: world_size={model.world_size} occupancy={occ:.3f}")
    return model


def ndc_batch(model, n_rand, seed=0):
    """Random forward-facing rays through ndc_rays (LLFF pipeline)."""
    from directvoxgo_tpu import rays as ray_lib
    rng = np.random.default_rng(seed)
    H, W = 756, 1008
    focal = 815.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[0, 3] = rng.uniform(-0.1, 0.1)
    rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    sel = rng.integers(0, H * W, n_rand)
    flat = lambda a: np.asarray(a).reshape(-1, 3)[sel]  # noqa: E731
    target = rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)
    return tuple(jnp.asarray(v) for v in
                 (flat(rays_o), flat(rays_d), flat(viewdirs), target))


def ndc_pool(model, n_views=3, H=756, W=1008, seed=0):
    """Whole-image NDC ray pools from a few jittered forward-facing poses
    (what run.py's flatten gather feeds the engine for LLFF)."""
    from directvoxgo_tpu import rays as ray_lib
    rng = np.random.default_rng(seed)
    focal = 815.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    chunks = []
    for i in range(n_views):
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[:2, 3] = rng.uniform(-0.15, 0.15, 2)
        ro, rd, vd = ray_lib.get_rays_of_a_view(
            H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False,
            flip_y=False)
        chunks.append((ro.reshape(-1, 3), rd.reshape(-1, 3),
                       vd.reshape(-1, 3)))
    ro = np.concatenate([c[0] for c in chunks])
    rd = np.concatenate([c[1] for c in chunks])
    vd = np.concatenate([c[2] for c in chunks])
    rgb = rng.uniform(0, 1, (ro.shape[0], 3)).astype(np.float32)
    return ro, rd, vd, rgb


def bench_train(model, n_rand=4096, iters=30):
    """Engine-faithful step timing: batches drawn as 2D (u, v)-windowed
    image-tile segments (ops/sweep.build_ray_segments_2d — the engine's
    forced-axis draw path), blended by ray share, with the unwindowed full
    z-sweep as the fallback class."""
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu.config import ConfigDict
    cfg_train = ConfigDict(
        N_rand=n_rand, weight_main=1.0, weight_entropy_last=0.001,
        weight_rgbper=0.01, weight_tv_density=0.0, weight_tv_k0=0.0,
        lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1,
        lrate_rgbnet=1e-3, skip_zero_grad_fields=["density", "k0"])
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    render_kwargs = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0)
    ro, rd, vd, rgb = ndc_pool(model)
    bk = sweep_ops.build_ray_segments_2d(
        ro, rd, model.xyz_min, model.xyz_max, model.world_size, 2,
        n_rand=n_rand)
    perm = sweep_ops._PERMS[2]
    gp = int(model.world_size[perm[0]])
    gu = int(model.world_size[perm[1]])
    gv = int(model.world_size[perm[2]])
    share = {k: v[0].size / ro.shape[0] for k, v in bk.items()}
    log(f"dmpigo bench: 2D window classes {share}")
    rng = np.random.default_rng(1)
    blend_num = blend_den = 0.0
    for wuv, (idx, ulo, vlo) in sorted(
            bk.items(), key=lambda kv: -kv[1][0].size):
        # a 0 slot means full extent for that dim (ops/sweep
        # build_ray_segments_2d); (0, 0) is the unwindowed fallback
        wu = wuv[0] if 0 < wuv[0] < gu else gu
        wv = wuv[1] if 0 < wuv[1] < gv else gv
        if wuv == (0, 0) or (wu, wv) == (gu, gv):
            sizes, tag = None, "full"
            wu = wv = 0
        else:
            sizes, tag = (gp, wu, wv), f"{wu}x{wv}"
        step = train_lib.make_train_step(
            model, optimizer, cfg_train, render_kwargs, apply_tv=False,
            tv_dense=False, axis=2, clip_sizes=sizes, donate=True)
        r = int(rng.integers(0, idx.shape[0]))
        sel = idx[r]
        off = np.asarray(
            [0, min(int(ulo[r]), gu - wu) if wu else 0,
             min(int(vlo[r]), gv - wv) if wv else 0], np.int32)
        pool = {"rays_o": jnp.asarray(ro[sel]),
                "rays_d": jnp.asarray(rd[sel]),
                "viewdirs": jnp.asarray(vd[sel]),
                "rgb": jnp.asarray(rgb[sel])}
        selj = jnp.arange(n_rand, dtype=jnp.int32)
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        opt_state = optimizer.init(model.params)
        co = jnp.asarray(off)
        t0 = time.time()
        params, opt_state, loss, psnr = step(params, model.mask, opt_state,
                                             pool, selj, co)
        log(f"dmpigo bench: class {tag} compile+first {time.time()-t0:.1f}s"
            f" loss={float(loss):.4f}")
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, loss, psnr = step(
                params, model.mask, opt_state, pool, selj, co)
        float(loss)
        dt_c = (time.time() - t0) / iters
        log(f"dmpigo bench: class {tag} {dt_c*1000:.2f} ms/iter "
            f"(ray share {share[wuv]:.2f})")
        blend_num += share[wuv] * dt_c
        blend_den += share[wuv]
    dt = blend_num / max(blend_den, 1e-9)
    log(f"dmpigo bench: train blended {dt*1000:.2f} ms/iter "
        f"(N_rand={n_rand}, ray-share weighted)")
    log(f"dmpigo bench: projected 30k-iter llff stage: {dt*30000/60:.2f} min"
        f" (reference ~5.5 min/scene total, IMPROVING_LOG.md:119)")
    return dt


def bench_render(model, H=756, W=1008, iters=8, chunk=8192):
    """NDC render through the 2D-windowed chunked path.

    Goes through engine.render.render_rays_chunked so the bench measures
    exactly what run.py eval would: build_ray_segments_2d tiles the frame
    into (Wu, Wv) window classes and each chunk renders a composed clip box
    (engine/render._render_rays_windowed_2d). Reference class: ~0.36 s/frame
    LLFF renders on a 2080 Ti (IMPROVING_LOG.md:119-132)."""
    from directvoxgo_tpu.engine import render as render_lib
    from directvoxgo_tpu import rays as ray_lib
    focal = 815.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    rk = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0,
              inverse_y=False, flip_x=False, flip_y=False,
              render_depth=True)
    render_fn = render_lib.make_render_fn(model, rk)
    # Headline: the tiled frame path run.py eval actually uses (device
    # raygen + corner-ray tile windows + one batched pull); the chunked
    # path timed once for comparison — it pays ~95 per-chunk transfer
    # round trips on a remote device (7.7 s/frame measured r5).
    t0 = time.time()
    out = render_lib.render_frame_ndc_tiles(render_fn, model, H, W, K,
                                            c2w, rk, chunk=chunk)
    if out is not None:
        log(f"dmpigo bench: frame-tiles compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(iters):
            render_lib.render_frame_ndc_tiles(render_fn, model, H, W, K,
                                              c2w, rk, chunk=chunk)
        sec = (time.time() - t0) / iters
        log(f"dmpigo bench: render {H}x{W} frame-tiles {sec*1000:.1f} "
            "ms/frame (reference 0.36 s-class)")
        rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
            H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False,
            flip_y=False)
        ro = np.asarray(rays_o).reshape(-1, 3)
        rd = np.asarray(rays_d).reshape(-1, 3)
        vd = np.asarray(viewdirs).reshape(-1, 3)
        t0 = time.time()
        render_lib.render_rays_chunked(render_fn, model, ro, rd, vd, chunk)
        log(f"dmpigo bench: chunked comparison "
            f"{time.time()-t0:.1f} s/frame (cold)")
        return sec
    rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    ro = np.asarray(rays_o).reshape(-1, 3)
    rd = np.asarray(rays_d).reshape(-1, 3)
    vd = np.asarray(viewdirs).reshape(-1, 3)
    t0 = time.time()
    render_lib.render_rays_chunked(render_fn, model, ro, rd, vd, chunk)
    log(f"dmpigo bench: render compile+first frame {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        render_lib.render_rays_chunked(render_fn, model, ro, rd, vd, chunk)
    sec = (time.time() - t0) / iters
    log(f"dmpigo bench: render {H}x{W} chunk={chunk} {sec*1000:.1f} ms/frame "
        f"(2D-windowed sweep chunks; reference 0.36 s-class)")
    return sec


if __name__ == "__main__":
    log("devices:", jax.devices())
    model = build_model()
    bench_train(model)
    bench_render(model, chunk=8192)
    bench_render(model, chunk=4096)
