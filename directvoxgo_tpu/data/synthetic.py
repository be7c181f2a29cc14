"""Procedural synthetic scene fixture (no external dataset needed).

The reference repo carries no test data; its regression oracle is PSNR on the
real nerf_synthetic scenes (IMPROVING_LOG.md). For hermetic tests and
benchmarks we generate a ground-truth dataset from an analytic voxel "teacher"
scene rendered with the same volume-rendering math the framework implements
(sample -> raw2alpha -> cumprod compositing), so a trained model can be
validated end-to-end: training on these images must drive PSNR up.

Scene: a soft-edged colored blob cluster inside [-1, 1]^3, cameras on a
blender-style orbit (radius 4, near 2, far 6, white or black background).
"""

from __future__ import annotations

import os

import numpy as np

from .. import rays as ray_lib
from .load_blender import pose_spherical

# Fixture GT generation is OUTAGE-PROOF (round-4 postmortem: the headline
# run died inside fixture generation when the remote device->host fetch
# path degraded to ~2 KB/s, PERF_LOG "tunnel outage"):
#   * device policy (DVGO_FIXTURE_DEVICE): "auto" (default) probes the
#     accelerator's fetch path with a small bounded pull and falls back to
#     the host CPU backend if it is degraded/absent; "cpu" forces the CPU
#     backend; "default" forces the attached accelerator.
#   * big renders checkpoint PER VIEW to <cache>.partial.npz, so an outage
#     costs only the views not yet pulled and a rerun resumes.
_FIXTURE_DEVICE = None


def _probe_device_fetch(dev, timeout_s=30.0, min_mb_s=0.05):
    """True if a 256 KB device->host pull completes at a usable rate.
    Runs in a daemon thread: a dead tunnel can block a fetch indefinitely
    and jax has no fetch timeout."""
    import threading
    import time

    import jax
    ok = [False]

    def work():
        # host-built array: device_put + pull only — a jnp.zeros here
        # would trigger a remote XLA compile (~100 s on a cold service)
        # and eat the whole probe budget.
        np.asarray(jax.device_put(np.zeros((256, 256), np.float32),
                                  dev))  # warm the put path / lazy init
        t0 = time.time()
        np.asarray(jax.device_put(np.ones((256, 256), np.float32), dev))
        dt = max(time.time() - t0, 1e-9)
        ok[0] = (0.25 / dt) >= min_mb_s

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok[0]


def _fixture_device():
    global _FIXTURE_DEVICE
    if _FIXTURE_DEVICE is None:
        import jax
        policy = os.environ.get("DVGO_FIXTURE_DEVICE", "auto")
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:  # JAX_PLATFORMS excludes cpu
            cpu = jax.devices()[0]
        acc = jax.devices()[0]
        if policy == "cpu" or acc == cpu:
            _FIXTURE_DEVICE = cpu
        elif policy == "default":
            _FIXTURE_DEVICE = acc
        else:  # auto
            if _probe_device_fetch(acc):
                _FIXTURE_DEVICE = acc
            else:
                print("synthetic: accelerator fetch path degraded — "
                      "rendering fixture GT on the host CPU backend")
                _FIXTURE_DEVICE = cpu
    return _FIXTURE_DEVICE


# Durable cache fallback: /tmp does not survive across sessions, so big
# fixtures (the 46x400^2 lego-sparse GT, the fern-scale NDC GT) are also
# looked up in (and written to) a repo-local directory that does.
_REPO_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                           "fixture_cache")


def _cache_load(cache_path):
    """Load a cached GT stack from cache_dir or the durable repo cache."""
    for path in (cache_path,
                 os.path.join(_REPO_CACHE, os.path.basename(cache_path))):
        if path and os.path.isfile(path):
            with np.load(path) as z:
                return z["images"].astype(np.float32)
    return None


def _render_views_resumable(render_one, n_total, cache_path,
                            checkpoint_every=4):
    """Render ``n_total`` views via ``render_one(i)``, checkpointing
    partial progress to ``<cache_path>.partial.npz`` so a mid-generation
    outage (the round-4 failure mode) costs only the un-pulled views and
    a rerun resumes instead of starting over."""
    partial_path = (cache_path + ".partial.npz") if cache_path else None
    done, views = 0, []
    if partial_path and os.path.isfile(partial_path):
        try:
            with np.load(partial_path) as z:
                arr = z["images"]
            views = [arr[i] for i in range(arr.shape[0])]
            done = len(views)
            print(f"synthetic: resuming fixture render at view "
                  f"{done}/{n_total} ({partial_path})")
        except Exception:
            done, views = 0, []
    for i in range(done, n_total):
        views.append(np.asarray(render_one(i), np.float32))
        if partial_path and (i + 1) % checkpoint_every == 0 \
                and i + 1 < n_total:
            os.makedirs(os.path.dirname(partial_path), exist_ok=True)
            tmp = partial_path + ".tmp"
            with open(tmp, "wb") as f:  # open handle: savez would append
                np.savez(f, images=np.stack(views, 0)  # .npz to the name
                         .astype(np.float16))
            os.replace(tmp, partial_path)
    images = np.stack(views, 0).astype(np.float32)
    if partial_path and os.path.isfile(partial_path):
        os.remove(partial_path)
    return images


def _cache_save(cache_path, images):
    """Write the GT stack (f16 — GT quantization ceiling ~69 dB, far above
    any train/test PSNR here) to the session cache AND the durable repo
    cache when that directory exists."""
    compact = images.astype(np.float16)
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    np.savez_compressed(cache_path, images=compact)
    if os.path.isdir(_REPO_CACHE):
        np.savez_compressed(
            os.path.join(_REPO_CACHE, os.path.basename(cache_path)),
            images=compact)


def teacher_grids(resolution=64, variant="blobs"):
    """Analytic density/rgb voxel grids for the fixture scene.

    ``variant``:
      * "blobs" (default, frozen — golden tests depend on it): three broad
        gaussian blobs whose tails span most of the volume. Adversarial
        for free-space machinery (the occupancy bbox is the whole grid).
      * "lego": seven compact, sharp-edged primitives inside ~55% of the
        extent — occupancy statistics like the real lego scene (a tight
        coarse-geometry bbox and ~5-10%% of fine voxels above threshold),
        so clip boxes and windows engage the way they do on the
        reference's headline benchmark.
    """
    lin = np.linspace(-1.0, 1.0, resolution, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    density = np.full_like(x, -6.0)
    if variant == "lego":
        blobs = [
            ((0.30, 0.10, -0.15), 0.20, 14.0, (0.9, 0.75, 0.2)),
            ((-0.28, 0.18, -0.05), 0.17, 14.0, (0.75, 0.2, 0.15)),
            ((0.05, -0.30, 0.10), 0.19, 14.0, (0.2, 0.55, 0.85)),
            ((0.02, 0.25, 0.28), 0.14, 14.0, (0.3, 0.8, 0.3)),
            ((-0.20, -0.22, -0.30), 0.15, 14.0, (0.85, 0.4, 0.1)),
            ((0.33, -0.12, 0.30), 0.12, 14.0, (0.6, 0.6, 0.65)),
            ((-0.05, 0.02, -0.02), 0.22, 14.0, (0.5, 0.5, 0.2)),
        ]
        sharp = 6.0  # steep falloff: tails die within ~r/2
    else:
        blobs = [
            ((0.35, 0.0, 0.0), 0.35, 9.0, (0.9, 0.2, 0.2)),
            ((-0.3, 0.25, 0.1), 0.28, 9.0, (0.2, 0.8, 0.3)),
            ((0.0, -0.3, -0.25), 0.30, 9.0, (0.25, 0.35, 0.95)),
        ]
        sharp = 2.0
    rgb_num = np.zeros((*x.shape, 3), np.float32)
    w_sum = np.zeros_like(x)
    for (cx, cy, cz), r, peak, color in blobs:
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        if sharp == 2.0:  # bit-exact original form (frozen goldens)
            w = np.exp(-d2 / (2 * (r / 2) ** 2)).astype(np.float32)
        else:
            w = np.exp(-(d2 / (r / 2) ** 2) ** (sharp / 2)
                       / 2).astype(np.float32)
        density = np.maximum(density, peak * w - 6.0)
        rgb_num += w[..., None] * np.asarray(color, np.float32)
        w_sum += w
    rgb = rgb_num / np.maximum(w_sum[..., None], 1e-6)
    return density, rgb


def _render_view(density, rgb, H, W, K, c2w, near, far, bg, n_samples=192,
                 scene_box=None):
    """Reference-math volume render of the teacher grids (numpy).

    ``scene_box`` ((min3, max3)) places the teacher volume in world space
    (default [-1, 1]^3)."""
    box_min, box_max = scene_box if scene_box is not None \
        else (np.full(3, -1.0), np.full(3, 1.0))
    box_min = np.asarray(box_min, np.float32)
    box_max = np.asarray(box_max, np.float32)
    rays_o, rays_d, viewdirs = ray_lib.get_rays_of_a_view(
        H, W, K, c2w, ndc=False, inverse_y=False, flip_x=False, flip_y=False)
    ro_all = rays_o.reshape(-1, 3).astype(np.float32)
    vd_all = viewdirs.reshape(-1, 3).astype(np.float32)
    t = np.linspace(near, far, n_samples, dtype=np.float32)

    res = density.shape[0]
    voxel = float(box_max[0] - box_min[0]) / res
    interval = (far - near) / n_samples / voxel  # in voxel units
    scale = (res - 1) / (box_max - box_min)

    # Chunked over rays: the [N, S, 3] point tensors at high resolutions
    # would otherwise allocate multiple GB and thrash (measured 129 s for
    # one 400^2 view unchunked vs ~2 s chunked). Teacher grids are sampled
    # TRILINEARLY: nearest sampling renders view-dependent voxel-staircase
    # aliasing at high image resolutions, which no trilinear radiance field
    # can generalize across views (a 400^2 lego-schedule run hit train 46 /
    # test 23 dB on the nearest-sampled GT). The trilinear render runs as a
    # jitted XLA chunk function (device if one is attached, multithreaded
    # CPU otherwise) — the 8-corner numpy fancy-index version measured
    # ~45 s/view at 400^2 (a 46-view fixture took >30 min to build).
    fields = np.concatenate([density[..., None], rgb], -1)
    chunk = 65536
    render_chunk = _teacher_chunk_renderer(res, n_samples)
    import jax
    import jax.numpy as jnp
    dev = _fixture_device()
    put = lambda a: jax.device_put(jnp.asarray(a), dev)  # noqa: E731
    fields_j = put(fields)
    n = ro_all.shape[0]
    n_pad = (n + chunk - 1) // chunk * chunk
    ro_p = np.concatenate([ro_all, np.zeros((n_pad - n, 3), np.float32)])
    vd_p = np.concatenate([vd_all, np.ones((n_pad - n, 3), np.float32)])
    outs = [render_chunk(fields_j, put(ro_p[lo:lo + chunk]),
                         put(vd_p[lo:lo + chunk]), put(t),
                         put(box_min), put(box_max),
                         put(np.float32(interval)), put(np.float32(bg)))
            for lo in range(0, n_pad, chunk)]
    out = np.concatenate([np.asarray(o) for o in outs])[:n]
    return out.reshape(H, W, 3)


_TEACHER_RENDERERS = {}


def _teacher_chunk_renderer(res, n_samples):
    """Jitted trilinear+compositing chunk renderer (cached per shape)."""
    key = (res, n_samples)
    if key in _TEACHER_RENDERERS:
        return _TEACHER_RENDERERS[key]
    import jax
    import jax.numpy as jnp

    @jax.jit
    def render_chunk(fields, ro, vd, t, box_min, box_max, interval, bg):
        pts = ro[:, None, :] + vd[:, None, :] * t[None, :, None]
        scale = (res - 1) / (box_max - box_min)
        idx = (pts - box_min) * scale
        inb = jnp.all((pts >= box_min) & (pts <= box_max), -1)
        i0 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, res - 2)
        f = jnp.clip(idx - i0, 0.0, 1.0)
        v = jnp.zeros((*pts.shape[:2], 4), jnp.float32)
        for dx in (0, 1):
            wx = f[..., 0] if dx else 1.0 - f[..., 0]
            for dy in (0, 1):
                wy = f[..., 1] if dy else 1.0 - f[..., 1]
                for dz in (0, 1):
                    wz = f[..., 2] if dz else 1.0 - f[..., 2]
                    corner = fields[i0[..., 0] + dx, i0[..., 1] + dy,
                                    i0[..., 2] + dz]
                    v = v + (wx * wy * wz)[..., None] * corner
        d, c = v[..., 0], v[..., 1:]
        alpha = 1.0 - jnp.exp(-jnp.log1p(jnp.exp(d)) * interval)
        alpha = jnp.where(inb, alpha, 0.0)
        one_minus = 1.0 - alpha + 1e-10
        t_excl = jnp.cumprod(one_minus, -1) / one_minus
        weights = t_excl * alpha
        alphainv_last = jnp.prod(one_minus, -1)
        return (weights[..., None] * c).sum(1) \
            + alphainv_last[..., None] * bg

    _TEACHER_RENDERERS[key] = render_chunk
    return render_chunk


def make_ndc_fixture_dataset(n_train=12, n_val=2, n_test=3, H=64, W=64,
                             teacher_res=64, seed=0,
                             cache_dir="/tmp/dvgo_fixture_cache"):
    """Forward-facing (LLFF-style) procedural fixture for the NDC/DMPIGO
    pipeline. ``ndc_rays`` puts the near plane at world z = -1 (the LLFF
    convention: cameras near z = 0 looking down -z, content beyond the near
    plane), so cameras sit on the z≈0 plane with small x/y offsets and the
    teacher blobs live in [-1.2, 1.2]^2 x [-3.4, -1.0]. ``near``/``far``
    are the NDC 0/1 (load_data.py:119-121); the training pipeline
    reparameterizes rays via ``ndc_rays`` itself."""
    rng = np.random.default_rng(seed)
    density, rgb = teacher_grids(teacher_res)
    scene_box = (np.array([-1.2, -1.2, -3.4], np.float32),
                 np.array([1.2, 1.2, -1.0], np.float32))
    focal = 0.8 * W
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)

    n_total = n_train + n_val + n_test
    poses = []
    for i in range(n_total):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = rng.uniform(-0.25, 0.25)
        c2w[1, 3] = rng.uniform(-0.25, 0.25)
        c2w[2, 3] = rng.uniform(-0.05, 0.05)
        poses.append(c2w)
    poses = np.stack(poses, 0)

    # GT images are WORLD-space renders (NDC is a model-side ray
    # reparameterization, not a scene change). Disk-cached like the
    # perspective fixture — a fern-scale (756x1008 x 20-view) fixture
    # costs minutes of raymarching.
    cache_path = None
    if cache_dir:
        key = f"ndc_{n_train}_{n_val}_{n_test}_{H}_{W}_{teacher_res}_" \
              f"{seed}_v1"
        cache_path = os.path.join(cache_dir, f"fixture_{key}.npz")
    images = _cache_load(cache_path) if cache_path else None
    if images is None:
        images = _render_views_resumable(
            lambda i: _render_view(density, rgb, H, W, K, poses[i][:3, :4],
                                   0.5, 4.5, 0.0, n_samples=256,
                                   scene_box=scene_box),
            n_total, cache_path)
        if cache_path:
            _cache_save(cache_path, images)

    idx = np.arange(n_total)
    render_poses = []
    for t in np.linspace(-0.2, 0.2, 8):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = t
        render_poses.append(c2w)
    render_poses = np.stack(render_poses, 0)
    return {
        "hwf": [H, W, focal],
        "HW": np.array([[H, W]] * n_total),
        "Ks": np.repeat(K[None], n_total, 0),
        "near": 0.0, "far": 1.0,
        "i_train": idx[:n_train],
        "i_val": idx[n_train:n_train + n_val],
        "i_test": idx[n_train + n_val:],
        "poses": poses[:, :3, :4].astype(np.float32),
        "render_poses": render_poses[:, :3, :4].astype(np.float32),
        "images": images,
        "irregular_shape": False,
    }


def make_synthetic_dataset(n_train=16, n_val=2, n_test=4, H=64, W=64,
                           teacher_res=64, white_bkgd=True, seed=0,
                           variant="blobs",
                           cache_dir="/tmp/dvgo_fixture_cache"):
    """Build a data_dict with the same keys as load_everything
    (lib/load_data.py:188-218).

    Rendered GT images are cached on disk keyed by all generation params
    (the reference's loaders cache derived data the same way: the lrsr
    pickle cache lib/load_blender.py:110-117, the LLFF _minify image cache)
    — a 400^2 x 30-view fixture costs minutes of host raymarching."""
    rng = np.random.default_rng(seed)
    near, far = 2.0, 6.0
    bg = 1.0 if white_bkgd else 0.0
    focal = 0.8 * W
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)

    n_total = n_train + n_val + n_test
    thetas = np.linspace(-180, 180, n_total, endpoint=False) \
        + rng.uniform(-2, 2, n_total)
    phis = -30.0 + 12.0 * np.sin(np.linspace(0, 3 * np.pi, n_total)) \
        + rng.uniform(-2, 2, n_total)
    poses = np.stack([pose_spherical(t, p, 4.0)
                      for t, p in zip(thetas, phis)], 0)

    cache_path = None
    if cache_dir:
        key = f"{n_train}_{n_val}_{n_test}_{H}_{W}_{teacher_res}_" \
              f"{int(white_bkgd)}_{seed}_v2" \
              + (f"_{variant}" if variant != "blobs" else "")
        cache_path = os.path.join(cache_dir, f"fixture_{key}.npz")
    images = _cache_load(cache_path) if cache_path else None
    if images is None:
        density, rgb = teacher_grids(teacher_res, variant=variant)
        images = _render_views_resumable(
            lambda i: _render_view(density, rgb, H, W, K,
                                   poses[i][:3, :4], near, far, bg),
            n_total, cache_path)
        if cache_path:
            _cache_save(cache_path, images)

    idx = np.arange(n_total)
    render_poses = np.stack([pose_spherical(t, -30.0, 4.0)
                             for t in np.linspace(-180, 180, 10,
                                                  endpoint=False)], 0)
    return {
        "hwf": [H, W, focal],
        "HW": np.array([[H, W]] * n_total),
        "Ks": np.repeat(K[None], n_total, 0),
        "near": near, "far": far,
        "i_train": idx[:n_train],
        "i_val": idx[n_train:n_train + n_val],
        "i_test": idx[n_train + n_val:],
        "poses": poses[:, :3, :4].astype(np.float32),
        "render_poses": render_poses[:, :3, :4].astype(np.float32),
        "images": images,
        "irregular_shape": False,
    }
