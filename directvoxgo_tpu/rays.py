"""Camera-to-ray generation and training-ray gathering.

Behavioral port of lib/ray_utils.py (reference), in numpy — ray precompute is
host-side one-time work; only the per-step batch slice goes to the device.
"""

from __future__ import annotations

import time

import numpy as np


def get_rays(H, W, K, c2w, inverse_y, flip_x, flip_y, mode="center"):
    """Pixel grid -> world-space ray origins and directions.

    Mirrors lib/ray_utils.py:9-47 including the two intrinsic conventions
    (``inverse_y``) and the optional pixel-center / jitter modes.
    """
    c2w = np.asarray(c2w, dtype=np.float32)
    K = np.asarray(K, dtype=np.float32)
    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    if mode == "lefttop":
        pass
    elif mode == "center":
        i, j = i + 0.5, j + 0.5
    elif mode == "random":
        i = i + np.random.rand(*i.shape).astype(np.float32)
        j = j + np.random.rand(*j.shape).astype(np.float32)
    else:
        raise NotImplementedError(mode)
    if flip_x:
        i = i[:, ::-1]
    if flip_y:
        j = j[::-1, :]
    if inverse_y:
        dirs = np.stack(
            [(i - K[0][2]) / K[0][0], (j - K[1][2]) / K[1][1], np.ones_like(i)], -1)
    else:
        dirs = np.stack(
            [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape).copy()
    return rays_o, rays_d


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Project rays into NDC space (forward-facing scenes).

    Mirrors lib/ray_utils.py:60-77.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return np.stack([o0, o1, o2], -1), np.stack([d0, d1, d2], -1)


def get_rays_of_a_view(H, W, K, c2w, ndc, inverse_y, flip_x, flip_y,
                       mode="center"):
    rays_o, rays_d = get_rays(H, W, K, c2w, inverse_y=inverse_y,
                              flip_x=flip_x, flip_y=flip_y, mode=mode)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    if ndc:
        rays_o, rays_d = ndc_rays(H, W, K[0][0], 1.0, rays_o, rays_d)
    return (rays_o.astype(np.float32), rays_d.astype(np.float32),
            viewdirs.astype(np.float32))


def get_training_rays(rgb_tr, train_poses, HW, Ks, ndc, inverse_y,
                      flip_x, flip_y):
    """Per-image ray tensors [n_img, H, W, 3] (lib/ray_utils.py:88-110)."""
    assert len(np.unique(HW, axis=0)) == 1
    assert len(np.unique(np.asarray(Ks).reshape(len(Ks), -1), axis=0)) == 1
    H, W = HW[0]
    K = Ks[0]
    n = len(rgb_tr)
    rays_o_tr = np.zeros([n, H, W, 3], np.float32)
    rays_d_tr = np.zeros([n, H, W, 3], np.float32)
    viewdirs_tr = np.zeros([n, H, W, 3], np.float32)
    for i, c2w in enumerate(train_poses):
        rays_o_tr[i], rays_d_tr[i], viewdirs_tr[i] = get_rays_of_a_view(
            H, W, K, c2w, ndc, inverse_y, flip_x, flip_y)
    imsz = [1] * n
    return rgb_tr, rays_o_tr, rays_d_tr, viewdirs_tr, imsz


def get_training_rays_flatten(rgb_tr_ori, train_poses, HW, Ks, ndc, inverse_y,
                              flip_x, flip_y):
    """Concat every image's rays into flat [N, 3] pools
    (lib/ray_utils.py:113-142; supports variable image sizes)."""
    eps = time.time()
    chunks_rgb, chunks_o, chunks_d, chunks_v, imsz = [], [], [], [], []
    for c2w, img, (H, W), K in zip(train_poses, rgb_tr_ori, HW, Ks):
        assert img.shape[:2] == (H, W)
        rays_o, rays_d, viewdirs = get_rays_of_a_view(
            H, W, K, c2w, ndc, inverse_y, flip_x, flip_y)
        chunks_rgb.append(np.asarray(img, np.float32).reshape(-1, 3))
        chunks_o.append(rays_o.reshape(-1, 3))
        chunks_d.append(rays_d.reshape(-1, 3))
        chunks_v.append(viewdirs.reshape(-1, 3))
        imsz.append(H * W)
    print(f"get_training_rays_flatten: finish (eps time: {time.time()-eps} sec)")
    return (np.concatenate(chunks_rgb), np.concatenate(chunks_o),
            np.concatenate(chunks_d), np.concatenate(chunks_v), imsz)


def get_training_rays_in_maskcache_sampling(rgb_tr_ori, train_poses, HW, Ks,
                                            ndc, inverse_y, flip_x, flip_y,
                                            model, render_kwargs):
    """Pre-filter training rays to those that hit the coarse geometry.

    Mirrors lib/ray_utils.py:145-183: per image, query
    ``model.hit_coarse_geo`` and keep only hitting rays. The dynamic-length
    compaction happens here on the host (numpy), so the device-side training
    loop stays static-shape.
    """
    eps = time.time()
    total = 0
    kept = 0
    # Two passes: dispatch every view's occupancy query first (device work
    # queues asynchronously), pull and compact second — a sync per view
    # costs a tunnel round trip each. For perspective cameras the query
    # generates its rays ON-DEVICE from (K, c2w) (model.hit_coarse_geo_view)
    # so no per-view ray upload happens, and the host ray math for kept
    # pools runs in pass two, overlapped with the device queue draining.
    device_view = (not ndc) and hasattr(model, "hit_coarse_geo_view")
    per_view = []
    for c2w, img, (H, W), K in zip(train_poses, rgb_tr_ori, HW, Ks):
        assert img.shape[:2] == (H, W)
        if device_view:
            rk = {k: v for k, v in render_kwargs.items()
                  if k not in ("inverse_y", "flip_x", "flip_y")}
            hit = model.hit_coarse_geo_view(
                H, W, K, c2w, inverse_y=inverse_y, flip_x=flip_x,
                flip_y=flip_y, packed=True, **rk)
            per_view.append((img, (H, W), K, c2w, None, None, None, hit))
            continue
        rays_o, rays_d, viewdirs = get_rays_of_a_view(
            H, W, K, c2w, ndc, inverse_y, flip_x, flip_y)
        hit = model.hit_coarse_geo(
            rays_o=rays_o.reshape(-1, 3), rays_d=rays_d.reshape(-1, 3),
            defer=True, **render_kwargs)
        per_view.append((img, (H, W), K, c2w, rays_o, rays_d, viewdirs,
                         hit))
    if device_view and per_view:
        # ONE batched device->host pull for every view's mask — per-view
        # np.asarray costs a round trip each, and those pulls queue behind
        # the previous stage's async checkpoint writer on a shared link.
        # Masks arrive BIT-PACKED (uint8, 8x smaller): the raw-bool pull is
        # the gather's dominant transfer (100 x 800^2 = 64 MB; measured as
        # the bulk of a 90 s fine-stage gather over the dev tunnel).
        print(f"get_training_rays_in_maskcache_sampling: [phase] "
              f"hit-view dispatch {time.time()-eps:.1f} s")
        t_pull = time.time()
        import jax as _jax
        pulled = iter(_jax.device_get([v[-1] for v in per_view]))
        per_view = [(*v[:-1],
                     np.unpackbits(next(pulled))[:v[1][0] * v[1][1]]
                     .astype(bool)) for v in per_view]
        print(f"get_training_rays_in_maskcache_sampling: [phase] "
              f"mask pull (queue drain + transfer) {time.time()-t_pull:.1f} s")
    chunks_rgb, chunks_o, chunks_d, chunks_v, imsz = [], [], [], [], []
    for img, (H, W), K, c2w, rays_o, rays_d, viewdirs, hit in per_view:
        if rays_o is None:
            rays_o, rays_d, viewdirs = get_rays_of_a_view(
                H, W, K, c2w, ndc, inverse_y, flip_x, flip_y)
        if isinstance(hit, tuple):  # deferred (device_chunks, n)
            outs, n_rays = hit
            mask = np.concatenate(
                [np.asarray(o) for o in outs])[:n_rays].reshape(H, W)
        else:
            mask = np.asarray(hit).reshape(H, W)
        n = int(mask.sum())
        chunks_rgb.append(np.asarray(img, np.float32)[mask])
        chunks_o.append(rays_o[mask])
        chunks_d.append(rays_d[mask])
        chunks_v.append(viewdirs[mask])
        imsz.append(n)
        total += H * W
        kept += n
    print("get_training_rays_in_maskcache_sampling: ratio", kept / max(total, 1))
    print(f"get_training_rays_in_maskcache_sampling: finish "
          f"(eps time: {time.time()-eps} sec)")
    return (np.concatenate(chunks_rgb), np.concatenate(chunks_o),
            np.concatenate(chunks_d), np.concatenate(chunks_v), imsz)


def batch_indices_generator(N, BS, rng=None):
    """Infinite shuffled index batches (lib/ray_utils.py:283-290)."""
    rng = rng or np.random
    idx, top = rng.permutation(N), 0
    while True:
        if top + BS > N:
            idx, top = rng.permutation(N), 0
        yield idx[top:top + BS]
        top += BS
