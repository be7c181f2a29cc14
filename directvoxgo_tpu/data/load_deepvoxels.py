"""DeepVoxels dataset loader (behavioral port of lib/load_deepvoxels.py:6-105).

Layout: ``{train,validation,test}/{scene}/{rgb,pose}`` with an
``intrinsics.txt`` header giving (f, cx, cy), barycenter, near, scale and the
source resolution; intrinsics are rescaled to the 512x512 target and poses
are multiplied by diag(1,-1,-1,1) to flip into the OpenGL convention.
"""

from __future__ import annotations

import os

import numpy as np

_AXIS_FLIP = np.array([
    [1, 0, 0, 0],
    [0, -1, 0, 0],
    [0, 0, -1, 0],
    [0, 0, 0, 1.0],
])


def _parse_intrinsics(filepath, trgt_sidelength):
    with open(filepath) as f:
        vals = list(map(float, f.readline().split()))
        focal, cx, cy = vals[:3]
        barycenter = np.array(list(map(float, f.readline().split())))
        near_plane = float(f.readline())
        scale = float(f.readline())
        height, width = map(float, f.readline().split())
    cx = cx / width * trgt_sidelength
    cy = cy / height * trgt_sidelength
    focal = trgt_sidelength / height * focal
    K = np.array([[focal, 0.0, cx], [0.0, focal, cy], [0.0, 0.0, 1.0]])
    return K, barycenter, scale, near_plane


def _load_poses(posedir, skip=1):
    files = [f for f in sorted(os.listdir(posedir)) if f.endswith("txt")]
    poses = np.stack([
        np.loadtxt(os.path.join(posedir, f)).reshape(4, 4)
        for f in files], 0).astype(np.float32)
    poses = (poses @ _AXIS_FLIP)[:, :3, :4].astype(np.float32)
    return poses[::skip]


def _load_images(rgbdir, skip=1):
    import imageio.v2 as imageio
    files = [f for f in sorted(os.listdir(rgbdir)) if f.endswith("png")]
    return np.stack([
        imageio.imread(os.path.join(rgbdir, f)) / 255.0
        for f in files[::skip]], 0).astype(np.float32)


def load_dv_data(scene="cube", basedir="/data/deepvoxels", testskip=1):
    H = W = 512
    train_base = os.path.join(basedir, "train", scene)
    K, _, _, _ = _parse_intrinsics(
        os.path.join(train_base, "intrinsics.txt"), H)
    focal = K[0, 0]

    splits = {
        "train": (train_base, 1),
        "validation": (os.path.join(basedir, "validation", scene), testskip),
        "test": (os.path.join(basedir, "test", scene), testskip),
    }
    imgs_per_split, poses_per_split = [], []
    for name, (base, skip) in splits.items():
        imgs_per_split.append(_load_images(os.path.join(base, "rgb"), skip))
        poses_per_split.append(_load_poses(os.path.join(base, "pose"), skip))

    counts = np.cumsum([0] + [x.shape[0] for x in imgs_per_split])
    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(imgs_per_split, 0)
    poses = np.concatenate(poses_per_split, 0)
    render_poses = poses_per_split[-1]
    return imgs, poses, render_poses, [H, W, focal], i_split
