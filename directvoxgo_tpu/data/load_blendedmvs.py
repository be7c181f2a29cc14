"""BlendedMVS dataset loader (behavioral port of lib/load_blendedmvs.py:11-35).

Layout: ``rgb/*.png`` + ``pose/*.txt`` + ``intrinsics.txt`` (full 3x3/4x4 K)
+ ``test_traj.txt`` render path. Filename prefix digit 0/1 selects
train/test (the test split doubles as val).
"""

from __future__ import annotations

import glob
import os

import numpy as np


def _load_prefix_split_scene(basedir):
    import imageio.v2 as imageio

    pose_paths = sorted(glob.glob(os.path.join(basedir, "pose", "*txt")))
    rgb_paths = sorted(glob.glob(os.path.join(basedir, "rgb", "*png")))
    imgs, poses = [], []
    i_split = [[], []]
    for i, (pose_path, rgb_path) in enumerate(zip(pose_paths, rgb_paths)):
        i_set = int(os.path.split(rgb_path)[-1][0])
        imgs.append((imageio.imread(rgb_path) / 255.0).astype(np.float32))
        poses.append(np.loadtxt(pose_path).astype(np.float32))
        i_split[i_set].append(i)
    imgs = np.stack(imgs, 0)
    poses = np.stack(poses, 0)
    i_split.append(i_split[-1])
    i_split = [np.array(s, dtype=np.int64) for s in i_split]
    K = np.loadtxt(os.path.join(basedir, "intrinsics.txt"))
    return imgs, poses, K, i_split


def load_blendedmvs_data(basedir):
    imgs, poses, K, i_split = _load_prefix_split_scene(basedir)
    H, W = imgs[0].shape[:2]
    focal = float(K[0, 0])
    render_poses = np.loadtxt(
        os.path.join(basedir, "test_traj.txt")).reshape(-1, 4, 4) \
        .astype(np.float32)
    return imgs, poses, render_poses, [H, W, focal], K, i_split
