"""NSVF-format dataset loader (behavioral port of lib/load_nsvf.py:1-78).

Layout: ``rgb/*.png`` + ``pose/*.txt`` (4x4 c2w) + ``intrinsics.txt`` whose
first value is the focal length. The split is encoded in the filename prefix
digit: 0_* train, 1_* val, 2_* test.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def load_nsvf_data(basedir, down=1):
    import imageio.v2 as imageio

    pose_paths = sorted(glob.glob(os.path.join(basedir, "pose", "*txt")))
    rgb_paths = sorted(glob.glob(os.path.join(basedir, "rgb", "*png")))

    imgs, poses = [], []
    i_split = [[], [], []]
    for i, (pose_path, rgb_path) in enumerate(zip(pose_paths, rgb_paths)):
        i_set = int(os.path.split(rgb_path)[-1][0])
        imgs.append((imageio.imread(rgb_path) / 255.0).astype(np.float32))
        poses.append(np.loadtxt(pose_path).astype(np.float32))
        i_split[i_set].append(i)
    imgs = np.stack(imgs, 0)
    poses = np.stack(poses, 0)
    i_split = [np.array(s, dtype=np.int64) for s in i_split]
    if len(i_split[1]) == 0:
        i_split[1] = i_split[2]

    with open(os.path.join(basedir, "intrinsics.txt")) as f:
        focal = float(f.readline().split()[0])
    H, W = imgs[0].shape[:2]

    if down > 1:
        import cv2
        H, W = H // down, W // down
        focal = focal / down
        imgs = np.stack([
            cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA)
            for im in imgs], 0)

    # Render path: circle through the test poses.
    render_poses = poses[i_split[-1]]
    return imgs, poses, render_poses, [H, W, focal], i_split
