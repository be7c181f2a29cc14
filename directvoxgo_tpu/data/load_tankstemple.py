"""Tanks&Temples dataset loader (behavioral port of
lib/load_tankstemple.py:11-39). Same prefix-split layout as BlendedMVS; the
render path falls back to test poses when ``test_traj.txt`` is absent.
"""

from __future__ import annotations

import os

import numpy as np

from .load_blendedmvs import _load_prefix_split_scene


def load_tankstemple_data(basedir):
    imgs, poses, K, i_split = _load_prefix_split_scene(basedir)
    H, W = imgs[0].shape[:2]
    focal = float(K[0, 0])
    path_traj = os.path.join(basedir, "test_traj.txt")
    if os.path.isfile(path_traj):
        render_poses = np.loadtxt(path_traj).reshape(-1, 4, 4) \
            .astype(np.float32)
    else:
        render_poses = poses[i_split[-1]]
    return imgs, poses, render_poses, [H, W, focal], K, i_split
