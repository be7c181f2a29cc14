#!/usr/bin/env python
"""Visualize exported camera poses + scene bbox (reference tools/vis_train.py).

Reads the npz written by ``run.py --export_bbox_and_cams_only``. Uses open3d
when available; otherwise falls back to a matplotlib 3D plot saved to PNG
(this environment has no display/open3d).

Usage: python tools/vis_train.py cams.npz [--out cams.png]
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('path', help='npz from --export_bbox_and_cams_only')
    parser.add_argument('--out', default=None, help='output PNG (fallback)')
    args = parser.parse_args()

    data = np.load(args.path)
    xyz_min, xyz_max = data['xyz_min'], data['xyz_max']
    cam_lst = data['cam_lst']
    print('bbox', xyz_min, xyz_max, '| cameras:', len(cam_lst))

    try:
        import open3d as o3d
        bbox = o3d.geometry.AxisAlignedBoundingBox(
            min_bound=xyz_min, max_bound=xyz_max)
        bbox.color = (1, 0, 0)
        geoms = [bbox]
        for cam in cam_lst:
            frustum = o3d.geometry.LineSet()
            frustum.points = o3d.utility.Vector3dVector(cam)
            frustum.lines = o3d.utility.Vector2iVector(
                [[0, 1], [0, 2], [0, 3], [0, 4],
                 [1, 2], [2, 4], [4, 3], [3, 1]])
            frustum.colors = o3d.utility.Vector3dVector(
                [[0, 0, 1]] * 8)
            geoms.append(frustum)
        o3d.visualization.draw_geometries(geoms)
        return
    except ImportError:
        pass

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection='3d')
    for cam in cam_lst:
        o = cam[0]
        for corner in cam[1:]:
            ax.plot(*zip(o, corner), 'b-', lw=0.5)
        ax.scatter(*o, c='k', s=4)
    # bbox wireframe
    lo, hi = xyz_min, xyz_max
    for i in range(8):
        for j in range(i + 1, 8):
            if bin(i ^ j).count('1') == 1:
                p = [[lo[k] if (m >> k) & 1 == 0 else hi[k]
                      for k in range(3)] for m in (i, j)]
                ax.plot(*zip(*p), 'r-', lw=1)
    out = args.out or args.path.replace('.npz', '.png')
    plt.savefig(out, dpi=120)
    print('wrote', out)


if __name__ == '__main__':
    main()
