#!/usr/bin/env python
"""Visualize an exported alpha/rgb voxel volume (reference tools/vis_volume.py).

Reads the npz written by ``run.py --export_coarse_only`` /
``--export_fine_only``. open3d point cloud when available, otherwise a
matplotlib scatter of thresholded voxels saved to PNG.

Usage: python tools/vis_volume.py vol.npz [--thres 0.5] [--out vol.png]
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('path')
    parser.add_argument('--thres', type=float, default=0.5)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    data = np.load(args.path)
    alpha = data['alpha']
    rgb = data.get('rgb')
    print('volume', alpha.shape, 'alpha range',
          float(alpha.min()), float(alpha.max()))
    mask = alpha > args.thres
    xyz = np.stack(np.nonzero(mask), -1).astype(np.float32)
    colors = rgb[mask] if rgb is not None else None
    print(f'{mask.sum()} voxels above {args.thres}')

    try:
        import open3d as o3d
        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(xyz)
        if colors is not None:
            pcd.colors = o3d.utility.Vector3dVector(colors[..., :3])
        o3d.visualization.draw_geometries([pcd])
        return
    except ImportError:
        pass

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection='3d')
    sub = slice(None, None, max(1, len(xyz) // 20000))
    ax.scatter(xyz[sub, 0], xyz[sub, 1], xyz[sub, 2], s=1,
               c=colors[sub, :3] if colors is not None else 'b')
    out = args.out or args.path.replace('.npz', '.png')
    plt.savefig(out, dpi=120)
    print('wrote', out)


if __name__ == '__main__':
    main()
