#!/usr/bin/env python
"""Offline metric re-evaluation: recompute PSNR/SSIM/LPIPS from saved
render PNGs vs dataset ground truth (reference eval_metrics.py:17-57,
generalized beyond its hardcoded NSVF loop).

Usage:
  python eval_metrics.py --render_dir logs/.../render_test_fine_last \
      --config configs/nerf/lego.py [--eval_ssim] [--eval_lpips_alex]
"""

import argparse
import glob
import os

import numpy as np

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data import load_everything
from directvoxgo_tpu.engine import metrics as metrics_lib


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--render_dir', required=True,
                        help='directory of rendered ???.png frames')
    parser.add_argument('--config', required=True)
    parser.add_argument('--split', default='test',
                        choices=['train', 'val', 'test'])
    parser.add_argument('--eval_ssim', action='store_true')
    parser.add_argument('--eval_lpips_alex', action='store_true')
    parser.add_argument('--eval_lpips_vgg', action='store_true')
    args = parser.parse_args()

    import imageio.v2 as imageio

    cfg = Config.fromfile(args.config)
    data_dict = load_everything(args=args, cfg=cfg)
    idx = data_dict[f'i_{args.split}']
    gts = [np.asarray(data_dict['images'][i], np.float32) for i in idx]

    files = sorted(glob.glob(os.path.join(args.render_dir, '*.png')))
    assert len(files) == len(gts), (
        f'{len(files)} renders vs {len(gts)} GT views')

    psnrs, ssims, lp_a, lp_v = [], [], [], []
    for f, gt in zip(files, gts):
        img = (imageio.imread(f) / 255.0).astype(np.float32)[..., :3]
        psnrs.append(metrics_lib.psnr(img, gt))
        if args.eval_ssim:
            ssims.append(metrics_lib.rgb_ssim(img, gt, max_val=1))
        if args.eval_lpips_alex:
            lp_a.append(metrics_lib.rgb_lpips(gt, img, 'alex'))
        if args.eval_lpips_vgg:
            lp_v.append(metrics_lib.rgb_lpips(gt, img, 'vgg'))

    lines = [f'psnr {np.mean(psnrs):.4f}']
    if ssims:
        lines.append(f'ssim {np.mean(ssims):.4f}')
    if lp_a:
        lines.append(f'lpips_alex {np.mean(lp_a):.4f}')
    if lp_v:
        lines.append(f'lpips_vgg {np.mean(lp_v):.4f}')
    report = '\n'.join(lines)
    print(report)
    out_path = os.path.join(args.render_dir, '_metrics.txt')
    with open(out_path, 'w') as fh:
        fh.write(report + '\n')
    print('wrote', out_path)


if __name__ == '__main__':
    main()
