#!/usr/bin/env python
"""Feature-plane / voxel-feature visualization (reference parity:
visualize_feature.ipynb / visualize_feature_v1.ipynb — the reference keeps
these as notebooks; here a CLI script writes PNG panels instead).

Usage:
  python tools/visualize_feature.py --ckpt logs/<exp>/fine_last.tar \
      [--out feature_vis.png] [--slice-axis 2] [--n-slices 6]

Writes a grid of panels: per-channel mid-slices of the k0 feature grid (or
the triplane planes for conditioned models), plus the density grid's
activated-alpha mid-slices.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", default="feature_vis.png")
    parser.add_argument("--slice_axis", type=int, default=2)
    parser.add_argument("--n_slices", type=int, default=6)
    parser.add_argument("--max_channels", type=int, default=12)
    args = parser.parse_args()

    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.ops import raymarch as rm

    st = ckpt_lib.load_checkpoint_file(args.ckpt)
    kw = st["model_kwargs"]
    state = st["model_state_dict"]
    density = np.asarray(state["density"])
    alpha = np.asarray(rm.raw2alpha(density, kw["act_shift"],
                                    kw.get("voxel_size_ratio", 1.0)))
    panels = []
    titles = []
    ax = args.slice_axis
    idxs = np.linspace(0, density.shape[ax] - 1, args.n_slices).astype(int)
    for i in idxs:
        panels.append(np.take(alpha, i, axis=ax))
        titles.append(f"alpha[{ax}={i}]")
    k0 = state.get("k0")
    if k0 is not None and np.asarray(k0).ndim == 4:
        k0 = np.asarray(k0)
        mid = density.shape[ax] // 2
        for c in range(min(k0.shape[-1], args.max_channels)):
            panels.append(np.take(k0[..., c], mid, axis=ax))
            titles.append(f"k0[ch={c}]")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    n = len(panels)
    cols = min(6, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).ravel()
    for a in axes[n:]:
        a.axis("off")
    for a, p, t in zip(axes, panels, titles):
        vmax = np.abs(p).max() + 1e-9
        a.imshow(p.T, origin="lower", cmap="coolwarm",
                 vmin=-vmax if p.min() < 0 else 0, vmax=vmax)
        a.set_title(t, fontsize=8)
        a.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out} ({n} panels)")


if __name__ == "__main__":
    main()
