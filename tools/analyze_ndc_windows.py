#!/usr/bin/env python
"""Window-width structure of the fern-scale NDC fixture pool (CPU, numpy).

The r5 fern run realized near-full (u, v) window classes at the final grid
((352, 371, 128): draws at (256, 272)-wide boxes, 142 ms/iter) where the
round-3 bench_dmpigo pool projected (64, 64) at 7 ms — because the fixture's
cameras sit on a +-0.25 baseline and content starts at the NDC near plane,
so a ray's in-plane drift across the z traversal is ~0.2 of the image
(~70 voxels at gu=352). This probe quantifies, per window strategy, the
support widths an 8192/4096-ray Morton segment actually needs:

  2d       whole-traversal (u, v) windows (build_ray_segments_2d — what the
           engine's forced-axis path draws today)
  blocked  per-p-block windows, B blocks (build_ray_segments_blocked)
  shear    residual spread after removing the segment-mean drift slope —
           the width a shear-sliced window (per-station offset following
           the batch's mean ray) would need. Lower bound for any
           station-dependent window scheme.

Pure numpy on the real pool (poses regenerate deterministically; GT images
are not needed for ray structure).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from directvoxgo_tpu.data.synthetic import make_ndc_fixture_dataset  # noqa: E402
from directvoxgo_tpu import rays as ray_lib  # noqa: E402
from directvoxgo_tpu.ops import sweep as sweep_ops  # noqa: E402


def main(n_rand=4096, n_blocks=8):
    # Poses only — pass the durable repo cache so no rendering happens.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = make_ndc_fixture_dataset(
        n_train=17, n_val=1, n_test=3, H=756, W=1008, teacher_res=128,
        cache_dir=os.path.join(repo, "fixture_cache"))
    H, W, focal = ds["hwf"]
    K = ds["Ks"][0]
    xyz_min = np.array([-1.4270204, -1.519121, -1.0000002], np.float32)
    xyz_max = np.array([1.3987073, 1.4574779, 1.0], np.float32)
    world_size = (352, 371, 128)  # final pg stage of fixture_ndc_fern
    axis = 2
    chunks = []
    for i in ds["i_train"]:
        ro, rd, vd = ray_lib.get_rays_of_a_view(
            H, W, K, ds["poses"][i], ndc=True, inverse_y=False,
            flip_x=False, flip_y=False)
        chunks.append((np.asarray(ro).reshape(-1, 3),
                       np.asarray(rd).reshape(-1, 3)))
    ro = np.concatenate([c[0] for c in chunks]).astype(np.float32)
    rd = np.concatenate([c[1] for c in chunks]).astype(np.float32)
    print(f"pool: {ro.shape[0]} rays, grid {world_size}", flush=True)

    perm = sweep_ops._PERMS[axis]
    gp = int(world_size[perm[0]])
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])

    # voxel-space components
    opv, dpv = [], []
    for ax in perm:
        scale = (float(world_size[ax]) - 1.0) / (float(xyz_max[ax])
                                                 - float(xyz_min[ax]))
        opv.append((ro[:, ax] - float(xyz_min[ax])) * scale)
        dpv.append(rd[:, ax] * scale)
    op, ou, ov = opv
    dp, du, dv = dpv
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
    t0 = (0.0 - op) / dp_s
    t1 = (gp - 1.0 - op) / dp_s
    u0r, u1r = ou + t0 * du, ou + t1 * du
    v0r, v1r = ov + t0 * dv, ov + t1 * dv
    drift_u = np.abs(u1r - u0r)
    drift_v = np.abs(v1r - v0r)
    print(f"per-ray drift across the full traversal: "
          f"u median {np.median(drift_u):.1f} p90 "
          f"{np.percentile(drift_u, 90):.1f}  v median "
          f"{np.median(drift_v):.1f} p90 {np.percentile(drift_v, 90):.1f}",
          flush=True)

    def shares(bk, label, nseg_width=None):
        tot = sum(v[0].size for v in bk.values())
        rows = sorted(bk.items(), key=lambda kv: -kv[1][0].size)
        txt = " ".join(f"{k}:{v[0].size / tot:.2f}" for k, v in rows)
        print(f"{label}: {txt}", flush=True)

    bk2 = sweep_ops.build_ray_segments_2d(
        ro, rd, xyz_min, xyz_max, world_size, axis, n_rand=n_rand,
        widths=(32, 48, 64, 96), max_classes=6)
    shares(bk2, f"2d classes (n_rand={n_rand})")

    bkb = sweep_ops.build_ray_segments_blocked(
        ro, rd, xyz_min, xyz_max, world_size, axis, n_rand=n_rand,
        n_blocks=n_blocks, widths=(32, 48, 64, 96), max_classes=6)
    shares(bkb, f"blocked B={n_blocks} classes")

    # --- shear residual: sort exactly like the 2D builder, then measure
    # per-segment widths AFTER subtracting the segment-mean drift line.
    def quant(x, g):
        return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

    u_ends = np.stack([np.clip(u0r, -1, gu), np.clip(u1r, -1, gu)])
    v_ends = np.stack([np.clip(v0r, -1, gv), np.clip(v1r, -1, gv)])
    keys = [quant(u_ends[0], gu), quant(v_ends[0], gv),
            quant(u_ends[1], gu), quant(v_ends[1], gv)]
    code = np.zeros(ro.shape[0], np.int64)
    for b in range(10):
        for d_i, kk in enumerate(keys):
            code |= ((kk >> b) & 1) << (b * 4 + d_i)
    order = np.argsort(code, kind="stable")
    n_seg = ro.shape[0] // n_rand
    idx = order[: n_seg * n_rand].reshape(n_seg, n_rand)

    for name, e0, e1 in (("u", u_ends[0], u_ends[1]),
                         ("v", v_ends[0], v_ends[1])):
        a0, a1 = e0[idx], e1[idx]          # [n_seg, n_rand]
        m0 = a0.mean(1, keepdims=True)
        m1 = a1.mean(1, keepdims=True)
        r0 = a0 - m0
        r1 = a1 - m1
        # residual support after the shear line: range over both endpoints
        need = np.maximum(r0, r1).max(1) - np.minimum(r0, r1).min(1)
        print(f"shear residual {name}: median {np.median(need):.1f} "
              f"p90 {np.percentile(need, 90):.1f} "
              f"max {need.max():.1f}", flush=True)


if __name__ == "__main__":
    main()
