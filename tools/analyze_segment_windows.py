#!/usr/bin/env python
"""Host-side: what (u, v) window widths would whole-batch segments need
under different spatial sort keys? Drives the (wu, wv) class design for
two-axis windowed sweeps — pure numpy, no TPU.

Findings feed ops/sweep.build_ray_segments.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def interleave(parts, bits=10):
    """Bit-interleave k quantized codes (MSB-first round-robin)."""
    code = np.zeros(parts[0].shape, np.int64)
    k = len(parts)
    for b in range(bits - 1, -1, -1):
        for i, p in enumerate(parts):
            code = (code << 1) | ((p >> b) & 1)
    return code


def main():
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu import rays as ray_lib
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu.config import Config

    cfg = Config.fromfile("configs/synthetic/fixture_lego.py")
    data = load_data(cfg.data)
    model = ckpt_lib.load_model(
        DirectVoxGO, "logs/synthetic/fixture_lego/fine_last.tar")
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    rgb, ro, rd, vd, _ = ray_lib.get_training_rays_flatten(
        rgb_tr_ori=images, train_poses=data["poses"][i_train],
        HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)
    ro = np.asarray(ro).reshape(-1, 3)
    rd = np.asarray(rd).reshape(-1, 3)
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    n_rand = 8192

    for axis in range(3):
        g = np.flatnonzero(groups == axis)
        o_pv, d_pv = sweep_ops.rays_to_voxel(
            ro[g], rd[g], model.xyz_min, model.xyz_max, model.world_size,
            axis)
        op, ou, ov = [np.asarray(x) for x in o_pv]
        dp, du, dv = [np.asarray(x) for x in d_pv]
        perm = sweep_ops._PERMS[axis]
        gp = int(model.world_size[perm[0]])
        gu = int(model.world_size[perm[1]])
        gv = int(model.world_size[perm[2]])
        dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
        t0 = (0.0 - op) / dp_s
        t1 = (gp - 1.0 - op) / dp_s
        v_ends = np.clip(np.stack([ov + t0 * dv, ov + t1 * dv]), -1.0, gv)
        u_ends = np.clip(np.stack([ou + t0 * du, ou + t1 * du]), -1.0, gu)

        def quant(x, g):
            return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

        kv0, kv1 = quant(v_ends[0], gv), quant(v_ends[1], gv)
        ku0, ku1 = quant(u_ends[0], gu), quant(u_ends[1], gu)

        keys = {
            "v-major (current)": (interleave([kv0, kv1]) << 10)
            | ((ku0 >> 5) << 5) | (ku1 >> 5),
            "uv-interleave": interleave([kv0, kv1, ku0, ku1]),
        }
        vmin = np.minimum(v_ends[0], v_ends[1])
        vmax = np.maximum(v_ends[0], v_ends[1])
        umin = np.minimum(u_ends[0], u_ends[1])
        umax = np.maximum(u_ends[0], u_ends[1])

        for name, code in keys.items():
            order = np.argsort(code, kind="stable")
            n_seg = len(g) // n_rand
            idx = order[: n_seg * n_rand].reshape(n_seg, n_rand)
            needed_v = (np.minimum(gv - 1, np.floor(vmax[idx]).max(1) + 1)
                        - np.maximum(0, np.floor(vmin[idx]).min(1)) + 8)
            needed_u = (np.minimum(gu - 1, np.floor(umax[idx]).max(1) + 1)
                        - np.maximum(0, np.floor(umin[idx]).min(1)) + 8)
            qs = [25, 50, 75, 90]
            log(f"axis {axis} [{name}] segs={n_seg} gu={gu} gv={gv}\n"
                f"  needed_v pct{qs}={np.percentile(needed_v, qs).round()}\n"
                f"  needed_u pct{qs}={np.percentile(needed_u, qs).round()}")
            # joint class assignment: smallest (wu, wv) that fits
            for wv in (32, 64, 96, 128):
                for wu in (48, 64, 96, 128):
                    frac = float(((needed_v <= wv)
                                  & (needed_u <= wu)).mean())
                    if frac > 0.02:
                        log(f"    fit (wu<={wu:3d}, wv<={wv:3d}): "
                            f"{frac:5.1%}")


if __name__ == "__main__":
    main()
