#!/usr/bin/env python
"""Why does the engine's fine pool land in wide window classes?

Builds BOTH pools the fixture run uses — the flatten pool (all rays) and
the maskcache-filtered pool (rays hitting the coarse geometry, what the
fine stage actually trains on) — and prints build_ray_segments_2d class
shares for each at the trained fine model's geometry. run5 drew ~60%
(96,96)-and-wider classes while the flatten-pool bench drew (32,32)-heavy.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def shares(ro, rd, model, axis, n_rand=8192):
    from directvoxgo_tpu.ops import sweep as sweep_ops
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    g = np.flatnonzero(groups == axis)
    bk = sweep_ops.build_ray_segments_2d(
        ro[g], rd[g], model.xyz_min, model.xyz_max, model.world_size, axis,
        n_rand=n_rand, widths=(32, 48, 64, 96), max_classes=6)
    tot = max(sum(idx.size for idx, _, _ in bk.values()), 1)
    return {k: round(idx.size / tot, 3) for k, (idx, _, _) in
            sorted(bk.items(), key=lambda kv: -kv[1][0].size)}, len(g)


def main():
    import jax.numpy as jnp
    from directvoxgo_tpu.config import Config
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu import rays as ray_lib

    model = ckpt_lib.load_model(
        DirectVoxGO, "logs/synthetic/fixture_lego_sparse/fine_last.tar")
    cfg = Config.fromfile("configs/synthetic/fixture_lego_sparse.py")
    data = load_data(cfg.data)
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    common = dict(rgb_tr_ori=images, train_poses=data["poses"][i_train],
                  HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
                  inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
                  flip_y=cfg.data.flip_y)
    _, ro_f, rd_f, _, _ = ray_lib.get_training_rays_flatten(**common)
    ro_f, rd_f = np.asarray(ro_f), np.asarray(rd_f)

    t0 = time.time()
    rk = dict(near=float(data["near"]), far=float(data["far"]),
              stepsize=0.5)
    _, ro_m, rd_m, _, _ = ray_lib.get_training_rays_in_maskcache_sampling(
        model=model, render_kwargs=rk, **common)
    ro_m, rd_m = np.asarray(ro_m), np.asarray(rd_m)
    log(f"pools: flatten {ro_f.shape[0]}, maskcache {ro_m.shape[0]} "
        f"({time.time()-t0:.0f} s gather)")

    for axis in (0, 1):
        sf, nf = shares(ro_f, rd_f, model, axis)
        sm, nm = shares(ro_m, rd_m, model, axis)
        log(f"axis {axis}: flatten ({nf}) {sf}")
        log(f"axis {axis}: maskcache({nm}) {sm}")


if __name__ == "__main__":
    main()
