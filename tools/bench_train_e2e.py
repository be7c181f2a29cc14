#!/usr/bin/env python
"""bench.py's engine-faithful bench_train at the REAL e2e shape: the
trained sparse-fixture fine checkpoint (near-full occupancy bbox — the
adversarial complement of the bench model's tight (112,96,80) clip).

Compares draw-class machineries via DVGO_BENCH_BUCKETS=2d|blocked —
the decision data for whether blocked per-p-block windows pay at the
shape where station matmuls dominate (run3: 35 ms/iter steady with 2D
windows at grid (167,162,151)).

Usage: DVGO_BENCH_BUCKETS=blocked python tools/bench_train_e2e.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import bench as bench_mod
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO

    path = "logs/synthetic/fixture_lego_sparse/fine_last.tar"
    model = ckpt_lib.load_model(DirectVoxGO, path)
    occ = float(np.asarray(model.mask).mean())
    bench_mod.log(f"e2e model {tuple(int(x) for x in model.world_size)} "
                  f"mask occupancy {occ:.3f} "
                  f"buckets={os.environ.get('DVGO_BENCH_BUCKETS', '2d')}")

    # The REAL training pool (the fixture's 46 views, same rays run.py
    # gathers) — the synthetic 12-view orbit bench pool has a different
    # view mix and yields a different window-class distribution.
    from directvoxgo_tpu.config import Config
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu import rays as ray_lib

    cfg = Config.fromfile("configs/synthetic/fixture_lego_sparse.py")
    data = load_data(cfg.data)
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    pool_kind = os.environ.get("DVGO_BENCH_POOL", "flatten")
    if pool_kind == "filtered":
        # The engine fine stage's ACTUAL pool (ray_sampler='in_maskcache',
        # engine/train.py gather_training_rays): only rays hitting the
        # coarse geometry. Its draw-class mix is what a run.py fine loop
        # realizes — ~60% wide classes in round 3 vs the flatten pool's
        # (32,32)-heavy mix (PERF_LOG).
        rk = dict(near=float(data["near"]), far=float(data["far"]),
                  stepsize=cfg.fine_model_and_render.stepsize)
        rgb, ro, rd, vd, _ = \
            ray_lib.get_training_rays_in_maskcache_sampling(
                rgb_tr_ori=images, train_poses=data["poses"][i_train],
                HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
                inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
                flip_y=cfg.data.flip_y, model=model, render_kwargs=rk)
    else:
        rgb, ro, rd, vd, _ = ray_lib.get_training_rays_flatten(
            rgb_tr_ori=images, train_poses=data["poses"][i_train],
            HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y)
    bench_mod.log(f"e2e pool {pool_kind}: {len(np.asarray(ro))} rays")
    pool = (np.asarray(ro), np.asarray(rd), np.asarray(vd),
            np.asarray(rgb))
    bench_mod._make_training_pool = lambda *a, **k: pool
    bench_mod.bench_train(model, iters=40)


if __name__ == "__main__":
    main()
