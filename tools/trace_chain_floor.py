#!/usr/bin/env python
"""Trace the ENGINE train step at the e2e shape for a narrow (32,32)
window class — the 13 ms 'chain floor' left after the endpoint-sort win
(tools/bench_train_e2e.py). Prints top device ops by self time."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench as bench_mod
    from directvoxgo_tpu.config import Config, ConfigDict
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.engine.train import make_train_step
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.optim import MaskedAdam
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu import rays as ray_lib

    model = ckpt_lib.load_model(
        DirectVoxGO, "logs/synthetic/fixture_lego_sparse/fine_last.tar")
    cfg = Config.fromfile("configs/synthetic/fixture_lego_sparse.py")
    data = load_data(cfg.data)
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    if os.environ.get("DVGO_TRACE_POOL", "flatten") == "filtered":
        rk0 = dict(near=float(data["near"]), far=float(data["far"]),
                   stepsize=cfg.fine_model_and_render.stepsize)
        rgb, ro, rd, vd, _ = \
            ray_lib.get_training_rays_in_maskcache_sampling(
                rgb_tr_ori=images, train_poses=data["poses"][i_train],
                HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
                inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
                flip_y=cfg.data.flip_y, model=model, render_kwargs=rk0)
    else:
        rgb, ro, rd, vd, _ = ray_lib.get_training_rays_flatten(
            rgb_tr_ori=images, train_poses=data["poses"][i_train],
            HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y)
    ro, rd, vd, rgb = map(np.asarray, (ro, rd, vd, rgb))
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    axis = 0
    g = np.flatnonzero(groups == axis)
    n_rand = 8192
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    perm = sweep_ops._PERMS[axis]
    if clip_sizes is None:
        clip_sizes = tuple(int(model.world_size[a]) for a in perm)
        clip_off = np.zeros(3, np.int32)
    bp, bu, bv = (int(x) for x in clip_sizes)
    bpo, buo, bvo = (int(x) for x in np.asarray(clip_off))
    bk = sweep_ops.build_ray_segments_2d(
        ro[g], rd[g], model.xyz_min, model.xyz_max, model.world_size, axis,
        n_rand=n_rand, widths=(32, 48, 64, 96), max_classes=6,
        clip_box=(bpo, bpo + bp - 1, buo, buo + bu - 1, bvo, bvo + bv - 1))
    pick = os.environ.get("DVGO_TRACE_CLASS", "narrow")
    cand = [k for k in bk if k != (0, 0) and k[0] and k[1]
            and bk[k][0].shape[0] > 0]
    if pick == "narrow":
        key = min(cand, key=lambda k: k[0] * k[1])
    else:  # widest bounded class (e.g. the 96x96 workhorse)
        key = max(cand, key=lambda k: k[0] * k[1])
    idx, ulo, vlo = bk[key]
    eu = key[0] if 0 < key[0] < bu else bu
    ev = key[1] if 0 < key[1] < bv else bv
    log(f"class {key} -> sizes ({bp},{eu},{ev}), {idx.shape[0]} segs")

    pool = {"rays_o": jnp.asarray(ro[g]), "rays_d": jnp.asarray(rd[g]),
            "viewdirs": jnp.asarray(vd[g]), "rgb": jnp.asarray(rgb[g])}
    optimizer = MaskedAdam({
        "density": {"lr": 1e-1, "skip_zero_grad": True},
        "k0": {"lr": 1e-1, "skip_zero_grad": True},
        "rgbnet": {"lr": 1e-3},
    }, lr_decay_factor=0.1 ** (1 / 20000))
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=0.001, weight_rgbper=0.01,
        weight_tv_density=0.0, weight_tv_k0=0.0, N_rand=n_rand))
    rk = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)
    step = make_train_step(model, optimizer, cfg_train, rk,
                           apply_tv=False, tv_dense=False, axis=axis,
                           clip_sizes=(bp, eu, ev), n_steps=1, donate=False)
    params = jax.tree_util.tree_map(jnp.copy, model.params)
    opt_state = optimizer.init(model.params)
    sel = jnp.asarray(idx[0].astype(np.int32))
    off = jnp.asarray([bpo,
                       min(max(int(ulo[0]), buo), buo + bu - eu),
                       min(max(int(vlo[0]), bvo), bvo + bv - ev)],
                      jnp.int32)
    out = step(params, model.mask, opt_state, pool, sel, off)
    float(out[2])
    trace_dir = "/tmp/chain_floor_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(6):
            out = step(params, model.mask, opt_state, pool, sel, off)
        float(out[2])
    log("trace captured")

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = names.get(e["pid"], "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    total = sum(agg.values())
    log(f"total device time {total/1e3/6:.2f} ms/step over 6 steps")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        log(f"{dur/1e3/6:8.3f} ms  x{cnt[name]//6:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
