#!/usr/bin/env python
"""jax.profiler trace of the ENGINE windowed train step (window-as-clip) at
the real e2e shape — where does the W=32 class's ~21.6 ms go? Prints top
device ops by self time."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def main():
    from directvoxgo_tpu.engine import checkpoint as ckpt_lib
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu.data.load_data import load_data
    from directvoxgo_tpu import rays as ray_lib
    from directvoxgo_tpu.ops import sweep as sweep_ops
    from directvoxgo_tpu.config import Config, ConfigDict

    axis = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    wv = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    cfg = Config.fromfile("configs/synthetic/fixture_lego.py")
    data = load_data(cfg.data)
    model = ckpt_lib.load_model(
        DirectVoxGO, "logs/synthetic/fixture_lego/fine_last.tar")
    model.sweep_color_topk = 48
    i_train = data["i_train"]
    images = np.asarray(data["images"], np.float32)[i_train]
    rgb, ro, rd, vd, _ = ray_lib.get_training_rays_flatten(
        rgb_tr_ori=images, train_poses=data["poses"][i_train],
        HW=data["HW"][i_train], Ks=data["Ks"][i_train], ndc=False,
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)
    rgb = np.asarray(rgb).reshape(-1, 3)
    ro = np.asarray(ro).reshape(-1, 3)
    rd = np.asarray(rd).reshape(-1, 3)
    vd = np.asarray(vd).reshape(-1, 3)
    groups = sweep_ops.dominant_axis(rd, model.xyz_min, model.xyz_max,
                                     model.world_size)
    n_rand = 8192
    cfg_train = ConfigDict(
        N_rand=n_rand, weight_main=1.0, weight_entropy_last=0.001,
        weight_rgbper=0.01, weight_tv_density=0.0, weight_tv_k0=0.0,
        lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1, lrate_rgbnet=1e-3,
        skip_zero_grad_fields=["density", "k0"])
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    rk = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)
    pool = {"rgb": jnp.asarray(rgb), "rays_o": jnp.asarray(ro),
            "rays_d": jnp.asarray(rd), "viewdirs": jnp.asarray(vd)}
    rng = np.random.default_rng(0)

    gidx = np.flatnonzero(groups == axis)
    bk = sweep_ops.build_ray_segments(
        ro[gidx], rd[gidx], model.xyz_min, model.xyz_max,
        model.world_size, axis, n_rand=n_rand)
    idx, svlo, _ = bk[wv]
    perm = sweep_ops._PERMS[axis]
    gv = int(model.world_size[perm[2]])
    sizes = (int(model.world_size[perm[0]]),
             int(model.world_size[perm[1]]), wv)
    step = train_lib.make_train_step(
        model, optimizer, cfg_train, rk, apply_tv=False,
        tv_dense=False, axis=axis, clip_sizes=sizes, donate=False)
    r = int(rng.integers(0, idx.shape[0]))
    sel = jnp.asarray(gidx[idx[r]], jnp.int32)
    co = jnp.asarray([0, 0, min(int(svlo[r]), gv - wv)], jnp.int32)
    params = jax.tree_util.tree_map(jnp.copy, model.params)
    opt_state = optimizer.init(model.params)
    out = step(params, model.mask, opt_state, pool, sel, co)
    float(out[2])
    t0 = time.time()
    for _ in range(20):
        out = step(params, model.mask, opt_state, pool, sel, co)
    float(out[2])
    log(f"axis {axis} W={wv}: {(time.time()-t0)/20*1000:.2f} ms/iter "
        "(non-donating)")

    trace_dir = "/tmp/windowed_step_trace"
    os.system(f"rm -rf {trace_dir}")
    n_tr = 6
    with jax.profiler.trace(trace_dir):
        for _ in range(n_tr):
            out = step(params, model.mask, opt_state, pool, sel, co)
        float(out[2])
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        log("no trace file")
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
    log(f"total device time {total/1e3/n_tr:.2f} ms/step; "
        f"pids {set(names.values())}")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
        log(f"{dur/1e3/n_tr:8.3f} ms  x{cnt[name]//n_tr:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
