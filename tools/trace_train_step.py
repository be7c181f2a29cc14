#!/usr/bin/env python
"""Capture a jax.profiler trace of the full train-step value_and_grad at the
bench shape, then print the top device ops by self time from the trace."""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", jax.devices())
    from bench import build_fine_model
    model = build_fine_model()
    n_rand = 8192
    rng = np.random.default_rng(0)
    rays_o = np.tile([[0.0, 0.0, 3.5]], (n_rand, 1)).astype(np.float32)
    ang = rng.uniform(-0.3, 0.3, (n_rand, 2))
    rays_d = np.stack([np.tan(ang[:, 0]), np.tan(ang[:, 1]),
                       -np.ones(n_rand)], -1).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)
    rays_o, rays_d, viewdirs, target = map(jnp.asarray,
                                           (rays_o, rays_d, viewdirs, target))
    axis = 2
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    clip_off = jnp.asarray(clip_off)
    kw = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5)
    params, mask = model.params, model.mask

    def full_loss(params):
        ret = model.forward_sweep(params, mask, rays_o, rays_d, viewdirs,
                                  axis, clip_sizes=clip_sizes,
                                  clip_offsets=clip_off, **kw)
        mse = jnp.mean((ret["rgb_marched"] - target) ** 2)
        pout = jnp.clip(ret["alphainv_last"], 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
        rgbper = jnp.sum((ret["raw_rgb_cl"] - target.T[:, :, None]) ** 2,
                         axis=0)
        rl = jnp.sum(rgbper * jax.lax.stop_gradient(ret["weights"])) / n_rand
        return mse + 0.001 * ent + 0.01 * rl

    g = jax.jit(jax.value_and_grad(full_loss))
    out = g(params)
    float(out[0])
    trace_dir = "/tmp/train_step_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(6):
            out = g(params)
        float(out[0])
    log("trace captured")

    # Parse the trace proto-json for device op self-times.
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    log("trace files:", paths)
    if not paths:
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # device events live on TPU pids; find the pid names
    names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    from collections import defaultdict
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        pname = names.get(e["pid"], "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    total = sum(agg.values())
    log(f"total device time {total/1e3/6:.2f} ms/step over 6 steps; pids:"
        f" {set(names.values())}")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        log(f"{dur/1e3/6:8.3f} ms  x{cnt[name]//6:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
