#!/usr/bin/env python
"""Dump the optimized HLO of the train-step value_and_grad and print the
instructions inside the fusions the profiler flagged as hot."""
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
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

    txt = jax.jit(jax.value_and_grad(full_loss)).lower(params) \
        .compile().as_text()
    with open("/tmp/train_step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)} chars", file=sys.stderr)

    want = sys.argv[1:] or ["fusion.211", "fusion.245", "copy.25",
                            "convert_element_type.46", "fusion.181",
                            "fusion.182", "fusion.189", "fusion.57",
                            "bitcast_convert_fusion", "multiply_reduce_fusion",
                            "reshape.168", "reshape.169", "fusion.270",
                            "fusion.265", "copy.27"]
    # map computation name -> body for fused computations
    comps = {}
    cur, buf = None, []
    for line in txt.splitlines():
        m = re.match(r"^%?([\w.\-]+)\s*(\([^)]*\).*)?\{\s*$", line.strip())
        if line.strip().endswith("{") and ("fused_computation" in line
                                           or line.startswith("ENTRY")
                                           or "comp" in line.split()[0]):
            cur, buf = line.strip(), []
            continue
        if cur is not None:
            if line.strip() == "}":
                comps[cur] = buf
                cur = None
            else:
                buf.append(line.rstrip())

    for name in want:
        pat = re.compile(rf"%?{re.escape(name)}\b\s*=")
        hits = [ln for ln in txt.splitlines() if pat.search(ln)]
        print(f"\n==== {name} ====")
        for h in hits[:3]:
            print(h.strip()[:600])
            m = re.search(r"calls=%?([\w.\-]+)", h)
            if m:
                body = None
                for cname, lines in comps.items():
                    if m.group(1) in cname:
                        body = lines
                        break
                if body:
                    for ln in body[:25]:
                        print("   |", ln.strip()[:200])


if __name__ == "__main__":
    main()
