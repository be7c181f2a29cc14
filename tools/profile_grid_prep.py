#!/usr/bin/env python
"""Grid-prep (pack/slice/permute) fwd+VJP cost at the bench shape.

forward_sweep packs [160^3] density + mask + [160^3,12] k0 into a bf16
channel-stacked grid, dynamic_slices the occupancy clip box, and permutes
to slab order (models/dvgo.py forward_sweep + ops/sweep.sweep_samples).
The VJP un-permutes, pads back to 160^3 and splits channels — suspected
~7 ms of the train step (profile_train_bwd: B-D=10.8 vs pure scan bwd 3.1).

Variants:
  P0 current order: cast+concat FULL grids -> slice -> permute
  P1 slice-first:  slice each grid to the box -> cast+concat -> permute
  P2 slice-first + direct-permuted concat (no second transpose)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from directvoxgo_tpu.ops import sweep as sweep_ops  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=20, dig=None):
    out = fn(*args)
    dig(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    dig(out)
    return (time.time() - t0) / iters


def main():
    log("devices:", jax.devices())
    G = 160
    axis = 2
    sizes_xyz = (112, 96, 80)  # xyz order for axis=2 clip (p,u,v)=(80,112,96)
    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.normal(0, 1, (G, G, G)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (G, G, G)) < 0.05)
    k0 = jnp.asarray(rng.normal(0, 1, (G, G, G, 12)).astype(np.float32))
    off = jnp.asarray(np.array([33, 31, 35], np.int32))  # xyz order

    def prep0(density, k0):
        chans = [density.astype(jnp.bfloat16)[..., None],
                 mask.astype(jnp.bfloat16)[..., None],
                 k0.astype(jnp.bfloat16)]
        grid_cat = jnp.concatenate(chans, axis=-1)
        grid = jax.lax.dynamic_slice(
            grid_cat, (*[off[i] for i in range(3)], jnp.int32(0)),
            (*sizes_xyz, 14))
        return sweep_ops.permute_grid(grid, axis)

    def prep1(density, k0):
        sl = [jax.lax.dynamic_slice(g, (*[off[i] for i in range(3)],
                                        jnp.int32(0))[:g.ndim],
                                    (*sizes_xyz, *g.shape[3:]))
              for g in (density, mask, k0)]
        chans = [sl[0].astype(jnp.bfloat16)[..., None],
                 sl[1].astype(jnp.bfloat16)[..., None],
                 sl[2].astype(jnp.bfloat16)]
        grid_cat = jnp.concatenate(chans, axis=-1)
        return sweep_ops.permute_grid(grid_cat, axis)

    def prep2(density, k0):
        perm = sweep_ops._PERMS[axis]
        outs = []
        for g in (density, mask, k0):
            s = jax.lax.dynamic_slice(
                g, (*[off[i] for i in range(3)], jnp.int32(0))[:g.ndim],
                (*sizes_xyz, *g.shape[3:]))
            if s.ndim == 3:
                s = s[..., None]
            outs.append(jnp.transpose(s, (*perm, 3)).astype(jnp.bfloat16))
        g = jnp.concatenate(outs, axis=-1)
        gp, gu, gv, c = g.shape
        return g.reshape(gp, gu, gv * c)

    ct = None
    for name, fn in (("P0", prep0), ("P1", prep1), ("P2", prep2)):
        f = jax.jit(fn)
        dt = timeit(f, density, k0,
                    dig=lambda o: float(jnp.sum(o[0, :2, :2].astype(
                        jnp.float32))))
        out = f(density, k0)
        if ct is None:
            ct = jnp.asarray(rng.normal(0, 1, out.shape).astype(np.float32)
                             ).astype(jnp.bfloat16)

        def vjp_fn(d, k, fn=fn):
            _, pull = jax.vjp(lambda dd, kk: fn(dd, kk), d, k)
            return pull(ct)

        fv = jax.jit(vjp_fn)
        dtv = timeit(fv, density, k0,
                     dig=lambda o: float(jnp.sum(o[0][:2, 0, 0])))
        log(f"{name}: fwd {dt*1000:7.2f} ms   fwd+vjp {dtv*1000:7.2f} ms")


if __name__ == "__main__":
    main()
