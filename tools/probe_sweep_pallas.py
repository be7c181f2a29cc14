#!/usr/bin/env python
"""Correctness + perf probe for the fused train-sweep forward kernel.

--cpu : interpret-mode numerics vs the XLA scan path (no TPU needed).
default: TPU — numerics then timed A/B (XLA scan vs Pallas) at the bench
shape, then the full engine step with the kernel on.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_case(n=512, gp=12, gu=16, gv=24, c=5, k=2, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    grid = rng.normal(0, 1, (gp, gu, gv, c)).astype(np.float32)
    grid_perm = jnp.asarray(grid.reshape(gp, gu, gv * c),
                            dtype=jnp.bfloat16)
    op = rng.uniform(-2, gp + 2, n).astype(np.float32)
    ou = rng.uniform(-1, gu, n).astype(np.float32)
    ov = rng.uniform(-1, gv, n).astype(np.float32)
    dp = rng.uniform(0.3, 1.0, n).astype(np.float32) \
        * rng.choice([-1.0, 1.0], n).astype(np.float32)
    du = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    dv = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    rays_pv = ((jnp.asarray(op), jnp.asarray(ou), jnp.asarray(ov)),
               (jnp.asarray(dp), jnp.asarray(du), jnp.asarray(dv)))
    return grid_perm, rays_pv, (c, k, gu, gv)


def check_numerics(interpret):
    import jax.numpy as jnp
    from directvoxgo_tpu.ops import sweep as sw
    from directvoxgo_tpu.ops import pallas_sweep_train as pst
    grid_perm, rays_pv, (c, k, gu, gv) = make_case()
    # XLA reference
    os.environ["DVGO_SWEEP_PALLAS"] = "0"
    vals_ref, ts_ref = sw._sweep_fwd_impl(grid_perm, rays_pv, c, k,
                                          (gu, gv), jnp.bfloat16)
    # kernel path (direct call so interpret works off-TPU)
    gp = grid_perm.shape[0]
    (op, ou, ov), (dp, du, dv) = rays_pv
    dp_safe = jnp.where(dp == 0, 1e-10, dp)
    grid_p, cp = pst.pad_channels(grid_perm, c)
    slabs = sw._station_slabs(grid_p, k)
    s = k * (gp - 1) + 1
    s_pad = pst._round_up(s, pst.S_BLK)
    if s_pad > s:
        slabs = jnp.concatenate(
            [slabs, jnp.zeros((s_pad - s, gu, cp * gv), slabs.dtype)])
    rp = jnp.stack([op, ou, ov, dp_safe, du, dv,
                    jnp.zeros_like(op), jnp.zeros_like(op)])
    vals = pst.sweep_fwd_pallas(slabs, rp, c=c, cp=cp, k=k, gu=gu, gv=gv,
                                interpret=interpret)
    vals = jnp.transpose(vals[:s], (1, 2, 0))
    err = float(jnp.max(jnp.abs(vals - vals_ref)))
    ref_mag = float(jnp.max(jnp.abs(vals_ref)))
    log(f"numerics: max|pallas - xla| = {err:.2e} (ref max {ref_mag:.2f})")
    assert err < 1e-2 * max(ref_mag, 1.0), "kernel diverges from XLA scan"
    os.environ.pop("DVGO_SWEEP_PALLAS", None)



def bench_tpu():
    import jax
    import jax.numpy as jnp
    from directvoxgo_tpu.ops import sweep as sw
    from bench import build_fine_model, _make_batches

    model = build_fine_model()
    axis = 2
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    log(f"clip={clip_sizes}")
    b = _make_batches(8192, axis, 1, seed=1)[0]
    ro, rd = jnp.asarray(b[0]), jnp.asarray(b[1])
    grid_cat = jnp.concatenate(
        [model.params["density"][..., None],
         model.mask.astype(jnp.float32)[..., None],
         model.params["k0"]], -1)
    co = jnp.asarray(clip_off)

    @jax.jit
    def run(grid_cat, ro, rd, co):
        out = sw.sweep_samples(grid_cat, None, ro, rd,
                               (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), axis,
                               stepsize=0.5, march_order=False,
                               clip_sizes=clip_sizes, clip_offsets=co,
                               pre_clipped=False,
                               world_size=tuple(model.world_size))
        return out["vals"]

    def vjp_run(grid_cat, ro, rd, co):
        def f(g):
            out = sw.sweep_samples(g, None, ro, rd,
                                   (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0),
                                   axis, stepsize=0.5, march_order=False,
                                   clip_sizes=clip_sizes, clip_offsets=co,
                                   pre_clipped=False,
                                   world_size=tuple(model.world_size))
            v = out["vals"]
            return jnp.sum(v * (0.3 + 0.1 * v))
        return jax.grad(f)(grid_cat)

    base = run.__wrapped__
    for flag in ("0", "1"):
        os.environ["DVGO_SWEEP_PALLAS"] = flag
        # fresh function objects per flag: jax caches traces by identity
        run2 = jax.jit(lambda *a, _f=base: _f(*a))
        vjp2 = jax.jit(lambda *a, _f=vjp_run: _f(*a))
        t0 = time.time()
        v = run2(grid_cat, ro, rd, co)
        v.block_until_ready()
        log(f"pallas={flag}: compile+first {time.time()-t0:.1f}s "
            f"sum={float(jnp.sum(v)):.4f}")
        t0 = time.time()
        reps = 30
        for _ in range(reps):
            v = run2(grid_cat, ro, rd, co)
        v.block_until_ready()
        fwd_ms = (time.time() - t0) / reps * 1000
        g = vjp2(grid_cat, ro, rd, co)
        g.block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            g = vjp2(grid_cat, ro, rd, co)
        g.block_until_ready()
        both_ms = (time.time() - t0) / reps * 1000
        log(f"pallas={flag}: sweep fwd {fwd_ms:.2f} ms, fwd+bwd "
            f"{both_ms:.2f} ms (bwd ~ {both_ms - fwd_ms:.2f}) "
            f"gsum={float(jnp.sum(g)):.3f}")
    os.environ.pop("DVGO_SWEEP_PALLAS", None)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        check_numerics(interpret=True)
        log("CPU interpret-mode numerics OK")
    else:
        check_numerics(interpret=False)
        bench_tpu()
