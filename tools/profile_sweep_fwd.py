#!/usr/bin/env python
"""Sweep-forward variants: kill the per-station [N, Gv*C] f32 intermediate.

The fwd scan body is dot([N,Gu],[Gu,Gv*C]) -> einsum over Gv: the first
dot's output (44 MB f32 at the bench shape) must materialize between the two
contractions, while the BWD's broadcast-multiply fuses into its single dot's
operand load — which is why bwd (3.1 ms) beats fwd (7.6 ms). Variants:

  V0  current (f32 tmp)
  V1  bf16 tmp (dot epilogue cast halves the HBM traffic)
  V2  single fused dot: (wu ox wv)[N, Gu*Gv] @ D[Gu*Gv, C]
      (operand built in-fusion; pays 128/C MXU padding)
  V3  contract v first: wv @ D'[Gv, Gu*C] -> tmp[N, Gu*C], then einsum u
      (same size tmp; sanity check that order doesn't matter)
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(out[0][0, :2, 0]))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0][0, :2, 0]))
    return comp, (time.time() - t0) / iters


def make_inputs():
    n = 8192
    gp, gu, gv, c = 80, 112, 96, 14
    rng = np.random.default_rng(0)
    grid_perm = jnp.asarray(
        rng.normal(0, 1, (gp, gu, gv * c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    op = jnp.asarray(rng.uniform(0, gp - 1, n).astype(np.float32))
    ou = jnp.asarray(rng.uniform(0, gu - 1, n).astype(np.float32))
    ov = jnp.asarray(rng.uniform(0, gv - 1, n).astype(np.float32))
    dp = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    du = jnp.asarray(rng.uniform(-0.5, 0.5, n).astype(np.float32))
    dv = jnp.asarray(rng.uniform(-0.5, 0.5, n).astype(np.float32))
    return grid_perm, ((op, ou, ov), (dp, du, dv)), c, (gu, gv)


def variant_fwd(mode):
    def impl(grid_perm, rays_pv, c, guv):
        gu, gv = guv
        slabs = sweep_ops._station_slabs(grid_perm, 2)
        s = slabs.shape[0]
        p_stations = jnp.arange(s, dtype=jnp.float32) / 2

        def body(_, inp):
            d_st, p_s = inp
            n = rays_pv[0][0].shape[0]
            t, u, v = sweep_ops._station_uv(rays_pv, p_s)
            wu = sweep_ops._interp_rows(u, gu, jnp.bfloat16)
            wv = sweep_ops._interp_rows(v, gv, jnp.float32)
            if mode == "v0":
                tmp = jax.lax.dot(wu, d_st,
                                  preferred_element_type=jnp.float32)
                val = jnp.einsum("ngc,ng->cn", tmp.reshape(n, gv, c), wv)
            elif mode == "v1":
                tmp = jax.lax.dot(wu, d_st,
                                  preferred_element_type=jnp.float32)
                tmp = tmp.astype(jnp.bfloat16)
                val = jnp.einsum("ngc,ng->cn", tmp.reshape(n, gv, c),
                                 wv.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            elif mode == "v2":
                wuv = (wu[:, :, None]
                       * wv.astype(jnp.bfloat16)[:, None, :]).reshape(
                           n, gu * gv)
                dmat = d_st.reshape(gu, gv, c).reshape(gu * gv, c)
                val = jax.lax.dot(wuv, dmat,
                                  preferred_element_type=jnp.float32).T
            elif mode == "v3":
                dT = jnp.swapaxes(d_st.reshape(gu, gv, c), 0, 1) \
                    .reshape(gv, gu * c)
                tmp = jax.lax.dot(wv.astype(jnp.bfloat16), dT,
                                  preferred_element_type=jnp.float32)
                val = jnp.einsum("nuc,nu->cn", tmp.reshape(n, gu, c),
                                 wu.astype(jnp.float32))
            return (), (val, t)

        _, (vals, ts) = jax.lax.scan(body, (), (slabs, p_stations))
        return jnp.transpose(vals, (1, 2, 0)), jnp.transpose(ts, (1, 0))

    return impl


def main():
    log("devices:", jax.devices())
    grid_perm, rays_pv, c, guv = make_inputs()
    ref = None
    for mode in ("v0", "v1", "v2", "v3"):
        fn = jax.jit(lambda g, mode=mode: variant_fwd(mode)(
            g, rays_pv, c, guv))
        try:
            comp, dt = timeit(fn, grid_perm)
            vals = np.asarray(fn(grid_perm)[0][:, :64], np.float32)
            if ref is None:
                ref = vals
                err = 0.0
            else:
                err = float(np.max(np.abs(vals - ref))
                            / (np.abs(ref).max() + 1e-9))
            log(f"{mode}: {dt*1000:7.2f} ms  (compile {comp:.0f}s, "
                f"rel_err vs v0 {err:.2e})")
        except Exception as e:
            log(f"{mode}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
