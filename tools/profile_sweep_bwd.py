#!/usr/bin/env python
"""Backward-scan variants: kill the 3.9 ms of reshapes the trace found.

The bwd scan body builds rhs = (wv[:,:,None] * g.T[:,None,:]).reshape(n,
gv*c) — the trace shows reshape.168/169 at ~25 us x 2 x 79 slabs = 3.9 ms:
the reshape after the broadcast-multiply materializes a [N, Gv*C] bf16 copy
instead of fusing into the dot operand. Variants:

  B0  current (reshape + 2D dot)
  B1  3D dot_general, no reshape: dot(wu[n,gu], rhs3[n,gv,c]) -> [gu,gv,c],
      carry kept 3D, single reshape at the end
  B2  B1 with the g transpose folded differently (g arrives [c, n])
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
    float(jnp.sum(out[0, 0, :2]))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, 0, :2]))
    return comp, (time.time() - t0) / iters


def make_inputs():
    n = 8192
    gp, gu, gv, c = 80, 112, 96, 14
    k = 2
    s = k * (gp - 1) + 1
    rng = np.random.default_rng(0)
    g_vals = (rng.normal(0, 1, (c, n, s)) *
              (rng.uniform(0, 1, (c, n, s)) < 0.15)).astype(np.float32)
    op = jnp.asarray(rng.uniform(0, gp - 1, n).astype(np.float32))
    ou = jnp.asarray(rng.uniform(0, gu - 1, n).astype(np.float32))
    ov = jnp.asarray(rng.uniform(0, gv - 1, n).astype(np.float32))
    dp = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    du = jnp.asarray(rng.uniform(-0.5, 0.5, n).astype(np.float32))
    dv = jnp.asarray(rng.uniform(-0.5, 0.5, n).astype(np.float32))
    return jnp.asarray(g_vals), ((op, ou, ov), (dp, du, dv)), \
        (gp, gu, gv, c, k)


def bwd_b0(g_vals, rays_pv, dims):
    gp, gu, gv, c, k = dims
    return sweep_ops._sweep_bwd(c, k, (gu, gv),
                                (jnp.bfloat16, jnp.bfloat16), rays_pv,
                                (g_vals, jnp.zeros(g_vals.shape[1:])))[0]


def bwd_b1(g_vals, rays_pv, dims):
    """3D operands end-to-end: no [n, gv*c] reshape anywhere."""
    gp, gu, gv, c, k = dims
    interp_dtype = jnp.bfloat16
    s = g_vals.shape[2]
    fracs = [j / k for j in range(k)]
    g_sta = jnp.transpose(g_vals, (2, 0, 1))  # [S, C, N]
    g_main = g_sta[: (gp - 1) * k].reshape(gp - 1, k, c, g_vals.shape[1])
    g_last = g_sta[-1]

    def cotangent3(g_s, p_s):
        n = g_s.shape[1]
        _, u, v = sweep_ops._station_uv(rays_pv, p_s)
        wu = sweep_ops._interp_rows(u, gu, interp_dtype)
        wv = sweep_ops._interp_rows(v, gv, jnp.float32)
        rhs3 = (wv[:, :, None] * g_s.T[:, None, :]).astype(interp_dtype)
        return jax.lax.dot_general(
            wu, rhs3, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [gu, gv, c]

    def body(pending, inp):
        g_z, z = inp
        d_prev = pending
        d_next = jnp.zeros_like(pending)
        for j, f in enumerate(fracs):
            p_s = z.astype(jnp.float32) - 1.0 + f
            d_st = cotangent3(g_z[j], p_s)
            d_prev = d_prev + (1.0 - f) * d_st
            if j > 0:
                d_next = d_next + f * d_st
        return d_next, d_prev

    zs = jnp.arange(1, gp, dtype=jnp.int32)
    init = jnp.zeros((gu, gv, c), jnp.float32)
    pending, d_slabs = jax.lax.scan(body, init, (g_main, zs))
    d_last = pending + cotangent3(g_last, jnp.float32(gp - 1.0))
    d_grid = jnp.concatenate([d_slabs, d_last[None]], axis=0)
    return d_grid.reshape(gp, gu, gv * c).astype(jnp.bfloat16)


def main():
    log("devices:", jax.devices())
    g_vals, rays_pv, dims = make_inputs()
    ref = None
    for name, fn in (("B0", bwd_b0), ("B1", bwd_b1)):
        f = jax.jit(lambda g, fn=fn: fn(g, rays_pv, dims))
        comp, dt = timeit(f, g_vals)
        out = np.asarray(f(g_vals)[:, :16].astype(jnp.float32))
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref))
                        / (np.abs(ref).max() + 1e-9))
        log(f"{name}: {dt*1000:7.2f} ms (compile {comp:.0f}s, "
            f"rel_err {err:.2e})")


if __name__ == "__main__":
    main()
