"""Microbenchmarks for the hot ops on the real device.

Run: python tools/microbench.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    N, S = 8192, 559
    G = 160

    grid1 = jnp.asarray(rng.normal(size=(G * G * G,)).astype(np.float32))
    grid12 = jnp.asarray(rng.normal(size=(G * G * G, 12)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, G ** 3, (N, S)), jnp.int32)
    keys = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(N, S, 3)).astype(np.float32))

    take1 = jax.jit(lambda g, i: jnp.take(g, i, axis=0))
    t = timeit(take1, grid1, idx)
    print(f"gather 1ch {N}x{S}: {t*1e3:.2f} ms "
          f"({N*S/t/1e6:.0f} M/s)")

    take12 = jax.jit(lambda g, i: jnp.take(g, i, axis=0))
    t = timeit(take12, grid12, idx[:, :64])
    print(f"gather 12ch {N}x64: {t*1e3:.2f} ms ({N*64/t/1e6:.0f} M/s)")

    srt = jax.jit(lambda k: jnp.argsort(k, axis=-1))
    t = timeit(srt, keys)
    print(f"argsort {N}x{S}: {t*1e3:.2f} ms")

    topk = jax.jit(lambda k: jax.lax.top_k(k, 64))
    t = timeit(topk, keys)
    print(f"top_k64 {N}x{S}: {t*1e3:.2f} ms")

    def scatter(g, i, v):
        return g.at[i].add(v[..., 0])
    sct = jax.jit(scatter)
    t = timeit(sct, grid1, idx, vals)
    print(f"scatter-add 1ch {N}x{S}: {t*1e3:.2f} ms")

    cum = jax.jit(lambda k: jnp.cumprod(1 - jax.nn.sigmoid(k), axis=-1))
    t = timeit(cum, keys)
    print(f"cumprod {N}x{S}: {t*1e3:.2f} ms")

    mlp_w1 = jnp.asarray(rng.normal(size=(39, 128)).astype(np.float32))
    mlp_w2 = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    mlp_w3 = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N * 64, 39)).astype(np.float32))

    def mlp(x):
        h = jax.nn.relu(x @ mlp_w1)
        h = jax.nn.relu(h @ mlp_w2)
        return h @ mlp_w3
    t = timeit(jax.jit(mlp), x)
    print(f"mlp {N*64}x(39-128-128-3): {t*1e3:.2f} ms")

    # trilinear via 8 gathers (the real access pattern: spatially coherent)
    from directvoxgo_tpu.ops.grid import trilinear_sample
    pts_idx = jnp.asarray(
        rng.uniform(0, G - 1, (N, S, 3)).astype(np.float32))
    g3 = jnp.asarray(rng.normal(size=(G, G, G)).astype(np.float32))
    tri = jax.jit(lambda g, p: trilinear_sample(g, p))
    t = timeit(tri, g3, pts_idx)
    print(f"trilinear 1ch {N}x{S}: {t*1e3:.2f} ms")

    tri_grad = jax.jit(jax.grad(lambda g, p: jnp.sum(trilinear_sample(g, p))))
    t = timeit(tri_grad, g3, pts_idx)
    print(f"trilinear-grad 1ch {N}x{S}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
