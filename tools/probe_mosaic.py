#!/usr/bin/env python
"""Probe Mosaic op costs for the v3 frame kernel, on the real TPU.

Measurement rules learned the hard way on this stack:
  - axon dispatch ~ a few ms; block_until_ready is a no-op -> sync by
    pulling ONE scalar (float(out[0,0])), never the full output;
  - identical op bodies get CSE'd -> every rep indexes a distinct weight
    slice;
  - per-grid-step overhead is separated by scaling grid size G.
Per-op cost = (t(G) - t_null(G)) / (G * R).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(body_fn, inputs, reps, g):
    """Kernel computes reps ops per grid step, stores a scalar digest."""
    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        acc = None
        for i in range(reps):
            r = body_fn(i, *ins)
            acc = r if acc is None else acc + r
        # digest: FULL reduction so Mosaic cannot narrow the producing ops.
        s = jnp.sum(acc.astype(jnp.float32))
        out[:] = out[:] + s * jnp.ones((8, 128), jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
        out_specs=pl.BlockSpec((8, 128), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    return jax.jit(lambda *a: f(*a))


def timeit(fn, inputs):
    t0 = time.time()
    out = fn(*inputs)
    float(out[0, 0])
    comp = time.time() - t0
    best = 1e9
    for _ in range(8):
        t0 = time.time()
        out = fn(*inputs)
        float(out[0, 0])
        best = min(best, time.time() - t0)
    return comp, best


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    results = {}

    # Null kernel at two grid sizes: dispatch + per-step overhead.
    def null_body(i, x_ref):
        return x_ref[:] * 1.0001
    x0 = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    nulls = {}
    for g in (64, 512):
        fn = build(null_body, [x0], 1, g)
        comp, t = timeit(fn, (x0,))
        nulls[g] = t
        log(f"null G={g}: compile {comp:.1f}s call {t*1e3:.3f}ms")
    step_oh = (nulls[512] - nulls[64]) / (512 - 64)
    log(f"per-grid-step overhead ~{step_oh*1e6:.1f}us, "
        f"dispatch ~{(nulls[64]-64*step_oh)*1e3:.2f}ms")

    G = 512

    def run(name, body, inputs, reps):
        try:
            fn = build(body, inputs, reps, G)
            comp, t = timeit(fn, inputs)
            op_us = (t - nulls[512]) / (G * reps) * 1e6
            results[name] = op_us
            log(f"{name}: compile {comp:.1f}s call {t*1e3:.2f}ms "
                f"-> {op_us:.2f} us/op")
        except Exception as e:
            results[name] = None
            log(f"{name}: FAILED: {type(e).__name__}: {str(e)[:250]}")

    R = 8

    # b12: 12-way batched matmul (color warp step B).
    a = jnp.asarray(rng.normal(size=(12, 128, 160)), bf)
    w = jnp.asarray(rng.normal(size=(R, 12, 160, 128)), bf)
    run("b12", lambda i, a_ref, w_ref: jax.lax.dot_general(
        a_ref[:], w_ref[i], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32), [a, w], R)

    # b8geo: 8-way batched geometry matmul.
    a = jnp.asarray(rng.normal(size=(8, 128, 160)), bf)
    w = jnp.asarray(rng.normal(size=(R, 8, 160, 320)), bf)
    run("b8geo", lambda i, a_ref, w_ref: jax.lax.dot_general(
        a_ref[:], w_ref[i], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32), [a, w], R)

    # lead: contraction over leading dim (channels-leading MLP layer 1).
    x = jnp.asarray(rng.normal(size=(12, 128, 128)), bf)
    w = jnp.asarray(rng.normal(size=(R, 12, 128)), bf)
    run("lead", lambda i, x_ref, w_ref: jax.lax.dot_general(
        x_ref[:], w_ref[i], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), [x, w], 4)

    # mm: [128,160]@[160,1920] (t1 color warp, v1 layout).
    a = jnp.asarray(rng.normal(size=(128, 160)), bf)
    w = jnp.asarray(rng.normal(size=(R, 160, 1920)), bf)
    run("mm", lambda i, a_ref, w_ref: jax.lax.dot(
        a_ref[:], w_ref[i], preferred_element_type=jnp.float32), [a, w], R)

    # mmT: [1920,160]@[160,128] (transposed-slab warp).
    a = jnp.asarray(rng.normal(size=(R, 1920, 160)), bf)
    w = jnp.asarray(rng.normal(size=(160, 128)), bf)
    run("mmT", lambda i, a_ref, w_ref: jax.lax.dot(
        a_ref[i], w_ref[:], preferred_element_type=jnp.float32), [a, w], R)

    # small: [128,160]x[128,160]->[128,128] contraction (v1 per-channel unit).
    a = jnp.asarray(rng.normal(size=(128, 160)), bf)
    w = jnp.asarray(rng.normal(size=(R, 128, 160)), bf)
    run("small", lambda i, a_ref, w_ref: jax.lax.dot_general(
        a_ref[:], w_ref[i], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32), [a, w], R)

    # acc: bf16 VPU multiply on [128,128,128] (layer-1 accumulate unit).
    x = jnp.asarray(rng.normal(size=(128, 128, 128)), bf)
    w = jnp.asarray(rng.normal(size=(R, 1, 128)), bf)
    run("acc", lambda i, x_ref, w_ref: x_ref[:] * w_ref[i][None], [x, w], R)

    # r3dot: rank-3 minor contraction (MLP layer 2 form), bf16 out.
    x = jnp.asarray(rng.normal(size=(128, 128, 128)), bf)
    w = jnp.asarray(rng.normal(size=(R, 128, 128)), bf)
    run("r3dot", lambda i, x_ref, w_ref: jax.lax.dot_general(
        x_ref[:], w_ref[i], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), [x, w], 4)

    # r3f: flattened equivalent [16384,128]@[128,128].
    x = jnp.asarray(rng.normal(size=(16384, 128)), bf)
    w = jnp.asarray(rng.normal(size=(R, 128, 128)), bf)
    run("r3f", lambda i, x_ref, w_ref: jax.lax.dot(
        x_ref[:], w_ref[i], preferred_element_type=jnp.float32), [x, w], 4)

    # vpu2d: [128,128] f32 exp (alpha-chain unit).
    x = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(R, 128, 128)), jnp.float32)
    run("vpu2d", lambda i, x_ref, w_ref: jnp.exp(x_ref[:] * w_ref[i]),
        [x, w], R)

    # vpu3d8: [8,128,128] f32 exp (batched alpha-chain unit).
    x = jnp.asarray(rng.normal(size=(8, 128, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(R, 8, 128, 128)), jnp.float32)
    run("vpu3d8", lambda i, x_ref, w_ref: jnp.exp(x_ref[:] * w_ref[i]),
        [x, w], R)

    log("RESULTS(us/op):", {k: (None if v is None else round(v, 2))
                            for k, v in results.items()})


if __name__ == "__main__":
    main()
