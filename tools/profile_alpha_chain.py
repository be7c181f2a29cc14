#!/usr/bin/env python
"""Isolate the compositing (alpha->weights) chain's backward cost.

profile_train_bwd.py put the non-sweep, non-MLP backward at ~7.5 ms on
[8192, 159] tensors — absurd for ~5 MB arrays unless an op lowers badly.
Suspects: jnp.cumprod's VJP (reverse scan with divisions), the double
(bidirectional) cumprod, the where-mask chains, raw2alpha transcendentals.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from directvoxgo_tpu.ops import raymarch as rm  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(out) if not isinstance(out, tuple) else jnp.sum(out[0]))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out) if not isinstance(out, tuple) else jnp.sum(out[0]))
    return comp, (time.time() - t0) / iters


def main():
    log("devices:", jax.devices())
    n, s = 8192, 159
    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.normal(-2, 2, (n, s)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(0, 1, (n, s)) < 0.3)
    fwd_flag = jnp.asarray(rng.uniform(0, 1, n) < 0.5)
    interval = jnp.asarray(np.full((n, 1), 0.5, np.float32))
    ct = jnp.asarray(rng.normal(0, 1, (n, s)).astype(np.float32))

    def chain(density):
        alpha = rm.raw2alpha(density, -3.0, interval)
        occ = valid & (alpha > 1e-4)
        weights, alphainv_last, live = rm.alpha2weight_dense_bidir(
            alpha, occ, fwd_flag)
        w_eff = jnp.where(weights > 1e-4, weights, 0.0)
        pout = jnp.clip(alphainv_last, 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
        return jnp.sum(w_eff * ct) / n + 0.001 * ent

    comp, dt = timeit(jax.jit(jax.value_and_grad(chain)), density)
    log(f"F  alpha chain v&g:            {dt*1000:7.2f} ms (compile {comp:.0f}s)")

    comp, dt = timeit(jax.jit(chain), density)
    log(f"F1 alpha chain fwd only:       {dt*1000:7.2f} ms")

    # raw2alpha alone
    def r2a(density):
        return jnp.sum(rm.raw2alpha(density, -3.0, interval) * ct)

    comp, dt = timeit(jax.jit(jax.value_and_grad(r2a)), density)
    log(f"F2 raw2alpha v&g:              {dt*1000:7.2f} ms")

    # one plain cumprod's v&g
    alpha0 = jax.jit(lambda d: rm.raw2alpha(d, -3.0, interval))(density)

    def one_cumprod(a):
        return jnp.sum(jnp.cumprod(1.0 - a + 1e-10, axis=-1) * ct)

    comp, dt = timeit(jax.jit(jax.value_and_grad(one_cumprod)), alpha0)
    log(f"F3 single cumprod v&g:         {dt*1000:7.2f} ms")

    comp, dt = timeit(jax.jit(one_cumprod), alpha0)
    log(f"F4 single cumprod fwd:         {dt*1000:7.2f} ms")

    # log-space alternative: cumsum of logs (stable for one_minus >= eps)
    def log_cumprod(a):
        t = jnp.exp(jnp.cumsum(jnp.log(1.0 - a + 1e-10), axis=-1))
        return jnp.sum(t * ct)

    comp, dt = timeit(jax.jit(jax.value_and_grad(log_cumprod)), alpha0)
    log(f"F5 log-space cumprod v&g:      {dt*1000:7.2f} ms")

    # cumsum v&g baseline (transpose of cumsum is reverse cumsum)
    def cs(a):
        return jnp.sum(jnp.cumsum(a, axis=-1) * ct)

    comp, dt = timeit(jax.jit(jax.value_and_grad(cs)), alpha0)
    log(f"F6 single cumsum v&g:          {dt*1000:7.2f} ms")

    # the full bidir compositing on its own
    def bidir(a):
        w, ai, live = rm.alpha2weight_dense_bidir(a, valid, fwd_flag)
        return jnp.sum(w * ct) + jnp.sum(ai)

    comp, dt = timeit(jax.jit(jax.value_and_grad(bidir)), alpha0)
    log(f"F7 alpha2weight_bidir v&g:     {dt*1000:7.2f} ms")

    comp, dt = timeit(jax.jit(bidir), alpha0)
    log(f"F8 alpha2weight_bidir fwd:     {dt*1000:7.2f} ms")


if __name__ == "__main__":
    main()
