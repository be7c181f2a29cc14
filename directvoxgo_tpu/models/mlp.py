"""Small functional MLP utilities (params as pytrees, [in, out] weights).

Replaces the reference's ``nn.Sequential(Linear, ReLU, ...)`` rgbnet
construction (lib/dvgo.py:123-131). Init matches torch ``nn.Linear`` defaults
(kaiming-uniform weights / uniform bias, both U(-1/sqrt(fan_in),
1/sqrt(fan_in))) so training dynamics stay comparable; the final bias is
zeroed as in the reference (lib/dvgo.py:131).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(key, fan_in, fan_out, zero_bias=False):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    if zero_bias:
        b = jnp.zeros((fan_out,), jnp.float32)
    else:
        b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_mlp(key, dim_in, width, depth, dim_out, zero_last_bias=True):
    """``depth`` linear layers total: in->width, (depth-2)x width->width,
    width->out, with ReLU between (lib/dvgo.py:123-130)."""
    dims = [dim_in] + [width] * (depth - 1) + [dim_out]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, k in enumerate(keys):
        is_last = i == len(dims) - 2
        layers.append(init_linear(k, dims[i], dims[i + 1],
                                  zero_bias=(is_last and zero_last_bias)))
    return {"layers": layers}


def mlp_apply(params, x, compute_dtype=None):
    """Apply the MLP; batch dims are arbitrary, contraction on the last."""
    layers = params["layers"]
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
        x = x.astype(compute_dtype or orig_dtype)
    return x.astype(orig_dtype)


def mlp_apply_split(params, x_samples, x_shared, compute_dtype=None):
    """MLP whose input is ``concat([x_samples, x_shared_broadcast], -1)``.

    ``x_samples`` is [..., S, D1] (per-sample features) and ``x_shared`` is
    [..., D2] (per-ray features, constant across the sample axis). Layer 1 is
    split so the shared part is computed once per ray instead of per sample —
    this also avoids materializing the concatenated [..., S, D1+D2] tensor
    (the reference concatenates, lib/dvgo.py:527-530; on TPU the broadcast
    concat dominates HBM traffic).
    """
    layers = params["layers"]
    w1, b1 = layers[0]["w"], layers[0]["b"]
    d1 = x_samples.shape[-1]
    wa, wb = w1[:d1], w1[d1:]
    cd = compute_dtype
    if cd is not None:
        x_samples, x_shared = x_samples.astype(cd), x_shared.astype(cd)
        wa, wb, b1 = wa.astype(cd), wb.astype(cd), b1.astype(cd)
    shared = jnp.dot(x_shared, wb, preferred_element_type=jnp.float32) + b1
    x = jnp.dot(x_samples, wa, preferred_element_type=jnp.float32) \
        + shared[..., None, :]
    x = jax.nn.relu(x)
    if cd is not None:
        x = x.astype(cd)
    for i, layer in enumerate(layers[1:]):
        w, b = layer["w"], layer["b"]
        if cd is not None:
            w, b = w.astype(cd), b.astype(cd)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        if i < len(layers) - 2:
            x = jax.nn.relu(x)
            if cd is not None:
                x = x.astype(cd)
    return x.astype(jnp.float32)


def positional_encoding(x, n_freqs):
    """[x, sin(x*2^i), cos(x*2^i)] embedding (lib/dvgo.py:524-525)."""
    if n_freqs <= 0:
        return x
    freqs = jnp.asarray([2.0 ** i for i in range(n_freqs)], x.dtype)
    emb = x[..., None] * freqs
    emb = emb.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(emb), jnp.cos(emb)], axis=-1)
