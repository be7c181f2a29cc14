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
    """Apply the MLP; batch dims are arbitrary, contraction on the last.

    Hidden activations are produced directly in ``compute_dtype`` (see
    :func:`mlp_apply_split` on why); the final layer comes out f32."""
    layers = params["layers"]
    orig_dtype = x.dtype
    cd = compute_dtype
    acc = cd or jnp.float32
    if cd is not None:
        x = x.astype(cd)
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        is_last = i == len(layers) - 1
        if cd is not None and not is_last:
            w = w.astype(cd)
        out_dtype = jnp.float32 if is_last else acc
        x = jnp.dot(x, w, preferred_element_type=out_dtype) \
            + b.astype(out_dtype)
        if not is_last:
            x = jax.nn.relu(x)
    return x.astype(orig_dtype)


def mlp_apply_split(params, x_samples, x_shared, compute_dtype=None):
    """MLP whose input is ``concat([x_samples, x_shared_broadcast], -1)``.

    ``x_samples`` is [..., S, D1] (per-sample features) and ``x_shared`` is
    [..., D2] (per-ray features, constant across the sample axis). Layer 1 is
    split so the shared part is computed once per ray instead of per sample —
    this also avoids materializing the concatenated [..., S, D1+D2] tensor
    (the reference concatenates, lib/dvgo.py:527-530; on TPU the broadcast
    concat dominates HBM traffic).

    With ``compute_dtype=bfloat16`` the hidden activations are *produced* in
    bf16 (MXU accumulation stays f32 internally): requesting f32 dot outputs
    and down-casting afterwards materializes an extra [.., S, width] f32
    tensor per layer — pure HBM traffic for bits that are immediately
    rounded away. Only the final logits come out f32.
    """
    layers = params["layers"]
    w1, b1 = layers[0]["w"], layers[0]["b"]
    d1 = x_samples.shape[-1]
    wa, wb = w1[:d1], w1[d1:]
    cd = compute_dtype
    acc = cd or jnp.float32
    if cd is not None:
        x_samples, x_shared = x_samples.astype(cd), x_shared.astype(cd)
        wa, wb, b1 = wa.astype(cd), wb.astype(cd), b1.astype(cd)
    # per-ray half in f32 (tiny), rounded once when added to the sample half
    shared = (jnp.dot(x_shared, wb, preferred_element_type=jnp.float32)
              + b1).astype(acc)
    x = jnp.dot(x_samples, wa, preferred_element_type=acc) \
        + shared[..., None, :]
    x = jax.nn.relu(x)
    for i, layer in enumerate(layers[1:]):
        w, b = layer["w"], layer["b"]
        is_last = i == len(layers) - 2
        if cd is not None and not is_last:
            w, b = w.astype(cd), b.astype(cd)
        out_dtype = jnp.float32 if is_last else acc
        x = jnp.dot(x, w, preferred_element_type=out_dtype) \
            + b.astype(out_dtype)
        if not is_last:
            x = jax.nn.relu(x)
    return x.astype(jnp.float32)


def mlp_apply_split_cl(params, x_cl, x_shared, compute_dtype=None):
    """:func:`mlp_apply_split` for channels-leading sample features.

    ``x_cl`` is [D1, N, S] (the station sweep's native layout — see
    ops/sweep.py on why small-channel-minor tensors are poison on TPU) and
    ``x_shared`` is [N, D2]. Returns logits [D_out, N, S], also
    channels-leading. Hidden activations are [N, S, width] (width >= 128:
    unpadded tiles) produced directly in ``compute_dtype``.
    """
    layers = params["layers"]
    w1, b1 = layers[0]["w"], layers[0]["b"]
    d1 = x_cl.shape[0]
    wa, wb = w1[:d1], w1[d1:]
    cd = compute_dtype
    acc = cd or jnp.float32
    if cd is not None:
        x_cl, x_shared = x_cl.astype(cd), x_shared.astype(cd)
        wa, wb, b1 = wa.astype(cd), wb.astype(cd), b1.astype(cd)
    shared = (jnp.dot(x_shared, wb, preferred_element_type=jnp.float32)
              + b1).astype(acc)
    # contract the leading channel dim: [D1, N, S] x [D1, W] -> [N, S, W]
    x = jax.lax.dot_general(x_cl, wa,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=acc) \
        + shared[:, None, :]
    x = jax.nn.relu(x)
    for i, layer in enumerate(layers[1:]):
        w, b = layer["w"], layer["b"]
        is_last = i == len(layers) - 2
        if is_last:
            # emit channels-leading: [D_out, W] x [N, S, W] -> [D_out, N, S]
            if jax.default_backend() == "cpu":
                # XLA:CPU's DotThunk lacks this bf16 contraction form; the
                # [N, S, 3] detour only pads tiles on TPU, not here.
                logit = jnp.dot(x, w.astype(x.dtype),
                                preferred_element_type=jnp.float32)
                logit = jnp.transpose(logit, (2, 0, 1))
            else:
                logit = jax.lax.dot_general(
                    w.astype(x.dtype).T, x,
                    dimension_numbers=(((1,), (2,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return logit + b.astype(jnp.float32)[:, None, None]
        if cd is not None:
            w, b = w.astype(cd), b.astype(cd)
        x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=acc)
                        + b.astype(acc))
    raise AssertionError("MLP needs depth >= 2")


def positional_encoding(x, n_freqs):
    """[x, sin(x*2^i), cos(x*2^i)] embedding (lib/dvgo.py:524-525)."""
    if n_freqs <= 0:
        return x
    freqs = jnp.asarray([2.0 ** i for i in range(n_freqs)], x.dtype)
    emb = x[..., None] * freqs
    emb = emb.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(emb), jnp.cos(emb)], axis=-1)
