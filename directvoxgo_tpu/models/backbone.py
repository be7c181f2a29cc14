"""2D conv encoders for the image-conditioned variants (EDSR, resnet stem).

Functional JAX re-design of lib/backbone.py: EDSR baseline (16 resblocks,
64 feats, ``n_colors=9`` — the conditioning input is rgb ⊕ rays_o ⊕ rays_d,
backbone.py:168-180) and a resnet34 stem+layer1 extractor
(backbone.py:197-212). Layout is NHWC (TPU-native); convs run through
``lax.conv_general_dilated`` so XLA maps them onto the MXU. Pretrained
torch weights can be imported via :func:`load_torch_edsr_weights` when a
checkpoint file is available (the reference downloads from a URL table,
backbone.py:83-90; this environment has no egress, so import is file-based).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ conv ops

def init_conv(key, cin, cout, ksize, bias=True):
    """torch nn.Conv2d default init (kaiming-uniform a=sqrt(5))."""
    kw, kb = jax.random.split(key)
    fan_in = cin * ksize * ksize
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (ksize, ksize, cin, cout), jnp.float32,
                           -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def conv_apply(params, x, stride=1, padding="SAME"):
    """NHWC conv; weights [kh, kw, cin, cout]."""
    out = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in params:
        out = out + params["b"]
    return out


def max_pool2d(x, window=2, stride=None):
    stride = stride or window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID")


def pixel_shuffle(x, r):
    """[N,H,W,C*r^2] -> [N,H*r,W*r,C] (torch PixelShuffle semantics)."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


# ---------------------------------------------------------------------- EDSR

def init_edsr(key, n_resblocks=16, n_feats=64, n_colors=9, scale=2,
              res_scale=1.0, no_upsampling=True):
    """EDSR params (backbone.py:92-146 structure)."""
    keys = iter(jax.random.split(key, 4 + 2 * n_resblocks + 4))
    params = {
        "head": init_conv(next(keys), n_colors, n_feats, 3),
        "body": [
            {"c1": init_conv(next(keys), n_feats, n_feats, 3),
             "c2": init_conv(next(keys), n_feats, n_feats, 3)}
            for _ in range(n_resblocks)
        ],
        "body_tail": init_conv(next(keys), n_feats, n_feats, 3),
    }
    if not no_upsampling:
        tail = []
        assert scale & (scale - 1) == 0, "power-of-two upsampling only"
        for _ in range(int(math.log2(scale))):
            tail.append(init_conv(next(keys), n_feats, 4 * n_feats, 3))
        params["tail_up"] = tail
        params["tail_out"] = init_conv(next(keys), n_feats, n_colors, 3)
    return params


def edsr_apply(params, x, res_scale=1.0, no_upsampling=True):
    """x: [N, H, W, n_colors] -> features [N, H, W, n_feats] (or upsampled
    rgb when the tail is enabled)."""
    x = conv_apply(params["head"], x)
    res = x
    for blk in params["body"]:
        h = jax.nn.relu(conv_apply(blk["c1"], res))
        h = conv_apply(blk["c2"], h) * res_scale
        res = res + h
    res = conv_apply(params["body_tail"], res)
    out = res + x
    if not no_upsampling:
        for up in params["tail_up"]:
            out = pixel_shuffle(conv_apply(up, out), 2)
        out = conv_apply(params["tail_out"], out)
    return out


def make_edsr_baseline(key, n_resblocks=16, n_feats=64, res_scale=1.0,
                       scale=2, no_upsampling=True, n_colors=9):
    """(params, apply_fn, out_dim) triple mirroring backbone.py:168-180."""
    params = init_edsr(key, n_resblocks, n_feats, n_colors, scale, res_scale,
                       no_upsampling)

    def apply_fn(p, x):
        return edsr_apply(p, x, res_scale=res_scale,
                          no_upsampling=no_upsampling)

    out_dim = n_feats if no_upsampling else n_colors
    return params, apply_fn, out_dim


def load_torch_edsr_weights(params, state_dict):
    """Import a torch EDSR state_dict (file-based; no network access)."""
    def cv(name):
        w = np.asarray(state_dict[name + ".weight"])
        out = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
        if name + ".bias" in state_dict:
            out["b"] = jnp.asarray(np.asarray(state_dict[name + ".bias"]))
        return out

    params = dict(params)
    params["head"] = cv("head.0")
    body = []
    for i in range(len(params["body"])):
        body.append({"c1": cv(f"body.{i}.body.0"),
                     "c2": cv(f"body.{i}.body.2")})
    params["body"] = body
    params["body_tail"] = cv(f"body.{len(body)}")
    return params


# ------------------------------------------------------------- resnet stem

def _bn_identity(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn_apply(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def init_resnet_extractor(key, width=64, n_blocks=3):
    """resnet34 stem + layer1 structure (backbone.py:197-212): 7x7/2 conv,
    bn, relu, 3x3/2 maxpool, then ``n_blocks`` basic blocks at ``width``.
    BatchNorm runs in inference mode (frozen statistics), matching the
    reference's use as a frozen pretrained extractor."""
    keys = iter(jax.random.split(key, 1 + 2 * n_blocks))
    params = {
        "stem": init_conv(next(keys), 3, width, 7, bias=False),
        "stem_bn": _bn_identity(width),
        "blocks": [
            {"c1": init_conv(next(keys), width, width, 3, bias=False),
             "bn1": _bn_identity(width),
             "c2": init_conv(next(keys), width, width, 3, bias=False),
             "bn2": _bn_identity(width)}
            for _ in range(n_blocks)
        ],
    }
    return params


def resnet_extractor_apply(params, x):
    x = conv_apply(params["stem"], x, stride=2)
    x = jax.nn.relu(_bn_apply(params["stem_bn"], x))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    for blk in params["blocks"]:
        h = jax.nn.relu(_bn_apply(blk["bn1"], conv_apply(blk["c1"], x)))
        h = _bn_apply(blk["bn2"], conv_apply(blk["c2"], h))
        x = jax.nn.relu(x + h)
    return x
