"""Neural-net zoo for the conditioned model variants.

Functional JAX re-designs of lib/mlp.py's modules: the skip-connected
NeRF MLP (mlp.py:6-51), pose-conditioned feature mappings (Mapping
mlp.py:54-85, Conv_Mapping/Conv_Mapping_d_o mlp.py:158-229), the LIIF
decoder (Interp_MLP, mlp.py:88-101), SIREN layers (mlp.py:239-278),
non-local attention between feature and density maps (NLBlockND,
mlp.py:282-393), multi-head attention (mlp.py:396-408) and the late-fusion
split rgbnet (mlp.py:410-448).

Every module is an (init, apply) pair over a params pytree. Dropout layers
are inference-mode no-ops unless an rng key is passed (`train` semantics).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .mlp import init_linear
from .backbone import init_conv, conv_apply, max_pool2d


def _linear(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def _dropout(x, rate, rng):
    if rng is None or rate <= 0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ------------------------------------------------------------------ NeRF MLP

def init_nerf_mlp(key, D=8, W=256, input_ch=99, input_ch_views=27,
                  skips=(2,)):
    """Skip-connected NeRF MLP with separate density/rgb heads
    (mlp.py:6-31)."""
    keys = iter(jax.random.split(key, D + 5))
    pts = [init_linear(next(keys), input_ch, W)]
    for i in range(D - 1):
        cin = W + input_ch if i in skips else W
        pts.append(init_linear(next(keys), cin, W))
    return {
        "pts": pts,
        "views": init_linear(next(keys), input_ch_views + W, W // 2),
        "feature": init_linear(next(keys), W, W),
        "density": init_linear(next(keys), W, 1),
        "rgb": init_linear(next(keys), W // 2, 3, zero_bias=True),
        "skips": tuple(skips),
    }


def nerf_mlp_apply(params, emb, viewemb):
    """(rgb, density) from positional + view embeddings (mlp.py:33-51)."""
    h = emb
    n_layers = len(params["pts"])
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(_linear(layer, h))
        # skip-concat feeds the NEXT layer; a skip on the last layer would
        # break the head widths (latent bug in the reference for D-1 in
        # skips, mlp.py:33-40 — guarded here)
        if i in params["skips"] and i < n_layers - 1:
            h = jnp.concatenate([emb, h], -1)
    density = _linear(params["density"], h)
    feature = _linear(params["feature"], h)
    h = jnp.concatenate([feature, viewemb], -1)
    h = jax.nn.relu(_linear(params["views"], h))
    rgb = _linear(params["rgb"], h)
    return rgb, density


# ------------------------------------------------------------------ Mapping

def init_mapping(key, in_dim, out_dim=12, depth=1, width=64, dropout=0.1):
    """Per-pixel MLP conditioned on the flattened relative pose
    (mlp.py:54-64). ``in_dim`` includes the 16 pose values."""
    keys = iter(jax.random.split(key, depth + 1))
    hidden = [init_linear(next(keys), in_dim, width)]
    for _ in range(max(depth - 2, 0)):
        hidden.append(init_linear(next(keys), width, width))
    return {"hidden": hidden, "out": init_linear(next(keys), width, out_dim),
            "dropout": dropout}


def mapping_apply(params, feature, pose, rng=None):
    """feature [N,H,W,C] + pose [N,4,4] -> mapped features [N,H,W,out]
    (mlp.py:66-85; NHWC here)."""
    n, h, w, _ = feature.shape
    pose_flat = pose.reshape(n, 1, 1, -1)
    pose_map = jnp.broadcast_to(pose_flat, (n, h, w, pose_flat.shape[-1]))
    x = jnp.concatenate([feature, pose_map], -1)
    x = jax.nn.relu(_linear(params["hidden"][0], x))
    for layer in params["hidden"][1:]:
        x = _linear(layer, x)
        x = _dropout(x, params["dropout"], rng)
        x = jax.nn.relu(x)
    return _linear(params["out"], x)


# ---------------------------------------------------------------- Interp MLP

def init_interp_mlp(key, in_dim, out_dim, width=128, depth=5, dropout=0.1):
    """LIIF local-ensemble decoder (mlp.py:88-101)."""
    keys = iter(jax.random.split(key, depth))
    layers = [init_linear(next(keys), in_dim, width)]
    for _ in range(depth - 2):
        layers.append(init_linear(next(keys), width, width))
    layers.append(init_linear(next(keys), width, out_dim))
    return {"layers": layers, "dropout": dropout}


def interp_mlp_apply(params, x, rng=None):
    layers = params["layers"]
    x = jax.nn.relu(_linear(layers[0], x))
    for layer in layers[1:-1]:
        x = _linear(layer, x)
        x = _dropout(x, params["dropout"], rng)
        x = jax.nn.relu(x)
    return _linear(layers[-1], x)


def load_liif_state_dict(liif_path):
    """Pretrained-LIIF linear layers from a torch checkpoint.

    The reference maps the LIIF imnet's 4 hidden linears into its
    Interp_MLP, leaving the output layer as initialized
    (``load_liif_state_dict``, lib/tri_dvgo_multiscene.py:33-52: imnet
    layers 0/2/4/6 -> model 0/2.0/3.0/4.0). Returns a list of 4
    ``{"w","b"}`` dicts in this repo's [in, out] weight convention.
    """
    import torch
    sd = torch.load(liif_path, map_location="cpu",
                    weights_only=False)["model"]["sd"]
    out = []
    for i in (0, 2, 4, 6):
        w = np.asarray(sd[f"imnet.layers.{i}.weight"].detach().cpu(),
                       np.float32)
        b = np.asarray(sd[f"imnet.layers.{i}.bias"].detach().cpu(),
                       np.float32)
        out.append({"w": jnp.asarray(w.T), "b": jnp.asarray(b)})
    return out


def apply_liif_sd_to_interp(interp_params, liif_layers):
    """Overwrite an Interp_MLP's first ``len(liif_layers)`` linears with the
    pretrained LIIF layers (shape-checked); the output layer keeps its
    random init, as in the reference (the LIIF imnet's final layer has a
    different output width)."""
    layers = list(interp_params["layers"])
    for i, ll in enumerate(liif_layers):
        if i >= len(layers) - 1:
            break
        if layers[i]["w"].shape != ll["w"].shape:
            raise ValueError(
                f"LIIF layer {i} shape {ll['w'].shape} does not match "
                f"interp layer {layers[i]['w'].shape}; check in_dim "
                f"(feat_unfold/cell_decode) and interp_width")
        layers[i] = {"w": ll["w"], "b": ll["b"]}
    return {**interp_params, "layers": layers}


# -------------------------------------------------------------- ConvMapping

def init_conv_mapping(key, in_dim, out_dim=12, ksize=3, n_resblocks=5,
                      dropout=0.1):
    """Conv pose-warp net: conv head + 2x2 maxpool + resblocks
    (mlp.py:158-195). ``in_dim`` includes the conditioning channels."""
    keys = iter(jax.random.split(key, 2 + 2 * n_resblocks + 1))
    return {
        "head": init_conv(next(keys), in_dim, in_dim, ksize),
        "blocks": [
            {"c1": init_conv(next(keys), in_dim, in_dim, ksize),
             "c2": init_conv(next(keys), in_dim, in_dim, ksize)}
            for _ in range(n_resblocks)
        ],
        "out": init_conv(next(keys), in_dim, out_dim, ksize),
        "dropout": dropout,
    }


def conv_mapping_apply(params, feature, cond, rng=None):
    """feature [N,H,W,C]; cond is a pose [N,4,4] (broadcast per pixel,
    Conv_Mapping) or a per-pixel map [N,H,W,Cc] (Conv_Mapping_d_o)."""
    n, h, w, _ = feature.shape
    if cond.ndim == 3:  # pose matrix
        cond = jnp.broadcast_to(cond.reshape(n, 1, 1, -1),
                                (n, h, w, cond.reshape(n, -1).shape[-1]))
    x = jnp.concatenate([feature, cond], -1)
    x = max_pool2d(conv_apply(params["head"], x), 2)
    for blk in params["blocks"]:
        hcv = conv_apply(blk["c1"], x)
        hcv = _dropout(hcv, params["dropout"], rng)
        hcv = jax.nn.relu(hcv)
        hcv = conv_apply(blk["c2"], hcv)
        hcv = _dropout(hcv, params["dropout"], rng)
        x = x + hcv
    return conv_apply(params["out"], x)


# -------------------------------------------------------------------- SIREN

def init_siren_layer(key, in_f, out_f, w0=30.0, is_first=False):
    """SIREN init (mlp.py:239-253)."""
    kw, kb = jax.random.split(key)
    b = 1.0 / in_f if is_first else np.sqrt(6.0 / in_f) / w0
    w = jax.random.uniform(kw, (in_f, out_f), jnp.float32, -b, b)
    bound = 1.0 / np.sqrt(in_f)
    bias = jax.random.uniform(kb, (out_f,), jnp.float32, -bound, bound)
    return {"w": w, "b": bias}


def init_siren_rgb_net(key, num_layers, input_dim, hidden_dim, w0=30.0):
    keys = iter(jax.random.split(key, num_layers))
    layers = [init_siren_layer(next(keys), input_dim, hidden_dim, w0,
                               is_first=True)]
    for _ in range(num_layers - 2):
        layers.append(init_siren_layer(next(keys), hidden_dim, hidden_dim,
                                       w0))
    layers.append(init_siren_layer(next(keys), hidden_dim, 3, w0))
    return {"layers": layers, "w0": w0}


def siren_rgb_net_apply(params, x):
    w0 = params["w0"]
    for layer in params["layers"][:-1]:
        x = jnp.sin(w0 * _linear(layer, x))
    return _linear(params["layers"][-1], x)


# ------------------------------------------------------- non-local attention

def init_nl_block(key, feat_channels, density_channels, inter_channels=None,
                  mode="embedded"):
    """Non-local block attending features to the density map
    (mlp.py:282-343). BatchNorm after W_z is replaced by a zero-initialized
    scale (same identity-at-init property, section 4.1 of the NL paper)."""
    assert mode in ("embedded", "dot")
    inter = inter_channels or max(feat_channels // 2, 1)
    keys = iter(jax.random.split(key, 4))
    wz = init_conv(next(keys), inter, feat_channels, 1)
    wz = {"w": jnp.zeros_like(wz["w"]), "b": jnp.zeros_like(wz["b"])}
    return {
        "g": init_conv(next(keys), feat_channels, inter, 1),
        "theta": init_conv(next(keys), feat_channels, inter, 1),
        "phi": init_conv(next(keys), density_channels, inter, 1),
        "wz": wz,
        "mode": mode,
        "inter": inter,
    }


def nl_block_apply(params, x, density):
    """x [N,H,W,C] features; density [N,Hd,Wd,Cd] map (mlp.py:345-393)."""
    n, h, w, c = x.shape
    inter = params["inter"]
    g_x = max_pool2d(conv_apply(params["g"], x), 2).reshape(n, -1, inter)
    theta = conv_apply(params["theta"], x).reshape(n, -1, inter)
    phi = max_pool2d(conv_apply(params["phi"], density), 2) \
        .reshape(n, -1, inter)
    f = jnp.einsum("nqc,nkc->nqk", theta, phi,
                   preferred_element_type=jnp.float32)
    if params["mode"] == "embedded":
        f = jax.nn.softmax(f, axis=-1)
    else:
        f = f / f.shape[-1]
    y = jnp.einsum("nqk,nkc->nqc", f, g_x,
                   preferred_element_type=jnp.float32)
    y = y.reshape(n, h, w, inter)
    return conv_apply(params["wz"], y) + x


# ------------------------------------------------------ multihead attention

def init_scaled_product_attention(key, embed_dim, num_heads=1):
    """Single nn.MultiheadAttention equivalent (mlp.py:396-408)."""
    keys = iter(jax.random.split(key, 4))
    return {
        "q": init_linear(next(keys), embed_dim, embed_dim),
        "k": init_linear(next(keys), embed_dim, embed_dim),
        "v": init_linear(next(keys), embed_dim, embed_dim),
        "o": init_linear(next(keys), embed_dim, embed_dim),
        "heads": num_heads,
    }


def scaled_product_attention_apply(params, query, kv):
    """query [Lq, N, E], kv [Lk, N, E] (torch seq-first convention)."""
    heads = params["heads"]
    e = query.shape[-1]
    dh = e // heads

    def split(x):
        l, n, _ = x.shape
        return x.reshape(l, n, heads, dh).transpose(1, 2, 0, 3)

    q = split(_linear(params["q"], query))
    k = split(_linear(params["k"], kv))
    v = split(_linear(params["v"], kv))
    att = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                     preferred_element_type=jnp.float32) / np.sqrt(dh)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", att, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(2, 0, 1, 3).reshape(query.shape)
    return _linear(params["o"], out)


# -------------------------------------------------------- split late-fusion

def init_split_rgbnet(key, input_dim, vox_dim=64, width=128, depth=4):
    """pos/view head -> concat voxel feature -> rgb (mlp.py:410-448)."""
    keys = iter(jax.random.split(key, 5))
    return {
        "head": [init_linear(next(keys), input_dim, width),
                 init_linear(next(keys), width, width),
                 init_linear(next(keys), width, width - vox_dim)],
        "mid": init_linear(next(keys), width, width),
        "rgb": init_linear(next(keys), width, 3),
    }


def split_rgbnet_apply(params, pos_view, vox):
    h = pos_view
    for layer in params["head"]:
        h = jax.nn.relu(_linear(layer, h))
    h = jnp.concatenate([h, vox], -1)
    h = jax.nn.relu(_linear(params["mid"], h))
    return _linear(params["rgb"], h)
