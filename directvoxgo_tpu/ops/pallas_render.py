"""Fused Pallas TPU kernel for the camera-frame station sweep.

One kernel renders a whole intermediate image: grid (tile_h, tile_w,
station_block) with stations innermost, so a tile's compositing state
(transmittance T, rgb/depth accumulators) stays resident in VMEM across all
stations — the XLA scan formulation materializes [Hi, Wi, 128] MLP
intermediates per station in HBM (~1.3 s/frame measured at 1280^2 x 319);
this kernel keeps everything on-chip except the station slabs themselves.
Stations are processed S_BLK at a time per grid step to amortize per-step
pipeline overhead (~30 us/step measured; one station per step costs ~1 s of
pure overhead at 100 tiles x 319 stations).

Free-space skipping, TPU-style: the geometry warp (density+mask channels) is
cheap and always runs; the color warp + MLP (the dominant FLOPs) run under
``@pl.when(any pixel in this tile has weight > 0 at this station)`` — the
tile-granular analogue of the reference's per-sample ``fast_color_thres``
culling (lib/dvgo.py:478-494) and maskcache skipping. The caller additionally
clips the station range and the intermediate-image footprint to the occupancy
mask's bounding box.

Per-sample math matches the reference renderer: trilinear station values,
``alpha = 1-exp(-softplus(d+shift)*interval)`` with the per-ray interval,
front-to-back compositing with early termination at T < 1e-3
(render_utils_kernel.cu:447-455).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raymarch as rm

TILE = 128
S_BLK = 8  # stations per grid step


def _hat(coords, g, dtype):
    """[T] continuous coords -> [T, g] linear-interp rows."""
    # Mosaic iota is integer-only; cast after.
    iota = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], g), 1)
    iota = iota.astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - iota)
                       ).astype(dtype)


def render_frame_pallas(d_geo, d_k0, shared1, dnorm, dclip, ur, vr,
                        mlp_params, scalars, *, guv, has_mlp, rgb_mode,
                        interpret=False):
    """Launch the fused frame kernel.

    Args:
      d_geo: [S, Gu, 2*Gv] bf16 station slabs in march order (front first),
        channel-major ([density | mask]); S padded to S_BLK with mask=0
        slabs.
      d_k0:  [S, F, Gu, Gv] bf16 color-feature slabs (F = full k0 channels;
        first 3 are the logit offset when rgb_mode='logit_plus_k0'). None
        when the model has no color grid.
      shared1: [Hi, Wi, width] bf16 hoisted first-layer view contribution
        (``vd_emb @ W1b + b1``), or None when has_mlp=False.
      dnorm: [Hi, Wi] f32 world |d| per intermediate pixel.
      dclip: [Hi, Wi] f32 |d . f_cam| — ``lam * dclip`` is the reference
        ray parameter t; near/far clipping uses it (see pallas_render3).
      ur, vr: [Hi], [Wi] reference-plane coordinates.
      mlp_params: dict with w1a [F_mlp, width], w2, b2, w3, b3, or None.
      scalars: [1, 12] f32 runtime pose/model scalars (op, ou, ov,
        inv_span, p_first, p_step, act_shift, interval_scale, fast_thres,
        near, far, bg) — runtime (SMEM), NOT baked in, so orbit poses share
        one compiled kernel per shape; the station at flat index t sits at
        axis coord ``p_first + p_step*t`` and interval_scale is
        world-step / voxel_size_base per unit dnorm.
      guv: static (Gu, Gv).

    Returns (rgb [Hi,Wi,3], depth [Hi,Wi], tcum [Hi,Wi]).
    """
    gu, gv = guv
    hi, wi = dnorm.shape
    assert hi % TILE == 0 and wi % TILE == 0
    s_total = d_geo.shape[0]
    assert s_total % S_BLK == 0
    nti, ntj, nsb = hi // TILE, wi // TILE, s_total // S_BLK
    f_k0 = 0 if d_k0 is None else d_k0.shape[1]
    f_mlp = f_k0 - (3 if rgb_mode == "logit_plus_k0" else 0)
    width = mlp_params["w2"].shape[0] if has_mlp else 0

    def kernel(sc_ref, ur_ref, vr_ref, dnorm_ref, dclip_ref, dgeo_ref,
               *rest):
        if d_k0 is not None:
            dk0_ref = rest[0]
            rest = rest[1:]
        if has_mlp:
            shared1_ref, w1a_ref, w2_ref, b2_ref, w3_ref, b3_ref = rest[:6]
            rest = rest[6:]
        if d_k0 is not None:
            rgb_ref, depth_ref, tcum_ref, xs_ref = rest
        else:
            rgb_ref, depth_ref, tcum_ref = rest

        op, ou, ov = sc_ref[0, 0], sc_ref[0, 1], sc_ref[0, 2]
        inv_span, p_first, p_step = sc_ref[0, 3], sc_ref[0, 4], sc_ref[0, 5]
        act_shift, interval_scale = sc_ref[0, 6], sc_ref[0, 7]
        fast_thres, near, far, bg = (sc_ref[0, 8], sc_ref[0, 9],
                                     sc_ref[0, 10], sc_ref[0, 11])
        sb = pl.program_id(2)

        @pl.when(sb == 0)
        def _():
            rgb_ref[:] = jnp.zeros_like(rgb_ref)
            depth_ref[:] = jnp.zeros_like(depth_ref)
            tcum_ref[:] = jnp.ones_like(tcum_ref)

        dn = dnorm_ref[:]
        dc = dclip_ref[:]
        interval = dn * interval_scale

        for j in range(S_BLK):
            idx = sb * S_BLK + j
            p_s = p_first + p_step * idx.astype(jnp.float32)
            lam = (p_s - op) * inv_span
            u = ou + lam * (ur_ref[:, 0] - ou)      # [TILE]
            v = ov + lam * (vr_ref[0, :] - ov)      # [TILE]
            au = _hat(u, gu, jnp.bfloat16)          # [TILE, Gu]
            av = _hat(v, gv, jnp.bfloat16)          # [TILE, Gv]

            t1g = jax.lax.dot(au, dgeo_ref[j],
                              preferred_element_type=jnp.float32)
            density = jax.lax.dot_general(
                t1g[:, :gv].astype(jnp.bfloat16), av,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            maskv = jax.lax.dot_general(
                t1g[:, gv:].astype(jnp.bfloat16), av,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            # expm1 has no Mosaic lowering; 1-exp is adequate for rendering
            # (training keeps the expm1 form, ops/raymarch.py).
            alpha = 1.0 - jnp.exp(
                -jax.nn.softplus(density + act_shift) * interval)
            dist = lam * dn
            t_px = lam * dc
            t_cum = tcum_ref[:]
            ok = (t_px >= near) & (t_px <= far) & (maskv > 0.0) \
                & (alpha > fast_thres) & (t_cum >= rm.T_TERMINATE)
            alpha = jnp.where(ok, alpha, 0.0)
            w = t_cum * alpha
            any_active = jnp.any(w > 0.0)

            @pl.when(any_active)
            def _(j=j, w=w, dist=dist):
                for ch in range(f_k0):
                    t1_c = jax.lax.dot(au, dk0_ref[j, ch],
                                       preferred_element_type=jnp.float32)
                    xs_ref[:, :, ch] = jax.lax.dot_general(
                        t1_c.astype(jnp.bfloat16), av,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if has_mlp:
                    feats = xs_ref[:, :, f_k0 - f_mlp:]
                    h = jax.lax.dot_general(
                        feats.astype(jnp.bfloat16),
                        w1a_ref[:].astype(jnp.bfloat16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    h = jax.nn.relu(h + shared1_ref[:].astype(jnp.float32)
                                    ).astype(jnp.bfloat16)
                    h = jax.lax.dot_general(
                        h, w2_ref[:].astype(jnp.bfloat16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b2_ref[0, :]
                    h = jax.nn.relu(h).astype(jnp.bfloat16)
                    logit = jax.lax.dot_general(
                        h, w3_ref[:].astype(jnp.bfloat16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b3_ref[0, :]
                    if rgb_mode == "logit_plus_k0":
                        logit = logit + xs_ref[:, :, 0:3]
                    rgb_s = jax.nn.sigmoid(logit)   # [TILE, TILE, 3]
                else:
                    rgb_s = jax.nn.sigmoid(xs_ref[:, :, 0:3])
                rgb_ref[:] = rgb_ref[:] + w[..., None] * rgb_s
                depth_ref[:] = depth_ref[:] + w * dist

            tcum_ref[:] = t_cum * (1.0 - alpha + rm.T_EPS)

        @pl.when(sb == nsb - 1)
        def _():
            rgb_ref[:] = rgb_ref[:] + tcum_ref[:][..., None] * bg

    in_specs = [
        pl.BlockSpec((1, 12), lambda i, j, s: (0, 0),
                     memory_space=pltpu.SMEM),          # scalars
        pl.BlockSpec((TILE, 1), lambda i, j, s: (i, 0),
                     memory_space=pltpu.VMEM),          # ur [Hi,1]
        pl.BlockSpec((1, TILE), lambda i, j, s: (0, j),
                     memory_space=pltpu.VMEM),          # vr [1,Wi]
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),          # dnorm
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),          # dclip
        pl.BlockSpec((S_BLK, gu, 2 * gv), lambda i, j, s: (s, 0, 0),
                     memory_space=pltpu.VMEM),          # d_geo
    ]
    inputs = [scalars.reshape(1, 12), ur.reshape(hi, 1),
              vr.reshape(1, wi), dnorm, dclip, d_geo]
    if d_k0 is not None:
        in_specs.append(pl.BlockSpec((S_BLK, f_k0, gu, gv),
                                     lambda i, j, s: (s, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(d_k0)
    if has_mlp:
        in_specs += [
            pl.BlockSpec((TILE, TILE, width), lambda i, j, s: (i, j, 0),
                         memory_space=pltpu.VMEM),      # shared1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1a
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2 [1,width]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b3 [1,3]
        ]
        inputs += [shared1,
                   mlp_params["w1a"], mlp_params["w2"],
                   mlp_params["b2"].reshape(1, -1),
                   mlp_params["w3"], mlp_params["b3"].reshape(1, -1)]

    out_shape = [
        jax.ShapeDtypeStruct((hi, wi, 3), jnp.float32),
        jax.ShapeDtypeStruct((hi, wi), jnp.float32),
        jax.ShapeDtypeStruct((hi, wi), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((TILE, TILE, 3), lambda i, j, s: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),
    ]
    scratch_shapes = []
    if d_k0 is not None:
        scratch_shapes.append(pltpu.VMEM((TILE, TILE, f_k0), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(nti, ntj, nsb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)
