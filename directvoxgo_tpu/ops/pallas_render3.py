"""Fused frame kernel, v3: scratch-free channel-leading color path.

Where v1 (ops/pallas_render.py) spends its time, measured on a v5e via the
tools/probe_mosaic.py harness (per-op costs at the real kernel shapes):

  - Mosaic matmuls/batched matmuls run at near-peak as SINGLE ops (12-way
    batched [128,160]x[160,128]: 0.4 us; rank-3 [128,128,128]@[128,128]:
    2.3 us; leading-dim contraction [12,128,128]x[12,128]: 2.0 us).
  - Per-grid-step pipeline overhead is ~0 (not the 30-40 us round 1 assumed).
  - The v1 killer is the 12 strided minor-dim scratch writes
    (``xs_ref[:, :, ch] = ...`` hits 1 of 128 lanes per tile) plus 24 small
    matmuls per active station.

v3 therefore:
  1. batches geometry over the whole station block (one batched warp + one
     block-wide alpha chain, as v2), and skips entire blocks once every ray
     in the tile has terminated;
  2. stores the color slabs TRANSPOSED, ``[S, C*Gu, Gv]``, so the full
     12-channel warp per active station is ONE [C*Gu, Gv]@[Gv, TILE] matmul
     plus ONE C-way batched [TILE, Gu]x[Gu, TILE] matmul whose output is
     channel-leading ``[C, u, v]`` — no scratch, no strided writes;
  3. runs the color MLP channels-leading: layer 1 contracts the leading
     channel dim (one op), layers 2+ are rank-3 minor contractions, and the
     last layer is applied transposed (``w3^T x h``) so logits come out
     ``[3, u, v]`` and accumulate into a channel-leading rgb block.

Outputs are channel-leading ``[3, Hi, Wi]`` (the XLA caller transposes
once). Per-sample math matches the reference renderer exactly as v1 does
(see that module's docstring; render_utils_kernel.cu:447-455 semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raymarch as rm

TILE = 128
# Stations per grid step. Larger blocks amortize per-grid-step overhead and
# put the VPU alpha chain on bigger tensors (measured: the geometry +
# compositing share of the kernel is per-step-overhead-bound, PERF_LOG.md);
# VMEM per step stays modest (d_geo 0.7 MB + d_k0t ~10 MB at 160^3).
# Env knob for A/B runs of tools/bench_framekernel.py.
import os as _os
S_BLK = int(_os.environ.get("DVGO_S_BLK", "16"))


def render_frame_pallas3(d_geo, d_k0t, shared1, dnorm, dclip, ur, vr,
                         mlp_params, scalars, activity=None, *, guv,
                         has_mlp, rgb_mode, interpret=False):
    """Launch the v3 fused frame kernel.

    Args:
      d_geo: [S, Gu, 2*Gv] bf16 station slabs in march order (front first),
        channel-major ([density | mask]); S padded to S_BLK with mask=0.
      d_k0t: [S, F*Gu, Gv] bf16 TRANSPOSED color-feature slabs (row c*Gu+U,
        col V). None when the model has no color grid.
      shared1: [Hi, Wi, width] bf16 hoisted first-layer view contribution
        (``vd_emb @ W1b + b1``), or None when has_mlp=False.
      dnorm: [Hi, Wi] f32 world |d| per intermediate pixel (depth scale).
      dclip: [Hi, Wi] f32 |d . f_cam| per intermediate pixel — the world
        direction's component along the camera forward axis, so that
        ``lam * dclip`` equals the reference ray parameter t of the
        unnormalized pixel direction; near/far clipping uses this, matching
        the per-ray paths (lib/dvgo.py:425-448 t in [near, far]).
      ur, vr: [Hi], [Wi] reference-plane coordinates.
      mlp_params: dict with w1a [F_mlp, width], w2, b2, w3, b3, or None.
      scalars: [1, 12] f32 runtime pose/model scalars (op, ou, ov, inv_span,
        p_first, p_step, act_shift, interval_scale, fast_thres, near, far,
        bg) — runtime (SMEM) so orbit poses share one compiled kernel per
        shape.
      guv: static (Gu, Gv).

    Returns (rgb_cl [3,Hi,Wi], depth [Hi,Wi], tcum [Hi,Wi]).
    """
    gu, gv = guv
    hi, wi = dnorm.shape
    assert hi % TILE == 0 and wi % TILE == 0
    s_total = d_geo.shape[0]
    assert s_total % S_BLK == 0
    nti, ntj, nsb = hi // TILE, wi // TILE, s_total // S_BLK
    f_k0 = 0 if d_k0t is None else d_k0t.shape[1] // gu
    c0 = 3 if rgb_mode == "logit_plus_k0" else 0  # MLP feats = cl[c0:]
    f_mlp = f_k0 - c0
    width = mlp_params["w2"].shape[0] if has_mlp else 0
    bf16 = jnp.bfloat16

    def kernel(sc_ref, act_ref, ur_ref, vr_ref, dnorm_ref, dclip_ref,
               dgeo_ref, *rest):
        if d_k0t is not None:
            dk0t_ref = rest[0]
            rest = rest[1:]
        if has_mlp:
            shared1_ref, w1a_ref, w2_ref, b2_ref, w3t_ref, b3_ref = rest[:6]
            rest = rest[6:]
        rgb_ref, depth_ref, tcum_ref = rest

        op, ou, ov = sc_ref[0, 0], sc_ref[0, 1], sc_ref[0, 2]
        inv_span, p_first, p_step = (sc_ref[0, 3], sc_ref[0, 4],
                                     sc_ref[0, 5])
        act_shift, interval_scale = sc_ref[0, 6], sc_ref[0, 7]
        fast_thres, near, far, bg = (sc_ref[0, 8], sc_ref[0, 9],
                                     sc_ref[0, 10], sc_ref[0, 11])
        sb = pl.program_id(2)

        @pl.when(sb == 0)
        def _():
            rgb_ref[:] = jnp.zeros_like(rgb_ref)
            depth_ref[:] = jnp.zeros_like(depth_ref)
            tcum_ref[:] = jnp.ones_like(tcum_ref)

        # Skip the whole station block once every ray has terminated, or
        # when the tile's footprint has no occupied voxels at this block
        # (precomputed conservative activity — engine/render_sweep.py
        # _tile_activity; inactive blocks contribute exactly zero).
        alive = jnp.any(tcum_ref[:] >= rm.T_TERMINATE)
        active = act_ref[pl.program_id(0), pl.program_id(1),
                         pl.program_id(2)] != 0

        @pl.when(alive & active)
        def _():
            dn = dnorm_ref[:]                              # [TILE, TILE]
            dc = dclip_ref[:]
            interval = dn * interval_scale

            # Station coords for the block.
            jidx = jax.lax.broadcasted_iota(jnp.int32, (S_BLK, 1), 0)
            jidx = jidx.astype(jnp.float32)
            p_blk = p_first + p_step * (sb.astype(jnp.float32) * S_BLK
                                        + jidx)
            lam = (p_blk - op) * inv_span                  # [S_BLK, 1]

            u3 = ou + lam * (ur_ref[:, 0][None, :] - ou)   # [S_BLK, TILE]
            v3 = ov + lam * (vr_ref[0, :][None, :] - ov)
            iota_u = jax.lax.broadcasted_iota(
                jnp.int32, (S_BLK, TILE, gu), 2).astype(jnp.float32)
            iota_v = jax.lax.broadcasted_iota(
                jnp.int32, (S_BLK, TILE, gv), 2).astype(jnp.float32)
            au = jnp.maximum(0.0, 1.0 - jnp.abs(u3[:, :, None] - iota_u)
                             ).astype(bf16)                # [S, TILE, Gu]
            av = jnp.maximum(0.0, 1.0 - jnp.abs(v3[:, :, None] - iota_v)
                             ).astype(bf16)                # [S, TILE, Gv]

            # Geometry warp, batched over the block.
            t1g = jax.lax.dot_general(
                au, dgeo_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [S, TILE, 2Gv]
            density = jax.lax.dot_general(
                t1g[:, :, :gv].astype(bf16), av,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [S, u, v]
            maskv = jax.lax.dot_general(
                t1g[:, :, gv:].astype(bf16), av,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

            alpha_all = 1.0 - jnp.exp(
                -jax.nn.softplus(density + act_shift) * interval[None])
            dist_all = lam[:, :, None] * dn[None]          # [S, u, v]
            t_all = lam[:, :, None] * dc[None]             # reference t
            ok_pre = (t_all >= near) & (t_all <= far) \
                & (maskv > 0.0) & (alpha_all > fast_thres)

            # Transmittance recurrence (cheap 2D multiplies).
            t_cum = tcum_ref[:]
            ws = []
            for j in range(S_BLK):
                okj = ok_pre[j] & (t_cum >= rm.T_TERMINATE)
                aj = jnp.where(okj, alpha_all[j], 0.0)
                ws.append(t_cum * aj)
                t_cum = t_cum * (1.0 - aj + rm.T_EPS)
            tcum_ref[:] = t_cum

            # Color, station by station, only where something is visible.
            for j in range(S_BLK):
                w_j = ws[j]
                any_active = jnp.any(w_j > 0.0)

                @pl.when(any_active)
                def _(j=j, w_j=w_j):
                    if d_k0t is not None:
                        # V-contraction: [F*Gu, Gv] @ [Gv, TILE] — avT built
                        # directly (iota on the leading dim).
                        iov = jax.lax.broadcasted_iota(
                            jnp.int32, (gv, TILE), 0).astype(jnp.float32)
                        avT = jnp.maximum(
                            0.0, 1.0 - jnp.abs(v3[j][None, :] - iov)
                        ).astype(bf16)                     # [Gv, TILE]
                        t1c = jax.lax.dot(
                            dk0t_ref[j], avT,
                            preferred_element_type=jnp.float32
                        ).astype(bf16)                     # [(c,U), v]
                        t1c3 = t1c.reshape(f_k0, gu, TILE)
                        au_b = jnp.broadcast_to(au[j][None],
                                                (f_k0, TILE, gu))
                        cl = jax.lax.dot_general(
                            au_b, t1c3,
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [C, u, v]
                    if has_mlp:
                        feats = cl[c0:].astype(bf16)       # [F_mlp, u, v]
                        h = jax.lax.dot_general(
                            feats, w1a_ref[:].astype(bf16),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [u,v,W]
                        h = jax.nn.relu(
                            h + shared1_ref[:].astype(jnp.float32)
                        ).astype(bf16)
                        h = jax.lax.dot_general(
                            h, w2_ref[:].astype(bf16),
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
                            + b2_ref[0, :]
                        h = jax.nn.relu(h).astype(bf16)
                        # Last layer transposed: [3, W] x [u, v, W] -> [3,u,v]
                        logit = jax.lax.dot_general(
                            w3t_ref[:].astype(bf16), h,
                            dimension_numbers=(((1,), (2,)), ((), ())),
                            preferred_element_type=jnp.float32) \
                            + b3_ref[:, 0][:, None, None]
                        if rgb_mode == "logit_plus_k0":
                            logit = logit + cl[0:3]
                        rgb_s = jax.nn.sigmoid(logit)      # [3, u, v]
                    elif d_k0t is not None:
                        rgb_s = jax.nn.sigmoid(cl[0:3])
                    else:  # geometry-only (perf probes): flat gray
                        rgb_s = jnp.full((3, TILE, TILE), 0.5, jnp.float32)
                    rgb_ref[:] = rgb_ref[:] + w_j[None] * rgb_s
                    depth_ref[:] = depth_ref[:] + w_j * dist_all[j]

        @pl.when(sb == nsb - 1)
        def _():
            rgb_ref[:] = rgb_ref[:] + tcum_ref[:][None] * bg

    if activity is None:
        activity = jnp.ones((nti, ntj, nsb), jnp.int32)
    in_specs = [
        pl.BlockSpec((1, 12), lambda i, j, s: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),              # activity
                                                            # (whole table)
        pl.BlockSpec((TILE, 1), lambda i, j, s: (i, 0),
                     memory_space=pltpu.VMEM),              # ur [Hi,1]
        pl.BlockSpec((1, TILE), lambda i, j, s: (0, j),
                     memory_space=pltpu.VMEM),              # vr [1,Wi]
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),              # dnorm
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),              # dclip
        pl.BlockSpec((S_BLK, gu, 2 * gv), lambda i, j, s: (s, 0, 0),
                     memory_space=pltpu.VMEM),              # d_geo
    ]
    inputs = [scalars.reshape(1, 12), activity, ur.reshape(hi, 1),
              vr.reshape(1, wi), dnorm, dclip, d_geo]
    if d_k0t is not None:
        in_specs.append(pl.BlockSpec((S_BLK, f_k0 * gu, gv),
                                     lambda i, j, s: (s, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(d_k0t)
    if has_mlp:
        in_specs += [
            pl.BlockSpec((TILE, TILE, width), lambda i, j, s: (i, j, 0),
                         memory_space=pltpu.VMEM),          # shared1
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w1a
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),          # b2 [1,width]
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w3t [3,width]
            pl.BlockSpec(memory_space=pltpu.VMEM),          # b3 [3,1]
        ]
        inputs += [shared1,
                   mlp_params["w1a"], mlp_params["w2"],
                   mlp_params["b2"].reshape(1, -1),
                   mlp_params["w3"].T, mlp_params["b3"].reshape(-1, 1)]

    out_shape = [
        jax.ShapeDtypeStruct((3, hi, wi), jnp.float32),
        jax.ShapeDtypeStruct((hi, wi), jnp.float32),
        jax.ShapeDtypeStruct((hi, wi), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((3, TILE, TILE), lambda i, j, s: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        kernel,
        grid=(nti, ntj, nsb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)
