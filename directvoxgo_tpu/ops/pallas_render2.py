"""Fused frame kernel, v2: station-batched ops.

v1 (ops/pallas_render.py) issues ~25 small ops per (tile, station) — at
~2-4 us Mosaic op granularity that is ~0.6 s/frame of pure launch/serialize
overhead (measured: bare matmuls 33 ms, + compositing chain 212 ms, + 3
color channels 658 ms at 1024^2 x 256). v2 processes a whole station block
with *batched* dot_generals and block-wide VPU passes:

  - geometry: one [S_BLK, TILE, Gu] x [S_BLK, Gu, 2Gv] batched matmul and
    one batched [.., Gv] x [S_BLK, TW, Gv] contraction;
  - alpha/softplus/exp and validity masks evaluated once on
    [S_BLK, TILE, TW] (8x fewer, 8x wider VPU passes);
  - transmittance recurrence unrolled as S_BLK cheap multiplies;
  - color: batched channel warps (F ops per *block*, not per station) into a
    rank-4 channel-minor scratch, one MLP over the whole block.

Same math and activity gating as v1 (reference parity notes there).

STATUS: numerically validated (interpret mode matches the XLA reference to
~1e-4) but NOT yet wired in — the first TPU compile ran out of VMEM (470 MB
demanded vs the v5e's 128 MB; the fully-unrolled block keeps t1g/alpha/ok/
xs/t1c live simultaneously and the scheduler spills). Next step: shrink
liveness (fold the alpha chain into the ws loop, drop t1c by slicing the
batched dot per channel group, S_BLK=4, bf16 scratch) and re-measure; the
ablation data says the op-granularity savings are worth ~0.5 s/frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raymarch as rm

TILE = 128
S_BLK = 4  # stations per grid step


def _hat_multi(coords, g, dtype):
    """[M] coords -> [M, g] hat rows (M = S_BLK*TILE stacked stations)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], g), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None]
                                          - iota.astype(jnp.float32))
                       ).astype(dtype)


def render_frame_pallas2(d_geo, d_k0, shared1, dnorm, ur, vr, mlp_params,
                         scalars, *, guv, has_mlp, rgb_mode,
                         interpret=False):
    """Same contract as ops.pallas_render.render_frame_pallas, with
    d_k0 laid out [S, Gu, F*Gv] (channel-major columns)."""
    gu, gv = guv
    hi, wi = dnorm.shape
    assert hi % TILE == 0 and wi % TILE == 0
    s_total = d_geo.shape[0]
    assert s_total % S_BLK == 0
    nti, ntj, nsb = hi // TILE, wi // TILE, s_total // S_BLK
    f_k0 = 0 if d_k0 is None else d_k0.shape[2] // gv
    f_mlp = f_k0 - (3 if rgb_mode == "logit_plus_k0" else 0)
    width = mlp_params["w2"].shape[0] if has_mlp else 0
    bf16 = jnp.bfloat16

    def kernel(sc_ref, ur_ref, vr_ref, dnorm_ref, dgeo_ref, *rest):
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

        # Station coordinates for the whole block: lam [S_BLK].
        jidx = jax.lax.broadcasted_iota(jnp.int32, (S_BLK, 1), 0)
        jidx = jidx.astype(jnp.float32)
        p_blk = p_first + p_step * (sb.astype(jnp.float32) * S_BLK + jidx)
        lam = (p_blk - op) * inv_span                      # [S_BLK, 1]

        # Hat rows for the whole block, built rank-3 (Mosaic cannot merge
        # sublane+lane dims in a reshape).
        u3 = ou + lam * (ur_ref[:, 0][None, :] - ou)      # [S_BLK, TILE]
        v3 = ov + lam * (vr_ref[0, :][None, :] - ov)
        iota_u = jax.lax.broadcasted_iota(
            jnp.int32, (S_BLK, TILE, gu), 2).astype(jnp.float32)
        iota_v = jax.lax.broadcasted_iota(
            jnp.int32, (S_BLK, TILE, gv), 2).astype(jnp.float32)
        au = jnp.maximum(0.0, 1.0 - jnp.abs(u3[:, :, None] - iota_u)
                         ).astype(bf16)
        av = jnp.maximum(0.0, 1.0 - jnp.abs(v3[:, :, None] - iota_v)
                         ).astype(bf16)

        # Geometry: batched over stations.
        t1g = jax.lax.dot_general(
            au, dgeo_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [S_BLK, TILE, 2Gv]
        density = jax.lax.dot_general(
            t1g[:, :, :gv].astype(bf16), av,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [S_BLK, TILE, TW]
        maskv = jax.lax.dot_general(
            t1g[:, :, gv:].astype(bf16), av,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        dn = dnorm_ref[:]                                  # [TILE, TW]
        interval = dn * interval_scale
        alpha_all = 1.0 - jnp.exp(
            -jax.nn.softplus(density + act_shift) * interval[None])
        dist_all = lam[:, :, None] * dn[None]              # [S_BLK,TILE,TW]
        ok_pre = (dist_all >= near) & (dist_all <= far) & (maskv > 0.0) \
            & (alpha_all > fast_thres)

        # Transmittance recurrence (cheap multiplies only).
        t_cum = tcum_ref[:]
        ws = []
        for j in range(S_BLK):
            okj = ok_pre[j] & (t_cum >= rm.T_TERMINATE)
            aj = jnp.where(okj, alpha_all[j], 0.0)
            ws.append(t_cum * aj)
            t_cum = t_cum * (1.0 - aj + rm.T_EPS)
        tcum_ref[:] = t_cum
        w_all = jnp.stack(ws)                              # [S_BLK,TILE,TW]
        any_active = jnp.any(w_all > 0.0)

        @pl.when(any_active)
        def _():
            if d_k0 is not None:
                t1c = jax.lax.dot_general(
                    au, dk0_ref[:],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [S,TILE,F*Gv]
                for ch in range(f_k0):
                    zc = jax.lax.dot_general(
                        t1c[:, :, ch * gv:(ch + 1) * gv].astype(bf16), av,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    xs_ref[:, :, :, ch] = zc
            if has_mlp:
                # MLP per station (a block-wide [S,TILE,TW,width] f32
                # intermediate would exceed VMEM); warps above stay batched.
                rgb_acc = rgb_ref[:]
                for j in range(S_BLK):
                    feats = xs_ref[j, :, :, f_k0 - f_mlp:]
                    h = jax.lax.dot_general(
                        feats.astype(bf16), w1a_ref[:].astype(bf16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    h = jax.nn.relu(
                        h + shared1_ref[:].astype(jnp.float32)
                    ).astype(bf16)
                    h = jax.lax.dot_general(
                        h, w2_ref[:].astype(bf16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b2_ref[0, :]
                    h = jax.nn.relu(h).astype(bf16)
                    logit = jax.lax.dot_general(
                        h, w3_ref[:].astype(bf16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b3_ref[0, :]
                    if rgb_mode == "logit_plus_k0":
                        logit = logit + xs_ref[j, :, :, 0:3]
                    rgb_acc = rgb_acc + w_all[j][..., None] \
                        * jax.nn.sigmoid(logit)
                rgb_ref[:] = rgb_acc
            else:
                rgb_s = jax.nn.sigmoid(xs_ref[:, :, :, 0:3])
                rgb_ref[:] = rgb_ref[:] + jnp.sum(
                    w_all[..., None] * rgb_s, axis=0)
            depth_ref[:] = depth_ref[:] + jnp.sum(w_all * dist_all, axis=0)

        @pl.when(sb == nsb - 1)
        def _():
            rgb_ref[:] = rgb_ref[:] + tcum_ref[:][..., None] * bg

    in_specs = [
        pl.BlockSpec((1, 12), lambda i, j, s: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((TILE, 1), lambda i, j, s: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE), lambda i, j, s: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda i, j, s: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S_BLK, gu, 2 * gv), lambda i, j, s: (s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [scalars.reshape(1, 12), ur.reshape(hi, 1),
              vr.reshape(1, wi), dnorm, d_geo]
    if d_k0 is not None:
        in_specs.append(pl.BlockSpec((S_BLK, gu, f_k0 * gv),
                                     lambda i, j, s: (s, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(d_k0)
    if has_mlp:
        in_specs += [
            pl.BlockSpec((TILE, TILE, width), lambda i, j, s: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
        scratch_shapes.append(
            pltpu.VMEM((S_BLK, TILE, TILE, f_k0), jnp.float32))

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
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*inputs)
