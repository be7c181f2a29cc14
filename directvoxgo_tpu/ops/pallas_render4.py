"""Fused frame kernel, v4: station-major grid — slabs stream ONCE per frame.

v3 (ops/pallas_render3.py) iterates its grid ``(tile_i, tile_j, s_blk)``
with the station axis innermost: per image tile it re-fetches every color
slab block from HBM. At 160^3/896^2 that is ``49 tiles x 20 s-blocks x
(9.8 MB d_k0t + 1.6 MB d_geo)`` ~ 6.7 GB of input DMA per frame — an ~8 ms
HBM floor that activity gating (which skips compute, not prefetch) cannot
touch.

v4 inverts the grid to ``(s_blk, tile_i, tile_j)``:

  - slab blocks are indexed by ``s`` only, so Mosaic's pipeliner fetches
    each exactly once per frame (~0.25 GB at the same shape);
  - the per-tile compositing state (rgb/depth/transmittance) that v3 kept
    implicitly in its output blocks (resident across consecutive ``s``
    steps) moves to explicit VMEM scratch indexed by ``(i, j)`` — it must
    survive non-consecutive visits now;
  - the hoisted first-layer view term (``vd_emb @ W1b + b1``, v3's
    ``shared1`` input, a [TILE,TILE,width] block re-fetched every step)
    is instead computed in-kernel from a channel-leading ``[E, Hi, Wi]``
    view embedding (1 MB blocks) — one leading-dim contraction per active
    step, measured ~2 us/op class (tools/probe_mosaic.py).

Outputs are written on the final station block's visit to each tile (the
sequential grid guarantees that visit is the block's last). Per-sample math
is identical to v3 (render_utils_kernel.cu:447-455 semantics); equivalence
is asserted by tests/test_render_sweep.py::test_pallas_v4_matches_v3 and
the v3-vs-v4 comparison in tools/bench_framekernel.py check().

Inherent trade-off of the station-major grid: the output BlockSpecs are
indexed ``(0, i, j)`` on a grid where ``(i, j)`` change every step, so
Mosaic copies each output block back to HBM on EVERY station block —
``nsb x`` redundant output DMA per frame (~300 MB at 896^2 with 20
s-blocks, vs ~15 MB in v3). That partially offsets the input-DMA saving
the kernel exists for; it is the price of visiting tiles non-consecutively
and cannot be removed without a tile-resident output (which is exactly
v3's grid order). Weigh both directions when tuning here.

VMEM: scratch is ``n_tiles x (3+1+1) x TILE^2`` f32 (16 MB at 896^2) on
top of the double-buffered slab blocks; :func:`v4_vmem_estimate` lets the
engine fall back to v3 when a shape would not fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raymarch as rm
from .pallas_render3 import S_BLK, TILE


def v4_vmem_estimate(s_total, gu, gv, f_k0, width, emb_dim, hi, wi):
    """Rough scoped-VMEM bytes for the v4 kernel at a given shape."""
    nti, ntj = hi // TILE, wi // TILE
    scratch = nti * ntj * 5 * TILE * TILE * 4
    slabs = 2 * (S_BLK * gu * 2 * gv * 2 + S_BLK * f_k0 * gu * gv * 2)
    emb = 2 * (TILE * TILE * max(emb_dim, 8) * 2)
    # big in-kernel temporaries: t1g [S,TILE,2Gv] f32, h/sh1 [TILE,TILE,W],
    # plus the [S_BLK,TILE,TILE] f32 per-block fields (density, maskv,
    # alpha_all, dist_all, t_all, ok_pre and the ws list — ~6-7 MB at
    # S_BLK=16) that the first estimate omitted; a shape passing the gate
    # without them could exceed the 110 MB compile limit with no runtime
    # fallback to v3.
    tmps = (S_BLK * TILE * 2 * gv * 4
            + 3 * TILE * TILE * max(width, 1) * 4
            + 7 * S_BLK * TILE * TILE * 4)
    outs = 2 * 5 * TILE * TILE * 4
    return scratch + slabs + emb + tmps + outs + (2 << 20)


def render_frame_pallas4(d_geo, d_k0t, vd_emb_cl, dnorm, dclip, ur, vr,
                         mlp_params, scalars, activity=None, *, guv,
                         has_mlp, rgb_mode, interpret=False):
    """Launch the v4 fused frame kernel (station-major grid).

    Args match :func:`..pallas_render3.render_frame_pallas3` except that
    ``shared1`` is replaced by ``vd_emb_cl``: the channel-leading
    ``[E, Hi, Wi]`` bf16 positional view embedding (None when
    ``has_mlp=False``), and ``mlp_params`` additionally carries ``w1b``
    ([E, width], the view half of layer 1) and ``b1``.
    """
    gu, gv = guv
    hi, wi = dnorm.shape
    assert hi % TILE == 0 and wi % TILE == 0
    s_total = d_geo.shape[0]
    assert s_total % S_BLK == 0
    nti, ntj, nsb = hi // TILE, wi // TILE, s_total // S_BLK
    f_k0 = 0 if d_k0t is None else d_k0t.shape[1] // gu
    c0 = 3 if rgb_mode == "logit_plus_k0" else 0
    f_mlp = f_k0 - c0
    width = mlp_params["w2"].shape[0] if has_mlp else 0
    emb = vd_emb_cl.shape[0] if has_mlp else 0
    bf16 = jnp.bfloat16

    def kernel(sc_ref, act_ref, ur_ref, vr_ref, dnorm_ref, dclip_ref,
               dgeo_ref, *rest):
        if d_k0t is not None:
            dk0t_ref = rest[0]
            rest = rest[1:]
        if has_mlp:
            (emb_ref, w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref, w3t_ref,
             b3_ref) = rest[:8]
            rest = rest[8:]
        rgb_ref, depth_ref, tcum_ref = rest[:3]
        rgb_acc, depth_acc, tcum_acc = rest[3:]

        op, ou, ov = sc_ref[0, 0], sc_ref[0, 1], sc_ref[0, 2]
        inv_span, p_first, p_step = (sc_ref[0, 3], sc_ref[0, 4],
                                     sc_ref[0, 5])
        act_shift, interval_scale = sc_ref[0, 6], sc_ref[0, 7]
        fast_thres, near, far, bg = (sc_ref[0, 8], sc_ref[0, 9],
                                     sc_ref[0, 10], sc_ref[0, 11])
        sb = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        @pl.when(sb == 0)
        def _():
            rgb_acc[ti, tj] = jnp.zeros((3, TILE, TILE), jnp.float32)
            depth_acc[ti, tj] = jnp.zeros((TILE, TILE), jnp.float32)
            tcum_acc[ti, tj] = jnp.ones((TILE, TILE), jnp.float32)

        alive = jnp.any(tcum_acc[ti, tj] >= rm.T_TERMINATE)
        active = act_ref[ti, tj, sb] != 0

        @pl.when(alive & active)
        def _():
            dn = dnorm_ref[:]                              # [TILE, TILE]
            dc = dclip_ref[:]
            interval = dn * interval_scale

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

            t_cum = tcum_acc[ti, tj]
            ws = []
            for j in range(S_BLK):
                okj = ok_pre[j] & (t_cum >= rm.T_TERMINATE)
                aj = jnp.where(okj, alpha_all[j], 0.0)
                ws.append(t_cum * aj)
                t_cum = t_cum * (1.0 - aj + rm.T_EPS)
            tcum_acc[ti, tj] = t_cum

            if has_mlp:
                # Hoisted view half of MLP layer 1, computed per step from
                # the channel-leading embedding block (leading-dim
                # contraction; replaces v3's shared1 input whose
                # [TILE,TILE,width] blocks re-fetched on every step of the
                # station-major grid).
                sh1 = jax.lax.dot_general(
                    emb_ref[:].astype(bf16), w1b_ref[:].astype(bf16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) \
                    + b1_ref[0, :]                         # [u, v, W]

            for j in range(S_BLK):
                w_j = ws[j]
                any_active = jnp.any(w_j > 0.0)

                @pl.when(any_active)
                def _(j=j, w_j=w_j):
                    if d_k0t is not None:
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
                        h = jax.nn.relu(h + sh1).astype(bf16)
                        h = jax.lax.dot_general(
                            h, w2_ref[:].astype(bf16),
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
                            + b2_ref[0, :]
                        h = jax.nn.relu(h).astype(bf16)
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
                    else:
                        rgb_s = jnp.full((3, TILE, TILE), 0.5, jnp.float32)
                    # pl.when bodies act through ref stores only (value
                    # rebinding would escape the conditional): accumulate
                    # straight into the tile's scratch slice.
                    rgb_acc[ti, tj] = (rgb_acc[ti, tj]
                                       + w_j[None] * rgb_s)
                    depth_acc[ti, tj] = (depth_acc[ti, tj]
                                         + w_j * dist_all[j])

        @pl.when(sb == nsb - 1)
        def _():
            tc = tcum_acc[ti, tj]
            rgb_ref[:] = rgb_acc[ti, tj] + tc[None] * bg
            depth_ref[:] = depth_acc[ti, tj]
            tcum_ref[:] = tc

    if activity is None:
        activity = jnp.ones((nti, ntj, nsb), jnp.int32)
    in_specs = [
        pl.BlockSpec((1, 12), lambda s, i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),              # activity
        pl.BlockSpec((TILE, 1), lambda s, i, j: (i, 0),
                     memory_space=pltpu.VMEM),              # ur [Hi,1]
        pl.BlockSpec((1, TILE), lambda s, i, j: (0, j),
                     memory_space=pltpu.VMEM),              # vr [1,Wi]
        pl.BlockSpec((TILE, TILE), lambda s, i, j: (i, j),
                     memory_space=pltpu.VMEM),              # dnorm
        pl.BlockSpec((TILE, TILE), lambda s, i, j: (i, j),
                     memory_space=pltpu.VMEM),              # dclip
        pl.BlockSpec((S_BLK, gu, 2 * gv), lambda s, i, j: (s, 0, 0),
                     memory_space=pltpu.VMEM),              # d_geo
    ]
    inputs = [scalars.reshape(1, 12), activity, ur.reshape(hi, 1),
              vr.reshape(1, wi), dnorm, dclip, d_geo]
    if d_k0t is not None:
        in_specs.append(pl.BlockSpec((S_BLK, f_k0 * gu, gv),
                                     lambda s, i, j: (s, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(d_k0t)
    if has_mlp:
        in_specs += [
            pl.BlockSpec((emb, TILE, TILE), lambda s, i, j: (0, i, j),
                         memory_space=pltpu.VMEM),          # vd_emb_cl
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w1a
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w1b
            pl.BlockSpec(memory_space=pltpu.VMEM),          # b1 [1,width]
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),          # b2 [1,width]
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w3t [3,width]
            pl.BlockSpec(memory_space=pltpu.VMEM),          # b3 [3,1]
        ]
        inputs += [vd_emb_cl,
                   mlp_params["w1a"], mlp_params["w1b"],
                   mlp_params["b1"].reshape(1, -1),
                   mlp_params["w2"], mlp_params["b2"].reshape(1, -1),
                   mlp_params["w3"].T, mlp_params["b3"].reshape(-1, 1)]

    out_shape = [
        jax.ShapeDtypeStruct((3, hi, wi), jnp.float32),
        jax.ShapeDtypeStruct((hi, wi), jnp.float32),
        jax.ShapeDtypeStruct((hi, wi), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((3, TILE, TILE), lambda s, i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda s, i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda s, i, j: (i, j),
                     memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        kernel,
        grid=(nsb, nti, ntj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nti, ntj, 3, TILE, TILE), jnp.float32),
            pltpu.VMEM((nti, ntj, TILE, TILE), jnp.float32),
            pltpu.VMEM((nti, ntj, TILE, TILE), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*inputs)
