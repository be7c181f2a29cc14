"""Fused station-sweep forward kernel for TRAINING ray batches.

The XLA scan formulation (ops/sweep.py `_sweep_fwd_impl`) materializes, for
every station, the `[N, Gv*C]` intermediate of the u-contraction before the
v-contraction consumes it. XLA fuses part of that, but the profiled forward
still runs ~31 us/station at the bench shape (160^3, clip (80,112,96),
8192 rays) where the u-matmul alone is ~10 us — the rest is the
intermediate's traffic and the separate v-reduce fusion
(tools/trace_train_step.py, PERF_LOG.md round 3).

This kernel keeps the whole per-station pipeline in VMEM, in a fully
TRANSPOSED orientation — rays live on the LANE dimension of every tensor,
so no operand or result ever needs a relayout:

  per (station j, ray tile):
    t      = (p_j - op) / dp                        [NT]   (lanes)
    wu_t   = max(0, 1 - |u - iota_Gu(sublanes)|)    [Gu, NT]  bf16
    tmp_t  = slab_j^T-contraction: dot_general(
               slab_j [Gu, Gv*Cp], wu_t,
               contract Gu with Gu)                 [Gv*Cp, NT] f32 (MXU)
    prod   = tmp_t * wv_wide_t                      [Gv*Cp, NT]   (VPU)
    fold   = rank-3 view [Gv, Cp, NT], log2 tree-
             fold over the leading (v) dim          [Cp, NT]
    out    = fold[:C]                               [C, NT]

`slab_j` is the v-major station slab `[Gu, Gv*Cp]` with the channel count
padded to Cp = roundup(C, 16): a 16-row channel group is exactly two f32
sublane tiles, which makes the `[Gv*Cp, NT] -> [Gv, Cp, NT]` reshape a pure
leading-dimension split (layout-preserving) and every tree-fold slice
tile-aligned. The earlier channel-segment-matmul variant padded its M=C=14
to the 128-lane MXU tile — a 9x-padded matmul that measured 3.6 ms/step of
kernel time; this orientation needs no segment matmul at all.

Grid is (station-blocks, ray-blocks) with the slab block indexed by the
outer dimension only, so each station block is DMA'd from HBM exactly once
and reused across all ray tiles.

Outputs `[S_pad, C, N]` f32 in slab order; the caller slices off station
padding and transposes once to the `[C, N, S]` layout downstream code
expects (the XLA scan path stacks `[S, C, N]` and transposes the same way).
The per-station `t` is recomputed in XLA (elementwise, fuses away).

Used by :func:`..sweep.station_sweep`'s forward on TPU; the custom-VJP
backward stays the XLA rank-3 streamed transpose (it measured FASTER than
a kernel attempt — see `_sweep_bwd` in ops/sweep.py). Reference semantics:
trilinear sampling at stations = F.grid_sample align_corners=True at those
points (lib/dvgo.py:312-328).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLK = 8      # stations per grid step (slab block resident in VMEM)
NT = 512       # rays per grid step
C_TILE = 16    # channel-group padding: two f32 sublane tiles


def _round_up(x, m):
    return (int(x) + m - 1) // m * m


def pad_channels(grid_perm, c):
    """[Gp, Gu, Gv*C] v-major -> [Gp, Gu, Gv*Cp] with channels padded to
    C_TILE (zeros). A pure-bandwidth pass over the compact grid."""
    cp = _round_up(c, C_TILE)
    if cp == c:
        return grid_perm, c
    gp, gu, gvc = grid_perm.shape
    gv = gvc // c
    g4 = grid_perm.reshape(gp, gu, gv, c)
    g4 = jnp.pad(g4, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    return g4.reshape(gp, gu, gv * cp), cp


@functools.partial(jax.jit,
                   static_argnames=("c", "cp", "k", "gu", "gv", "wv",
                                    "interpret", "s_blk", "nt"))
def sweep_fwd_pallas(slabs_p, rays_packed, v_base=None, *, c, cp, k, gu, gv,
                     wv=0, interpret=False, s_blk=S_BLK, nt=NT):
    """All-station sweep values via the fused kernel.

    Args:
      slabs_p: [S_pad, Gu, Gv*Cp] bf16 v-major station slabs with channels
        padded to ``cp`` (see :func:`pad_channels`), stations padded to a
        multiple of s_blk (static) (pad slabs zero).
      rays_packed: [8, N] f32 rows (op, ou, ov, dp_safe, du, dv, 0, 0) with
        dp_safe already zero-guarded; N a multiple of nt.
      v_base: optional [N // nt] int32 per-ray-tile v-window starts (each a
        multiple of 8, in [0, Gv - wv]). With ``wv > 0`` each ray tile only
        reads the ``wv``-wide v-window of every slab — EXACT when every ray
        of tile j keeps its v support inside [v_base[j], v_base[j]+wv-1]:
        u/v are linear in the station plane, so a ray's v range is bounded
        by its two (clipped) plane-endpoint values, which the engine's
        spatially-bucketed batches bound per tile by construction.
      c, cp, k, gu, gv: static real/padded channel counts, substeps per
        voxel, in-plane dims.
      wv: static v-window width in voxels (0 = full-Gv sweep).

    Returns:
      vals [S_pad, C, N] f32 station samples in slab order.
    """
    s_pad = slabs_p.shape[0]
    n = rays_packed.shape[1]
    windowed = bool(wv) and wv < gv
    gv_eff = wv if windowed else gv
    cgv = cp * gv
    cgv_eff = cp * gv_eff
    assert s_pad % s_blk == 0 and n % nt == 0 and cp % C_TILE == 0
    nsb, nnb = s_pad // s_blk, n // nt
    inv_k = 1.0 / float(k)
    bf16 = jnp.bfloat16

    def kernel(*refs):
        if windowed:
            # Scalar array holds v_base // 8: the slab slice start is then
            # vb8 * (8 * cp), whose 128-multiple alignment Mosaic can prove
            # syntactically (a runtime value it cannot).
            vb8_ref, slab_ref, rp_ref, out_ref = refs
            vb8 = vb8_ref[pl.program_id(1)]
            vb = vb8 * 8
        else:
            slab_ref, rp_ref, out_ref = refs
            vb = 0
        sb = pl.program_id(0)

        op = rp_ref[0, :]                                  # [nt] lanes
        ou = rp_ref[1, :]
        ov = rp_ref[2, :]
        dp = rp_ref[3, :]
        du = rp_ref[4, :]
        dv = rp_ref[5, :]

        # u-hat rows over SUBLANES (rays stay on lanes).
        iota_u = jax.lax.broadcasted_iota(
            jnp.int32, (gu, nt), 0).astype(jnp.float32)
        # v index of each (v*Cp + c) row (window-relative when windowed).
        iota_vw = (jax.lax.broadcasted_iota(jnp.int32, (cgv_eff, nt), 0)
                   // cp).astype(jnp.float32)
        if windowed:
            iota_vw = iota_vw + vb.astype(jnp.float32)

        for j in range(s_blk):
            p_s = (sb * s_blk + j).astype(jnp.float32) * inv_k
            t = (p_s - op) / dp                            # [nt]
            u = ou + t * du
            v = ov + t * dv
            wu_t = jnp.maximum(0.0, 1.0 - jnp.abs(u[None, :] - iota_u)
                               ).astype(bf16)              # [Gu, nt]
            wv_t = jnp.maximum(0.0, 1.0 - jnp.abs(v[None, :] - iota_vw))
            if windowed:
                # [Gu, wv*Cp] v-window of the slab; vb8 * (8*cp) is a
                # syntactic multiple of 128, keeping the lane-dim dynamic
                # slice tile-aligned for Mosaic.
                slab_j = slab_ref[j, :, pl.ds(vb8 * (8 * cp), cgv_eff)]
            else:
                slab_j = slab_ref[j]
            # [Gu, Gv*Cp] (contract Gu) [Gu, nt] -> [Gv*Cp, nt]
            tmp_t = jax.lax.dot_general(
                slab_j, wu_t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            prod = (tmp_t * wv_t).reshape(gv_eff, cp, nt)
            # Tree-fold the v dimension (leading-dim slices of the rank-3
            # view are tile-aligned because cp is two f32 sublane tiles).
            m = gv_eff
            while m > 1:
                lower = (m + 1) // 2
                folded = prod[: m - lower] + prod[lower:m]
                if lower > m - lower:   # odd m: middle row passes through
                    folded = jnp.concatenate(
                        [folded, prod[m - lower: lower]], axis=0)
                prod = folded
                m = lower
            out_ref[j] = prod[0, :c, :]

    in_specs = [
        pl.BlockSpec((s_blk, gu, cgv), lambda s, nb: (s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, nt), lambda s, nb: (0, nb),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((s_blk, c, nt), lambda s, nb: (s, 0, nb),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((s_pad, c, n), jnp.float32)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024)
    if windowed:
        # Scalar-prefetch grid spec: index maps gain the scalar ref as an
        # extra (unused) leading argument.
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nsb, nnb),
                in_specs=[
                    pl.BlockSpec((s_blk, gu, cgv), lambda s, nb, vbr: (s, 0, 0)),
                    pl.BlockSpec((8, nt), lambda s, nb, vbr: (0, nb)),
                ],
                out_specs=pl.BlockSpec((s_blk, c, nt),
                                       lambda s, nb, vbr: (s, 0, nb)),
            ),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=cparams,
        )(v_base // 8, slabs_p, rays_packed)
    return pl.pallas_call(
        kernel,
        grid=(nsb, nnb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=cparams,
    )(slabs_p, rays_packed)


def sweep_fwd_available(n, c, gu, gv):
    """Shape gate for the fused path (ray count must tile; tiny grids are
    not worth a kernel launch and can violate Mosaic minimums; very
    anisotropic slabs blow the 64 MB scoped-VMEM budget — e.g. the
    LLFF-class z-sweep at gu=404, gv=323 needs a ~33 MB slab block and
    failed to compile). ``DVGO_SWEEP_PALLAS=0`` forces the XLA scan."""
    if os.environ.get("DVGO_SWEEP_PALLAS", "1") == "0":
        return False
    cp = _round_up(c, C_TILE)
    cgv = cp * gv
    vmem_est = (2 * S_BLK * gu * cgv * 2        # double-buffered slab block
                + (gu + cgv) * NT * 4           # u-hat / v-index iotas
                + NT * cgv * 4                  # u-contraction intermediate
                + 2 * S_BLK * cp * NT * 4)      # out block (+copy)
    return (jax.default_backend() == "tpu" and n % NT == 0
            and gu >= 2 and gv >= 2 and c >= 1
            and vmem_est <= 48 * 2 ** 20)


@functools.partial(jax.jit,
                   static_argnames=("c", "cp", "k", "gu", "gv", "wv",
                                    "interpret"))
def sweep_bwd_pallas(g_snc, rp_t, v_base, *, c, cp, k, gu, gv, wv,
                     interpret=False):
    """Windowed sweep backward: grid cotangents via per-station-block slab
    partials accumulated in VMEM across ray tiles.

    The XLA formulation of the windowed transpose loses its FLOP win to HBM
    traffic: every (station, tile) window contribution and scan carry
    round-trips HBM (measured: W=64 windows ran SLOWER than the full
    backward, tools/profile_windowed_step.py). Here each (station-block,
    ray-tile) grid step keeps the [ZP, Gu, Gv_p8*Cp] slab-partial block
    resident in VMEM and accumulates every ray tile into it; only the
    per-station-block partials reach HBM.

    Args:
      g_snc: [S_pad, N, Cp] f32 station cotangents, stations padded with
        zeros to a multiple of S_BLK, channels padded to Cp (rays on
        SUBLANES: the backward contracts over rays).
      rp_t: [N, 8] f32 per-ray COLUMNS (op, ou, ov, dp_safe, du, dv, 0, 0).
      v_base: [N // NT] int32 per-tile v-window starts, multiples of 8 in
        [0, round_up(gv, 8) - wv] (see sweep_fwd_pallas).
      wv: static v-window width (> 0; the full backward stays in XLA).

    Returns:
      partials [NSB, ZP, Gu, Gv_p8*Cp] f32, ZP = S_BLK//k + 1: slab z of
      station block sb sits at local z - sb*(S_BLK//k). Fold with
      :func:`fold_bwd_partials`.
    """
    s_pad, n, _ = g_snc.shape
    assert s_pad % S_BLK == 0 and n % NT == 0 and S_BLK % k == 0
    nsb, nnb = s_pad // S_BLK, n // NT
    zp = S_BLK // k + 1
    gv_p8 = _round_up(gv, 8)
    cgv = cp * gv_p8
    cw = cp * wv
    inv_k = 1.0 / float(k)
    bf16 = jnp.bfloat16

    def kernel(vb8_ref, g_ref, rpt_ref, out_ref):
        sb = pl.program_id(0)
        nb = pl.program_id(1)
        vb8 = vb8_ref[nb]
        vb = vb8 * 8

        @pl.when(nb == 0)
        def _init():
            out_ref[...] = jnp.zeros((1, zp, gu, cgv), jnp.float32)

        op = rpt_ref[:, 0:1]                             # [NT, 1] sublanes
        ou = rpt_ref[:, 1:2]
        ov = rpt_ref[:, 2:3]
        dp = rpt_ref[:, 3:4]
        du = rpt_ref[:, 4:5]
        dv = rpt_ref[:, 5:6]

        iota_u = jax.lax.broadcasted_iota(
            jnp.int32, (NT, gu), 1).astype(jnp.float32)
        iota_vw = (jax.lax.broadcasted_iota(jnp.int32, (NT, cw), 1)
                   // cp).astype(jnp.float32) + vb.astype(jnp.float32)

        # Window-relative accumulators live as VALUES (VMEM temporaries);
        # the out block is touched by ONE read-modify-write per slab at the
        # end — a dynamic-lane-offset RMW per STATION measured pathological.
        accs = [jnp.zeros((gu, cw), jnp.float32) for _ in range(zp)]
        for j in range(S_BLK):
            p_s = (sb * S_BLK + j).astype(jnp.float32) * inv_k
            t = (p_s - op) / dp                          # [NT, 1]
            u = ou + t * du
            v = ov + t * dv
            wu_nt = jnp.maximum(0.0, 1.0 - jnp.abs(u - iota_u)
                                ).astype(bf16)           # [NT, Gu]
            wv_nt = jnp.maximum(0.0, 1.0 - jnp.abs(v - iota_vw))
            g_j = g_ref[j]                               # [NT, Cp]
            # [NT, wv*Cp], channel-minor: g tiled wv times along lanes.
            g_t = jnp.concatenate([g_j] * wv, axis=1)
            prod = (wv_nt * g_t).astype(bf16)
            # A^T B with rays contracting on sublanes: [Gu, wv*Cp] f32.
            pm = jax.lax.dot_general(
                wu_nt, prod,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z_lo = j // k
            f = (j % k) * inv_k
            accs[z_lo] = accs[z_lo] + (1.0 - f) * pm
            if j % k:
                accs[z_lo + 1] = accs[z_lo + 1] + f * pm
        ds_v = pl.ds(vb8 * (8 * cp), cw)
        for z in range(zp):
            out_ref[0, z, :, ds_v] += accs[z]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsb, nnb),
            in_specs=[
                pl.BlockSpec((S_BLK, NT, cp), lambda s, nb, vbr: (s, nb, 0)),
                pl.BlockSpec((NT, 8), lambda s, nb, vbr: (nb, 0)),
            ],
            out_specs=pl.BlockSpec((1, zp, gu, cgv),
                                   lambda s, nb, vbr: (s, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nsb, zp, gu, cgv), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(v_base // 8, g_snc, rp_t)


def fold_bwd_partials(partials, gp, gu, gv, c, cp, k):
    """[NSB, ZP, Gu, Gv_p8*Cp] slab partials -> [Gp, Gu, Gv*C] cotangent.

    Block sb's local slab zl is absolute slab sb*(S_BLK//k) + zl; locals
    0..ZP-2 tile the slab axis contiguously and the last local overlaps
    the next block's local 0 (one shifted add).
    """
    nsb, zp, gu, cgv = partials.shape
    gv_p8 = cgv // cp
    zb = zp - 1  # slabs per station block
    body = partials[:, :zb]                        # [nsb, zb, gu, cgv]
    carry = partials[:, zb]                        # -> slab (sb+1)*zb
    shifted = jnp.concatenate(
        [jnp.zeros_like(carry[:1]), carry[:-1]])   # block sb+1, local 0
    body = body.at[:, 0].add(shifted)              # slice-add: one pass
    total = body.reshape(nsb * zb, gu, cgv)
    if nsb * zb < gp:  # unpadded station count: last carry is a real slab
        total = jnp.concatenate(
            [total, jnp.zeros((gp - nsb * zb, gu, cgv), jnp.float32)])
        total = total.at[nsb * zb].add(carry[-1])
    g4 = total[:gp].reshape(gp, gu, gv_p8, cp)[:, :, :gv, :c]
    return g4.reshape(gp, gu, gv * c)
