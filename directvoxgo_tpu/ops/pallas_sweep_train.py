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
                   static_argnames=("c", "cp", "k", "gu", "gv", "interpret"))
def sweep_fwd_pallas(slabs_p, rays_packed, *, c, cp, k, gu, gv,
                     interpret=False):
    """All-station sweep values via the fused kernel.

    Args:
      slabs_p: [S_pad, Gu, Gv*Cp] bf16 v-major station slabs with channels
        padded to ``cp`` (see :func:`pad_channels`), stations padded to a
        multiple of S_BLK (pad slabs zero).
      rays_packed: [8, N] f32 rows (op, ou, ov, dp_safe, du, dv, 0, 0) with
        dp_safe already zero-guarded; N a multiple of NT.
      c, cp, k, gu, gv: static real/padded channel counts, substeps per
        voxel, in-plane dims.

    Returns:
      vals [S_pad, C, N] f32 station samples in slab order.
    """
    s_pad = slabs_p.shape[0]
    n = rays_packed.shape[1]
    cgv = cp * gv
    assert s_pad % S_BLK == 0 and n % NT == 0 and cp % C_TILE == 0
    nsb, nnb = s_pad // S_BLK, n // NT
    inv_k = 1.0 / float(k)
    bf16 = jnp.bfloat16

    def kernel(slab_ref, rp_ref, out_ref):
        sb = pl.program_id(0)

        op = rp_ref[0, :]                                  # [NT] lanes
        ou = rp_ref[1, :]
        ov = rp_ref[2, :]
        dp = rp_ref[3, :]
        du = rp_ref[4, :]
        dv = rp_ref[5, :]

        # u-hat rows over SUBLANES (rays stay on lanes).
        iota_u = jax.lax.broadcasted_iota(
            jnp.int32, (gu, NT), 0).astype(jnp.float32)
        # v index of each (v*Cp + c) row.
        iota_vw = (jax.lax.broadcasted_iota(jnp.int32, (cgv, NT), 0)
                   // cp).astype(jnp.float32)

        for j in range(S_BLK):
            p_s = (sb * S_BLK + j).astype(jnp.float32) * inv_k
            t = (p_s - op) / dp                            # [NT]
            u = ou + t * du
            v = ov + t * dv
            wu_t = jnp.maximum(0.0, 1.0 - jnp.abs(u[None, :] - iota_u)
                               ).astype(bf16)              # [Gu, NT]
            wv_t = jnp.maximum(0.0, 1.0 - jnp.abs(v[None, :] - iota_vw))
            # [Gu, Gv*Cp] (contract Gu) [Gu, NT] -> [Gv*Cp, NT]
            tmp_t = jax.lax.dot_general(
                slab_ref[j], wu_t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            prod = (tmp_t * wv_t).reshape(gv, cp, NT)
            # Tree-fold the v dimension (leading-dim slices of the rank-3
            # view are tile-aligned because cp is two f32 sublane tiles).
            m = gv
            while m > 1:
                lower = (m + 1) // 2
                folded = prod[: m - lower] + prod[lower:m]
                if lower > m - lower:   # odd m: middle row passes through
                    folded = jnp.concatenate(
                        [folded, prod[m - lower: lower]], axis=0)
                prod = folded
                m = lower
            out_ref[j] = prod[0, :c, :]

    return pl.pallas_call(
        kernel,
        grid=(nsb, nnb),
        in_specs=[
            pl.BlockSpec((S_BLK, gu, cgv), lambda s, nb: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NT), lambda s, nb: (0, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_BLK, c, NT), lambda s, nb: (s, 0, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, c, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(slabs_p, rays_packed)


def sweep_fwd_available(n, c, gu, gv):
    """Shape gate for the fused path (ray count must tile; tiny grids are
    not worth a kernel launch and can violate Mosaic minimums).
    ``DVGO_SWEEP_PALLAS=0`` forces the XLA scan (A/B probes)."""
    if os.environ.get("DVGO_SWEEP_PALLAS", "1") == "0":
        return False
    return (jax.default_backend() == "tpu" and n % NT == 0
            and gu >= 2 and gv >= 2 and c >= 1)
