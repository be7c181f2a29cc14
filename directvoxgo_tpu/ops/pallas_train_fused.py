"""Fully fused station-sweep TRAIN step kernels (forward + backward).

Round-3 profiling (tools/trace_chain_floor.py on the maskcache-filtered
pool, class (163,96,96)) decomposed the 27-30 ms train step into: fused
sweep forward 5.6 ms, XLA backward station scan 5.9 ms, ~3.4 ms full-grid
Adam dynamic-update-slices, ~3 ms donate-avoidable copies, and **~12 ms of
[N,S] "chain" soup** — raw2alpha, the bidirectional cumprod compositing,
top-K compaction (sort + one-hot matmuls), MLP dispatch, loss terms, and
their VJPs, each a separate [8192, 325]-sized XLA op with its own HBM
round-trip. The chain is pure bandwidth/latency — none of it needs to
touch HBM.

This module fuses the whole per-ray pipeline into two Pallas kernels:

* ``train_fwd_pallas`` (K1): per (station-block, ray-tile) grid step, the
  station slab contraction (same transposed rays-on-lanes orientation as
  ops/pallas_sweep_train.py), then — in registers — raw2alpha, the
  live-gated transmittance recursion, ``fast_color_thres`` gating, and the
  color MLP, with per-ray accumulators (T, rgb, rgbper) carried across
  station blocks in VMEM scratch. Outputs are **[N]-sized**: rgb_marched,
  alphainv_last, rgbper_sum — the only quantities the training loss reads
  — plus the raw station values ``vals`` [S_pad, Cp, N] (saved for the
  backward: at wide window classes the sweep matmul is MXU-bound, so
  re-reading ~170 MB of f32 values is ~15x cheaper than recomputing the
  contraction) and per-station-block transmittance checkpoints ``t_chk``
  (the backward recomputes T *within* a block from its checkpoint —
  robust against saturated alphas, no 1/(1-a) division chains).

* ``train_bwd_pallas`` (K2): iterates station blocks in REVERSE march
  order carrying the suffix accumulator ``R_k = sum_{j>k} dL/dw_j * w_j``
  per ray (the closed-form compositing backward of
  ops/raymarch.alpha2weight_dense_bidir, render_utils_kernel.cu:507-561
  semantics), recomputes alpha/T/weights from ``vals`` + checkpoints
  (bit-identical f32 ops to the forward), runs the MLP forward+backward,
  and contracts per-station cotangents back to slab space on the MXU
  ([Wu, NT] x [Cw, NT]^T per station, accumulated across ray tiles in the
  resident output block — the ops/pallas_sweep_train.sweep_bwd_pallas
  pattern). MLP weight gradients accumulate in constant-index output
  blocks (resident in VMEM for the whole kernel).

Two structural perf choices (v2, measured on the v5e at the e2e shape):

* **Per-(station-block, ray-tile) (u, v) windows** (v3): with
  ``cfg.wu``/``cfg.wv`` set, every (station-block, 512-ray-tile) grid
  cell reads only its own (Wu, Wv) sub-window of its slabs (in-kernel
  ``pl.ds`` slices at aligned per-cell bases from a prefetched scalar
  array), and cells with no station inside the tile's [t_lo, t_hi] are
  skipped outright. v2's whole-traversal per-tile windows didn't pay —
  per-ray in-plane drift across the full traversal is ~63 voxels median
  on the trained fixture pool — but a cell's footprint is the tile
  spread plus only ~s_blk/k voxels of drift: measured 7-10% of the
  segment-box area at the wide classes (tools/
  analyze_blocktile_windows.py), which is what makes wide-footprint
  maskcache-pool batches cheap (VERDICT r3 #1). Batches must group
  same-class tiles (ops/sweep.build_ray_tiles_blocktile); the static
  (wu, wv) covers every cell of every tile in the batch.
* **Station-block-batched MLP**: the per-station [128,12]x[12,512]
  matmuls are invocation-overhead-bound (K=12 wastes the systolic array;
  9 tiny matmuls per station-block-tile across K1+K2). Features for the
  whole block concatenate on lanes to one [F, S_BLK*NT] operand — 8x
  fewer MXU invocations, gated per (tile, station-block) by
  ``any(w_eff > 0)`` (exact: contributions are w_eff-masked).

March direction: batches must be direction-uniform along the sweep axis
(the engine's segment builder sorts by sign — see
ops/sweep.build_ray_segments_2d). Rays keep their TRUE voxel coords; a
descending batch just *visits* stations in reverse via the (p0, pstep)
runtime scalars and slabs pre-flipped in XLA (one fused select pass), so
one compiled kernel serves both directions.

Loss semantics mirrored exactly (engine/train.py make_train_step):
``mse = mean((rgb_marched - gt)^2)``, entropy on clipped alphainv_last,
``rgbper = sum(w_eff_detached * ||rgb_s - gt||^2) / N_rand`` — all three
flow through K1's three outputs only, so the custom_vjp boundary is
complete. Reference parity: lib/dvgo.py:450-577 forward composition,
render_utils_kernel.cu:354-561 alpha/weight kernels. One deliberate
deviation: Mosaic has no ``expm1`` lowering, so alpha uses ``1-exp`` —
at alpha ~ fast_color_thres=1e-4 the f32 error is ~1e-7 (0.1% relative),
which can flip the threshold gate for a measure-zero sliver of samples;
the XLA path (kept for parity tests) uses ``-expm1``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raymarch import T_EPS, T_TERMINATE

CP = 16        # padded channel count (two f32 sublane tiles; see
               # pallas_sweep_train on why the fold needs this)
S_BLK = 8      # stations per grid step
NT = 512       # rays per grid step


def _round_up(x, m):
    return (int(x) + m - 1) // m * m


class FusedCfg(NamedTuple):
    """Static configuration of one fused-step program (hashable)."""
    k: int                 # substeps per voxel along the sweep axis
    f: int                 # k0 feature channels feeding the MLP
    width: int             # MLP hidden width
    act_shift: float
    thres: float           # fast_color_thres (> 0 required)
    bg: float
    direct: bool           # rgbnet_direct: True = sigmoid(logit),
    #                        False = sigmoid(logit + k0[:3])
    wu: int = 0            # per-tile u window (0 = full extent)
    wv: int = 0            # per-tile v window (0 = full extent)
    s_blk: int = S_BLK
    nt: int = NT
    interpret: bool = False


def _eff_windows(cfg, gu, gv):
    """Effective per-tile window extents (full dim when unwindowed)."""
    wu = cfg.wu if 0 < cfg.wu < gu else gu
    wv = cfg.wv if 0 < cfg.wv < gv else gv
    windowed = wu < gu or wv < gv
    return wu, wv, windowed


def _hat_rows(coord, iota, dtype=jnp.float32):
    """[NT] coords + [G, NT] iota -> [G, NT] interp rows."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[None, :] - iota)
                       ).astype(dtype)


def _fold_v(prod, gv, cp, nt):
    """Tree-fold the v dim of a [Gv*Cp, NT] product -> [Cp, NT]."""
    prod = prod.reshape(gv, cp, nt)
    m = gv
    while m > 1:
        lower = (m + 1) // 2
        folded = prod[: m - lower] + prod[lower:m]
        if lower > m - lower:
            folded = jnp.concatenate([folded, prod[m - lower: lower]],
                                     axis=0)
        prod = folded
        m = lower
    return prod[0]


def _mlp_fwd_blk(feat_all, sh1_all, w1a_r, w2_r, b2_r, w3_r, b3_r):
    """Batched MLP forward: [F, S_BLK*NT] features -> (logit [8, *],
    h1, h2 bf16 [W, *])."""
    h1p = jax.lax.dot_general(
        w1a_r[:], feat_all, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + sh1_all
    h1 = jnp.maximum(h1p, 0.0).astype(jnp.bfloat16)
    h2p = jax.lax.dot_general(
        w2_r[:], h1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_r[:]
    h2 = jnp.maximum(h2p, 0.0).astype(jnp.bfloat16)
    logit = jax.lax.dot_general(
        w3_r[:], h2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b3_r[:]
    return logit, h1, h2


@functools.partial(
    jax.jit, static_argnames=("cfg", "gu", "gv"))
def train_fwd_pallas(slabs_m, rays16, sh1_t, w1a, w2, b2t, w3p, b3t, scal,
                     uvb8=None, *, cfg: FusedCfg, gu, gv):
    """K1. Args:
      slabs_m: [S_pad, Gu, Gv*CP] bf16 station slabs in MARCH order
        (pre-flipped for descending batches; channels: 0 density, 1 mask,
        2.. k0, zero-padded to CP; Gu/Gv padded to multiples of 8 when
        windowed).
      rays16: [16, N] f32 rows (op, ou, ov, dp_safe, du, dv, t_lo, t_hi,
        interval, gt_r, gt_g, gt_b, 0...). Voxel coords are TRUE
        (unflipped).
      sh1_t: [W, N] f32 hoisted view-path first-layer term
        (vd_emb @ W1b + b1, transposed).
      w1a: [F, W] bf16; w2: [W, W] bf16; b2t: [W, 1] f32;
      w3p: [W, 8] bf16 (3 real cols); b3t: [8, 1] f32 (3 real rows).
      scal: [1, 4] f32 (p0, pstep, 0, 0): station ms sits at sweep coord
        p0 + pstep*ms.
      uvb8: [nsb, N//NT, 4] int32 per-(march-block, ray-tile) window
        cells — rows (u_base//16, v_base//8, active, 0) from
        :func:`blocktile_uv_bases` (required when cfg.wu/wv window). Each
        grid step reads only its own (wu, wv) slab cell; ``active == 0``
        cells (no station of the block inside the tile's [t_lo, t_hi])
        skip the contraction/compositing entirely and write zero vals.
        EXACT when every (block, tile) cell's support fits the class —
        the segment builder guarantees it (ops/sweep
        .build_ray_segments_blocktile).

    Returns:
      pack [8, N] f32 (rows: rgb*3, alphainv_last, rgbper_sum, 0...),
      t_chk [nsb, 8, N] f32 (row 0: T entering each march block),
      vals [S_pad, CP, N] f32 (raw station values, march order).
    """
    s_pad, _, cgv = slabs_m.shape
    n = rays16.shape[1]
    s_blk, nt = cfg.s_blk, cfg.nt
    assert s_pad % s_blk == 0 and n % nt == 0 and cgv == gv * CP
    nsb, nnb = s_pad // s_blk, n // nt
    width = cfg.width
    coff = 2 + (0 if cfg.direct else 3)
    wu, wv, windowed = _eff_windows(cfg, gu, gv)
    cw = wv * CP
    if windowed:
        assert gu % 8 == 0 and gv % 8 == 0 and wu % 8 == 0 and wv % 8 == 0
        assert uvb8 is not None and uvb8.shape == (nsb, nnb, 4)

    def kernel(*refs):
        if windowed:
            uvb_ref = refs[0]
            refs = refs[1:]
        (scal_ref, slab_ref, rp_ref, sh1_ref, w1a_r, w2_r, b2_r, w3_r,
         b3_r, pack_ref, tchk_ref, vals_ref, acc_ref) = refs
        mb = pl.program_id(0)
        nb = pl.program_id(1)
        p0 = scal_ref[0, 0]
        pstep = scal_ref[0, 1]

        @pl.when(mb == 0)
        def _():
            acc_ref[nb] = jnp.zeros((8, nt), jnp.float32)
            acc_ref[nb, 0] = jnp.ones((nt,), jnp.float32)

        tchk_ref[0, 0] = acc_ref[nb, 0]

        def body(ub16, vb8):
            op, ou, ov = rp_ref[0], rp_ref[1], rp_ref[2]
            dp, du, dv = rp_ref[3], rp_ref[4], rp_ref[5]
            tlo, thi, interval = rp_ref[6], rp_ref[7], rp_ref[8]
            gt = rp_ref[9:12]

            iota_u = jax.lax.broadcasted_iota(
                jnp.int32, (wu, nt), 0).astype(jnp.float32) \
                + (ub16 * 16).astype(jnp.float32)
            iota_vw = (jax.lax.broadcasted_iota(jnp.int32, (cw, nt), 0)
                       // CP).astype(jnp.float32) \
                + (vb8 * 8).astype(jnp.float32)

            t_cum = acc_ref[nb, 0]
            feats, weffs, aux = [], [], []
            for jm in range(s_blk):
                ms = (mb * s_blk + jm).astype(jnp.float32)
                p_s = p0 + pstep * ms
                t = (p_s - op) / dp
                u = ou + t * du
                v = ov + t * dv
                wu_t = _hat_rows(u, iota_u, jnp.bfloat16)
                wv_t = _hat_rows(v, iota_vw)
                if windowed:
                    slab_j = slab_ref[jm, pl.ds(ub16 * 16, wu),
                                      pl.ds(vb8 * (8 * CP), cw)]
                else:
                    slab_j = slab_ref[jm]
                tmp = jax.lax.dot_general(
                    slab_j, wu_t,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                vals_j = _fold_v(tmp * wv_t, wv, CP, nt)
                vals_ref[jm] = vals_j

                dens = vals_j[0]
                maskv = vals_j[1]
                alpha_raw = 1.0 - jnp.exp(
                    -jax.nn.softplus(dens + cfg.act_shift) * interval)
                valid = (t >= tlo) & (t <= thi) & (thi > tlo) \
                    & (maskv > 0.0)
                a = jnp.where(valid & (alpha_raw > cfg.thres),
                              alpha_raw, 0.0)
                live = t_cum >= T_TERMINATE
                w = jnp.where(live, t_cum * a, 0.0)
                weff = jnp.where(w > cfg.thres, w, 0.0)
                weffs.append(weff)
                feats.append(
                    vals_j[coff: coff + cfg.f].astype(jnp.bfloat16))
                if not cfg.direct:
                    aux.append(vals_j[2:5])
                om = jnp.where(a > 0.0, 1.0 - a + T_EPS, 1.0)
                t_cum = jnp.where(live, t_cum * om, t_cum)
            acc_ref[nb, 0] = t_cum

            any_active = jnp.any(
                sum(jnp.sum(wf) for wf in weffs) > 0.0)

            @pl.when(any_active)
            def _():
                feat_all = jnp.concatenate(feats, axis=1)  # [F, S_BLK*NT]
                sh1 = sh1_ref[:].astype(jnp.float32)
                sh1_all = jnp.concatenate([sh1] * s_blk, axis=1)
                logit, _, _ = _mlp_fwd_blk(feat_all, sh1_all, w1a_r, w2_r,
                                           b2_r, w3_r, b3_r)
                for jm in range(s_blk):
                    lg = logit[0:3, jm * nt:(jm + 1) * nt]
                    if not cfg.direct:
                        lg = lg + aux[jm]
                    rgb = jax.nn.sigmoid(lg)
                    acc_ref[nb, 1:4] += weffs[jm][None, :] * rgb
                    acc_ref[nb, 4] += weffs[jm] * jnp.sum((rgb - gt) ** 2,
                                                          axis=0)

        if windowed:
            act = uvb_ref[mb, nb, 2]

            @pl.when(act == 0)
            def _():
                # Inactive (block, tile) cell: no station of this march
                # block lies inside any of the tile's [t_lo, t_hi] ranges.
                # Zero vals (K2 recomputes alpha from them; uninitialized
                # VMEM could hold NaNs that survive the 0-weight gates as
                # 0 * NaN) and skip the contraction/compositing entirely.
                vals_ref[:] = jnp.zeros((s_blk, CP, nt), jnp.float32)

            @pl.when(act != 0)
            def _():
                body(uvb_ref[mb, nb, 0], uvb_ref[mb, nb, 1])
        else:
            body(jnp.int32(0), jnp.int32(0))

        t_fin = acc_ref[nb, 0]
        pack_ref[0:3] = acc_ref[nb, 1:4] + t_fin[None, :] * cfg.bg
        pack_ref[3] = t_fin
        pack_ref[4] = acc_ref[nb, 4]
        pack_ref[5:8] = jnp.zeros((3, nt), jnp.float32)

    in_specs = [
        pl.BlockSpec((1, 4), lambda s, b: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((s_blk, gu, cgv), lambda s, b: (s, 0, 0)),
        pl.BlockSpec((16, nt), lambda s, b: (0, b)),
        pl.BlockSpec((width, nt), lambda s, b: (0, b)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((8, nt), lambda s, b: (0, b)),
        # [nsb, 8, N] with only row 0 written: Mosaic requires the
        # last-two block dims (8, nt) be tile-divisible; a [nsb, N]
        # layout would need an illegal (1, nt) block.
        pl.BlockSpec((1, 8, nt), lambda s, b: (s, 0, b)),
        pl.BlockSpec((s_blk, CP, nt), lambda s, b: (s, 0, b)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8, n), jnp.float32),
        jax.ShapeDtypeStruct((nsb, 8, n), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, CP, n), jnp.float32),
    ]
    scratch = [pltpu.VMEM((nnb, 8, nt), jnp.float32)]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)
    inputs = (scal, slabs_m, rays16, sh1_t, w1a, w2, b2t, w3p, b3t)
    if windowed:
        def _shift(spec):
            im = spec.index_map
            if im is None:      # full-array spec (weights): pass through
                return spec
            return pl.BlockSpec(spec.block_shape,
                                lambda s, b, u, _im=im: _im(s, b),
                                memory_space=spec.memory_space)

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nsb, nnb),
                in_specs=[_shift(s) for s in in_specs],
                out_specs=[_shift(s) for s in out_specs],
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=cfg.interpret,
            compiler_params=cparams,
        )(uvb8, *inputs)
    return pl.pallas_call(
        kernel,
        grid=(nsb, nnb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=cfg.interpret,
        compiler_params=cparams,
    )(*inputs)


@functools.partial(
    jax.jit, static_argnames=("cfg", "gu", "gv"))
def train_bwd_pallas(vals, t_chk, rays16, cot, sh1_t, w1a, w2, b2t, w3p,
                     b3t, scal, uvb8=None, *, cfg: FusedCfg, gu, gv):
    """K2. Args (beyond K1's): vals/t_chk from K1; cot [8, N] f32 rows
    (g_rgb*3, g_ainv, g_rgbper, alphainv_last, 0, 0); uvb8 as in K1
    ([nsb, N//nt, 4] march-block-resolved window cells).

    Returns:
      d_st [S_pad, Gu, Gv*CP] f32 slab cotangents (march order),
      d_sh1 [W, N] f32, d_w1a [F, W] f32, d_w2 [W, W] f32,
      d_b2 [W, 8] f32 (col 0), d_w3 [W, 8] f32, d_b3 [8, 8] f32 (col 0).
    """
    s_pad = vals.shape[0]
    n = rays16.shape[1]
    s_blk, nt = cfg.s_blk, cfg.nt
    cgv = gv * CP
    nsb, nnb = s_pad // s_blk, n // nt
    width, f = cfg.width, cfg.f
    coff = 2 + (0 if cfg.direct else 3)
    wu, wv, windowed = _eff_windows(cfg, gu, gv)
    cw = wv * CP
    if windowed:
        assert gu % 8 == 0 and gv % 8 == 0 and wu % 8 == 0 and wv % 8 == 0
        assert uvb8 is not None and uvb8.shape == (nsb, nnb, 4)

    def kernel(*refs):
        if windowed:
            uvb_ref = refs[0]
            refs = refs[1:]
        (scal_ref, vals_ref, tchk_ref, rp_ref, cot_ref, sh1_ref,
         w1a_r, w2_r, b2_r, w3_r, b3_r,
         dst_ref, dsh1_ref, dw1a_ref, dw2_ref, db2_ref, dw3_ref,
         db3_ref, r_scr, st_scr, sh1_scr) = refs
        mbg = pl.program_id(0)
        nb = pl.program_id(1)
        mb = nsb - 1 - mbg          # true march block (reverse iteration)
        p0 = scal_ref[0, 0]
        pstep = scal_ref[0, 1]

        @pl.when((mbg == 0) & (nb == 0))
        def _():
            dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
            dw3_ref[:] = jnp.zeros_like(dw3_ref)
            db3_ref[:] = jnp.zeros_like(db3_ref)

        @pl.when(mbg == 0)
        def _():
            r_scr[nb] = jnp.zeros((8, nt), jnp.float32)
            sh1_scr[nb] = jnp.zeros((width, nt), jnp.float32)

        @pl.when(nb == 0)
        def _():
            dst_ref[:] = jnp.zeros_like(dst_ref)

        def body(ub16, vb8):
            op, ou, ov = rp_ref[0], rp_ref[1], rp_ref[2]
            dp, du, dv = rp_ref[3], rp_ref[4], rp_ref[5]
            tlo, thi, interval = rp_ref[6], rp_ref[7], rp_ref[8]
            gt = rp_ref[9:12]
            g_rgb = cot_ref[0:3]
            g_ainv = cot_ref[3]
            g_rgbper = cot_ref[4]
            ainv = cot_ref[5]
            ga_ainv = g_ainv * ainv
            sh1 = sh1_ref[:]

            iota_u = jax.lax.broadcasted_iota(
                jnp.int32, (wu, nt), 0).astype(jnp.float32) \
                + (ub16 * 16).astype(jnp.float32)
            iota_vw = (jax.lax.broadcasted_iota(jnp.int32, (cw, nt), 0)
                       // CP).astype(jnp.float32) \
                + (vb8 * 8).astype(jnp.float32)

            # ---- pass 1 (ascending in-block): recompute T/alpha/w from
            # vals + the block's T checkpoint; batched gated MLP
            # forward+backward; stash A and the color-row cotangents.
            t_cum = tchk_ref[0, 0]
            a_l, w_l, om_l, live_l, araw_l, dens_l, valid_l, t_l = \
                [], [], [], [], [], [], [], []
            weffs, feats, auxs = [], [], []
            for jm in range(s_blk):
                ms = (mb * s_blk + jm).astype(jnp.float32)
                p_s = p0 + pstep * ms
                t = (p_s - op) / dp
                vals_j = vals_ref[jm]
                dens = vals_j[0]
                maskv = vals_j[1]
                alpha_raw = 1.0 - jnp.exp(
                    -jax.nn.softplus(dens + cfg.act_shift) * interval)
                valid = (t >= tlo) & (t <= thi) & (thi > tlo) & (maskv > 0.0)
                occ = valid & (alpha_raw > cfg.thres)
                a = jnp.where(occ, alpha_raw, 0.0)
                live = t_cum >= T_TERMINATE
                w = jnp.where(live, t_cum * a, 0.0)
                weff = jnp.where(w > cfg.thres, w, 0.0)
                a_l.append(a)
                w_l.append(w)
                live_l.append(live)
                araw_l.append(alpha_raw)
                dens_l.append(dens)
                valid_l.append(occ)
                t_l.append(t_cum)
                om = jnp.where(a > 0.0, 1.0 - a + T_EPS, 1.0)
                om_l.append(om)
                weffs.append(weff)
                feats.append(vals_j[coff: coff + f].astype(jnp.bfloat16))
                if not cfg.direct:
                    auxs.append(vals_j[2:5])
                st_scr[jm] = jnp.zeros((CP, nt), jnp.float32)
                t_cum = jnp.where(live, t_cum * om, t_cum)

            any_active = jnp.any(
                sum(jnp.sum(wf) for wf in weffs) > 0.0)

            @pl.when(any_active)
            def _():
                feat_all = jnp.concatenate(feats, axis=1)   # [F, S_BLK*NT]
                sh1_all = jnp.concatenate([sh1] * s_blk, axis=1)
                logit, h1, h2 = _mlp_fwd_blk(feat_all, sh1_all, w1a_r, w2_r,
                                             b2_r, w3_r, b3_r)
                lg3 = logit[0:3]
                if not cfg.direct:
                    lg3 = lg3 + jnp.concatenate(auxs, axis=1)
                rgb_all = jax.nn.sigmoid(lg3)               # [3, S_BLK*NT]
                weff_all = jnp.concatenate(
                    [wf[None, :] for wf in weffs], axis=1)  # [1, S_BLK*NT]
                g_rgb_t = jnp.concatenate([g_rgb] * s_blk, axis=1)
                g_per_t = jnp.concatenate([g_rgbper[None, :]] * s_blk, axis=1)
                gt_t = jnp.concatenate([gt] * s_blk, axis=1)
                # A_j = dL/dw_eff = sum_c rgb_c * g_rgb_c (+ rgbper term is
                # weight-detached, reference run.py:380-384 semantics)
                a_all = jnp.sum(rgb_all * g_rgb_t, axis=0)  # [S_BLK*NT]
                d_rgb = weff_all * (
                    g_rgb_t + g_per_t * 2.0 * (rgb_all - gt_t))
                d_logit3 = d_rgb * rgb_all * (1.0 - rgb_all)
                d_logit = jnp.concatenate(
                    [d_logit3, jnp.zeros((5, s_blk * nt), jnp.float32)],
                    axis=0)
                d_logit_b = d_logit.astype(jnp.bfloat16)
                dw3_ref[:] += jax.lax.dot_general(
                    h2, d_logit_b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                db3_ref[:, 0:1] += jnp.sum(d_logit, axis=1, keepdims=True)
                d_h2 = jax.lax.dot_general(
                    w3_r[:], d_logit_b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d_h2 = jnp.where(h2.astype(jnp.float32) > 0.0, d_h2, 0.0)
                d_h2b = d_h2.astype(jnp.bfloat16)
                dw2_ref[:] += jax.lax.dot_general(
                    h1, d_h2b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                db2_ref[:, 0:1] += jnp.sum(d_h2, axis=1, keepdims=True)
                d_h1 = jax.lax.dot_general(
                    w2_r[:], d_h2b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d_h1 = jnp.where(h1.astype(jnp.float32) > 0.0, d_h1, 0.0)
                d_h1b = d_h1.astype(jnp.bfloat16)
                dw1a_ref[:] += jax.lax.dot_general(
                    feat_all, d_h1b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d_feat = jax.lax.dot_general(
                    w1a_r[:], d_h1b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [F, S_BLK*NT]
                acc = sh1_scr[nb]
                for jm in range(s_blk):
                    seg = slice(jm * nt, (jm + 1) * nt)
                    st_scr[jm, 15] = a_all[seg]
                    st_scr[jm, coff: coff + f] = d_feat[:, seg]
                    if not cfg.direct:
                        st_scr[jm, 2:5] = d_logit3[:, seg]
                    acc = acc + d_h1[:, seg]
                sh1_scr[nb] = acc

            # ---- pass 2 (descending in-block): suffix R, d_alpha -> d_dens,
            # per-station windowed slab cotangent contraction.
            r_suf = r_scr[nb, 0]
            for jm in range(s_blk - 1, -1, -1):
                g_sc = st_scr[jm]
                d_w = jnp.where(w_l[jm] > cfg.thres, g_sc[15], 0.0)
                keep = valid_l[jm] & live_l[jm]
                a_term = jnp.where(live_l[jm], ga_ainv, 0.0)
                inv_om = jnp.where(
                    valid_l[jm], 1.0 / jnp.maximum(om_l[jm], T_EPS), 0.0)
                d_alpha = jnp.where(keep, d_w * t_l[jm], 0.0) \
                    - (r_suf + a_term) * inv_om
                d_dens = d_alpha * interval \
                    * jax.nn.sigmoid(dens_l[jm] + cfg.act_shift) \
                    * (1.0 - araw_l[jm])
                r_suf = r_suf + d_w * w_l[jm]

                ms = (mb * s_blk + jm).astype(jnp.float32)
                p_s = p0 + pstep * ms
                t = (p_s - op) / dp
                u = ou + t * du
                v = ov + t * dv
                wu_t = _hat_rows(u, iota_u, jnp.bfloat16)
                wv_t = _hat_rows(v, iota_vw)
                g_st = jnp.concatenate(
                    [d_dens[None, :], jnp.zeros((1, nt), jnp.float32),
                     g_sc[2:14], jnp.zeros((2, nt), jnp.float32)], axis=0)
                g_tiled = jnp.concatenate([g_st] * wv, axis=0)   # [Cw, NT]
                rhs = (wv_t * g_tiled).astype(jnp.bfloat16)
                pm = jax.lax.dot_general(
                    wu_t, rhs,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [Wu, Cw]
                if windowed:
                    cur = dst_ref[jm, pl.ds(ub16 * 16, wu),
                                  pl.ds(vb8 * (8 * CP), cw)]
                    dst_ref[jm, pl.ds(ub16 * 16, wu),
                            pl.ds(vb8 * (8 * CP), cw)] = cur + pm
                else:
                    dst_ref[jm] += pm
            r_scr[nb, 0] = r_suf

        if windowed:
            act = uvb_ref[mb, nb, 2]

            # Inactive cells (see K1) have zero vals and every station
            # outside the tile's [t_lo, t_hi]: weff, d_dens and the
            # suffix-R update are all exactly zero there, so skipping the
            # whole recompute + contraction changes nothing.
            @pl.when(act != 0)
            def _():
                body(uvb_ref[mb, nb, 0], uvb_ref[mb, nb, 1])
        else:
            body(jnp.int32(0), jnp.int32(0))
        dsh1_ref[:] = sh1_scr[nb]

    rmb = nsb - 1
    in_specs = [
        pl.BlockSpec((1, 4), lambda s, b: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((s_blk, CP, nt), lambda s, b: (rmb - s, 0, b)),
        pl.BlockSpec((1, 8, nt), lambda s, b: (rmb - s, 0, b)),
        pl.BlockSpec((16, nt), lambda s, b: (0, b)),
        pl.BlockSpec((8, nt), lambda s, b: (0, b)),
        pl.BlockSpec((width, nt), lambda s, b: (0, b)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((s_blk, gu, cgv), lambda s, b: (rmb - s, 0, 0)),
        pl.BlockSpec((width, nt), lambda s, b: (0, b)),
        pl.BlockSpec((f, width), lambda s, b: (0, 0)),
        pl.BlockSpec((width, width), lambda s, b: (0, 0)),
        pl.BlockSpec((width, 8), lambda s, b: (0, 0)),
        pl.BlockSpec((width, 8), lambda s, b: (0, 0)),
        pl.BlockSpec((8, 8), lambda s, b: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((s_pad, gu, cgv), jnp.float32),
        jax.ShapeDtypeStruct((width, n), jnp.float32),
        jax.ShapeDtypeStruct((f, width), jnp.float32),
        jax.ShapeDtypeStruct((width, width), jnp.float32),
        jax.ShapeDtypeStruct((width, 8), jnp.float32),
        jax.ShapeDtypeStruct((width, 8), jnp.float32),
        jax.ShapeDtypeStruct((8, 8), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((nnb, 8, nt), jnp.float32),
        pltpu.VMEM((s_blk, CP, nt), jnp.float32),
        pltpu.VMEM((nnb, width, nt), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)
    inputs = (scal, vals, t_chk, rays16, cot, sh1_t, w1a, w2, b2t, w3p,
              b3t)
    if windowed:
        def _shift(spec):
            im = spec.index_map
            if im is None:      # full-array spec (weights): pass through
                return spec
            return pl.BlockSpec(spec.block_shape,
                                lambda s, b, u, _im=im: _im(s, b),
                                memory_space=spec.memory_space)

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nsb, nnb),
                in_specs=[_shift(s) for s in in_specs],
                out_specs=[_shift(s) for s in out_specs],
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=cfg.interpret,
            compiler_params=cparams,
        )(uvb8, *inputs)
    return pl.pallas_call(
        kernel,
        grid=(nsb, nnb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=cfg.interpret,
        compiler_params=cparams,
    )(*inputs)


# ---------------------------------------------------------------------------
# XLA glue: slab build/flip, its manual transpose, the per-tile window
# base computation, and the custom_vjp wrapper the model calls.
# ---------------------------------------------------------------------------

def _station_slabs_transpose(d_st, gp, k):
    """Transpose of ops/sweep._station_slabs: [S, ...] station cotangents
    -> [Gp, ...] z-slab cotangents (S = k*(Gp-1)+1)."""
    if k == 1:
        return d_st
    d_inner = d_st[:-1].reshape(gp - 1, k, *d_st.shape[1:])
    fr = jnp.arange(k, dtype=jnp.float32) / k
    shape1 = (1, k) + (1,) * (d_st.ndim - 1)
    lo = jnp.sum(d_inner * (1.0 - fr).reshape(shape1), axis=1)
    hi = jnp.sum(d_inner * fr.reshape(shape1), axis=1)
    d_g = jnp.concatenate([lo, jnp.zeros_like(lo[:1])], axis=0)
    d_g = d_g.at[1:].add(hi)
    return d_g.at[-1].add(d_st[-1])


def _build_slabs(density_pm, k0_pm, mask_pm, k, s_blk, pad_uv=False):
    """Channel-stack -> bf16 -> station slabs [S_pad, Gu_p, Gv_p*CP].

    With ``pad_uv`` the in-plane dims are zero-padded (u to a multiple of
    16 — the bf16 sublane tile, so per-tile u-window slices stay
    tile-aligned — v to a multiple of 8); the zero mask channel gates the
    padding exactly."""
    from . import sweep as sweep_ops
    gp, gu, gv = density_pm.shape
    fdim = k0_pm.shape[-1]
    parts = [density_pm[..., None], mask_pm[..., None], k0_pm]
    grid4 = jnp.concatenate(
        [p.astype(jnp.bfloat16) for p in parts], axis=-1)
    gu_p, gv_p = gu, gv
    if pad_uv:
        gu_p, gv_p = _round_up(gu, 16), _round_up(gv, 8)
    grid4 = jnp.pad(grid4, ((0, 0), (0, gu_p - gu), (0, gv_p - gv),
                            (0, CP - 2 - fdim)))
    grid_pm = grid4.reshape(gp, gu_p, gv_p * CP)
    slabs = sweep_ops._station_slabs(grid_pm, k)
    s = slabs.shape[0]
    s_pad = _round_up(s, s_blk)
    if s_pad > s:
        slabs = jnp.concatenate(
            [slabs, jnp.zeros((s_pad - s, gu_p, gv_p * CP), slabs.dtype)])
    return slabs, s, s_pad, gu_p, gv_p


def _mlp_operands(rgbnet, fdim, width):
    """Split layer-0 into (station-feature, view) parts and pad layer 2,
    mirroring models/mlp.mlp_apply_split_cl."""
    layers = rgbnet["layers"]
    w1 = layers[0]["w"]
    w1a = w1[:fdim].astype(jnp.bfloat16)                 # [F, W]
    w2 = layers[1]["w"].astype(jnp.bfloat16)             # [W, W]
    b2t = layers[1]["b"].astype(jnp.float32).reshape(width, 1)
    w3 = layers[2]["w"]                                  # [W, 3]
    w3p = jnp.pad(w3, ((0, 0), (0, 8 - w3.shape[1]))).astype(jnp.bfloat16)
    b3 = layers[2]["b"].astype(jnp.float32)
    b3t = jnp.pad(b3, (0, 8 - b3.shape[0])).reshape(8, 1)
    return w1a, w2, b2t, w3p, b3t


def blocktile_uv_bases(rays16, p0, pstep, nsb, s_blk, gu_p, gv_p, wu, wv,
                       nt):
    """Per-(march-block, ray-tile) window cells for the fused kernels.

    March block ``mb`` evaluates stations ``ms`` in ``[mb*s_blk,
    mb*s_blk + s_blk - 1]`` at sweep coords ``p0 + pstep*ms``; a ray's
    in-plane coords are linear in t, so over the block's t-range —
    clamped to the ray's contributing ``[t_lo, t_hi]`` (stations outside
    it are invalid-gated in-kernel regardless of window coverage) — its
    (u, v) support is bounded by the two endpoint values ±1 voxel of hat
    support, clipped to ``[0, G]`` (rows outside the grid hold no data;
    interpolated mask == 0 gates them exactly). This bounds the per-block
    footprint by ~``s_blk/k * tan(angle)`` instead of the whole-traversal
    ~``gp * tan`` drift — the reason wide maskcache-pool batches become
    cheap (VERDICT r3 #1; sizing: tools/analyze_blocktile_windows.py).

    Returns ``(uvb [nsb, N//nt, 4] int32, fits [nsb, N//nt, 2] bool)``.
    ``uvb`` rows are (u_base//16, v_base//8, active, 0): u bases are
    multiples of 16 so Mosaic can prove the bf16 sublane slices aligned
    SYNTACTICALLY (ub16*16), v bases multiples of 8; ``active == 0``
    cells have no station of the block inside any ray's [t_lo, t_hi] and
    are skipped by the kernels. ``fits`` flags cells whose needed support
    exceeds the (wu, wv) class — a debug aid; the engine's tile builder
    (ops/sweep.build_ray_tiles_blocktile) only dispatches batches whose
    every cell fits its class.
    """
    n = rays16.shape[1]
    nnb = n // nt
    op, ou, ov = rays16[0], rays16[1], rays16[2]
    dp, du, dv = rays16[3], rays16[4], rays16[5]
    tlo, thi = rays16[6], rays16[7]
    hit = thi > tlo
    ms0 = (jnp.arange(nsb, dtype=jnp.float32) * s_blk)[:, None]
    ms1 = ms0 + float(s_blk - 1)
    ta = (p0 + pstep * ms0 - op[None, :]) / dp[None, :]
    tb = (p0 + pstep * ms1 - op[None, :]) / dp[None, :]
    t0 = jnp.maximum(jnp.minimum(ta, tb), tlo[None, :])
    t1 = jnp.minimum(jnp.maximum(ta, tb), thi[None, :])
    act = (t1 >= t0) & hit[None, :]

    def rng(o, d, g):
        a = o[None, :] + t0 * d[None, :]
        b = o[None, :] + t1 * d[None, :]
        lo = jnp.where(act, jnp.minimum(a, b) - 1.0, jnp.inf)
        hi = jnp.where(act, jnp.maximum(a, b) + 1.0, -jnp.inf)
        # inactive rays clip to (g, 0): neutral under the min/max below
        lo = jnp.clip(lo, 0.0, float(g))
        hi = jnp.clip(hi, 0.0, float(g))
        return (lo.reshape(nsb, nnb, nt).min(axis=-1),
                hi.reshape(nsb, nnb, nt).max(axis=-1))

    u_lo, u_hi = rng(ou, du, gu_p)
    v_lo, v_hi = rng(ov, dv, gv_p)

    def base(lo, g, w, align):
        b = jnp.floor(lo).astype(jnp.int32)
        b = (b // align) * align
        return jnp.clip(b, 0, max(g - w, 0))

    ub = base(u_lo, gu_p, wu, 16)
    vb = base(v_lo, gv_p, wv, 8)
    active = act.reshape(nsb, nnb, nt).any(axis=-1)
    fits = jnp.stack(
        [~active | (jnp.ceil(u_hi) <= (ub + wu).astype(jnp.float32)),
         ~active | (jnp.ceil(v_hi) <= (vb + wv).astype(jnp.float32))],
        axis=-1)
    uvb = jnp.stack([ub // 16, vb // 8, active.astype(jnp.int32),
                     jnp.zeros_like(ub)], axis=-1)
    return uvb, fits


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_chain(cfg, density_pm, k0_pm, mask_pm, rays16, sh1_t, rgbnet):
    """Fused train forward: sweep + compositing + MLP in two Pallas calls.

    Args:
      cfg: FusedCfg (static). cfg.wu/wv > 0 enables per-(station-block,
        ray-tile) windowed slab reads; the cell bases are computed here
        from the ray geometry (:func:`blocktile_uv_bases`).
      density_pm, k0_pm, mask_pm: f32 grids ALREADY permuted to sweep
        order [Gp, Gu, Gv(, F)] (and already clip-sliced in region mode).
      rays16: [16, N] f32 packed rays (see train_fwd_pallas); every ray
        must share the sign of dp (direction-uniform batch).
      sh1_t: [W, N] f32 hoisted view-path term (vd_emb @ W1b + b1).T.
      rgbnet: the model's rgbnet param pytree (layers 0..2).

    Returns (rgb_marched [N, 3], alphainv_last [N], rgbper_sum [N]).
    """
    out, _ = _fused_chain_fwd(cfg, density_pm, k0_pm, mask_pm, rays16,
                              sh1_t, rgbnet)
    return out


def _fused_chain_fwd(cfg, density_pm, k0_pm, mask_pm, rays16, sh1_t,
                     rgbnet):
    gp, gu, gv = density_pm.shape
    k0_dim = k0_pm.shape[-1]
    windowed = (0 < cfg.wu < _round_up(gu, 16)
                or 0 < cfg.wv < _round_up(gv, 8))
    slabs, s_real, s_pad, gu_p, gv_p = _build_slabs(
        density_pm, k0_pm, mask_pm, cfg.k, cfg.s_blk, pad_uv=windowed)
    desc = rays16[3, 0] < 0
    slabs_m = jnp.where(desc, slabs[::-1], slabs)
    inv_k = 1.0 / cfg.k
    p0 = jnp.where(desc, (s_pad - 1) * inv_k, 0.0)
    pstep = jnp.where(desc, -inv_k, inv_k)
    scal = jnp.stack([p0, pstep, jnp.float32(0), jnp.float32(0)]
                     ).reshape(1, 4).astype(jnp.float32)
    w1a, w2, b2t, w3p, b3t = _mlp_operands(rgbnet, cfg.f, cfg.width)
    if windowed:
        wu_e, wv_e, _ = _eff_windows(cfg, gu_p, gv_p)
        uvb, _ = blocktile_uv_bases(
            rays16, p0, pstep, s_pad // cfg.s_blk, cfg.s_blk, gu_p, gv_p,
            wu_e, wv_e, cfg.nt)
    else:
        uvb = None
    pack, t_chk, vals = train_fwd_pallas(
        slabs_m, rays16, sh1_t, w1a, w2, b2t, w3p, b3t, scal, uvb,
        cfg=cfg, gu=gu_p, gv=gv_p)
    rgb = pack[0:3].T
    ainv = pack[3]
    rgbper = pack[4]
    res = (vals, t_chk, rays16, sh1_t, rgbnet, ainv, scal, desc, uvb,
           gp, gu, gv, gu_p, gv_p, k0_dim, s_real)
    return (rgb, ainv, rgbper), res


def _fused_chain_bwd(cfg, res, cts):
    (vals, t_chk, rays16, sh1_t, rgbnet, ainv, scal, desc, uvb,
     gp, gu, gv, gu_p, gv_p, k0_dim, s_real) = res
    g_rgb, g_ainv, g_rgbper = cts
    n = rays16.shape[1]
    # rgb_marched = sum_s w_s rgb_s + alphainv_last * bg: the rgb cotangent
    # also reaches alphainv through the background term.
    g_ainv = g_ainv + cfg.bg * jnp.sum(g_rgb, axis=-1)
    cot = jnp.concatenate(
        [g_rgb.T.astype(jnp.float32),
         g_ainv[None].astype(jnp.float32),
         g_rgbper[None].astype(jnp.float32),
         ainv[None], jnp.zeros((2, n), jnp.float32)], axis=0)
    w1a, w2, b2t, w3p, b3t = _mlp_operands(rgbnet, cfg.f, cfg.width)
    d_st_m, d_sh1, d_w1a, d_w2, d_b2, d_w3, d_b3 = train_bwd_pallas(
        vals, t_chk, rays16, cot, sh1_t, w1a, w2, b2t, w3p, b3t, scal,
        uvb, cfg=cfg, gu=gu_p, gv=gv_p)
    # Un-flip (march -> slab order), drop station padding, fold back to
    # z-slabs, then split channels.
    d_st = jnp.where(desc, d_st_m[::-1], d_st_m)
    # The un-flip restores padded-slab order, whose zero padding sits at
    # the END for both directions (desc marched through it first).
    d_st = d_st[:s_real]
    d_gpm = _station_slabs_transpose(d_st, gp, cfg.k)  # [Gp, Gu_p, Gv_p*CP]
    d_g4 = d_gpm.reshape(gp, gu_p, gv_p, CP)[:, :gu, :gv]
    d_density = d_g4[..., 0]
    d_k0 = d_g4[..., 2:2 + k0_dim]
    d_rgbnet = _assemble_rgbnet_grads(rgbnet, d_w1a, d_w2, d_b2, d_w3,
                                      d_b3, cfg.f)
    return (d_density, d_k0, jnp.zeros_like(d_g4[..., 1]),
            jnp.zeros_like(rays16), d_sh1, d_rgbnet)


def _assemble_rgbnet_grads(rgbnet, d_w1a, d_w2, d_b2, d_w3, d_b3, fdim):
    """Zero-filled rgbnet cotangent pytree with the kernel accumulators in
    place. The view-path parts of layer 0 (w1[fdim:], b1) arrive via the
    d_sh1 cotangent instead (shared1 is computed outside)."""
    layers = rgbnet["layers"]
    w1 = layers[0]["w"]
    d_w1 = jnp.zeros_like(w1).at[:fdim].set(d_w1a.astype(w1.dtype))
    out_layers = [
        {"w": d_w1, "b": jnp.zeros_like(layers[0]["b"])},
        {"w": d_w2.astype(layers[1]["w"].dtype),
         "b": d_b2[:, 0].astype(layers[1]["b"].dtype)},
        {"w": d_w3[:, :layers[2]["w"].shape[1]].astype(
            layers[2]["w"].dtype),
         "b": d_b3[:layers[2]["b"].shape[0], 0].astype(
             layers[2]["b"].dtype)},
    ]
    return {"layers": out_layers}


fused_chain.defvjp(_fused_chain_fwd, _fused_chain_bwd)


def fused_enabled():
    """Backend/env gate alone (the engine checks it before paying for the
    tile sort): DVGO_FUSED_TRAIN=1 on TPU, or =force (CPU interpret mode).

    Default OFF since the r5 full-length A/B on fixture_lego_sparse:
    identical schedule/grid trained both ways measured fblk at test PSNR
    26.67/SSIM 0.905 vs 28.41/0.927 for the window-sweep engine, with no
    engine-level speed win (NNLS blends 42.4 vs 43.1 ms/iter). The fused
    step is numerically parity-tested per draw, so the end-state gap
    points at its tile draw distribution (spatially clustered batches),
    not kernel math; until that is closed the fused trainer is opt-in."""
    import os
    env = os.environ.get("DVGO_FUSED_TRAIN", "0")
    if env == "0":
        return False
    return env == "force" or jax.default_backend() == "tpu"


def fused_available(n, gu, gv, fdim, width, thres, depth,
                    s_blk=S_BLK, nt=NT, wu=0, wv=0):
    """Gate for the fused train step: TPU backend (Mosaic kernels; set
    DVGO_FUSED_TRAIN=force to exercise the path in interpret mode on
    CPU), shape tiling, a 3-layer split MLP, a positive fast_color_thres
    (the gating semantics depend on it), and a VMEM budget check for both
    kernels at this (gu, gv[, window])."""
    if not fused_enabled():
        return False
    if depth != 3 or width < 8 or fdim < 1 or fdim > CP - 2:
        return False
    if thres <= 0 or n % nt or gu < 2 or gv < 2:
        return False
    windowed = bool(wu) or bool(wv)
    if windowed:
        gu, gv = _round_up(gu, 16), _round_up(gv, 8)
        if wu % 16 or wv % 8 or wu > gu or wv > gv:
            return False
    cgv = gv * CP
    wu_e = wu if 0 < wu < gu else gu
    cw_e = (wv if 0 < wv < gv else gv) * CP
    blk = s_blk * nt
    # K2 dominates: resident d_st block (x2: index map moves every s) +
    # vals blocks + windowed contraction temps + batched-MLP temps +
    # per-tile scratch.
    vmem_est = (2 * s_blk * gu * cgv * 4      # d_st out block
                + 2 * s_blk * CP * nt * 4     # vals blocks (dbuf)
                + 6 * cw_e * nt * 4           # iota/wv/tiled/rhs temps
                + 2 * wu_e * nt * 4           # iota_u/wu_t
                + 2 * s_blk * gu * cgv * 2    # K1 slab blocks (dbuf)
                + (4 * 4 + 2 * 2 + 2) * width * blk  # d_h*/h* batched
                + (CP + 16 + 8) * blk * 4     # feat/logit/d_logit temps
                + (16 + 8 + CP * s_blk + 2 * width) * nt * 4)
    return vmem_est <= 96 * 2 ** 20
