"""Station-sweep grid queries: trilinear sampling as MXU matmuls.

THE core TPU-native redesign of the reference hot path. The reference gathers
grid values at arbitrary ray-sample points with CUDA random access
(``sample_pts_on_rays`` + ``F.grid_sample``, lib/dvgo.py:462-509). Random
HBM gathers on TPU run at ~1e8/s while matmuls run at ~2e14 FLOP/s, so here
samples are pinned to *stations* — half-voxel-spaced planes perpendicular to
the ray batch's dominant axis — and each station's query becomes a dense
matmul:

  ``val[n] = wu[n] @ D_s @ wv[n]``

where ``wu``/``wv`` are the (two-nonzero) linear-interpolation weight rows
built on the fly from the ray's continuous (u, v) coordinates at that
station, via the closed form ``max(0, 1 - |u - iota|)``. Station planes at
integer voxel coordinates hold grid slabs; fractional stations blend the two
neighboring slabs (streamed inside the scan, never materialized), so a
station sample equals exact trilinear interpolation at that point. Sampling
matches the reference's ``stepsize=0.5`` quadrature (spacing along the ray is
``0.5 * voxel/|unit_d_axis|`` ∈ [0.5, 0.87] voxels for rays grouped by
dominant axis), with the per-ray interval fed into ``raw2alpha``.

The backward pass is the transpose matmul (``dD_s = wu^T @ (g ⊙ wv)``),
streamed the same way — no scatters anywhere, which is what makes training
fast on TPU (XLA scatter-add measured ~1e7 rows/s vs ~1e11 matmul FLOP/ms).

Outputs are in *slab order* (ascending station coordinate); rays marching
against the axis (``dp < 0``) see descending ``t``. Compositing handles both
directions with a bidirectional cumulative product
(:func:`...ops.raymarch.alpha2weight_dense_bidir`) instead of flipping the
big ``[N, S, C]`` sample tensor.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Axis permutations: sweep axis first, remaining axes keep original order.
_PERMS = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}

# Guard band (voxels) added to host-computed segment supports before the
# floor: the engine's flatten pools regenerate rays ON DEVICE (engine/
# train._rays_of_view_device) and XLA FMA/fusion can differ from numpy in
# the last ulp, so a support sitting exactly on an integer boundary could
# otherwise floor one voxel tighter than the device rays' true support.
# Costs at most +1 voxel of window occasionally; keeps window-as-clip
# exact for device-generated rays.
SEG_GUARD = 1e-3


def _round_up(x, m):
    return (int(x) + m - 1) // m * m


def substeps_for_stepsize(stepsize):
    """Stations per voxel along the sweep axis (reference stepsize=0.5 ->
    half-voxel stations -> k=2)."""
    return max(int(round(1.0 / float(stepsize))), 1)


def permute_grid(grid, axis, dtype=jnp.bfloat16):
    """[Gx, Gy, Gz, C] -> [Gp, Gu, Gv*C] slabs for a sweep along ``axis``
    (channel-minor: column v*C + c)."""
    perm = _PERMS[axis]
    g = jnp.transpose(grid, (*perm, 3))
    gp, gu, gv, c = g.shape
    return g.reshape(gp, gu, gv * c).astype(dtype)


def permute_grid_cmajor(grid, axis, dtype=jnp.bfloat16):
    """[Gx, Gy, Gz, C] -> [Gp, Gu, C*Gv] slabs, channel-major (column
    c*Gv + v) — the layout the fused Pallas frame kernel slices per
    channel."""
    perm = _PERMS[axis]
    g = jnp.transpose(grid, (*perm, 3))
    gp, gu, gv, c = g.shape
    g = jnp.transpose(g, (0, 1, 3, 2))
    return g.reshape(gp, gu, c * gv).astype(dtype)


def rays_to_voxel(rays_o, rays_d, xyz_min, xyz_max, world_size, axis):
    """World rays -> continuous voxel coordinates, permuted (p, u, v).

    The ray parameter t is unchanged (each component scales both origin
    offset and direction by the same factor).
    """
    perm = _PERMS[axis]
    o, d = [], []
    for ax in perm:
        scale = (world_size[ax] - 1.0) / (float(xyz_max[ax])
                                          - float(xyz_min[ax]))
        o.append((rays_o[:, ax] - float(xyz_min[ax])) * scale)
        d.append(rays_d[:, ax] * scale)
    return tuple(o), tuple(d)


def _station_uv(rays_pv, p_s):
    (op, ou, ov), (dp, du, dv) = rays_pv
    safe_dp = jnp.where(dp == 0, 1e-10, dp)
    t = (p_s - op) / safe_dp
    return t, ou + t * du, ov + t * dv


def _interp_rows(x, g, dtype):
    """[N] continuous coords -> [N, g] linear-interp weight rows
    (max(0, 1-|x - i|) has exactly the two trilinear corner weights)."""
    iota = jax.lax.broadcasted_iota(jnp.float32, (1, g), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - iota)).astype(dtype)


def _query_station(d_st, rays_pv, p_s, gu, gv, c, interp_dtype):
    """One station query: [Gu, Gv*C] slab -> ([C, N] values, [N] t).

    Values come out *channels-leading*: a [N, C] emission would stack into
    [S, N, C] scan outputs whose minor dim is the small channel count —
    TPU tiles pad the minor dim to 128 lanes, so every downstream
    materialization of a channels-minor tensor moves ~9x the real bytes
    (measured: the whole alpha chain ran 3x slower on [N, S, C])."""
    n = rays_pv[0][0].shape[0]
    t, u, v = _station_uv(rays_pv, p_s)
    wu = _interp_rows(u, gu, interp_dtype)
    wv = _interp_rows(v, gv, jnp.float32)
    tmp = jax.lax.dot(wu, d_st, preferred_element_type=jnp.float32)
    val = jnp.einsum("ngc,ng->cn", tmp.reshape(n, gv, c), wv)
    return val, t


def _station_cotangent(g_s, rays_pv, p_s, gu, gv, c, interp_dtype):
    """One station's grid cotangent: [C, N] -> [Gu, Gv, C].

    The contraction stays rank-3: dot_general(wu[n,gu], rhs3[n,gv,c]) with n
    contracting. A [n, gv*c] RESHAPE of the broadcast-multiply forces a
    materialized copy (profiled at ~25 us per station = 3.9 ms/step of pure
    reshapes at the bench shape); the 3D form fuses the multiply into the
    matmul operand load and runs the whole bwd scan 2.4x faster,
    bit-identically (tools/profile_sweep_bwd.py: 10.3 -> 4.3 ms)."""
    _, u, v = _station_uv(rays_pv, p_s)
    wu = _interp_rows(u, gu, interp_dtype)
    wv = _interp_rows(v, gv, jnp.float32)
    if jax.default_backend() == "cpu":
        # XLA:CPU's DotThunk lacks the rank-3 bf16 x bf16 = f32 contraction;
        # fall back to the 2D-reshape form (tests run on the CPU mesh).
        n = g_s.shape[1]
        rhs = (wv[:, :, None] * g_s.T[:, None, :]).reshape(n, gv * c)
        out = jax.lax.dot(wu.T, rhs.astype(interp_dtype),
                          preferred_element_type=jnp.float32)
        return out.reshape(gu, gv, c)
    rhs3 = (wv[:, :, None] * g_s.T[:, None, :]).astype(interp_dtype)
    return jax.lax.dot_general(wu, rhs3,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# Ray-tile width for per-tile v-windows (must match the fwd kernel's NT).
TILE_N = 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def station_sweep(grid_perm, rays_pv, v_base, n_channels, k, guv, dtypes,
                  wv=0):
    """Sample every station along each ray; stations streamed from slabs.

    Args:
      grid_perm: [Gp, Gu, Gv*C] permuted grid slabs (:func:`permute_grid`).
      rays_pv: ((op, ou, ov), (dp, du, dv)) [N] voxel-space ray components,
        sweep axis first.
      v_base: [N // TILE_N] int32 per-ray-tile v-window starts (multiples
        of 8, in [0, Gv - wv]); pass a length-0 array when ``wv == 0``.
        With ``wv > 0`` both the fused forward kernel and the backward
        restrict every slab access to the tile's v-window — EXACT when
        every ray of a tile keeps its v support inside the window, which
        the engine's spatially-bucketed batches guarantee (u/v are linear
        in the station plane, so a ray's range is bounded by its clipped
        plane-endpoint values).
      n_channels: C (static).
      k: stations per voxel (static); station s sits at axis coord s/k,
        S = k*(Gp-1)+1.
      guv: static (Gu, Gv) pair (the VJP cannot recover in-plane dims from
        cotangent shapes).
      dtypes: static (interp_dtype, grid_dtype) dtype classes for the weight
        matmuls and the returned grid cotangent.
      wv: static v-window width (0 = full sweep).

    Returns:
      vals: [C, N, S] station samples (f32, channels-leading — see
        :func:`_query_station`), in slab order.
      t:    [N, S] ray parameter per station (f32; huge where dp≈0).
    """
    return _sweep_fwd_impl(grid_perm, rays_pv, n_channels, k, guv, dtypes[0],
                           v_base=v_base, wv=wv)


def _station_slabs(grid_perm, k):
    """Materialize the [S, Gu, Gv*C] station slabs from [Gp, Gu, Gv*C].

    Kept out of the scan on purpose: a carry-based streaming variant
    measured 2x slower (the slab-blend in the loop body defeats XLA's
    xs prefetch pipelining), while this build is pure bandwidth in the
    compact dtype.
    """
    gp = grid_perm.shape[0]
    if k == 1:
        return grid_perm
    parts = [grid_perm[:-1]]
    for j in range(1, k):
        f = j / k
        parts.append((1.0 - f) * grid_perm[:-1] + f * grid_perm[1:])
    inner = jnp.stack(parts, axis=1).astype(grid_perm.dtype)
    inner = inner.reshape((gp - 1) * k, *grid_perm.shape[1:])
    return jnp.concatenate([inner, grid_perm[-1:]], axis=0)


def _sweep_fwd_impl(grid_perm, rays_pv, c, k, guv, interp_dtype,
                    v_base=None, wv=0):
    gu, gv = guv
    gp = grid_perm.shape[0]
    s = k * (gp - 1) + 1
    n = rays_pv[0][0].shape[0]
    windowed = bool(wv) and v_base is not None and v_base.shape[0] > 0

    from . import pallas_sweep_train as pst
    # The fused kernel is tuned for (and assumes) bf16 slab blocks; f32
    # sweeps (parity mode, models.sweep_dtype) take the XLA scan path.
    if grid_perm.dtype == jnp.bfloat16 \
            and pst.sweep_fwd_available(n, c, gu, gv):
        # Fused kernel: the whole per-station pipeline stays in VMEM (the
        # XLA scan round-trips the [N, Gv*C] u-contraction intermediate
        # per station — see pallas_sweep_train docstring).
        (op, ou, ov), (dp, du, dv) = rays_pv
        dp_safe = jnp.where(dp == 0, 1e-10, dp)
        gv_k = gv
        if windowed:
            # Pad the v dim to a multiple of 8 so every 8-aligned window
            # start vb satisfies vb + wv <= Gv_pad (the engine clamps
            # vb <= Gv_pad - wv). Padded columns are zero -> exact.
            gv_k = _round_up(gv, 8)
            if gv_k > gv:
                g4 = grid_perm.reshape(gp, gu, gv, c)
                g4 = jnp.pad(g4, ((0, 0), (0, 0), (0, gv_k - gv), (0, 0)))
                grid_perm = g4.reshape(gp, gu, gv_k * c)
        grid_p, cp = pst.pad_channels(grid_perm, c)
        slabs = _station_slabs(grid_p, k)
        # Tiling: bigger (station, ray) tiles when the slab block is small.
        # The default (8, 512) grid runs 672 invocations at S=333/N=8192
        # and spent ~2 ms on per-step overheads at a (167,32,32) window
        # class (tools/trace_chain_floor.py); larger tiles amortize it
        # whenever the VMEM budget allows.
        s_blk, nt = pst.S_BLK, pst.NT
        if not windowed:
            cgv_b = cp * gv_k

            def _vm(sb, ntc):
                return (2 * sb * gu * cgv_b * 2 + (gu + cgv_b) * ntc * 4
                        + ntc * cgv_b * 4 + 2 * sb * cp * ntc * 4)

            for sb_c, nt_c in ((16, 1024), (16, 512), (8, 1024)):
                if n % nt_c == 0 and _vm(sb_c, nt_c) <= 40 * 2 ** 20:
                    s_blk, nt = sb_c, nt_c
                    break
        s_pad = pst._round_up(s, s_blk)
        if s_pad > s:
            slabs = jnp.concatenate(
                [slabs, jnp.zeros((s_pad - s, gu, cp * gv_k), slabs.dtype)])
        rp = jnp.stack([op, ou, ov, dp_safe, du, dv,
                        jnp.zeros_like(op), jnp.zeros_like(op)])
        # v_base may carry a trailing batch-level entry for the backward
        # (segment convention) — the fwd kernel wants per-tile starts only.
        vals = pst.sweep_fwd_pallas(slabs, rp,
                                    v_base[: n // pst.NT]
                                    if windowed else None,
                                    c=c, cp=cp, k=k, gu=gu, gv=gv_k,
                                    wv=wv if windowed else 0,
                                    s_blk=s_blk, nt=nt)
        p_stations = jnp.arange(s, dtype=jnp.float32) / k
        ts = (p_stations[None, :] - op[:, None]) / dp_safe[:, None]
        return jnp.transpose(vals[:s], (1, 2, 0)), ts

    slabs = _station_slabs(grid_perm, k)
    p_stations = jnp.arange(s, dtype=jnp.float32) / k

    def body(_, inp):
        d_st, p_s = inp
        val, t = _query_station(d_st, rays_pv, p_s, gu, gv, c, interp_dtype)
        return (), (val, t)

    _, (vals, ts) = jax.lax.scan(body, (), (slabs, p_stations))
    # [S, C, N] -> [C, N, S]; both layouts tile on unpadded (>=128) dims.
    return jnp.transpose(vals, (1, 2, 0)), jnp.transpose(ts, (1, 0))


def _sweep_fwd(grid_perm, rays_pv, v_base, n_channels, k, guv, dtypes,
               wv=0):
    out = _sweep_fwd_impl(grid_perm, rays_pv, n_channels, k, guv, dtypes[0],
                          v_base=v_base, wv=wv)
    return out, (rays_pv, v_base)


def _station_cotangent_win(g_s, rays_tile, p_s, gu, wv, c, vb, interp_dtype):
    """One station's windowed grid cotangent for ONE ray tile:
    [C, NT] -> [Gu, wv, C] (v rows relative to the tile's window start
    ``vb``). Same rank-3 fused form as :func:`_station_cotangent`."""
    _, u, v = _station_uv(rays_tile, p_s)
    wu = _interp_rows(u, gu, interp_dtype)
    wvr = _interp_rows(v - vb.astype(jnp.float32), wv, jnp.float32)
    if jax.default_backend() == "cpu":
        n = g_s.shape[1]
        rhs = (wvr[:, :, None] * g_s.T[:, None, :]).reshape(n, wv * c)
        out = jax.lax.dot(wu.T, rhs.astype(interp_dtype),
                          preferred_element_type=jnp.float32)
        return out.reshape(gu, wv, c)
    rhs3 = (wvr[:, :, None] * g_s.T[:, None, :]).astype(interp_dtype)
    return jax.lax.dot_general(wu, rhs3,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _sweep_bwd_windowed(c, k, gu, gv, wv, interp_dtype, grid_dtype,
                        rays_pv, v_base, g_vals):
    """Per-ray-tile v-windowed transpose: every tile accumulates its slab
    cotangents in a [Gp, Gu, wv, C] window (FLOPs and carry traffic scale
    with wv/Gv, not Gv), then one dynamic-update-slice add per tile writes
    the window into the full grid cotangent."""
    _, n, s = g_vals.shape
    gp = (s - 1) // k + 1
    n_tiles = n // TILE_N
    fracs = [j / k for j in range(k)]

    g_sta = jnp.transpose(g_vals, (2, 0, 1))  # [S, C, N]
    g_main = g_sta[: (gp - 1) * k].reshape(gp - 1, k, c, n)
    g_last = g_sta[-1]

    def tile_bwd(rays_tile, g_main_t, g_last_t, vb):
        def body(pending, inp):
            g_z, z = inp  # [k, C, NT] cotangents of stations in [z-1, z)
            d_prev = pending
            d_next = jnp.zeros_like(pending)
            for j, f in enumerate(fracs):
                p_s = z.astype(jnp.float32) - 1.0 + f
                d_st = _station_cotangent_win(g_z[j], rays_tile, p_s, gu,
                                              wv, c, vb, interp_dtype)
                d_prev = d_prev + (1.0 - f) * d_st
                if j > 0:
                    d_next = d_next + f * d_st
            return d_next, d_prev

        zs = jnp.arange(1, gp, dtype=jnp.int32)
        init = jnp.zeros((gu, wv, c), jnp.float32)
        pending, d_slabs = jax.lax.scan(body, init, (g_main_t, zs))
        d_last = pending + _station_cotangent_win(
            g_last_t, rays_tile, jnp.float32(gp - 1.0), gu, wv, c, vb,
            interp_dtype)
        return jnp.concatenate([d_slabs, d_last[None]], axis=0)

    o_pv, d_pv = rays_pv
    o_t = tuple(x.reshape(n_tiles, TILE_N) for x in o_pv)
    d_t = tuple(x.reshape(n_tiles, TILE_N) for x in d_pv)
    g_main_t = jnp.transpose(
        g_main.reshape(gp - 1, k, c, n_tiles, TILE_N), (3, 0, 1, 2, 4))
    g_last_t = jnp.transpose(
        g_last.reshape(c, n_tiles, TILE_N), (1, 0, 2))
    d_wins = jax.vmap(tile_bwd)((o_t, d_t), g_main_t, g_last_t, v_base)

    # Accumulate in a v-padded grid: window starts are clamped to
    # [0, round_up(Gv, 8) - wv] by the bucket builder, so windows may
    # overhang the true Gv by up to 7 (zero-weight rows).
    gv_p = _round_up(gv, 8)
    d_grid = jnp.zeros((gp, gu, gv_p, c), jnp.float32)
    for ti in range(n_tiles):
        vb = v_base[ti]
        cur = jax.lax.dynamic_slice(
            d_grid, (0, 0, vb, 0), (gp, gu, wv, c))
        d_grid = jax.lax.dynamic_update_slice(
            d_grid, cur + d_wins[ti], (0, 0, vb, 0))
    return d_grid[:, :, :gv].reshape(gp, gu, gv * c).astype(grid_dtype)


def _sweep_bwd_segment(c, k, gu, gv, wv, interp_dtype, grid_dtype,
                       rays_pv, vb_seg, g_vals):
    """Batch-level v-windowed transpose: the whole batch shares ONE window
    (the engine's segment sampler draws each batch as consecutive rays of
    the spatial sort), so every per-station cotangent keeps the efficient
    full-N rank-3 contraction (59% MXU measured at the e2e shape) — just
    ``wv`` wide instead of ``Gv``. Carries and outputs are window-sized;
    one dynamic-update-slice embeds the window into the full grid."""
    _, n, s = g_vals.shape
    gp = (s - 1) // k + 1
    fracs = [j / k for j in range(k)]
    vb = vb_seg.astype(jnp.float32)

    g_sta = jnp.transpose(g_vals, (2, 0, 1))  # [S, C, N]
    g_main = g_sta[: (gp - 1) * k].reshape(gp - 1, k, c, n)
    g_last = g_sta[-1]

    def body(pending, inp):
        g_z, z = inp
        d_prev = pending
        d_next = jnp.zeros_like(pending)
        for j, f in enumerate(fracs):
            p_s = z.astype(jnp.float32) - 1.0 + f
            d_st = _station_cotangent_win(g_z[j], rays_pv, p_s, gu, wv, c,
                                          vb, interp_dtype)
            d_prev = d_prev + (1.0 - f) * d_st
            if j > 0:
                d_next = d_next + f * d_st
        return d_next, d_prev

    zs = jnp.arange(1, gp, dtype=jnp.int32)
    init = jnp.zeros((gu, wv, c), jnp.float32)
    # Narrow windows make the body ~2 us of math in a ~28 us scan
    # iteration (latency-bound; traced at the (167,32,32) e2e class,
    # tools/trace_chain_floor.py) — unroll until each iteration carries
    # >=128 columns of matmul work. At full-gv widths unroll stays 1
    # (bodies are matmul-bound there; unroll measured neutral-to-worse).
    unroll = max(1, min(8, 128 // max(wv, 1)))
    pending, d_slabs = jax.lax.scan(body, init, (g_main, zs),
                                    unroll=unroll)
    d_last = pending + _station_cotangent_win(
        g_last, rays_pv, jnp.float32(gp - 1.0), gu, wv, c, vb, interp_dtype)
    d_win = jnp.concatenate([d_slabs, d_last[None]], axis=0)
    gv_p = _round_up(gv, 8)
    d_grid = jnp.zeros((gp, gu, gv_p, c), jnp.float32)
    d_grid = jax.lax.dynamic_update_slice(d_grid, d_win, (0, 0, vb_seg, 0))
    return d_grid[:, :, :gv].reshape(gp, gu, gv * c).astype(grid_dtype)


def _sweep_bwd(n_channels, k, guv, dtypes, wv, residuals, cts):
    """Streamed transpose: iter z emits dD[z-1], carries the pending
    contribution to dD[z] (each station between slabs z-1 and z splits its
    cotangent (1-f)/f between them)."""
    interp_dtype, grid_dtype = dtypes
    gu, gv = guv
    c = n_channels
    rays_pv, v_base = residuals
    g_vals, _ = cts  # t is non-differentiable; g_vals is [C, N, S]
    _, n, s = g_vals.shape
    gp = (s - 1) // k + 1
    zeros_rays = jax.tree_util.tree_map(jnp.zeros_like, rays_pv)
    zeros_vb = np.zeros(v_base.shape, jax.dtypes.float0)
    # v_base convention: [n_tiles] entries = per-tile forward windows only;
    # [n_tiles + 1] entries = the engine drew the batch as one spatial
    # SEGMENT and the last entry is its batch-level window start — the
    # backward then keeps the efficient full-N rank-3 contraction, wv wide.
    if wv and v_base.shape[0] == n // TILE_N + 1 and n % TILE_N == 0:
        d_grid = _sweep_bwd_segment(c, k, gu, gv, wv, interp_dtype,
                                    grid_dtype, rays_pv, v_base[-1], g_vals)
        return d_grid, zeros_rays, zeros_vb
    # PER-TILE windowed backwards are off by default: at the e2e shape
    # (162^3-ish, W=32) the XLA per-tile form loses its FLOP win to HBM
    # round-trips (44.3 vs 41.4 ms/step) and the Pallas partials kernel to
    # VPU glue + fold/unpad relayouts (14 + 9.6 + 3.9 ms vs ~16 for the
    # full transpose) — tools/profile_windowed_step.py, /tmp/bwd_variants.
    # Kept behind this flag for future re-tuning.
    import os
    bwd_windowed = os.environ.get("DVGO_SWEEP_BWD_WINDOWED", "0") != "0"
    if wv and bwd_windowed and v_base.shape[0] > 0 and n % TILE_N == 0:
        from . import pallas_sweep_train as pst
        if (jax.default_backend() == "tpu"
                and os.environ.get("DVGO_SWEEP_PALLAS", "1") != "0"):
            # Fused kernel: slab partials accumulate in VMEM across ray
            # tiles (the XLA windowed form round-trips every per-tile
            # window through HBM and measured SLOWER than the full
            # transpose at W=64 — see sweep_bwd_pallas docstring).
            cp = pst._round_up(c, pst.C_TILE)
            s_pad = pst._round_up(s, pst.S_BLK)
            g_snc = jnp.transpose(g_vals, (2, 1, 0))
            g_snc = jnp.pad(
                g_snc, ((0, s_pad - s), (0, 0), (0, cp - c)))
            (op, ou, ov), (dp, du, dv) = rays_pv
            dp_safe = jnp.where(dp == 0, 1e-10, dp)
            zeros_n = jnp.zeros_like(op)
            rp_t = jnp.stack([op, ou, ov, dp_safe, du, dv,
                              zeros_n, zeros_n], axis=1)
            partials = pst.sweep_bwd_pallas(
                g_snc, rp_t, v_base, c=c, cp=cp, k=k, gu=gu, gv=gv, wv=wv)
            d_grid = pst.fold_bwd_partials(partials, gp, gu, gv, c, cp, k)
            return d_grid.astype(grid_dtype), zeros_rays, zeros_vb
        d_grid = _sweep_bwd_windowed(c, k, gu, gv, wv, interp_dtype,
                                     grid_dtype, rays_pv, v_base, g_vals)
        return d_grid, zeros_rays, zeros_vb

    # NOTE: a fused Pallas bwd kernel was built and measured SLOWER than
    # this XLA rank-3 streamed transpose (6.1 ms kernel + 2.2 cotangent
    # transpose + 2.8 station fold vs 3.95 ms total at the bench shape) —
    # XLA already fuses the broadcast-multiply into the matmul operand
    # load, so the kernel's only win was eaten by layout moves. See
    # PERF_LOG.md round 3 and tools/probe_sweep_pallas.py --parts.
    fracs = [j / k for j in range(k)]

    g_sta = jnp.transpose(g_vals, (2, 0, 1))  # [S, C, N]
    g_main = g_sta[: (gp - 1) * k].reshape(gp - 1, k, c, n)
    g_last = g_sta[-1]

    def body(pending, inp):
        g_z, z = inp  # [k, C, N] cotangents of stations in [z-1, z)
        d_prev = pending
        d_next = jnp.zeros_like(pending)
        for j, f in enumerate(fracs):
            p_s = z.astype(jnp.float32) - 1.0 + f
            d_st = _station_cotangent(g_z[j], rays_pv, p_s, gu, gv, c,
                                      interp_dtype)
            d_prev = d_prev + (1.0 - f) * d_st
            if j > 0:
                d_next = d_next + f * d_st
        return d_next, d_prev

    zs = jnp.arange(1, gp, dtype=jnp.int32)
    init = jnp.zeros((gu, gv, c), jnp.float32)
    # (scan unroll measured neutral-to-worse at every shape tried: 2/4 gave
    # 22.5/24.1 vs 21.5 ms/step at full-gv e2e, and unroll=4 at the narrow
    # (167,32,32) region box traced 16.0 vs 14.9 ms — the scan is carry-
    # dependency-bound, not loop-overhead-bound.)
    pending, d_slabs = jax.lax.scan(body, init, (g_main, zs))
    d_last = pending + _station_cotangent(g_last, rays_pv,
                                          jnp.float32(gp - 1.0), gu, gv, c,
                                          interp_dtype)
    d_grid = jnp.concatenate([d_slabs, d_last[None]], axis=0)
    # [Gp, Gu, Gv, C] -> [Gp, Gu, Gv*C]: contiguous, a bitcast.
    d_grid = d_grid.reshape(gp, gu, gv * c)
    return d_grid.astype(grid_dtype), zeros_rays, zeros_vb


station_sweep.defvjp(_sweep_fwd, _sweep_bwd)


def sweep_samples(grid, mask, rays_o, rays_d, xyz_min, xyz_max, axis,
                  stepsize=0.5, interp_dtype=jnp.bfloat16,
                  march_order=True, clip_sizes=None, clip_offsets=None,
                  pre_clipped=False, world_size=None, tile_windows=None):
    """Full sweep query: density/mask/feature channels at ray stations.

    Args:
      grid: [Gx, Gy, Gz, C] channels-last stacked grids (caller packs
        density, occupancy-mask-as-float and color features).
      mask: unused here (fold occupancy as a channel of ``grid``); kept for
        signature clarity. Pass None.
      rays_o, rays_d: [N, 3] world rays (rays_d need not be unit).
      axis: static sweep axis (the batch's dominant |d| axis).
      stepsize: station spacing in voxels along the sweep axis.
      march_order: if True, flip rows with dp<0 so t ascends (convenient but
        touches the whole [N,S,C] tensor); if False, return slab order plus
        a per-ray ``forward`` flag and let the caller composite
        bidirectionally (the fast path).
      clip_sizes / clip_offsets: free-space clipping to the occupancy-mask
        bbox (the sweep analogue of the reference maskcache's sample
        skipping, render_utils_kernel.cu:447-455). ``clip_sizes`` is a
        *static* (p, u, v) voxel-extent triple in permuted order (quantized
        by the caller so mask renewals rarely change the compiled shape);
        ``clip_offsets`` is a traced int32 [3] start-voxel vector. Only the
        clipped sub-box is swept; samples outside it read as zeros, which is
        exact because the box bounds everything with interpolated mask > 0.
      pre_clipped: the caller already sliced ``grid`` to the clip box (so
        gradients stay box-sized end-to-end — the region-sliced train step);
        only the ray-coordinate shift is applied here. ``world_size``
        (full-grid xyz extents) must be given for the world->voxel scale.

    Returns dict with:
      vals:  [C, N, S] station samples (channels-leading).
      t:     [N, S] ray parameter.
      forward: [N] bool, True where t ascends with station index (always
        True when march_order=True).
      interval: [N] world-space step distance between this ray's stations;
        divide by voxel_size_base for the reference's ``interval``
        (lib/dvgo.py:466).
      p_offset: [] f32 sweep-axis voxel offset of station 0 (0 unclipped).
    """
    k = substeps_for_stepsize(stepsize)
    if world_size is None:
        world_size = grid.shape[:3]
    c = grid.shape[3]
    o_pv, d_pv = rays_to_voxel(rays_o, rays_d, xyz_min, xyz_max,
                               world_size, axis)
    p_offset = jnp.float32(0.0)
    if clip_sizes is not None:
        if not pre_clipped:
            perm = _PERMS[axis]
            inv = {ax: i for i, ax in enumerate(perm)}
            sizes_xyz = tuple(int(clip_sizes[inv[a]]) for a in range(3))
            off_xyz = [clip_offsets[inv[a]] for a in range(3)]
            grid = jax.lax.dynamic_slice(
                grid, (*off_xyz, jnp.int32(0)), (*sizes_xyz, c))
        offs_f = clip_offsets.astype(jnp.float32)
        o_pv = tuple(o - offs_f[i] for i, o in enumerate(o_pv))
        p_offset = offs_f[0]
    grid_perm = permute_grid(grid, axis, dtype=interp_dtype)
    gu, gv = grid_perm.shape[1], grid_perm.shape[2] // c
    # Per-ray-tile v-windows (see station_sweep): only without clipping —
    # clipped sweeps shift v by a traced offset, which would break the
    # window starts' 8-alignment (and real full-scale runs are unclipped:
    # compute_bbox_by_coarse_geo already fits the fine grid to the mask).
    v_base = jnp.zeros((0,), jnp.int32)
    wv = 0
    if tile_windows is not None and clip_sizes is None:
        v_base, wv = tile_windows
        wv = int(wv)
        n_tiles = rays_o.shape[0] // TILE_N
        if (wv >= gv or rays_o.shape[0] % TILE_N
                or v_base.shape[0] not in (n_tiles, n_tiles + 1)):
            v_base, wv = jnp.zeros((0,), jnp.int32), 0
    vals, t = station_sweep(grid_perm, (o_pv, d_pv), v_base, c, k, (gu, gv),
                            (interp_dtype, interp_dtype), wv)

    forward = d_pv[0] >= 0
    if march_order:
        flip = ~forward
        vals = jnp.where(flip[None, :, None], vals[:, :, ::-1], vals)
        t = jnp.where(flip[:, None], t[:, ::-1], t)
        forward = jnp.ones_like(forward)

    # World-space distance between consecutive stations along the ray:
    # dt = (1/k)/|dp_vox|, scaled by |d_world|.
    d_norm = jnp.sqrt(jnp.sum(rays_d * rays_d, axis=-1))
    interval = d_norm / (k * jnp.maximum(jnp.abs(d_pv[0]), 1e-10))
    return {"vals": vals, "t": t, "forward": forward, "interval": interval,
            "p_offset": p_offset}


def dominant_axis(rays_d, xyz_min, xyz_max, world_size):
    """Per-ray dominant axis in voxel space (host-side grouping helper)."""
    rays_d = np.asarray(rays_d)
    scale = (np.asarray(world_size) - 1.0) / (
        np.asarray(xyz_max, np.float64) - np.asarray(xyz_min, np.float64))
    return np.argmax(np.abs(rays_d * scale), axis=-1)


# -------------------------------------------------- top-K station compaction

# Gather style for topk_station_select: "onehot" = one-hot [N, K, S] matmuls
# whose transpose is again a matmul (no XLA scatter in the backward);
# "gather" = take_along_axis (gather fwd, scatter-add bwd). A/B'd on TPU.
COMPACT_GATHER = "onehot"


def topk_station_select(w_eff, topk, gather_mode=None):
    """Build per-ray top-K-by-weight station selectors.

    The static-shape analogue of the reference's ``fast_color_thres``
    pruning before the color MLP (lib/dvgo.py:478-494): instead of a
    data-dependent boolean compaction, keep the K highest-weight stations
    per ray. Exact whenever <= K stations per ray are above threshold
    (the rest carry zero weight and contribute nothing downstream).

    Returns ``(idx [N, K] int32, sel_nk, sel_cl)`` where ``sel_nk`` maps
    [N, S] -> [N, K] and ``sel_cl`` maps channels-leading [C, N, S] ->
    [C, N, K]; both are differentiable.
    """
    mode = gather_mode or COMPACT_GATHER
    s_total = w_eff.shape[1]
    _, idx = jax.lax.top_k(jax.lax.stop_gradient(w_eff), topk)
    if mode == "onehot":
        onehot = (idx[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, s_total), 2)).astype(jnp.bfloat16)

        def sel_nk(x):
            return jnp.einsum("nks,ns->nk", onehot, x,
                              preferred_element_type=jnp.float32)

        def sel_cl(x):
            # [C, N, S] x [N, K, S] -> [N, C, K] (ray-batched dot), then
            # one transpose back to channels-leading.
            nck = jax.lax.dot_general(
                x, onehot.astype(x.dtype),
                dimension_numbers=(((2,), (2,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)
            return jnp.transpose(nck, (1, 0, 2))
    else:
        def sel_nk(x):
            return jnp.take_along_axis(x, idx, axis=1)

        def sel_cl(x):
            return jnp.take_along_axis(x, idx[None], axis=2)
    return idx, sel_nk, sel_cl


def build_tile_buckets(rays_o, rays_d, xyz_min, xyz_max, world_size, axis,
                       tile_n=TILE_N, widths=(32, 64, 96)):
    """Spatially-bucketed ray tiles for v-windowed sweeps (host-side).

    Sorts a dominant-axis ray group by a 4D Morton key of each ray's (u, v)
    at the first and last sweep planes, slices the order into tiles of
    ``tile_n`` rays, and computes each tile's GUARANTEED v-window: u/v are
    linear in the sweep-plane coordinate p, so over every station a ray's
    v range is bounded by its two plane-endpoint values (clipped to the
    grid's support [-1, Gv], outside which interp rows are zero — linearity
    makes each ray's v(p) monotone, so clipped endpoints still bound the
    in-support range). A tile needs window width W >= (row range) + 7: the
    +7 covers the 8-alignment of the window start the kernel's lane-dim
    dynamic slice requires.

    Returns ``{W: (idx [n_b, tile_n] int64, vlo [n_b] int32)}`` mapping
    each width class (plus 0 = full sweep) to its tiles; ``idx`` holds
    positions into THIS group's ray arrays.
    """
    n = rays_o.shape[0]
    n_tiles = n // tile_n
    if n_tiles == 0:
        return {}
    o_pv, d_pv = rays_to_voxel(rays_o, rays_d, xyz_min, xyz_max,
                               world_size, axis)
    op, ou, ov = [np.asarray(x) for x in o_pv]
    dp, du, dv = [np.asarray(x) for x in d_pv]
    perm = _PERMS[axis]
    gp = int(world_size[perm[0]])
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
    t0 = (0.0 - op) / dp_s
    t1 = (gp - 1.0 - op) / dp_s
    u_ends = np.stack([ou + t0 * du, ou + t1 * du])
    v_ends = np.stack([ov + t0 * dv, ov + t1 * dv])
    u_ends = np.clip(u_ends, -1.0, gu)
    v_ends = np.clip(v_ends, -1.0, gv)

    def quant(x, g):
        return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

    keys = [quant(u_ends[0], gu), quant(v_ends[0], gv),
            quant(u_ends[1], gu), quant(v_ends[1], gv)]
    code = np.zeros(n, np.int64)
    for b in range(10):
        for d_i in range(4):
            code |= ((keys[d_i] >> b) & 1) << (b * 4 + d_i)
    order = np.argsort(code, kind="stable")
    idx = order[: n_tiles * tile_n].reshape(n_tiles, tile_n)
    # (the < tile_n tail is dropped from bucketed batches; those rays are
    # still drawn by the full-sweep fallback class below when present)

    vmin = np.minimum(v_ends[0], v_ends[1])[idx].min(1)
    vmax = np.maximum(v_ends[0], v_ends[1])[idx].max(1)
    r0 = np.maximum(0, np.floor(vmin - SEG_GUARD)).astype(np.int64)
    r1 = np.minimum(gv - 1, np.floor(vmax + SEG_GUARD) + 1).astype(np.int64)
    needed = (r1 - r0 + 1) + 7
    gv_p8 = _round_up(gv, 8)
    out = {}
    assigned = np.full(n_tiles, -1, np.int64)
    for w in sorted(widths):
        if w >= gv:
            continue
        sel_t = np.flatnonzero((assigned < 0) & (needed <= w))
        if len(sel_t) == 0:
            continue
        assigned[sel_t] = w
        vlo = (r0[sel_t] // 8 * 8).astype(np.int32)
        vlo = np.minimum(vlo, gv_p8 - w).astype(np.int32)
        out[int(w)] = (idx[sel_t], vlo)
    rest = np.flatnonzero(assigned < 0)
    if len(rest):
        out[0] = (idx[rest], np.zeros(len(rest), np.int32))
    return out


def build_ray_segments(rays_o, rays_d, xyz_min, xyz_max, world_size, axis,
                       n_rand=8192, tile_n=TILE_N,
                       widths=(32, 48, 64, 96), clip_box=None):
    # (W=128 measured SLOWER than the full sweep at the e2e shape — 64.8 vs
    # 54.3 ms/step — the window machinery without a real FLOP cut; wide
    # segments go to the full class instead. tools/profile_windowed_step.)
    """Spatially-sorted ray SEGMENTS for two-level v-windowed sweeps.

    Like :func:`build_tile_buckets` but each draw unit is one whole batch
    (``n_rand`` consecutive rays of the sort order): all of a batch's tiles
    then share one segment-level v-window, which lets the BACKWARD stay a
    single full-N rank-3 contraction per station (59% MXU measured) at
    window width instead of Gv — per-tile backward forms lose their FLOP
    win to HBM traffic (see _sweep_bwd). The sort key is v-endpoint-major
    (2D Morton over (v at first plane, v at last plane), u bits as a low
    tiebreak) since only v is ever windowed.

    Returns ``{W: (idx [n_seg, n_rand], seg_vlo [n_seg] int32,
    tile_vlo [n_seg, n_rand // tile_n] int32)}``; W=0 = full sweep.

    ``clip_box`` ((p_lo, p_hi, v_lo, v_hi), inclusive voxel bounds in
    permuted order): restrict each ray's v support to its traversal of the
    occupancy clip box — outside it every contribution is zero, so a window
    covering only support∩box stays exact (the engine composes the window
    with the clip box). Supports measured over the box instead of the full
    grid classify FAR more rays into narrow (cheap) classes: the fallback
    share at the 160^3 bench clip was ~60% without this.
    """
    n = rays_o.shape[0]
    n_seg = n // n_rand
    if n_seg == 0:
        return {}
    n_tile = n_rand // tile_n
    # Pure-numpy voxel transform: the jnp rays_to_voxel would round-trip
    # ~50-150 MB of per-component arrays through the device (measured 15-74 s
    # of the stage setup over the dev tunnel), for what is six axpys.
    perm = _PERMS[axis]
    rays_o = np.asarray(rays_o)
    rays_d = np.asarray(rays_d)
    opv, dpv = [], []
    for ax in perm:
        scale = (float(world_size[ax]) - 1.0) / (float(xyz_max[ax])
                                                 - float(xyz_min[ax]))
        opv.append((rays_o[:, ax] - float(xyz_min[ax])) * scale)
        dpv.append(rays_d[:, ax] * scale)
    op, ou, ov = opv
    dp, du, dv = dpv
    gp = int(world_size[perm[0]])
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
    p_lo, p_hi, v_lo, v_hi = (0.0, gp - 1.0, -1.0, float(gv)) \
        if clip_box is None else tuple(float(x) for x in clip_box)
    t0 = (p_lo - op) / dp_s
    t1 = (p_hi - op) / dp_s
    v_ends = np.clip(np.stack([ov + t0 * dv, ov + t1 * dv]), v_lo, v_hi)
    u_ends = np.clip(np.stack([ou + t0 * du, ou + t1 * du]), -1.0, gu)

    def quant(x, g):
        return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

    kv0, kv1 = quant(v_ends[0], gv), quant(v_ends[1], gv)
    code = np.zeros(n, np.int64)
    for b in range(10):
        code |= ((kv0 >> b) & 1) << (b * 2)
        code |= ((kv1 >> b) & 1) << (b * 2 + 1)
    code = (code << 10) | ((quant(u_ends[0], gu) >> 5) << 5) \
        | (quant(u_ends[1], gu) >> 5)
    order = np.argsort(code, kind="stable")
    idx = order[: n_seg * n_rand].reshape(n_seg, n_rand)

    vmin = np.minimum(v_ends[0], v_ends[1])
    vmax = np.maximum(v_ends[0], v_ends[1])
    r0_t = np.maximum(0, np.floor(vmin - SEG_GUARD))[
        idx.reshape(n_seg, n_tile, tile_n)].min(2)
    r1_t = np.minimum(gv - 1, np.floor(vmax + SEG_GUARD) + 1)[
        idx.reshape(n_seg, n_tile, tile_n)].max(2)
    r0_s, r1_s = r0_t.min(1), r1_t.max(1)
    needed = (r1_s - r0_s + 1) + 7  # +7: fwd window starts are 8-aligned
    gv_p8 = _round_up(gv, 8)
    out = {}
    assigned = np.full(n_seg, -1, np.int64)
    for w in sorted(widths):
        if w >= gv:
            continue
        sel_s = np.flatnonzero((assigned < 0) & (needed <= w))
        if len(sel_s) == 0:
            continue
        assigned[sel_s] = w
        seg_vlo = np.minimum(r0_s[sel_s].astype(np.int64) // 8 * 8,
                             gv_p8 - w).astype(np.int32)
        tile_vlo = np.minimum(r0_t[sel_s].astype(np.int64) // 8 * 8,
                              gv_p8 - w).astype(np.int32)
        out[int(w)] = (idx[sel_s], seg_vlo, tile_vlo)
    rest = np.flatnonzero(assigned < 0)
    if len(rest):
        out[0] = (idx[rest], np.zeros(len(rest), np.int32),
                  np.zeros((len(rest), n_tile), np.int32))
    return out


def build_ray_segments_2d(rays_o, rays_d, xyz_min, xyz_max, world_size,
                          axis, n_rand=4096, widths=(32, 64, 96, 128),
                          max_classes=4, clip_box=None):
    """Spatially-sorted ray segments with BOTH in-plane dims windowed.

    The 1D (v-only) builder assumes the sweep plane's u extent is
    comparable to the ray count's appetite — true for cube grids, false
    for forced-axis MPI sweeps where one station plane is the whole image
    (LLFF fern: 404x323 voxels per z-plane vs 4096 rays; the dense
    per-station matmul is then ~17 GFLOP/station and a training step costs
    59 ms). Forward-facing rays are near-parallel, so a batch drawn as a
    Morton-contiguous segment is an IMAGE TILE whose (u, v) footprint
    across every station is a small box: drawing the batch as a composed
    clip box (gp, Wu, Wv) with traced offsets cuts the sweep's FLOPs by
    ~ (gu*gv)/(Wu*Wv) with the existing clip machinery — no new kernels.
    Exact: every interp row of every ray lies inside the box (supports are
    endpoint-bounded like the 1D builder; +-1 voxel interp margin).

    Returns ``{(wu, wv): (idx [n_seg, n_rand], seg_ulo [n_seg],
    seg_vlo [n_seg])}``; a 0 in one slot means FULL EXTENT for that dim
    (e.g. ``(0, 48)`` = full-u, 48-voxel v window — how perspective cube
    sweeps with plane-spanning u support keep their v windows), and the
    ``(0, 0)`` key is the full-sweep fallback. At most ``max_classes``
    window classes are kept (each is a separately compiled step program);
    smaller classes fold into kept covers or the fallback.
    """
    n = rays_o.shape[0]
    n_seg = n // n_rand
    if n_seg == 0:
        return {}
    perm = _PERMS[axis]
    rays_o = np.asarray(rays_o)
    rays_d = np.asarray(rays_d)
    opv, dpv = [], []
    for ax in perm:
        scale = (float(world_size[ax]) - 1.0) / (float(xyz_max[ax])
                                                 - float(xyz_min[ax]))
        opv.append((rays_o[:, ax] - float(xyz_min[ax])) * scale)
        dpv.append(rays_d[:, ax] * scale)
    op, ou, ov = opv
    dp, du, dv = dpv
    gp = int(world_size[perm[0]])
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
    # clip_box: (p_lo, p_hi) or (p_lo, p_hi, u_lo, u_hi, v_lo, v_hi),
    # inclusive voxel bounds in permuted order. Support outside the
    # occupancy box contributes zero (interpolated mask == 0), so clamping
    # the measured u/v supports to it stays exact and classifies far more
    # segments into narrow classes (same argument as the 1D builder).
    p_lo, p_hi = (0.0, gp - 1.0) if clip_box is None \
        else (float(clip_box[0]), float(clip_box[1]))
    u_lo, u_hi, v_lo, v_hi = (-1.0, float(gu), -1.0, float(gv)) \
        if clip_box is None or len(clip_box) < 6 \
        else tuple(float(x) for x in clip_box[2:6])
    t0 = (p_lo - op) / dp_s
    t1 = (p_hi - op) / dp_s
    u_ends = np.clip(np.stack([ou + t0 * du, ou + t1 * du]), u_lo, u_hi)
    v_ends = np.clip(np.stack([ov + t0 * dv, ov + t1 * dv]), v_lo, v_hi)

    def quant(x, g):
        return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

    # 4-endpoint Morton sort: (u, v) at BOTH clip planes. A midpoint sort
    # mixes rays from different views that cross near the scene center but
    # fan apart toward the traversal ends — their segments then need
    # ~full-u windows. Endpoint agreement = direction agreement, so
    # segments become per-view-ish bundles with compact whole-traversal
    # supports: measured class blend 0.26 vs ~0.6 of the full sweep on the
    # trained sparse-fixture pool (tools/analyze_blocked_windows.py);
    # near-parallel MPI pools are unaffected (endpoints ~= midpoints).
    keys = [quant(u_ends[0], gu), quant(v_ends[0], gv),
            quant(u_ends[1], gu), quant(v_ends[1], gv)]
    code = np.zeros(n, np.int64)
    for b in range(10):
        for d_i, kk in enumerate(keys):
            code |= ((kk >> b) & 1) << (b * 4 + d_i)
    order = np.argsort(code, kind="stable")
    idx = order[: n_seg * n_rand].reshape(n_seg, n_rand)

    def seg_range(ends, g):
        lo = np.maximum(0, np.floor(np.minimum(ends[0], ends[1])
                                    - SEG_GUARD))
        hi = np.minimum(g - 1, np.floor(np.maximum(ends[0], ends[1])
                                        + SEG_GUARD) + 1)
        r0 = lo[idx].min(1)
        r1 = hi[idx].max(1)
        return r0.astype(np.int64), r1.astype(np.int64)

    u0, u1 = seg_range(u_ends, gu)
    v0, v1 = seg_range(v_ends, gv)
    need_u = u1 - u0 + 1
    need_v = v1 - v0 + 1

    def fit(need, g):
        ws = [w for w in sorted(widths) if w < g]
        out = np.zeros(len(need), np.int64)
        for i, nd in enumerate(need):
            out[i] = next((w for w in ws if nd <= w), 0)
        return out

    wu_min = fit(need_u, gu)
    wv_min = fit(need_v, gv)
    # A 0 in a class key means FULL EXTENT for that dim: perspective rays
    # (dominant-axis cube sweeps) often have compact v support but u spans
    # the plane — (0, wv) keeps the v window instead of dropping the
    # segment to the full-sweep fallback. (0, 0) stays the fallback.
    pairs = {}
    for s in range(n_seg):
        if wu_min[s] or wv_min[s]:
            pairs.setdefault((int(wu_min[s]), int(wv_min[s])),
                             []).append(s)

    def fits(s, wu, wv):
        ok_u = wu == 0 or (wu_min[s] != 0 and wu_min[s] <= wu)
        ok_v = wv == 0 or (wv_min[s] != 0 and wv_min[s] <= wv)
        return ok_u and ok_v

    kept = sorted(pairs, key=lambda p: -len(pairs[p]))[:max_classes]
    out = {}
    assigned = np.full(n_seg, False)
    # Tightest covers claim segments first (a (64, 48) segment must not be
    # swallowed by a more popular (0, 96) cover when its own class is kept).
    for wu, wv in sorted(kept, key=lambda p: ((p[0] or 1 << 20)
                                              * (p[1] or 1 << 20))):
        sel = [s for s in range(n_seg)
               if not assigned[s] and fits(s, wu, wv)]
        if not sel:
            continue
        sel = np.asarray(sel)
        assigned[sel] = True
        ulo = (np.zeros(len(sel), np.int32) if wu == 0
               else np.minimum(u0[sel], gu - wu).astype(np.int32))
        vlo = (np.zeros(len(sel), np.int32) if wv == 0
               else np.minimum(v0[sel], gv - wv).astype(np.int32))
        out[(int(wu), int(wv))] = (idx[sel], ulo, vlo)
    rest = np.flatnonzero(~assigned)
    if len(rest):
        out[(0, 0)] = (idx[rest], np.zeros(len(rest), np.int32),
                       np.zeros(len(rest), np.int32))
    return out


def build_ray_segments_blocked(rays_o, rays_d, xyz_min, xyz_max, world_size,
                               axis, n_rand=8192, n_blocks=6,
                               widths=(32, 48, 64, 96), max_classes=6,
                               clip_box=None):
    """Spatially-sorted ray segments with per-p-BLOCK (u, v) windows.

    The 2D builder (:func:`build_ray_segments_2d`) measures one (u, v)
    window per segment over the FULL p traversal — a perspective ray's own
    in-plane drift across gp stations is ~gp*tan(angle-to-axis) voxels, so
    multi-view pools land in wide classes (measured blend 0.59 of the full
    sweep at the lego-scale fixture). Splitting the traversal into
    ``n_blocks`` consecutive p-blocks bounds the drift per block to
    ~(gp/B)*tan, and sorting rays by a Morton code of their (u, v) at BOTH
    clip planes groups same-direction rays (endpoint agreement = direction
    agreement), so per-block supports shrink to drift + segment spread:
    measured blend 0.16 of the full sweep at B=6 on the same pool — the
    engine then draws each segment as B composed clip boxes
    (p-rows static, (u, v) offsets traced) concatenated along the station
    axis, reusing the clip machinery end to end.

    Exactness is the standard endpoint-support argument per block: u/v are
    linear in p, so a ray's in-block range is bounded by its values at the
    block's edge planes (clamped to the grid's interp support and, when
    ``clip_box`` is given, to the occupancy box — outside it every
    contribution is zero through the swept mask channel).

    Returns ``{(wu, wv): (idx [n_seg, n_rand], u_off [n_seg, B] int32,
    v_off [n_seg, B] int32)}`` — (wu, wv) are the static per-block window
    extents (0 = full extent for that dim; (0, 0) = the unblocked
    full-sweep fallback, whose offsets are zeros). Block b covers slab rows
    [b*pb, min((b+1)*pb, gp-1)] with ``pb = ceil((gp-1)/B)`` — the same
    static split :func:`blocked_p_rows` gives the sweep.
    """
    n = rays_o.shape[0]
    n_seg = n // n_rand
    if n_seg == 0:
        return {}
    perm = _PERMS[axis]
    rays_o = np.asarray(rays_o)
    rays_d = np.asarray(rays_d)
    opv, dpv = [], []
    for ax in perm:
        scale = (float(world_size[ax]) - 1.0) / (float(xyz_max[ax])
                                                 - float(xyz_min[ax]))
        opv.append((rays_o[:, ax] - float(xyz_min[ax])) * scale)
        dpv.append(rays_d[:, ax] * scale)
    op, ou, ov = opv
    dp, du, dv = dpv
    gp = int(world_size[perm[0]])
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
    p_lo, p_hi = (0.0, gp - 1.0) if clip_box is None \
        else (float(clip_box[0]), float(clip_box[1]))
    u_lo, u_hi, v_lo, v_hi = (-1.0, float(gu), -1.0, float(gv)) \
        if clip_box is None or len(clip_box) < 6 \
        else tuple(float(x) for x in clip_box[2:6])

    def u_at(pv):
        t = (pv - op) / dp_s
        return np.clip(ou + t * du, u_lo, u_hi)

    def v_at(pv):
        t = (pv - op) / dp_s
        return np.clip(ov + t * dv, v_lo, v_hi)

    # 4-endpoint Morton sort: (u, v) at both CLIP planes.
    def quant(x, g):
        return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

    keys = [quant(u_at(p_lo), gu), quant(v_at(p_lo), gv),
            quant(u_at(p_hi), gu), quant(v_at(p_hi), gv)]
    code = np.zeros(n, np.int64)
    for b in range(10):
        for d_i, kk in enumerate(keys):
            code |= ((kk >> b) & 1) << (b * 4 + d_i)
    order = np.argsort(code, kind="stable")
    idx = order[: n_seg * n_rand].reshape(n_seg, n_rand)

    rows = blocked_p_rows(gp, n_blocks)
    nb = len(rows)
    u0_bl = np.zeros((nb, n_seg), np.int64)
    u1_bl = np.zeros((nb, n_seg), np.int64)
    v0_bl = np.zeros((nb, n_seg), np.int64)
    v1_bl = np.zeros((nb, n_seg), np.int64)
    for b, (r0, r1) in enumerate(rows):
        ub = np.stack([u_at(float(r0)), u_at(float(r1))])
        vb = np.stack([v_at(float(r0)), v_at(float(r1))])

        def rng_of(ends, g):
            lo = np.maximum(0, np.floor(np.minimum(ends[0], ends[1])
                                        - SEG_GUARD))
            hi = np.minimum(g - 1.0,
                            np.floor(np.maximum(ends[0], ends[1])
                                     + SEG_GUARD) + 1)
            return (lo[idx].min(1).astype(np.int64),
                    hi[idx].max(1).astype(np.int64))

        u0_bl[b], u1_bl[b] = rng_of(ub, gu)
        v0_bl[b], v1_bl[b] = rng_of(vb, gv)

    need_u = (u1_bl - u0_bl + 1).max(0)   # [n_seg] max over blocks
    need_v = (v1_bl - v0_bl + 1).max(0)

    def fit(nd, g):
        for w in sorted(widths):
            if w < g and nd <= w:
                return w
        return 0

    wu_min = np.asarray([fit(x, gu) for x in need_u], np.int64)
    wv_min = np.asarray([fit(x, gv) for x in need_v], np.int64)
    pairs = {}
    for s in range(n_seg):
        if wu_min[s] or wv_min[s]:
            pairs.setdefault((int(wu_min[s]), int(wv_min[s])), []).append(s)

    def fits(s, wu, wv):
        ok_u = wu == 0 or (wu_min[s] != 0 and wu_min[s] <= wu)
        ok_v = wv == 0 or (wv_min[s] != 0 and wv_min[s] <= wv)
        return ok_u and ok_v

    kept = sorted(pairs, key=lambda p: -len(pairs[p]))[:max_classes]
    out = {}
    assigned = np.full(n_seg, False)
    for wu, wv in sorted(kept, key=lambda p: ((p[0] or 1 << 20)
                                              * (p[1] or 1 << 20))):
        sel = [s for s in range(n_seg) if not assigned[s] and fits(s, wu, wv)]
        if not sel:
            continue
        sel = np.asarray(sel)
        assigned[sel] = True
        if wu == 0:
            uo = np.zeros((len(sel), nb), np.int32)
        else:
            uo = np.minimum(u0_bl[:, sel].T, gu - wu).astype(np.int32)
        if wv == 0:
            vo = np.zeros((len(sel), nb), np.int32)
        else:
            vo = np.minimum(v0_bl[:, sel].T, gv - wv).astype(np.int32)
        out[(int(wu), int(wv))] = (idx[sel], uo, vo)
    rest = np.flatnonzero(~assigned)
    if len(rest):
        out[(0, 0)] = (idx[rest], np.zeros((len(rest), nb), np.int32),
                       np.zeros((len(rest), nb), np.int32))
    return out


def build_ray_tiles_blocktile(rays_o, rays_d, xyz_min, xyz_max,
                              world_size, axis, near, far, stepsize,
                              nt=512, s_blk=8,
                              widths_u=(32, 48, 64, 80, 96, 112, 128),
                              widths_v=(16, 24, 32, 40, 48, 56, 64, 80,
                                        96),
                              max_classes=4, clip_box=None, margin=0.5):
    """Direction-uniform 512-ray TILES classed by fused-kernel cell need.

    The sampling unit for the fused train kernels' per-(station-block,
    ray-tile) windows (ops/pallas_train_fused.blocktile_uv_bases). The
    per-SEGMENT max cell footprint is ruined by outlier tiles (measured:
    an 8192-ray segment's max cell ~= its whole segment box while the
    MEAN cell is 7-10% of it — tools/analyze_blocktile_windows.py), so
    batches must regroup TILES of the same cell class: the endpoint-
    Morton-sorted pool is cut into ``nt``-ray tiles, each tile's class is
    the max (u, v) support any (s_blk-station block) cell of it needs,
    and the engine assembles batches as N_rand/nt same-class, same-sweep-
    direction rows (measured realizable area blend 0.16-0.41 of the
    segment box on the trained fixture pool).

    Mirrors the kernels' base arithmetic (16/8-aligned bases, ±1 hat
    margin, [t_lo, t_hi] clamp, grid clip) with an extra ``margin`` voxel
    of slack so f32-on-TPU vs numpy rounding can never make a dispatched
    cell exceed its class. t_lo/t_hi follow ops/raymarch.ray_aabb_tminmax
    (1e-6 zero-dir guard, [near, far] clamp).

    Returns ``{(wu, wv, sg): idx [n_tiles, nt] int64}`` with ``sg`` the
    sweep-direction sign (+1/-1; fused batches must be direction-uniform)
    plus a ``(0, 0, 0)`` key for tiles needing wider support than the
    largest class (the engine trains those through the plain fallback
    program). At most ``max_classes`` (wu, wv) pairs are kept; smaller
    classes fold into kept covers.
    """
    n = rays_o.shape[0]
    if n < nt:
        return {}
    perm = _PERMS[axis]
    rays_o = np.asarray(rays_o, np.float64)
    rays_d = np.asarray(rays_d, np.float64)
    k = substeps_for_stepsize(stepsize)

    # t range per ray: numpy mirror of ops/raymarch.ray_aabb_tminmax
    vec = np.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (np.asarray(xyz_max, np.float64) - rays_o) / vec
    rate_b = (np.asarray(xyz_min, np.float64) - rays_o) / vec
    tlo = np.clip(np.minimum(rate_a, rate_b).max(-1), near, far)
    thi = np.clip(np.maximum(rate_a, rate_b).min(-1), near, far)

    opv, dpv = [], []
    for ax in perm:
        scale = (float(world_size[ax]) - 1.0) / (float(xyz_max[ax])
                                                 - float(xyz_min[ax]))
        opv.append((rays_o[:, ax] - float(xyz_min[ax])) * scale)
        dpv.append(rays_d[:, ax] * scale)
    op, ou, ov = opv
    dp, du, dv = dpv
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])
    if clip_box is None:
        bp = int(world_size[perm[0]])
        off_p = off_u = off_v = 0.0
        u_hi_c, v_hi_c = float(gu), float(gv)
    else:
        off_p, p_hi = float(clip_box[0]), float(clip_box[1])
        bp = int(round(p_hi - off_p)) + 1
        if len(clip_box) >= 6:
            off_u, u_hi_c = float(clip_box[2]), float(clip_box[3]) + 1.0
            off_v, v_hi_c = float(clip_box[4]), float(clip_box[5]) + 1.0
        else:
            off_u = off_v = 0.0
            u_hi_c, v_hi_c = float(gu), float(gv)
    # box frame (the fused path's grids arrive pre-clipped; rays shifted)
    op = op - off_p
    ou = ou - off_u
    ov = ov - off_v
    bu = int(round(u_hi_c - off_u))
    bv = int(round(v_hi_c - off_v))
    gu_p = _round_up(bu, 16)
    gv_p = _round_up(bv, 8)
    dp_s = np.where(np.abs(dp) < 1e-10, 1e-10, dp)

    # 4-endpoint Morton sort per direction sign (fused batches must be
    # direction-uniform; see ops/pallas_train_fused march-order note)
    t0e = (0.0 - op) / dp_s
    t1e = (bp - 1.0 - op) / dp_s
    u_ends = np.clip(np.stack([ou + t0e * du, ou + t1e * du]), 0, bu)
    v_ends = np.clip(np.stack([ov + t0e * dv, ov + t1e * dv]), 0, bv)

    def quant(x, g):
        return np.clip((x / max(g, 1) * 1024).astype(np.int64), 0, 1023)

    keys = [quant(u_ends[0], bu), quant(v_ends[0], bv),
            quant(u_ends[1], bu), quant(v_ends[1], bv)]
    code = np.zeros(n, np.int64)
    for b in range(10):
        for d_i, kk in enumerate(keys):
            code |= ((kk >> b) & 1) << (b * 4 + d_i)

    s_total = k * (bp - 1) + 1
    s_pad = _round_up(s_total, s_blk)
    nsb = s_pad // s_blk
    inv_k = 1.0 / k
    p_a = (np.arange(nsb, dtype=np.float64) * s_blk * inv_k)[:, None]
    p_b = p_a + (s_blk - 1) * inv_k

    tiles_by = {}
    for sg in (1, -1):
        pool = np.flatnonzero((dp >= 0) if sg > 0 else (dp < 0))
        if pool.size < nt:
            continue
        order = pool[np.argsort(code[pool], kind="stable")]
        n_tiles = order.size // nt
        idx = order[: n_tiles * nt].reshape(n_tiles, nt)
        # per-(block, tile) cell needs; loop tiles in chunks to bound mem
        need_u = np.zeros(n_tiles, np.int64)
        need_v = np.zeros(n_tiles, np.int64)
        chunk = max(1, (1 << 22) // (nsb * nt))
        for c0 in range(0, n_tiles, chunk):
            sel = idx[c0: c0 + chunk].ravel()
            ta = (p_a - op[sel][None, :]) / dp_s[sel][None, :]
            tb = (p_b - op[sel][None, :]) / dp_s[sel][None, :]
            lo_t = np.maximum(np.minimum(ta, tb), tlo[sel][None, :])
            hi_t = np.minimum(np.maximum(ta, tb), thi[sel][None, :])
            act = hi_t >= lo_t - 1e-4     # conservative vs the f32 kernel

            def cell_need(o_c, d_c, g_pad, align):
                a = o_c[sel][None, :] + lo_t * d_c[sel][None, :]
                b2 = o_c[sel][None, :] + hi_t * d_c[sel][None, :]
                lo = np.where(act, np.minimum(a, b2) - 1.0 - margin,
                              np.inf)
                hi = np.where(act, np.maximum(a, b2) + 1.0 + margin,
                              -np.inf)
                lo = np.clip(lo, 0.0, float(g_pad))
                hi = np.clip(hi, 0.0, float(g_pad))
                nc = lo.shape[1] // nt
                lo = lo.reshape(nsb, nc, nt).min(-1)
                hi = hi.reshape(nsb, nc, nt).max(-1)
                need = np.ceil(hi) - (np.floor(lo).astype(np.int64)
                                      // align) * align
                return need.max(0).astype(np.int64)  # max over blocks

            nc_ = sel.size // nt
            need_u[c0: c0 + nc_] = cell_need(ou, du, gu_p, 16)
            need_v[c0: c0 + nc_] = cell_need(ov, dv, gv_p, 8)
        tiles_by[sg] = (idx, need_u, need_v)

    def fit(need, widths, g_pad):
        # g_pad itself is the terminal class: full extent in THIS axis is
        # still a valid fused window when the other axis stays narrow
        # (the kernel treats w >= extent as unwindowed for that dim,
        # pallas_train_fused._eff_windows), and need <= g_pad always (the
        # cell ranges are grid-clipped), so nothing is left classless.
        ws = [w for w in sorted(widths) if w < g_pad] + [g_pad]
        out = np.zeros(len(need), np.int64)
        for i, nd in enumerate(need):
            out[i] = next(w for w in ws if nd <= w)
        return out

    # candidate classes from both sign pools, kept by ray count, tiles
    # assigned smallest-fitting-kept-cover first (build_ray_segments_2d
    # pattern)
    pair_count = {}
    fitted = {}
    for sg, (idx, nu, nv) in tiles_by.items():
        wu_min = fit(nu, widths_u, gu_p)
        wv_min = fit(nv, widths_v, gv_p)
        fitted[sg] = (wu_min, wv_min)
        for i in range(len(nu)):
            if wu_min[i] and wv_min[i]:
                key = (int(wu_min[i]), int(wv_min[i]))
                pair_count[key] = pair_count.get(key, 0) + 1
    kept = sorted(pair_count, key=lambda p: -pair_count[p])[:max_classes]
    out = {}
    rest_rows = []
    for sg, (idx, nu, nv) in tiles_by.items():
        wu_min, wv_min = fitted[sg]
        assigned = np.full(len(nu), False)
        for wu, wv in sorted(kept, key=lambda p: p[0] * p[1]):
            sel = np.flatnonzero(~assigned & (wu_min != 0)
                                 & (wu_min <= wu) & (wv_min != 0)
                                 & (wv_min <= wv))
            if sel.size == 0:
                continue
            assigned[sel] = True
            out[(int(wu), int(wv), sg)] = idx[sel]
        rest = np.flatnonzero(~assigned)
        if rest.size:
            rest_rows.append(idx[rest])
    if rest_rows:
        out[(0, 0, 0)] = np.concatenate(rest_rows, axis=0)
    return out


def blocked_p_rows(gp, n_blocks):
    """Static per-block slab-row ranges for a blocked sweep: block b covers
    rows [b*pb, min((b+1)*pb, gp-1)] inclusive, pb = ceil((gp-1)/B).
    Consecutive blocks SHARE their boundary row (each block's sub-sweep
    needs both bounding slabs); the sweep drops each non-final block's last
    station so the concatenated station set exactly tiles [0, gp-1]."""
    pb = max(1, -(-(gp - 1) // max(1, n_blocks)))
    rows = []
    r = 0
    while r < gp - 1:
        rows.append((r, min(r + pb, gp - 1)))
        r += pb
    return rows


def sweep_samples_blocked(grid, rays_o, rays_d, xyz_min, xyz_max, axis,
                          block_sizes, u_off, v_off, stepsize=0.5,
                          interp_dtype=jnp.bfloat16):
    """Blocked sweep: B composed clip-box sub-sweeps, concatenated along S.

    The full station range is split into static p-blocks
    (:func:`blocked_p_rows`); each block sweeps only the
    ``(rows_b + 1, Wu, Wv)`` sub-box at its traced per-block (u, v) offsets
    (:func:`build_ray_segments_blocked`), so the per-station matmul runs at
    window size instead of plane size — the FLOP term drops from
    ``S*Gu*Gv`` to ``S*Wu*Wv`` (measured blend 0.16 of the full sweep at
    the lego-scale fixture, B=6). Each sub-sweep is a plain clipped
    :func:`sweep_samples` call, so the pallas forward and the streamed
    XLA backward are reused at the small shape per block.

    Args:
      grid: [Gx, Gy, Gz, C] stacked channels (same as sweep_samples).
      block_sizes: static (n_blocks, wu, wv); 0 in wu/wv = full extent.
      u_off, v_off: [B] traced int32 per-block window starts (permuted
        in-plane order), already clamped to [0, G - W] by the builder.

    Returns the same dict as :func:`sweep_samples` (march_order=False),
    with stations tiling the full [0, Gp-1] range exactly once (each
    non-final block's shared-boundary station is dropped).
    """
    n_blocks, wu_w, wv_w = block_sizes
    perm = _PERMS[axis]
    world_size = grid.shape[:3]
    gp = int(world_size[perm[0]])
    gu = int(world_size[perm[1]])
    gv = int(world_size[perm[2]])
    eu = int(wu_w) if wu_w else gu
    ev = int(wv_w) if wv_w else gv
    rows = blocked_p_rows(gp, n_blocks)
    vals_parts, t_parts = [], []
    out_b = None
    for b, (r0, r1) in enumerate(rows):
        offs = jnp.stack([jnp.int32(r0),
                          u_off[b].astype(jnp.int32),
                          v_off[b].astype(jnp.int32)])
        out_b = sweep_samples(grid, None, rays_o, rays_d, xyz_min, xyz_max,
                              axis, stepsize=stepsize,
                              interp_dtype=interp_dtype, march_order=False,
                              clip_sizes=(r1 - r0 + 1, eu, ev),
                              clip_offsets=offs)
        last = b == len(rows) - 1
        vals_parts.append(out_b["vals"] if last else out_b["vals"][:, :, :-1])
        t_parts.append(out_b["t"] if last else out_b["t"][:, :-1])
    return {"vals": jnp.concatenate(vals_parts, axis=2),
            "t": jnp.concatenate(t_parts, axis=1),
            "forward": out_b["forward"],
            "interval": out_b["interval"],
            "p_offset": jnp.float32(0.0)}
