"""Station-sweep op tests (directvoxgo_tpu/ops/sweep.py).

The sweep is the TPU replacement of the reference's ragged point sampler +
grid_sample hot path (lib/cuda/render_utils_kernel.cu:138-236 +
lib/dvgo.py:312-328): samples pinned to half-voxel stations, trilinear
queries as matmuls. Tests verify (a) exact agreement with the direct
trilinear sampler at station points, (b) VJP correctness against autodiff of
the gather formulation, (c) adjointness of the station-grid build/fold pair,
and (d) end-to-end agreement of forward_sweep with the reference-faithful
gather forward on camera-like rays.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.ops import sweep as sweep_ops
from directvoxgo_tpu.ops.grid import trilinear_sample_world
from directvoxgo_tpu.models.dvgo import DirectVoxGO

F32 = jnp.float32


def _rand_setup(seed=0, G=(12, 10, 14), C=3, N=64):
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(rng.normal(size=(*G, C)).astype(np.float32))
    xyz_min = (-1.0, -0.8, -1.2)
    xyz_max = (1.0, 0.9, 1.1)
    o = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    return grid, xyz_min, xyz_max, o, d


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_sweep_matches_trilinear_at_stations(axis):
    grid, xyz_min, xyz_max, o, d = _rand_setup()
    out = sweep_ops.sweep_samples(grid, None, jnp.asarray(o), jnp.asarray(d),
                                  xyz_min, xyz_max, axis, stepsize=0.5,
                                  interp_dtype=F32)
    vals = np.moveaxis(np.asarray(out["vals"]), 0, -1)  # [C,N,S]->[N,S,C]
    t = np.asarray(out["t"])
    pts = o[:, None, :] + t[..., None] * d[:, None, :]
    inb = np.all((pts >= np.array(xyz_min)) & (pts <= np.array(xyz_max)), -1)
    ref = np.asarray(trilinear_sample_world(
        grid, jnp.asarray(pts[..., 0]), jnp.asarray(pts[..., 1]),
        jnp.asarray(pts[..., 2]), xyz_min, xyz_max))
    assert np.abs(vals - ref)[inb].max() < 1e-4
    # march order: t ascending
    assert (np.diff(t, axis=1) >= -1e-5).all()


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_sweep_vjp_matches_gather_autodiff(axis):
    grid, xyz_min, xyz_max, o, d = _rand_setup(seed=1)
    rng = np.random.default_rng(2)

    out = sweep_ops.sweep_samples(grid, None, jnp.asarray(o), jnp.asarray(d),
                                  xyz_min, xyz_max, axis, stepsize=0.5,
                                  interp_dtype=F32)
    t = np.asarray(out["t"])
    pts = o[:, None, :] + t[..., None] * d[:, None, :]
    inb = np.all((pts >= np.array(xyz_min)) & (pts <= np.array(xyz_max)),
                 -1, keepdims=True)
    cot = rng.normal(size=out["vals"].shape).astype(np.float32) \
        * np.moveaxis(inb, -1, 0)  # [C, N, S] layout

    def loss_sweep(g):
        r = sweep_ops.sweep_samples(g, None, jnp.asarray(o), jnp.asarray(d),
                                    xyz_min, xyz_max, axis, stepsize=0.5,
                                    interp_dtype=F32)
        return jnp.sum(r["vals"] * cot)

    def loss_gather(g):
        r = trilinear_sample_world(
            g, jnp.asarray(pts[..., 0]), jnp.asarray(pts[..., 1]),
            jnp.asarray(pts[..., 2]), xyz_min, xyz_max)
        return jnp.sum(r * np.moveaxis(cot, 0, -1))

    g_sweep = np.asarray(jax.grad(loss_sweep)(grid))
    g_gather = np.asarray(jax.grad(loss_gather)(grid))
    # Out-of-bbox stations are zeroed in the cotangent, where the two
    # formulations agree exactly (clamping vs zero-weighting differs only
    # outside).
    assert np.abs(g_sweep - g_gather).max() < 1e-3 * max(
        1.0, np.abs(g_gather).max())


def test_sweep_custom_vjp_matches_autodiff_of_fwd_impl():
    """The hand-written streamed bwd must equal autodiff of the fwd scan."""
    rng = np.random.default_rng(3)
    gp, gu, gv, c, k, n = 7, 6, 5, 2, 2, 16
    grid_perm = jnp.asarray(rng.normal(size=(gp, gu, gv * c))
                            .astype(np.float32))
    o = tuple(jnp.asarray(rng.uniform(0, g - 1, (n,)).astype(np.float32))
              for g in (gp, gu, gv))
    d = tuple(jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
              for _ in range(3))
    cot = jnp.asarray(
        rng.normal(size=(c, n, k * (gp - 1) + 1)).astype(np.float32))

    def loss_custom(g):
        vals, _ = sweep_ops.station_sweep(g, (o, d),
                                          jnp.zeros((0,), jnp.int32),
                                          c, k, (gu, gv), (F32, F32), 0)
        return jnp.sum(vals * cot)

    def loss_auto(g):
        vals, _ = sweep_ops._sweep_fwd_impl(g, (o, d), c, k, (gu, gv), F32)
        return jnp.sum(vals * cot)

    g_custom = np.asarray(jax.grad(loss_custom)(grid_perm))
    g_auto = np.asarray(jax.grad(loss_auto)(grid_perm))
    assert np.abs(g_custom - g_auto).max() < 1e-4 * max(
        1.0, np.abs(g_auto).max())


def test_forward_sweep_matches_gather_forward():
    rng = np.random.default_rng(0)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=32 ** 3, num_voxels_base=32 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        k_density=None, k_color=0)
    pts = np.asarray(model.grid_points())
    r2 = (pts ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (8 * np.exp(-3 * r2) - 2).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))

    # camera-like rays: |d| ~ 1, z-dominant (the reference's sampler counts
    # steps in rays_d units, so parity comparisons need |d| near 1;
    # render_utils_kernel.cu:38-49)
    N = 256
    o = np.tile([[0.0, 0.0, 3.0]], (N, 1)).astype(np.float32)
    ang = rng.uniform(-0.3, 0.3, (N, 2))
    d = np.stack([np.tan(ang[:, 0]), np.tan(ang[:, 1]),
                  -np.ones(N)], -1).astype(np.float32)
    vd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    kw = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5, render_depth=True)

    ret_g = model.forward(model.params, model.mask, jnp.asarray(o),
                          jnp.asarray(d), jnp.asarray(vd), **kw)
    ret_s = model.forward_sweep(model.params, model.mask, jnp.asarray(o),
                                jnp.asarray(d), jnp.asarray(vd), 2, **kw)
    a = np.asarray(ret_g["rgb_marched"])
    b = np.asarray(ret_s["rgb_marched"])
    mse = float(np.mean((a - b) ** 2))
    psnr_of_diff = -10 * np.log10(mse + 1e-12)
    assert psnr_of_diff > 45, f"sweep/gather disagree: {psnr_of_diff:.1f} dB"
    ai = np.abs(np.asarray(ret_g["alphainv_last"])
                - np.asarray(ret_s["alphainv_last"]))
    assert ai.max() < 0.05
    dep_corr = np.corrcoef(np.asarray(ret_g["depth"]),
                           np.asarray(ret_s["depth"]))[0, 1]
    assert dep_corr > 0.99


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_forward_sweep_clip_equivalence(axis):
    """Occupancy-bbox clipping must not change forward_sweep outputs or
    grads: samples outside the (padded) mask bbox have interpolated mask 0,
    so alpha2weight zeroes their contribution either way."""
    rng = np.random.default_rng(4)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=48 ** 3, num_voxels_base=48 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        k_density=None, k_color=0)
    pts = np.asarray(model.grid_points())
    # off-center compact blob -> tight mask bbox away from grid edges
    r2 = (((pts - np.array([0.25, -0.2, 0.1])) / 0.4) ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (18 * np.exp(-2 * r2) - 9).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()

    clip_sizes, clip_off = model.sweep_clip_for_axis(axis, quantum=8)
    assert clip_sizes is not None, "blob fixture should produce a real clip"
    assert any(s < g for s, g in zip(
        clip_sizes, [model.world_size[a] for a in
                     sweep_ops._PERMS[axis]]))

    N = 128
    o = np.tile([[0.0, 0.0, 3.0]], (N, 1)).astype(np.float32)
    ang = rng.uniform(-0.3, 0.3, (N, 2))
    d3 = np.stack([np.tan(ang[:, 0]), np.tan(ang[:, 1]),
                   -np.ones(N)], -1).astype(np.float32)
    # rotate so the batch is dominant along `axis`
    d3 = np.roll(d3, axis - 2, axis=1)
    o = np.roll(o, axis - 2, axis=1)
    vd = (d3 / np.linalg.norm(d3, axis=-1, keepdims=True)).astype(np.float32)
    kw = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5, render_depth=True)

    def run(params, clip_s, clip_o):
        return model.forward_sweep(
            params, model.mask, jnp.asarray(o), jnp.asarray(d3),
            jnp.asarray(vd), axis, clip_sizes=clip_s,
            clip_offsets=None if clip_o is None else jnp.asarray(clip_o),
            **kw)

    ret_full = run(model.params, None, None)
    ret_clip = run(model.params, clip_sizes, clip_off)
    for key in ("rgb_marched", "alphainv_last", "depth"):
        a, b = np.asarray(ret_full[key]), np.asarray(ret_clip[key])
        assert np.allclose(a, b, atol=2e-5), (key, np.abs(a - b).max())

    def loss(params, clip_s, clip_o):
        ret = run(params, clip_s, clip_o)
        return jnp.mean(ret["rgb_marched"] ** 2) \
            + jnp.mean(ret["alphainv_last"])

    g_full = jax.grad(loss)(model.params, None, None)
    g_clip = jax.grad(loss)(model.params, clip_sizes, clip_off)
    for name in ("density", "k0"):
        a, b = np.asarray(g_full[name]), np.asarray(g_clip[name])
        scale = max(1.0, np.abs(a).max())
        assert np.abs(a - b).max() < 1e-5 * scale, (name,
                                                    np.abs(a - b).max())


@pytest.mark.parametrize("axis", [0, 2])
def test_forward_sweep_window_composes_with_clip(axis):
    """A segment v-window composed with the occupancy clip box — sizes
    (clip_p, clip_u, W), v offset clamp(svlo, bvo, bvo+bv-W) — must match
    the plain clip box bit-for-tolerance: the batch's v support lies inside
    [svlo, svlo+W] and everything outside the mask bbox contributes zero
    (engine/train.py next_chunk composed draw)."""
    rng = np.random.default_rng(11)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=48 ** 3, num_voxels_base=48 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        k_density=None, k_color=0)
    pts = np.asarray(model.grid_points())
    # broad ellipsoid -> mask bbox v extent comfortably above the 32-wide
    # window class, so composition actually shrinks something
    r2 = (((pts - np.array([0.1, -0.05, 0.05])) / 0.75) ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (18 * np.exp(-2 * r2) - 9).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis, quantum=8)
    assert clip_sizes is not None

    # tight fan through the blob, dominant along `axis` -> narrow v support
    n_rand = sweep_ops.TILE_N
    n = 8 * n_rand
    o = np.tile([[0.15, -0.1, 3.0]], (n, 1)).astype(np.float32)
    ang = rng.uniform(-0.04, 0.04, (n, 2))
    d3 = np.stack([np.tan(ang[:, 0]) + rng.uniform(-0.1, 0.1, n),
                   np.tan(ang[:, 1]),
                   -np.ones(n)], -1).astype(np.float32)
    d3 = np.roll(d3, axis - 2, axis=1)
    o = np.roll(o, axis - 2, axis=1)
    vd = (d3 / np.linalg.norm(d3, axis=-1, keepdims=True)).astype(np.float32)

    bp, bu, bv = (int(x) for x in clip_sizes)
    bpo, buo, bvo = (int(x) for x in np.asarray(clip_off))
    # box-clipped supports: classes measured over the ray∩clip-box segment
    # (what the engine builds when a clip is active)
    bk = sweep_ops.build_ray_segments(
        o, d3, model.xyz_min, model.xyz_max, model.world_size, axis,
        n_rand=n_rand,
        clip_box=(bpo, bpo + bp - 1, bvo, bvo + bv - 1))
    usable = [w for w, (idx, _, _) in bk.items()
              if 0 < int(w) < bv and idx.shape[0] > 0]
    assert usable, f"no window class narrower than clip v={bv}: {list(bk)}"
    w = int(min(usable))
    idx, svlo, _ = bk[w]
    sel = idx[0]
    off_comp = np.asarray(
        [bpo, buo, min(max(int(svlo[0]), bvo), bvo + bv - w)], np.int32)
    kw = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5, render_depth=True)

    def run(params, cs, co):
        return model.forward_sweep(
            params, model.mask, jnp.asarray(o[sel]), jnp.asarray(d3[sel]),
            jnp.asarray(vd[sel]), axis, clip_sizes=cs,
            clip_offsets=jnp.asarray(co), **kw)

    ret_clip = run(model.params, clip_sizes, clip_off)
    ret_comp = run(model.params, (bp, bu, w), off_comp)
    for key in ("rgb_marched", "alphainv_last", "depth"):
        a, b = np.asarray(ret_clip[key]), np.asarray(ret_comp[key])
        assert np.allclose(a, b, atol=2e-5), (key, np.abs(a - b).max())

    def loss(params, cs, co):
        ret = run(params, cs, co)
        return jnp.mean(ret["rgb_marched"] ** 2) \
            + jnp.mean(ret["alphainv_last"])

    g_a = jax.grad(loss)(model.params, clip_sizes, clip_off)
    g_b = jax.grad(loss)(model.params, (bp, bu, w), off_comp)
    for name in ("density", "k0"):
        a, b = np.asarray(g_a[name]), np.asarray(g_b[name])
        scale = max(1.0, np.abs(a).max())
        assert np.abs(a - b).max() < 1e-5 * scale, (name,
                                                    np.abs(a - b).max())


def test_forward_sweep_2d_window_equivalence():
    """2D (u, v)-windowed draws (build_ray_segments_2d) must match the full
    sweep: a near-parallel (MPI-like) ray batch drawn as an image-tile
    segment trains a (gp, Wu, Wv) composed box whose interp support covers
    every ray (engine/train.py forced-axis draw path)."""
    rng = np.random.default_rng(7)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=64 ** 3, num_voxels_base=64 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        k_density=None, k_color=0)
    model.params["density"] = jnp.asarray(
        rng.normal(-2, 2, model.params["density"].shape).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()

    # forward-facing-style bundle: near-parallel -z rays from a grid of
    # origins (like NDC rays through image pixels)
    n_rand = 256
    n = 8 * n_rand
    gx, gy = np.meshgrid(np.linspace(-0.9, 0.9, 64),
                         np.linspace(-0.9, 0.9, 32), indexing="ij")
    o = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 2.0)],
                 -1).astype(np.float32)[:n]
    d3 = np.stack([rng.uniform(-0.04, 0.04, n),
                   rng.uniform(-0.04, 0.04, n),
                   -np.ones(n)], -1).astype(np.float32)
    vd = (d3 / np.linalg.norm(d3, axis=-1, keepdims=True)).astype(np.float32)

    bk = sweep_ops.build_ray_segments_2d(
        o, d3, model.xyz_min, model.xyz_max, model.world_size, 2,
        n_rand=n_rand, widths=(16, 24, 32, 48))
    # fully-windowed pairs only (0-slot keys mean full extent for that
    # dim and are exercised by the perspective compose test below)
    pairs = [k for k in bk if k[0] > 0 and k[1] > 0]
    assert pairs, f"no 2D window classes formed: {list(bk)}"
    wu, wv = pairs[0]
    idx, ulo, vlo = bk[(wu, wv)]
    sel = idx[0]
    perm = sweep_ops._PERMS[2]
    gp = int(model.world_size[perm[0]])
    gu = int(model.world_size[perm[1]])
    gv = int(model.world_size[perm[2]])
    off = np.asarray([0, min(int(ulo[0]), gu - wu),
                      min(int(vlo[0]), gv - wv)], np.int32)
    kw = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5, render_depth=True)

    def run(cs, co):
        return model.forward_sweep(
            model.params, model.mask, jnp.asarray(o[sel]),
            jnp.asarray(d3[sel]), jnp.asarray(vd[sel]), 2, clip_sizes=cs,
            clip_offsets=None if co is None else jnp.asarray(co), **kw)

    ret_full = run(None, None)
    ret_win = run((gp, wu, wv), off)
    for key in ("rgb_marched", "alphainv_last", "depth"):
        a, b = np.asarray(ret_full[key]), np.asarray(ret_win[key])
        # Windowed interp weights compute |(u - off) - iota| where the full
        # sweep computes |u - iota|: the f32 pre-shift rounds differently at
        # weight boundaries, and the bf16 weight cast amplifies that to
        # ~1e-4 on composited outputs — float-association noise, not a
        # window defect (sort-order changes redraw which segment trains).
        tol = 1e-3 * max(1.0, float(np.abs(a).max()))
        assert np.allclose(a, b, atol=tol), (key, np.abs(a - b).max())


def test_dominant_axis_grouping():
    d = np.array([[1.0, 0.1, 0.1], [0.1, -2.0, 0.3], [0.0, 0.1, 5.0]],
                 np.float32)
    g = sweep_ops.dominant_axis(d, (-1, -1, -1), (1, 1, 1), (64, 64, 64))
    assert list(g) == [0, 1, 2]


def test_pallas_train_sweep_kernels_match_xla():
    """Fused train-sweep fwd/bwd kernels (ops/pallas_sweep_train.py) vs the
    XLA scan formulation, in Pallas interpreter mode (CPU)."""
    from directvoxgo_tpu.ops import pallas_sweep_train as pst

    rng = np.random.default_rng(3)
    gp, gu, gv, c, k = 9, 16, 24, 5, 2
    n = pst.NT  # the kernel's ray-tile size
    grid_perm = jnp.asarray(
        rng.normal(size=(gp, gu, gv * c)).astype(np.float32),
        dtype=jnp.bfloat16)
    op = rng.uniform(-2, gp + 2, n).astype(np.float32)
    ou = rng.uniform(-1, gu, n).astype(np.float32)
    ov = rng.uniform(-1, gv, n).astype(np.float32)
    dp = (rng.uniform(0.3, 1.0, n)
          * rng.choice([-1.0, 1.0], n)).astype(np.float32)
    du = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    dv = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    rays_pv = ((jnp.asarray(op), jnp.asarray(ou), jnp.asarray(ov)),
               (jnp.asarray(dp), jnp.asarray(du), jnp.asarray(dv)))

    vals_ref, ts_ref = sweep_ops._sweep_fwd_impl(
        grid_perm, rays_pv, c, k, (gu, gv), jnp.bfloat16)

    grid_p, cp = pst.pad_channels(grid_perm, c)
    slabs = sweep_ops._station_slabs(grid_p, k)
    s = k * (gp - 1) + 1
    s_pad = pst._round_up(s, pst.S_BLK)
    if s_pad > s:
        slabs = jnp.concatenate(
            [slabs, jnp.zeros((s_pad - s, gu, gv * cp), slabs.dtype)])
    rp = jnp.stack([jnp.asarray(op), jnp.asarray(ou), jnp.asarray(ov),
                    jnp.asarray(dp), jnp.asarray(du), jnp.asarray(dv),
                    jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32)])
    vals = pst.sweep_fwd_pallas(slabs, rp, c=c, cp=cp, k=k, gu=gu,
                                gv=gv, interpret=True)
    vals = jnp.transpose(vals[:s], (1, 2, 0))
    err = float(jnp.max(jnp.abs(vals - vals_ref)))
    assert err < 1e-2, err


@pytest.mark.parametrize("gather_mode", ["onehot", "gather"])
def test_forward_sweep_topk_compaction_parity(gather_mode):
    """sweep_color_topk must not change outputs or grid gradients when the
    per-ray budget covers every above-threshold sample (the reference's
    fast_color_thres pruning keeps the same set, lib/dvgo.py:478-494).

    Uses a 56^3 grid (s_total = 111 > the >96 compaction gate... adjusted:
    64^3 -> 127 stations) with a compact gaussian blob so active stations
    per ray stay well under the K=48 budget.
    """
    from directvoxgo_tpu.models import dvgo as dvgo_mod
    rng = np.random.default_rng(7)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=64 ** 3, num_voxels_base=64 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=False,
                        rgbnet_depth=3, rgbnet_width=64,
                        k_density=None, k_color=0)
    model.mlp_dtype = jnp.float32  # isolate compaction from bf16 rounding
    pts = np.asarray(model.grid_points())
    r2 = (pts ** 2).sum(-1)
    # sharp blob: high density inside r<0.3, strongly negative outside, so
    # weights concentrate on < 20 stations per ray
    model.params["density"] = jnp.asarray(
        (30 * np.exp(-20 * r2) - 15).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))

    N = 64
    o = np.tile([[0.0, 0.0, 3.0]], (N, 1)).astype(np.float32)
    ang = rng.uniform(-0.25, 0.25, (N, 2))
    d = np.stack([np.tan(ang[:, 0]), np.tan(ang[:, 1]),
                  -np.ones(N)], -1).astype(np.float32)
    vd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    kw = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5, render_depth=True)
    o, d, vd = jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd)
    target = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

    def run(topk):
        model.sweep_color_topk = topk

        def loss_fn(params):
            ret = model.forward_sweep(params, model.mask, o, d, vd, 2, **kw)
            return jnp.mean((ret["rgb_marched"] - target) ** 2), ret

        (loss, ret), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            model.params)
        return loss, ret, grads

    old_mode = dvgo_mod._COMPACT_GATHER
    try:
        dvgo_mod._COMPACT_GATHER = gather_mode
        loss_d, ret_d, g_d = run(0)
        loss_c, ret_c, g_c = run(48)
    finally:
        dvgo_mod._COMPACT_GATHER = old_mode
    # sanity: compaction really was active
    assert ret_c["weights"].shape[1] == 48
    assert ret_d["weights"].shape[1] > 96

    np.testing.assert_allclose(np.asarray(ret_c["rgb_marched"]),
                               np.asarray(ret_d["rgb_marched"]),
                               atol=2e-5)
    np.testing.assert_allclose(float(loss_c), float(loss_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret_c["depth"]),
                               np.asarray(ret_d["depth"]), atol=1e-3)
    # per-sample weight mass kept identical
    np.testing.assert_allclose(
        np.asarray(jnp.sum(ret_c["weights"], 1)),
        np.asarray(jnp.sum(ret_d["weights"], 1)), atol=2e-5)
    for name in ("density", "k0", "rgbnet"):
        gd = jax.tree_util.tree_leaves(g_d[name])
        gc = jax.tree_util.tree_leaves(g_c[name])
        for a, b in zip(gd, gc):
            scale = float(jnp.max(jnp.abs(a))) + 1e-12
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 2e-3, (name, err)


def test_station_sweep_tile_window_bwd_parity(monkeypatch):
    """Windowed backward (per-ray-tile v-windows) must match the full
    transpose exactly when every tile's rays keep their v support inside
    the window (the engine's bucket sampler guarantees this bound).
    The windowed backward ships off by default (slower on TPU at e2e
    shapes — see _sweep_bwd); force it on to keep its math covered."""
    monkeypatch.setenv("DVGO_SWEEP_BWD_WINDOWED", "1")
    rng = np.random.default_rng(3)
    gp, gu, gv, c, k = 10, 12, 40, 3, 2
    n = 2 * sweep_ops.TILE_N
    grid = jnp.asarray(rng.normal(size=(gp, gu, gv * c)).astype(np.float32))
    op = jnp.asarray(rng.uniform(1, gp - 2, n).astype(np.float32))
    dp = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    ou = jnp.asarray(rng.uniform(1, gu - 2, n).astype(np.float32))
    du = jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32))
    ov = np.concatenate([rng.uniform(1, 13, sweep_ops.TILE_N),
                         rng.uniform(17, 29, sweep_ops.TILE_N)])
    ov = jnp.asarray(ov.astype(np.float32))
    dv = jnp.zeros(n, jnp.float32)
    rays = ((op, ou, ov), (dp, du, dv))
    v_base = jnp.asarray(np.array([0, 16], np.int32))
    wv = 16
    cot = jnp.asarray(rng.normal(
        size=(c, n, k * (gp - 1) + 1)).astype(np.float32))
    none_vb = jnp.zeros((0,), jnp.int32)

    def loss(g, vb, w):
        vals, _ = sweep_ops.station_sweep(g, rays, vb, c, k, (gu, gv),
                                          (F32, F32), w)
        return jnp.sum(vals * cot)

    g_full = np.asarray(jax.grad(loss)(grid, none_vb, 0))
    g_win = np.asarray(jax.grad(loss)(grid, v_base, wv))
    scale = max(1.0, np.abs(g_full).max())
    # Outside every tile's window the rays have zero interp weight, so the
    # full transpose's cotangent is zero there too -> exact agreement.
    assert np.abs(g_win - g_full).max() < 1e-4 * scale


def test_build_tile_buckets_cover_guarantee():
    """Every tile's assigned (vlo, W) must cover each member ray's v interp
    support at EVERY station plane, and every pool ray (minus the < tile_n
    sort tail) must land in exactly one bucket."""
    rng = np.random.default_rng(9)
    n = 4 * sweep_ops.TILE_N + 37   # non-multiple: exercises tail dropping
    xyz_min, xyz_max = (-1, -1, -1), (1, 1, 1)
    world = (48, 40, 56)
    o = np.tile([[0.0, 0.0, 3.0]], (n, 1)).astype(np.float32)
    o[:, :2] += rng.uniform(-0.4, 0.4, (n, 2))
    ang = rng.uniform(-0.35, 0.35, (n, 2))
    d = np.stack([np.tan(ang[:, 0]), np.tan(ang[:, 1]),
                  -np.ones(n)], -1).astype(np.float32)
    axis = 2
    out = sweep_ops.build_tile_buckets(o, d, xyz_min, xyz_max, world, axis)
    seen = []
    gp = world[sweep_ops._PERMS[axis][0]]
    gv = world[sweep_ops._PERMS[axis][2]]
    o_pv, d_pv = sweep_ops.rays_to_voxel(o, d, xyz_min, xyz_max, world, axis)
    op, _, ov = [np.asarray(x) for x in o_pv]
    dp, _, dv = [np.asarray(x) for x in d_pv]
    dp = np.where(np.abs(dp) < 1e-10, 1e-10, dp)
    for w, (idx, vlo) in out.items():
        assert idx.shape[1] == sweep_ops.TILE_N
        seen.append(idx.reshape(-1))
        if w == 0:
            continue
        assert (vlo % 8 == 0).all()
        for b in range(idx.shape[0]):
            rays = idx[b]
            # v at every station plane, clipped to the interp support range
            for p in np.linspace(0, gp - 1, 13):
                t = (p - op[rays]) / dp[rays]
                v = np.clip(ov[rays] + t * dv[rays], -1, gv)
                rows = np.floor(v).astype(int)
                lo, hi = vlo[b], vlo[b] + w - 1
                r0 = np.clip(rows, 0, gv - 1)
                r1 = np.clip(rows + 1, 0, gv - 1)
                in_grid = (v > -1) & (v < gv)
                assert (r0[in_grid] >= lo).all() and (r1[in_grid] <= hi).all(), \
                    (w, b, p, r0[in_grid].min(), r1[in_grid].max(), lo, hi)
    seen = np.concatenate(seen)
    assert len(seen) == len(np.unique(seen))  # disjoint buckets
    assert len(seen) == (n // sweep_ops.TILE_N) * sweep_ops.TILE_N


def test_windowed_fwd_kernel_interpret_matches_scan():
    """v-windowed fused fwd kernel (interpret mode) == XLA scan when tiles
    respect their windows."""
    from directvoxgo_tpu.ops import pallas_sweep_train as pst
    rng = np.random.default_rng(0)
    gp, gu, gv, c, k = 12, 16, 40, 3, 2
    n = 2 * pst.NT
    grid_perm = jnp.asarray(
        rng.normal(size=(gp, gu, gv * c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    op = rng.uniform(1, gp - 2, n); dp = rng.uniform(0.5, 1.0, n)
    ou = rng.uniform(1, gu - 2, n); du = rng.uniform(-0.3, 0.3, n)
    ov = np.concatenate([rng.uniform(1, 13, pst.NT),
                         rng.uniform(17, 29, pst.NT)])
    dv = np.zeros(n)
    rays = [jnp.asarray(x.astype(np.float32))
            for x in (op, ou, ov, dp, du, dv)]
    rays_pv = ((rays[0], rays[1], rays[2]), (rays[3], rays[4], rays[5]))
    v_base = jnp.asarray(np.array([0, 16], np.int32))
    wv = 16
    vals_ref, _ = sweep_ops._sweep_fwd_impl(grid_perm, rays_pv, c, k,
                                            (gu, gv), jnp.bfloat16)
    grid_p, cp = pst.pad_channels(grid_perm, c)
    slabs = sweep_ops._station_slabs(grid_p, k)
    s = k * (gp - 1) + 1
    s_pad = pst._round_up(s, pst.S_BLK)
    if s_pad > s:
        slabs = jnp.concatenate(
            [slabs, jnp.zeros((s_pad - s, gu, cp * gv), slabs.dtype)])
    rp = jnp.stack(rays + [jnp.zeros(n, jnp.float32)] * 2)
    vals = pst.sweep_fwd_pallas(slabs, rp, v_base, c=c, cp=cp, k=k, gu=gu,
                                gv=gv, wv=wv, interpret=True)
    vals = jnp.transpose(vals[:s], (1, 2, 0))
    assert float(jnp.max(jnp.abs(vals - vals_ref))) < 1e-2


def test_windowed_bwd_kernel_interpret_matches_xla():
    """Flag-gated Pallas bwd partials kernel (interpret mode) == the XLA
    windowed transpose."""
    from directvoxgo_tpu.ops import pallas_sweep_train as pst
    rng = np.random.default_rng(1)
    gp, gu, gv, c, k = 12, 16, 40, 3, 2
    n = 2 * pst.NT
    op = jnp.asarray(rng.uniform(1, gp - 2, n).astype(np.float32))
    dp = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    ou = jnp.asarray(rng.uniform(1, gu - 2, n).astype(np.float32))
    du = jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32))
    ov = jnp.asarray(np.concatenate(
        [rng.uniform(2, 12, pst.NT), rng.uniform(18, 28, pst.NT)]
    ).astype(np.float32))
    dv = jnp.asarray(rng.uniform(-0.03, 0.03, n).astype(np.float32))
    rays = ((op, ou, ov), (dp, du, dv))
    v_base = jnp.asarray(np.array([0, 16], np.int32))
    wv = 16
    s = k * (gp - 1) + 1
    cot = jnp.asarray(rng.normal(size=(c, n, s)).astype(np.float32))
    d_ref = sweep_ops._sweep_bwd_windowed(
        c, k, gu, gv, wv, jnp.float32, jnp.float32, rays, v_base, cot)
    cp = pst._round_up(c, pst.C_TILE)
    s_pad = pst._round_up(s, pst.S_BLK)
    g_snc = jnp.pad(jnp.transpose(cot, (2, 1, 0)),
                    ((0, s_pad - s), (0, 0), (0, cp - c)))
    rp_t = jnp.stack([op, ou, ov, dp, du, dv,
                      jnp.zeros(n), jnp.zeros(n)], axis=1)
    partials = pst.sweep_bwd_pallas(g_snc, rp_t, v_base, c=c, cp=cp, k=k,
                                    gu=gu, gv=gv, wv=wv, interpret=True)
    d_k = pst.fold_bwd_partials(partials, gp, gu, gv, c, cp, k)
    scale = float(jnp.max(jnp.abs(d_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(d_k - d_ref))) < 2e-2 * max(scale, 1.0)


def test_station_sweep_segment_window_bwd_parity():
    """Segment convention (v_base has n_tiles+1 entries; the last is the
    batch-level window start): the windowed backward must match the full
    transpose when the segment window covers every ray's v support."""
    rng = np.random.default_rng(5)
    gp, gu, gv, c, k = 10, 12, 64, 3, 2
    n = 2 * sweep_ops.TILE_N
    grid = jnp.asarray(rng.normal(size=(gp, gu, gv * c)).astype(np.float32))
    op = jnp.asarray(rng.uniform(1, gp - 2, n).astype(np.float32))
    dp = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    ou = jnp.asarray(rng.uniform(1, gu - 2, n).astype(np.float32))
    du = jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32))
    ov = jnp.asarray(np.concatenate(
        [rng.uniform(1, 13, sweep_ops.TILE_N),
         rng.uniform(17, 29, sweep_ops.TILE_N)]).astype(np.float32))
    dv = jnp.zeros(n, jnp.float32)
    rays = ((op, ou, ov), (dp, du, dv))
    wv = 32
    v_base = jnp.asarray(np.array([0, 8, 0], np.int32))  # tiles..., segment
    cot = jnp.asarray(rng.normal(
        size=(c, n, k * (gp - 1) + 1)).astype(np.float32))
    none_vb = jnp.zeros((0,), jnp.int32)

    def loss(g, vb, w):
        vals, _ = sweep_ops.station_sweep(g, rays, vb, c, k, (gu, gv),
                                          (F32, F32), w)
        return jnp.sum(vals * cot)

    g_full = np.asarray(jax.grad(loss)(grid, none_vb, 0))
    g_seg = np.asarray(jax.grad(loss)(grid, v_base, wv))
    scale = max(1.0, np.abs(g_full).max())
    assert np.abs(g_seg - g_full).max() < 1e-4 * scale


@pytest.mark.parametrize("axis", [0, 2])
def test_forward_sweep_2d_window_composes_with_clip_perspective(axis):
    """Perspective (dominant-axis) batches drawn as 2D (wu, wv) composed
    boxes must match the plain clip box. Covers the 6-bound clip_box form
    (u/v supports clamped to the box) and 0-slot classes meaning full
    extent for that dim (engine/train.py next_chunk 2D draw + eff())."""
    rng = np.random.default_rng(19)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=48 ** 3, num_voxels_base=48 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        k_density=None, k_color=0)
    pts = np.asarray(model.grid_points())
    r2 = (((pts - np.array([0.1, -0.05, 0.05])) / 0.75) ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (18 * np.exp(-2 * r2) - 9).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()
    clip_sizes, clip_off = model.sweep_clip_for_axis(axis, quantum=8)
    assert clip_sizes is not None

    # tight fan through the blob, dominant along `axis`
    n_rand = sweep_ops.TILE_N
    n = 8 * n_rand
    o = np.tile([[0.15, -0.1, 3.0]], (n, 1)).astype(np.float32)
    ang = rng.uniform(-0.04, 0.04, (n, 2))
    d3 = np.stack([np.tan(ang[:, 0]) + rng.uniform(-0.1, 0.1, n),
                   np.tan(ang[:, 1]),
                   -np.ones(n)], -1).astype(np.float32)
    d3 = np.roll(d3, axis - 2, axis=1)
    o = np.roll(o, axis - 2, axis=1)
    vd = (d3 / np.linalg.norm(d3, axis=-1, keepdims=True)).astype(np.float32)

    bp, bu, bv = (int(x) for x in clip_sizes)
    bpo, buo, bvo = (int(x) for x in np.asarray(clip_off))
    bk = sweep_ops.build_ray_segments_2d(
        o, d3, model.xyz_min, model.xyz_max, model.world_size, axis,
        n_rand=n_rand, widths=(16, 32),
        clip_box=(bpo, bpo + bp - 1, buo, buo + bu - 1,
                  bvo, bvo + bv - 1))
    usable = [k for k in bk if k != (0, 0)]
    assert usable, f"no 2D window class: {list(bk)}"
    kw = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5, render_depth=True)

    def run(sel, params, cs, co):
        return model.forward_sweep(
            params, model.mask, jnp.asarray(o[sel]), jnp.asarray(d3[sel]),
            jnp.asarray(vd[sel]), axis, clip_sizes=cs,
            clip_offsets=jnp.asarray(co), **kw)

    for key2d in usable:
        wu, wv = key2d
        eu = wu if 0 < wu < bu else bu
        ev = wv if 0 < wv < bv else bv
        if (eu, ev) == (bu, bv):
            continue
        idx, ulo, vlo = bk[key2d]
        sel = idx[0]
        off = np.asarray(
            [bpo,
             min(max(int(ulo[0]), buo), buo + bu - eu),
             min(max(int(vlo[0]), bvo), bvo + bv - ev)], np.int32)
        ret_clip = run(sel, model.params, clip_sizes, clip_off)
        ret_comp = run(sel, model.params, (bp, eu, ev), off)
        for name in ("rgb_marched", "alphainv_last", "depth"):
            a = np.asarray(ret_clip[name])
            b = np.asarray(ret_comp[name])
            # Scale-aware float tolerance: f32 reassociation across the
            # window's station blend order plus the bf16 weight cast of
            # the shifted |(u - off) - iota| rows — ~1e-4 relative noise
            # (depth spans near..far, so absolute tolerances must scale)
            tol = 1e-4 * max(1.0, float(np.abs(a).max()))
            assert np.allclose(a, b, atol=tol), (key2d, name,
                                                 np.abs(a - b).max())

        def loss(params, cs, co):
            ret = run(sel, params, cs, co)
            return jnp.mean(ret["rgb_marched"] ** 2) \
                + jnp.mean(ret["alphainv_last"])

        g_a = jax.grad(loss)(model.params, clip_sizes, clip_off)
        g_b = jax.grad(loss)(model.params, (bp, eu, ev), off)
        for name in ("density", "k0"):
            a, b = np.asarray(g_a[name]), np.asarray(g_b[name])
            scale = max(1.0, np.abs(a).max())
            assert np.abs(a - b).max() < 1e-5 * scale, (key2d, name)


@pytest.mark.parametrize("axis", [0, 2])
def test_forward_sweep_blocked_equivalence(axis):
    """Blocked per-p-block (u, v) windows (build_ray_segments_blocked +
    sweep_samples_blocked) must match the plain full sweep: forward outputs
    AND grid gradients, for a perspective multi-view-style batch whose
    per-block supports the builder guarantees (engine blocked draw path)."""
    rng = np.random.default_rng(23)
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=56 ** 3, num_voxels_base=56 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        k_density=None, k_color=0)
    pts = np.asarray(model.grid_points())
    r2 = (((pts - np.array([0.05, -0.1, 0.0])) / 0.6) ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (16 * np.exp(-2 * r2) - 8).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()

    # two camera bundles from different directions (both dominant along
    # `axis`): endpoint sorting separates them, per-block windows tighten
    n_rand = 2 * sweep_ops.TILE_N
    n = 4 * n_rand
    o = np.zeros((n, 3), np.float32)
    d3 = np.zeros((n, 3), np.float32)
    half = n // 2
    for i, (ox, tilt) in enumerate(((0.4, 0.35), (-0.5, -0.3))):
        sl = slice(i * half, (i + 1) * half)
        o[sl] = np.array([ox, 0.1 * i, 3.0], np.float32)
        ang = rng.uniform(-0.12, 0.12, (half, 2))
        d3[sl] = np.stack([np.tan(ang[:, 0]) + tilt,
                           np.tan(ang[:, 1]) + 0.2 * i,
                           -np.ones(half)], -1)
    o = np.roll(o, axis - 2, axis=1)
    d3 = np.roll(d3, axis - 2, axis=1)
    vd = (d3 / np.linalg.norm(d3, axis=-1, keepdims=True)).astype(np.float32)

    bk = sweep_ops.build_ray_segments_blocked(
        o, d3, model.xyz_min, model.xyz_max, model.world_size, axis,
        n_rand=n_rand, n_blocks=4, widths=(16, 24, 32, 40, 48))
    wins = [k for k in bk if k != (0, 0) and bk[k][0].shape[0] > 0]
    assert wins, f"no windowed blocked class: {list(bk)}"
    wu, wv = wins[0]
    idx, uo, vo = bk[(wu, wv)]
    sel = idx[0]
    kw = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5, render_depth=True)

    def run(params, bw):
        return model.forward_sweep(
            params, model.mask, jnp.asarray(o[sel]), jnp.asarray(d3[sel]),
            jnp.asarray(vd[sel]), axis, block_windows=bw, **kw)

    nb = uo.shape[1]
    bw = ((nb, wu, wv), (jnp.asarray(uo[0]), jnp.asarray(vo[0])))
    ret_full = run(model.params, None)
    ret_blk = run(model.params, bw)
    for key in ("rgb_marched", "alphainv_last", "depth"):
        a, b = np.asarray(ret_full[key]), np.asarray(ret_blk[key])
        assert np.allclose(a, b, atol=3e-5), (key, np.abs(a - b).max())

    def loss(params, bwin):
        ret = run(params, bwin)
        return jnp.mean(ret["rgb_marched"] ** 2) \
            + jnp.mean(ret["alphainv_last"])

    g_a = jax.grad(loss)(model.params, None)
    g_b = jax.grad(loss)(model.params, bw)
    for name in ("density", "k0"):
        a, b = np.asarray(g_a[name]), np.asarray(g_b[name])
        scale = max(1.0, np.abs(a).max())
        assert np.abs(a - b).max() < 2e-5 * scale, (name,
                                                    np.abs(a - b).max())
