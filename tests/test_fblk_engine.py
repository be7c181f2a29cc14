"""Engine wiring for fused block-tile windowed draws ('fblk' step keys).

Kernel-level exactness is covered in tests/test_fused_train.py; here the
make_train_step plumbing is exercised: the ('fblk', wu, wv, bp, bu, bv)
static key (region-mode box slicing + forward_sweep_fused dispatch +
rgbper_sum loss), the [3] traced box-offset argument, and the optimizer
update must produce the same loss and a structurally matching parameter
step as the region-mode plain program on the same direction-uniform,
class-fitting ray batch (engine/train.py next_chunk fblk draw path; see
the in-test note on why first-step Adam caps the pointwise bound at a
sign flip). Also covers
ops/sweep.build_ray_tiles_blocktile's exactness contract: every
dispatched cell must fit its class per the kernels' own base arithmetic
(pallas_train_fused.blocktile_uv_bases fits flags).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.config import ConfigDict
from directvoxgo_tpu.engine.train import make_train_step
from directvoxgo_tpu.models.dvgo import DirectVoxGO
from directvoxgo_tpu.optim import MaskedAdam
from directvoxgo_tpu.ops import pallas_train_fused as ptf
from directvoxgo_tpu.ops import sweep as sweep_ops
from directvoxgo_tpu.ops import raymarch as rm


def _scene(rng):
    model = DirectVoxGO(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
                        num_voxels=48 ** 3, num_voxels_base=48 ** 3,
                        alpha_init=1e-2, fast_color_thres=1e-4,
                        rgbnet_dim=6, rgbnet_direct=True,
                        k_density=None, k_color=0, sweep_color_topk=0)
    pts = np.asarray(model.grid_points())
    r2 = (((pts - np.array([0.05, -0.1, 0.0])) / 0.55) ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (14 * np.exp(-2 * r2) - 7).astype(np.float32))
    model.params["k0"] = jnp.asarray(
        rng.normal(0, 0.5, model.params["k0"].shape).astype(np.float32))
    model.update_occupancy_cache()
    return model


def _rays(rng, n, sign):
    """Multi-cluster rays marching along +/-x (dominant axis 0)."""
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = -3.0 * sign
    d = np.zeros((n, 3), np.float32)
    d[:, 0] = sign
    nt = 512
    for j in range(n // nt):
        tgt = rng.uniform(-0.7, 0.7, 2)
        sl = slice(j * nt, (j + 1) * nt)
        o[sl, 1:] = rng.normal(tgt, 0.05, (nt, 2))
        d[sl, 1:] = rng.normal(0, 0.06, (nt, 2))
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d, vd.astype(np.float32)


def test_fblk_step_matches_plain(monkeypatch):
    monkeypatch.setenv("DVGO_FUSED_TRAIN", "force")  # CPU interpret mode
    rng = np.random.default_rng(11)
    model = _scene(rng)
    axis = 0
    n_rand = 2048       # 4 tiles per batch: keeps interpret mode fast
    n = 4 * n_rand
    o_p, d_p, vd_p = _rays(rng, n // 2, +1.0)
    o_m, d_m, vd_m = _rays(rng, n // 2, -1.0)
    o = np.concatenate([o_p, o_m])
    d = np.concatenate([d_p, d_m])
    vd = np.concatenate([vd_p, vd_m])
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pool = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
            "viewdirs": jnp.asarray(vd), "rgb": jnp.asarray(rgb)}
    rk = dict(near=0.5, far=8.0, bg=1.0, stepsize=0.5)

    csz, coff = model.sweep_clip_for_axis(axis)
    perm = sweep_ops._PERMS[axis]
    if csz is None:
        csz = tuple(int(model.world_size[a]) for a in perm)
        coff = np.zeros(3, np.int32)
    offs = np.asarray(coff, np.int64)
    bp, bu, bv = (int(x) for x in csz)
    box6 = (float(offs[0]), float(offs[0]) + bp - 1.0,
            float(offs[1]), float(offs[1]) + bu - 1.0,
            float(offs[2]), float(offs[2]) + bv - 1.0)

    tiles = sweep_ops.build_ray_tiles_blocktile(
        o, d, model.xyz_min, model.xyz_max, model.world_size, axis,
        rk["near"], rk["far"], rk["stepsize"], clip_box=box6)
    wins = [k for k in tiles if k[0] and k[1]]
    assert wins, f"no windowed tile class: {list(tiles)}"
    # both signs must appear in some class (direction-uniform draws)
    assert {k[2] for k in wins} == {1, -1}, list(tiles)
    wu, wv, sg = max(wins, key=lambda k: tiles[k].shape[0])
    idx = tiles[(wu, wv, sg)]
    assert idx.shape[0] >= n_rand // 512
    sel_np = idx[: n_rand // 512].reshape(-1)
    sel = jnp.asarray(sel_np.astype(np.int32))

    # exactness contract: every (station-block, tile) cell of the batch
    # fits the class per the kernel's own base arithmetic
    o_pv, d_pv = sweep_ops.rays_to_voxel(
        jnp.asarray(o[sel_np]), jnp.asarray(d[sel_np]),
        tuple(float(v) for v in model.xyz_min),
        tuple(float(v) for v in model.xyz_max),
        tuple(int(x) for x in model.world_size), axis)
    o_pv = tuple(ov - jnp.float32(float(offs[i]))
                 for i, ov in enumerate(o_pv))
    tlo, thi = rm.ray_aabb_tminmax(
        jnp.asarray(o[sel_np]), jnp.asarray(d[sel_np]),
        jnp.asarray(model.xyz_min), jnp.asarray(model.xyz_max),
        rk["near"], rk["far"])
    z = jnp.zeros((n_rand,), jnp.float32)
    dp_safe = jnp.where(d_pv[0] == 0, 1e-10, d_pv[0])
    rays16 = jnp.stack([o_pv[0], o_pv[1], o_pv[2], dp_safe, d_pv[1],
                        d_pv[2], tlo, thi, z, z, z, z, z, z, z, z])
    k = sweep_ops.substeps_for_stepsize(rk["stepsize"])
    s_pad = ptf._round_up(k * (bp - 1) + 1, ptf.S_BLK)
    gu_p, gv_p = ptf._round_up(bu, 16), ptf._round_up(bv, 8)
    inv_k = 1.0 / k
    p0 = jnp.where(sg < 0, (s_pad - 1) * inv_k, 0.0)
    pstep = jnp.where(sg < 0, -inv_k, inv_k)
    _, fits = ptf.blocktile_uv_bases(
        rays16, p0, pstep, s_pad // ptf.S_BLK, ptf.S_BLK, gu_p, gv_p,
        wu, wv, 512)
    assert bool(jnp.all(fits)), "builder class must cover every cell"

    optimizer = MaskedAdam({
        "density": {"lr": 1e-1, "skip_zero_grad": True},
        "k0": {"lr": 1e-1, "skip_zero_grad": True},
        "rgbnet": {"lr": 1e-3},
    })
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=0.001, weight_rgbper=0.01,
        weight_tv_density=0.0, weight_tv_k0=0.0, N_rand=n_rand))

    step_plain = make_train_step(model, optimizer, cfg_train, rk,
                                 apply_tv=False, tv_dense=False,
                                 axis=axis, clip_sizes=csz)
    step_fblk = make_train_step(model, optimizer, cfg_train, rk,
                                apply_tv=False, tv_dense=False, axis=axis,
                                clip_sizes=("fblk", wu, wv, bp, bu, bv))
    off3 = jnp.asarray(np.asarray(offs, np.int32))

    p_a, o_a, loss_a, psnr_a = step_plain(
        model.params, model.mask, optimizer.init(model.params), pool,
        sel, off3)
    p_b, o_b, loss_b, psnr_b = step_fblk(
        model.params, model.mask, optimizer.init(model.params), pool,
        sel, off3)
    assert abs(float(loss_a) - float(loss_b)) < 3e-5, (float(loss_a),
                                                       float(loss_b))
    assert abs(float(psnr_a) - float(psnr_b)) < 1e-2

    # Param-step comparison through FIRST-step Adam is a sign(grad) test:
    # step ~= -lr * sign(g), so two numerically distinct but correct
    # programs (bf16 slab quantization orders differ; test_fused_train
    # bounds the raw grads at 5e-3 rtol) legitimately disagree by up to
    # 2*lr wherever a near-zero gradient flips sign or zero/nonzero
    # (measured here: 0.4% of density voxels, 0.8% of k0, median diff
    # ~1.5e-2*lr). A WIRING bug — a shifted box offset, wrong slice,
    # mis-sliced optimizer region — misaligns the whole gradient
    # footprint instead: dense step-sized disagreement. Discriminate on
    # structure: nothing beyond a sign flip, disagreement sparse, and the
    # strongly-stepped sets agree.
    lrs = {"density": 1e-1, "k0": 1e-1, "rgbnet": 1e-3}
    for name, lr in lrs.items():
        for (path, a), (_, b), (_, p0) in zip(
                jax.tree_util.tree_leaves_with_path(p_a[name]),
                jax.tree_util.tree_leaves_with_path(p_b[name]),
                jax.tree_util.tree_leaves_with_path(model.params[name])):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            p0 = np.asarray(p0, np.float32)
            d = np.abs(a - b)
            where = f"{name}{jax.tree_util.keystr(path)}"
            assert d.max() <= 2.05 * lr, (where, d.max())
            # the tight sparsity bound is the GRID check (a mis-wired box
            # offset shifts the whole grad footprint); MLP grads are the
            # noisiest of both paths (bf16 hidden chains on each side,
            # test_fused_train uses looser MLP tolerances) and carry no
            # spatial wiring to get wrong — bound them loosely.
            frac = 0.02 if name != "rgbnet" else 0.10
            assert (d > 0.05 * lr).sum() <= max(4, frac * d.size), (
                where, (d > 0.05 * lr).mean())
            strong = np.abs(a - p0) > 0.5 * lr
            if strong.any():
                assert (d[strong] > 0.5 * lr).mean() < 0.01, (
                    where, (d[strong] > 0.5 * lr).mean())


def test_fblk_unwindowed_key_rejected_outside_region_mode():
    """fblk keys assume pre-clipped box grids: building one with TV on
    (full-grid grads) must fail loudly rather than silently mis-slice."""
    rng = np.random.default_rng(3)
    model = _scene(rng)
    optimizer = MaskedAdam({"density": {"lr": 0.1, "skip_zero_grad": True},
                            "k0": {"lr": 0.1, "skip_zero_grad": True},
                            "rgbnet": {"lr": 1e-3}})
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=0.001, weight_rgbper=0.01,
        weight_tv_density=0.1, weight_tv_k0=0.0, N_rand=1024))
    with pytest.raises(AssertionError):
        make_train_step(model, optimizer, cfg_train,
                        dict(near=0.5, far=8.0, bg=1.0, stepsize=0.5),
                        apply_tv=True, tv_dense=True, axis=0,
                        clip_sizes=("fblk", 32, 16, 48, 48, 48))
