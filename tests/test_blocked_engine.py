"""Engine wiring for blocked per-p-block windowed draws.

The model-level exactness of the blocked sweep is covered in
tests/test_sweep.py::test_forward_sweep_blocked_equivalence; here the
make_train_step plumbing is exercised: the ('blk', B, eu, ev) static key,
the [B, 2] traced offset argument, and the optimizer update must produce
the same loss and parameter step as the plain unclipped program on the
same ray batch (engine/train.py next_chunk blocked draw path).
"""
import numpy as np
import jax.numpy as jnp

from directvoxgo_tpu.config import ConfigDict
from directvoxgo_tpu.engine.train import make_train_step
from directvoxgo_tpu.models.dvgo import DirectVoxGO
from directvoxgo_tpu.optim import MaskedAdam
from directvoxgo_tpu.ops import sweep as sweep_ops


def test_blocked_step_matches_plain():
    rng = np.random.default_rng(31)
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

    n_rand = 2 * sweep_ops.TILE_N
    n = 4 * n_rand
    axis = 2
    o = np.tile([[0.3, 0.1, 3.0]], (n, 1)).astype(np.float32)
    ang = rng.uniform(-0.12, 0.12, (n, 2))
    d3 = np.stack([np.tan(ang[:, 0]) + 0.3, np.tan(ang[:, 1]),
                   -np.ones(n)], -1).astype(np.float32)
    vd = (d3 / np.linalg.norm(d3, axis=-1, keepdims=True)).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pool = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d3),
            "viewdirs": jnp.asarray(vd), "rgb": jnp.asarray(rgb)}

    bk = sweep_ops.build_ray_segments_blocked(
        o, d3, model.xyz_min, model.xyz_max, model.world_size, axis,
        n_rand=n_rand, n_blocks=4, widths=(16, 24, 32, 40, 48))
    wins = [k for k in bk if k != (0, 0) and bk[k][0].shape[0] > 0]
    assert wins, f"no windowed blocked class: {list(bk)}"
    wu, wv = wins[0]
    idx, uo, vo = bk[(wu, wv)]
    nb = uo.shape[1]
    gu = int(model.world_size[sweep_ops._PERMS[axis][1]])
    gv = int(model.world_size[sweep_ops._PERMS[axis][2]])
    eu = wu if 0 < wu < gu else gu
    ev = wv if 0 < wv < gv else gv

    optimizer = MaskedAdam({
        "density": {"lr": 1e-1, "skip_zero_grad": True},
        "k0": {"lr": 1e-1, "skip_zero_grad": True},
        "rgbnet": {"lr": 1e-3},
    })
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=0.001, weight_rgbper=0.01,
        weight_tv_density=0.0, weight_tv_k0=0.0, N_rand=n_rand))
    rk = dict(near=0.5, far=6.0, bg=1.0, stepsize=0.5)

    step_plain = make_train_step(model, optimizer, cfg_train, rk,
                                 apply_tv=False, tv_dense=False, axis=axis,
                                 clip_sizes=None)
    step_blk = make_train_step(model, optimizer, cfg_train, rk,
                               apply_tv=False, tv_dense=False, axis=axis,
                               clip_sizes=("blk", nb, eu, ev))
    sel = jnp.asarray(idx[0].astype(np.int32))
    off_blk = jnp.asarray(np.stack([uo[0], vo[0]], axis=1).astype(np.int32))
    off_plain = jnp.zeros(3, jnp.int32)

    p_a, o_a, loss_a, psnr_a = step_plain(
        model.params, model.mask, optimizer.init(model.params), pool, sel,
        off_plain)
    p_b, o_b, loss_b, psnr_b = step_blk(
        model.params, model.mask, optimizer.init(model.params), pool, sel,
        off_blk)
    assert abs(float(loss_a) - float(loss_b)) < 3e-5, (float(loss_a),
                                                       float(loss_b))
    import jax
    flat_a = jax.tree_util.tree_leaves_with_path(p_a)
    flat_b = jax.tree_util.tree_leaves_with_path(p_b)
    for (path, a), (_, b) in zip(flat_a, flat_b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(a).max())
        assert np.abs(a - b).max() < 5e-5 * scale, (
            jax.tree_util.keystr(path), np.abs(a - b).max())
