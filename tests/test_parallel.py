"""SPMD data-parallel tests (directvoxgo_tpu/parallel + engine wiring).

New capability over the single-GPU reference (SURVEY.md §2.2: no
torch.distributed / NCCL anywhere). Runs on the 8-virtual-CPU-device mesh
forced by conftest.py. The contract under test: sharding the per-step ray
batch over the 'data' mesh axis with everything else replicated computes the
SAME math as the single-device step — so parity is asserted numerically for
one full train step (forward_sweep + MaskedAdam, the shipping fast path) and
one render chunk, 1 device vs 8.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.config import ConfigDict
from directvoxgo_tpu.engine import render as render_lib
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.models.dvgo import DirectVoxGO
from directvoxgo_tpu.parallel import (make_mesh, replicate, shard_batch_tree,
                                      shard_rays)


N_RAYS = 128


def _model(query_mode="sweep"):
    return DirectVoxGO(
        xyz_min=[-1.0, -1.0, -1.0], xyz_max=[1.0, 1.0, 1.0],
        num_voxels=16 ** 3, num_voxels_base=16 ** 3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=6, rgbnet_direct=True,
        k_density=32, k_color=16, query_mode=query_mode)


def _rays(n=N_RAYS, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([[0.0, 0.0, 2.5]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0  # dominant axis z
    v = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(v)


def _cfg_train():
    return ConfigDict(
        N_rand=N_RAYS, weight_main=1.0, weight_entropy_last=0.001,
        weight_rgbper=0.01, weight_tv_density=0.0, weight_tv_k0=0.0,
        lrate_decay=20, lrate_density=1e-1, lrate_k0=1e-1,
        lrate_rgbnet=1e-3, skip_zero_grad_fields=["density", "k0"])


RK = dict(near=0.2, far=6.0, bg=1.0, stepsize=0.5)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8, (
        "conftest must force 8 virtual devices for SPMD tests")


@pytest.mark.parametrize("axis", [2, None])
def test_train_step_parity_1_vs_8_devices(axis):
    """One full engine train step: sharded == single-device, both paths
    (forward_sweep fast path and the gather fallback)."""
    model = _model()
    cfg_train = _cfg_train()
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    opt_state = optimizer.init(model.params)
    ro, rd, vd = _rays()
    pool = {"rgb": jnp.asarray(np.random.default_rng(1).uniform(
                0, 1, (N_RAYS, 3)).astype(np.float32)),
            "rays_o": ro, "rays_d": rd, "viewdirs": vd}
    sel = jnp.arange(N_RAYS, dtype=jnp.int32)
    if axis is not None:
        clip_sizes, clip_off = model.sweep_clip_for_axis(axis)
    else:
        clip_sizes, clip_off = None, np.zeros(3, np.int32)
    clip_off = jnp.asarray(clip_off)

    step1 = train_lib.make_train_step(
        model, optimizer, cfg_train, RK, apply_tv=False, tv_dense=False,
        axis=axis, clip_sizes=clip_sizes, mesh=None)
    p1, o1, loss1, psnr1 = step1(model.params, model.mask, opt_state,
                                 pool, sel, clip_off)

    mesh = make_mesh()
    step8 = train_lib.make_train_step(
        model, optimizer, cfg_train, RK, apply_tv=False, tv_dense=False,
        axis=axis, clip_sizes=clip_sizes, mesh=mesh)
    sel8 = jax.device_put(sel, shard_rays(mesh, ndim=1))
    pool8 = jax.device_put(pool, replicate(mesh))
    p8, o8, loss8, psnr8 = step8(model.params, model.mask, opt_state,
                                 pool8, sel8, clip_off)

    assert np.isfinite(float(loss8))
    assert abs(float(loss1) - float(loss8)) < 1e-5
    assert abs(float(psnr1) - float(psnr8)) < 1e-3
    # Tolerance: splitting the batch changes bf16-matmul accumulation order,
    # and Adam's 1/(sqrt(v)+eps) rescaling amplifies that on tiny grads —
    # observed max |diff| ~1e-4 at lr=0.1. A real sharding bug (dropped
    # shard, missing all-reduce) shifts updates at the lr scale, 1000x this.
    leaves1, tdef1 = jax.tree_util.tree_flatten(p1)
    leaves8, tdef8 = jax.tree_util.tree_flatten(p8)
    assert tdef1 == tdef8
    for i, (a, b) in enumerate(zip(leaves1, leaves8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-4,
                                   err_msg=f"leaf {i}")


def test_render_chunk_parity_1_vs_8_devices():
    model = _model()
    ro, rd, vd = _rays(seed=3)
    clip_sizes, clip_off = model.sweep_clip_for_axis(2)
    clip_off = jnp.asarray(clip_off)

    fn1 = render_lib.make_render_fn(model, RK, mesh=None)
    rgb1, dep1 = fn1(model.params, model.mask, ro, rd, vd, 2,
                     clip_sizes, clip_off)

    mesh = make_mesh()
    fn8 = render_lib.make_render_fn(model, RK, mesh=mesh)
    batch8 = shard_batch_tree(mesh, {"ro": ro, "rd": rd, "vd": vd})
    rgb8, dep8 = fn8(jax.device_put(model.params, replicate(mesh)),
                     jax.device_put(model.mask, replicate(mesh)),
                     batch8["ro"], batch8["rd"], batch8["vd"], 2,
                     clip_sizes, clip_off)

    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb8),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep8),
                               rtol=1e-5, atol=1e-6)


def test_dryrun_multichip_engine_path():
    """The driver-facing dryrun exercises the shipping fast path."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(len(jax.devices()))


def test_clip_step_plain_adam_full_moment_decay():
    """Clip boxes + plain Adam (coarse stage: skip_zero_grad_fields=[]):
    region-grad mode must NOT activate — plain Adam decays moments
    everywhere each step, so a box-limited update would diverge from
    reference semantics (and previously crashed on a moment/grad shape
    mismatch when the segment-window sampler introduced clip boxes to the
    coarse stage). The clipped step must run and match the unclipped step
    exactly (the sweep reads nothing outside the box)."""
    model = _model()
    cfg_train = _cfg_train()
    cfg_train.skip_zero_grad_fields = []  # coarse-stage optimizer semantics
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg_train)
    opt_state = optimizer.init(model.params)
    # Narrow fan straight down -z so the rays' v footprint (axis-2 sweep:
    # v = y) stays in the middle half of the grid — the W=8 window below
    # provably covers every sample.
    rng = np.random.default_rng(7)
    ro = jnp.asarray(np.tile([[0.0, 0.0, 2.5]], (N_RAYS, 1)).astype(
        np.float32))
    d = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d[:, :2] *= 0.05
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    rd = jnp.asarray(d)
    vd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    pool = {"rgb": jnp.asarray(np.random.default_rng(2).uniform(
                0, 1, (N_RAYS, 3)).astype(np.float32)),
            "rays_o": ro, "rays_d": rd, "viewdirs": vd}
    sel = jnp.arange(N_RAYS, dtype=jnp.int32)
    # window-as-clip in PERMUTED (p, u, v) order, as the engine draws it
    from directvoxgo_tpu.ops import sweep as sweep_ops
    perm = sweep_ops._PERMS[2]
    gp, gu, gv = (int(model.world_size[a]) for a in perm)
    clip_sizes = (gp, gu, gv // 2)
    clip_off = jnp.asarray([0, 0, gv // 4], jnp.int32)

    step_clip = train_lib.make_train_step(
        model, optimizer, cfg_train, RK, apply_tv=False, tv_dense=False,
        axis=2, clip_sizes=clip_sizes)
    p_c, o_c, loss_c, _ = step_clip(model.params, model.mask, opt_state,
                                    pool, sel, clip_off)

    step_full = train_lib.make_train_step(
        model, optimizer, cfg_train, RK, apply_tv=False, tv_dense=False,
        axis=2, clip_sizes=None)
    p_f, o_f, loss_f, _ = step_full(model.params, model.mask, opt_state,
                                    pool, sel, jnp.zeros(3, jnp.int32))

    assert abs(float(loss_c) - float(loss_f)) < 1e-6
    for n in ("density", "k0"):
        np.testing.assert_allclose(np.asarray(p_c[n]), np.asarray(p_f[n]),
                                   rtol=1e-4, atol=1e-6, err_msg=n)
        # moments must have decayed OUTSIDE the clip box too (plain Adam)
        m_c = np.asarray(o_c["exp_avg_sq"][n])
        m_f = np.asarray(o_f["exp_avg_sq"][n])
        np.testing.assert_allclose(m_c, m_f, rtol=1e-4, atol=1e-7,
                                   err_msg=f"{n} moments")
