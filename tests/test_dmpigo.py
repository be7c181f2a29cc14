"""DirectMPIGO (NDC multiplane) model tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.models.dmpigo import DirectMPIGO


def make_model(**kw):
    defaults = dict(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1],
        num_voxels=32 * 32 * 32, mpi_depth=32,
        fast_color_thres=1e-4, rgbnet_dim=0)
    defaults.update(kw)
    return DirectMPIGO(**defaults)


def _ndc_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-0.5, 0.5, n)
    o[:, 1] = rng.uniform(-0.5, 0.5, n)
    d = np.zeros((n, 3), np.float32)
    d[:, 0] = rng.uniform(-0.2, 0.2, n)
    d[:, 1] = rng.uniform(-0.2, 0.2, n)
    d[:, 2] = 1.0
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd)


RK = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0)


class TestDMPIGO:
    def test_density_init_uniform_stop_probability(self):
        model = make_model(mpi_depth=16, num_voxels=16 * 16 * 16)
        # alpha of each plane equals ~1/mpi_depth of *remaining* mass; the
        # rendered weights should be ~uniform across planes, last opaque.
        o, d, vd = _ndc_rays(16)
        ret = model(o, d, vd, **RK)
        w = np.asarray(ret["weights"])
        # all planes carry roughly equal weight ~1/16
        assert np.allclose(w.sum(-1), 1.0, atol=1e-3)  # opaque last plane
        mean_w = w.mean(0)
        assert mean_w.std() / mean_w.mean() < 0.2

    def test_background_when_empty(self):
        model = make_model()
        model.params["density"] = jnp.full_like(model.params["density"],
                                                -20.0)
        o, d, vd = _ndc_rays(8)
        ret = model(o, d, vd, **RK)
        np.testing.assert_allclose(np.asarray(ret["rgb_marched"]),
                                   np.ones((8, 3)), atol=1e-3)

    def test_fine_mlp_shapes(self):
        model = make_model(rgbnet_dim=6, rgbnet_width=32, viewbase_pe=4,
                           k_color=8)
        o, d, vd = _ndc_rays(8)
        ret = model(o, d, vd, render_depth=True, **RK)
        assert ret["rgb_marched"].shape == (8, 3)
        assert ret["raw_rgb"].shape[0] == 8 and ret["raw_rgb"].shape[1] == 8
        assert ret["depth"].shape == (8,)

    def test_scale_volume_grid(self):
        model = make_model(mpi_depth=16, num_voxels=16 ** 3)
        o, d, vd = _ndc_rays(8)
        before = np.asarray(model(o, d, vd, **RK)["rgb_marched"])
        model.scale_volume_grid(32 ** 3, 16)
        after = np.asarray(model(o, d, vd, **RK)["rgb_marched"])
        np.testing.assert_allclose(after, before, atol=0.05)

    def test_anisotropic_tv_weights(self):
        model = make_model()
        p = jnp.asarray(np.random.default_rng(0).normal(
            size=model.params["density"].shape).astype(np.float32))
        g = jnp.ones_like(p)
        out = model.density_total_variation_grad(p, g, 0.1, True)
        assert out.shape == p.shape
        assert np.isfinite(np.asarray(out)).all()


def _blob_model(rng, **kw):
    """DMPIGO with a smooth off-center density blob and random colors."""
    model = make_model(**kw)
    pts = np.asarray(model.grid_points())
    r2 = (((pts - np.array([0.2, -0.15, 0.45])) / 0.35) ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (10 * np.exp(-2 * r2) - 4).astype(np.float32))
    model.params["density"] = model.params["density"].at[..., -1].set(10.0)
    model.params["k0"] = jnp.asarray(rng.normal(
        0, 0.5, model.params["k0"].shape).astype(np.float32))
    return model


class TestDMPIGOSweep:
    """forward_sweep: the NDC sampler expressed as a z-station sweep
    (models/dmpigo.py forward_sweep; render_utils_kernel.cu:238-264)."""

    @pytest.mark.parametrize("stepsize,rgbnet_dim",
                             [(1.0, 0), (0.5, 0), (1.0, 6)])
    def test_sweep_matches_gather_forward(self, stepsize, rgbnet_dim):
        rng = np.random.default_rng(0)
        kw = dict(rgbnet_dim=rgbnet_dim)
        if rgbnet_dim:
            kw.update(rgbnet_width=32, viewbase_pe=4, k_color=0)
        model = _blob_model(rng, **kw)
        o, d, vd = _ndc_rays(128, seed=1)
        rk = dict(near=0.0, far=1.0, bg=1.0, stepsize=stepsize,
                  render_depth=True)
        ret_g = model.forward(model.params, model.mask, o, d, vd, **rk)
        ret_s = model.forward_sweep(model.params, model.mask, o, d, vd, 2,
                                    **rk)
        a = np.asarray(ret_g["rgb_marched"])
        b = np.asarray(ret_s["rgb_marched"])
        # Stations coincide EXACTLY with the reference sampler's points
        # (o_z == zmin, d_z == zmax-zmin for these rays), so only the
        # sweep's bf16 grid cast separates the two paths.
        assert np.abs(a - b).max() < 3e-2, np.abs(a - b).max()
        ai = np.abs(np.asarray(ret_g["alphainv_last"])
                    - np.asarray(ret_s["alphainv_last"]))
        assert ai.max() < 2e-2
        # depth is in sample-index units in both paths
        dg, ds = np.asarray(ret_g["depth"]), np.asarray(ret_s["depth"])
        assert np.abs(dg - ds).max() < 0.5

    def test_sweep_clip_equivalence(self):
        rng = np.random.default_rng(2)
        model = _blob_model(rng)
        # carve the mask to the blob so the clip actually shrinks
        model.mask = model.activate_density(model.params["density"]) > 1e-3
        clip_sizes, clip_off = model.sweep_clip_for_axis(2)
        o, d, vd = _ndc_rays(64, seed=3)
        rk = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0)
        full = model.forward_sweep(model.params, model.mask, o, d, vd, 2,
                                   **rk)
        clip = model.forward_sweep(model.params, model.mask, o, d, vd, 2,
                                   clip_sizes=clip_sizes,
                                   clip_offsets=jnp.asarray(clip_off), **rk)
        np.testing.assert_allclose(np.asarray(full["rgb_marched"]),
                                   np.asarray(clip["rgb_marched"]),
                                   atol=2e-3)

    def test_engine_routes_all_rays_to_z(self):
        assert DirectMPIGO.forced_sweep_axis == 2
        model = make_model()
        assert model.query_mode == "sweep"
        assert "query_mode" in model.get_kwargs()


def test_sweep_topk_compaction_parity():
    """sweep_color_topk must not change the MPI sweep's outputs or grads
    when the per-ray budget covers every above-threshold sample (reference
    fast_color_thres pruning, lib/dvgo.py:478-494 via the shared path)."""
    rng = np.random.default_rng(11)
    model = _blob_model(rng, mpi_depth=64, num_voxels=32 * 32 * 64,
                        rgbnet_dim=6, rgbnet_width=32, viewbase_pe=4,
                        k_color=0)
    model.mlp_dtype = jnp.float32  # isolate compaction from bf16 rounding
    # Sharpen the blob so above-threshold stations per ray stay < K=48
    # (the smooth _blob_model default spreads weight over ~100 stations,
    # where truncation is a real — and expected — deviation).
    pts = np.asarray(model.grid_points())
    r2 = (((pts - np.array([0.1, -0.1, 0.5])) / 0.18) ** 2).sum(-1)
    model.params["density"] = jnp.asarray(
        (40 * np.exp(-6 * r2) - 20).astype(np.float32))
    o, d, vd = _ndc_rays(48, seed=5)
    rk = dict(near=0.0, far=1.0, bg=1.0, stepsize=0.5, render_depth=True)
    target = jnp.asarray(rng.uniform(0, 1, (48, 3)).astype(np.float32))

    def run(topk):
        model.sweep_color_topk = topk

        def loss_fn(params):
            ret = model.forward_sweep(params, model.mask, o, d, vd, 2, **rk)
            return jnp.mean((ret["rgb_marched"] - target) ** 2), ret

        (loss, ret), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            model.params)
        return loss, ret, grads

    loss_d, ret_d, g_d = run(0)
    loss_c, ret_c, g_c = run(48)
    assert ret_c["weights"].shape[1] == 48
    assert ret_d["weights"].shape[1] > 96
    np.testing.assert_allclose(np.asarray(ret_c["rgb_marched"]),
                               np.asarray(ret_d["rgb_marched"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ret_c["depth"]),
                               np.asarray(ret_d["depth"]), atol=1e-2)
    for name in ("density", "k0", "rgbnet"):
        for a, b in zip(jax.tree_util.tree_leaves(g_d[name]),
                        jax.tree_util.tree_leaves(g_c[name])):
            scale = float(jnp.max(jnp.abs(a))) + 1e-12
            assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-3, name


def test_tv_step_windows_match_full(tmp_path):
    """A TV-applying train step drawn as a 2D (wu, wv) composed window must
    match the unwindowed step bit-for-tolerance: TV steps run with region
    mode OFF (full-size grads via the slice VJP), so dense AND sparse TV +
    full-grid Adam see identical gradients while the sweep stays windowed
    (engine/train.py next_chunk now windows TV steps — the LLFF schedule
    applies TV every step, reference run.py:389-395 / llff_default
    tv_before=1e9)."""
    from directvoxgo_tpu.engine import train as train_lib
    from directvoxgo_tpu.config import ConfigDict
    from directvoxgo_tpu.ops import sweep as sweep_ops

    model = make_model(num_voxels=48 * 48 * 32, mpi_depth=32, rgbnet_dim=6,
                       rgbnet_width=16)
    rng = np.random.default_rng(3)
    model.params["density"] = jnp.asarray(
        rng.normal(0, 1, model.params["density"].shape).astype(np.float32))
    model.update_occupancy_cache()
    n = 256
    # clustered tile -> a real (wu, wv) window forms
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(0.1, 0.4, n)
    o[:, 1] = rng.uniform(-0.4, -0.1, n)
    d = np.zeros((n, 3), np.float32)
    d[:, 0] = rng.uniform(-0.05, 0.05, n)
    d[:, 1] = rng.uniform(-0.05, 0.05, n)
    d[:, 2] = 1.0
    vd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    pool = {"rgb": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
            "rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
            "viewdirs": jnp.asarray(vd)}
    cfg = ConfigDict(N_rand=n, weight_main=1.0, weight_entropy_last=0.001,
                     weight_rgbper=0.01, weight_tv_density=1e-5,
                     weight_tv_k0=1e-5, lrate_decay=20, lrate_density=1e-1,
                     lrate_k0=1e-1, lrate_rgbnet=1e-3,
                     skip_zero_grad_fields=["density", "k0"])
    optimizer = train_lib.create_optimizer_or_freeze_model(model, cfg)
    opt0 = optimizer.init(model.params)
    ax = 2
    bk = sweep_ops.build_ray_segments_2d(
        o, d, model.xyz_min, model.xyz_max, model.world_size, ax,
        n_rand=n, widths=(16, 24, 32), max_classes=4)
    wuv = next(k for k in bk if k != (0, 0))
    idx, ulo, vlo = bk[wuv]
    perm = sweep_ops._PERMS[ax]
    gp, gu, gv = (int(model.world_size[a]) for a in perm)
    wu = wuv[0] if 0 < wuv[0] < gu else gu
    wv_ = wuv[1] if 0 < wuv[1] < gv else gv
    sel = jnp.asarray(idx[0].astype(np.int32))
    off = jnp.asarray([0, min(int(ulo[0]), gu - wu),
                       min(int(vlo[0]), gv - wv_)], jnp.int32)
    for tv_dense in (True, False):
        step_w = train_lib.make_train_step(
            model, optimizer, cfg, RK, apply_tv=True, tv_dense=tv_dense,
            axis=ax, clip_sizes=(gp, wu, wv_))
        step_f = train_lib.make_train_step(
            model, optimizer, cfg, RK, apply_tv=True, tv_dense=tv_dense,
            axis=ax, clip_sizes=None)
        pw, ow, lw, _ = step_w(model.params, model.mask, opt0, pool, sel,
                               off)
        pf, of_, lf, _ = step_f(model.params, model.mask, opt0, pool, sel,
                                jnp.zeros(3, jnp.int32))
        assert abs(float(lw) - float(lf)) < 1e-6 * max(1.0, abs(float(lf)))
        # Raw gradients agree to f32 reduction noise (probed 4.7e-10 max;
        # the MSE term alone is bit-identical), but first-step Adam
        # normalizes by sqrt(g^2), which amplifies that noise to ~lr scale
        # at near-zero-grad voxels — same bound family as
        # tests/test_parallel.py's one-step atol.
        for k in pw:
            dmax = float(jnp.max(jnp.abs(
                jnp.asarray(pw[k], jnp.float32)
                - jnp.asarray(pf[k], jnp.float32)))) \
                if not isinstance(pw[k], dict) else max(
                    float(jnp.max(jnp.abs(a - b))) for a, b in zip(
                        jax.tree_util.tree_leaves(pw[k]),
                        jax.tree_util.tree_leaves(pf[k])))
            assert dmax < 5e-4, f"tv_dense={tv_dense} param {k}: {dmax}"
