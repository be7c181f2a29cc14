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
