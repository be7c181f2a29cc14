"""DirectMPIGO (NDC multiplane) model tests."""

import numpy as np
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
