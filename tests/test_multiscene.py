"""DirectVoxGOMultiScene tests: scene isolation and per-scene surgery."""

import numpy as np
import jax.numpy as jnp

from directvoxgo_tpu.models.dvgo_multiscene import DirectVoxGOMultiScene


def make_model(n_scene=3, **kw):
    defaults = dict(
        xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
        num_voxels=16 ** 3, num_voxels_base=16 ** 3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=0, n_scene=n_scene)
    defaults.update(kw)
    return DirectVoxGOMultiScene(**defaults)


def _rays(n):
    o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    d = np.tile(np.array([[0.05, -0.05, -1.0]], np.float32), (n, 1))
    d += np.random.default_rng(0).normal(scale=0.05, size=d.shape) \
        .astype(np.float32)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd)


RK = dict(near=0.5, far=8.0, bg=1.0, stepsize=0.5)


class TestMultiScene:
    def test_scene_grids_are_independent(self):
        model = make_model(n_scene=2)
        # scene 0 opaque, scene 1 empty
        model.params["density"] = model.params["density"].at[0].set(100.0)
        model.params["density"] = model.params["density"].at[1].set(-100.0)
        o, d, vd = _rays(8)
        r0 = model(o, d, vd, scene_id=0, **RK)
        r1 = model(o, d, vd, scene_id=1, **RK)
        assert float(np.mean(np.asarray(r0["alphainv_last"]))) < 0.01
        np.testing.assert_allclose(np.asarray(r1["alphainv_last"]),
                                   np.ones(8), atol=1e-4)

    def test_coarse_k0_per_scene(self):
        model = make_model(n_scene=2)
        assert model.params["density"].shape[0] == 2
        assert model.params["k0"].shape[0] == 2
        assert model.mask.shape[0] == 2

    def test_fine_k0_shared(self):
        model = make_model(n_scene=2, rgbnet_dim=6, rgbnet_width=16)
        assert model.params["density"].shape[0] == 2
        assert model.params["k0"].ndim == 4  # shared, no scene axis
        assert "rgbnet" in model.params

    def test_per_scene_maskout(self):
        model = make_model(n_scene=2)
        model.maskout_near_cam_vox(np.zeros((1, 3), np.float32), near=0.5,
                                   scene_id=1)
        dens = np.asarray(model.params["density"])
        c = np.array(dens.shape[1:]) // 2
        assert dens[1, c[0], c[1], c[2]] == -100.0
        assert dens[0, c[0], c[1], c[2]] == 0.0

    def test_scale_volume_grid_all_scenes(self):
        model = make_model(n_scene=2)
        model.scale_volume_grid(32 ** 3)
        assert model.params["density"].shape[0] == 2
        assert model.params["density"].shape[1:] == model.world_size
        assert model.mask.shape == (2, *model.world_size)

    def test_scene_indexed_hit_coarse_geo(self):
        model = make_model(n_scene=2)
        mask = np.zeros((2, *model.world_size), bool)
        mask[0] = True  # scene 0 fully occupied, scene 1 empty
        model.mask = jnp.asarray(mask)
        ro = np.array([[3.0, 0.0, 0.0]], np.float32)
        rd = np.array([[-1.0, 0.0, 0.0]], np.float32)
        hit0 = model.hit_coarse_geo(ro, rd, scene_id=0, near=0.2, far=10.0,
                                    stepsize=0.5)
        hit1 = model.hit_coarse_geo(ro, rd, scene_id=1, near=0.2, far=10.0,
                                    stepsize=0.5)
        assert bool(hit0[0]) and not bool(hit1[0])

    def test_ckpt_kwargs_roundtrip(self):
        model = make_model(n_scene=2)
        kw = model.get_kwargs()
        assert kw["n_scene"] == 2
        model2 = DirectVoxGOMultiScene(**kw)
        assert model2.params["density"].shape == \
            model.params["density"].shape
