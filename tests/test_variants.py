"""Tests for the conditioned model variants: SR, implicit multiscene, and
triplane multiscene with aux losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.models.sr_dvgo import SRDVGO
from directvoxgo_tpu.models.multiscene_dvgo import MultiSceneImplicitDVGO
from directvoxgo_tpu.models.tri_dvgo_multiscene import (TriDVGOMultiScene,
                                                        affine_warp)
from directvoxgo_tpu.models.tri_dvgo import anchor_poses


def _rays(n, seed=0):
    o = np.tile([[0.0, 0.0, 3.0]], (n, 1)).astype(np.float32)
    d = np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32)
    d[:, :2] *= 0.3
    d[:, 2] = -np.abs(d[:, 2]) - 1
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd)


RK = dict(near=0.5, far=8.0, bg=1.0, stepsize=0.5)
BASE = dict(xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1], num_voxels=16 ** 3,
            num_voxels_base=16 ** 3, alpha_init=1e-2, fast_color_thres=1e-4)


class TestSRDVGO:
    def test_forward(self):
        model = SRDVGO(**BASE, rgbnet_dim=4, rgbnet_width=16, n_feats=8,
                       n_resblocks=2, k_density=32, k_color=16,
                       rgbnet_direct=True)
        rgb_lr = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (1, 16, 16, 3)).astype(np.float32))
        o, d, vd = _rays(8)
        ret = model(rgb_lr, o, d, vd, render_depth=True, **RK)
        assert ret["rgb_marched"].shape == (8, 3)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()

    def test_conditioning_affects_color(self):
        model = SRDVGO(**BASE, rgbnet_dim=4, rgbnet_width=16, n_feats=8,
                       n_resblocks=2, rgbnet_direct=True)
        model.params["density"] = jnp.full_like(model.params["density"], 5.0)
        o, d, vd = _rays(8)
        rng = np.random.default_rng(0)
        im1 = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3))
                          .astype(np.float32))
        im2 = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3))
                          .astype(np.float32))
        r1 = model(im1, o, d, vd, **RK)
        r2 = model(im2, o, d, vd, **RK)
        assert not np.allclose(np.asarray(r1["rgb_marched"]),
                               np.asarray(r2["rgb_marched"]), atol=1e-5)


class TestImplicitMultiscene:
    def test_forward_no_density_grid(self):
        model = MultiSceneImplicitDVGO(
            **BASE, rgbnet_dim=4, rgbnet_depth=3, rgbnet_width=32,
            n_feats=8, n_resblocks=2, map_width=16, k_density=32)
        assert "density" not in model.params
        assert model.act_shift == -1.0
        rgb_lr = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (3, 16, 16, 9)).astype(np.float32))
        pose_lr = jnp.asarray(anchor_poses())
        o, d, vd = _rays(8)
        ret = model(rgb_lr, pose_lr, o, d, vd, **RK)
        assert ret["rgb_marched"].shape == (8, 3)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()


class TestAffineWarp:
    def test_identity_theta(self):
        rng = np.random.default_rng(0)
        feat = jnp.asarray(rng.normal(size=(8, 8, 2)).astype(np.float32))
        theta = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        out = affine_warp(feat, theta)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feat),
                                   atol=1e-5)


class TestTriMultiScene:
    def _model(self, **kw):
        defaults = dict(**BASE, n_scene=2, rgbnet_dim=4, rgbnet_width=16,
                        n_feats=8, n_resblocks=2, map_width=16,
                        k_density=32, k_color=16)
        defaults.update(kw)
        return TriDVGOMultiScene(**defaults)

    def _inputs(self):
        rng = np.random.default_rng(0)
        rgb_lr = jnp.asarray(rng.uniform(0, 1, (3, 16, 16, 9))
                             .astype(np.float32))
        pose_lr = jnp.asarray(anchor_poses())
        return rgb_lr, pose_lr

    def test_forward_returns_aux_losses(self):
        model = self._model(compute_consistency=True, compute_cosine=True)
        rgb_lr, pose_lr = self._inputs()
        o, d, vd = _rays(4)
        ret, cons, cos, dist = model(rgb_lr, pose_lr, o, d, vd,
                                     scene_id=1, **RK)
        assert ret["rgb_marched"].shape == (4, 3)
        assert float(cons) >= 0 and np.isfinite(float(cons))
        assert np.isfinite(float(cos))
        assert float(dist) == 0.0

    def test_scene_density_isolated(self):
        model = self._model()
        model.params["density"] = model.params["density"].at[0].set(100.0)
        model.params["density"] = model.params["density"].at[1].set(-100.0)
        rgb_lr, pose_lr = self._inputs()
        o, d, vd = _rays(4)
        r0, *_ = model(rgb_lr, pose_lr, o, d, vd, scene_id=0, **RK)
        r1, *_ = model(rgb_lr, pose_lr, o, d, vd, scene_id=1, **RK)
        assert float(np.mean(np.asarray(r0["alphainv_last"]))) < 0.01
        assert float(np.mean(np.asarray(r1["alphainv_last"]))) > 0.99

    def test_closed_map_mode(self):
        model = self._model(mlp_map=False, closed_map=True)
        rgb_lr, pose_lr = self._inputs()
        o, d, vd = _rays(4)
        ret, *_ = model(rgb_lr, pose_lr, o, d, vd, scene_id=0, **RK)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()

    def test_conv_map_mode(self):
        model = self._model(mlp_map=False, conv_map=True)
        rgb_lr, pose_lr = self._inputs()
        o, d, vd = _rays(4)
        ret, *_ = model(rgb_lr, pose_lr, o, d, vd, scene_id=0, **RK)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()

    def test_nl_attention_mode(self):
        model = self._model(mlp_map=False, use_nl=True)
        rgb_lr, pose_lr = self._inputs()
        o, d, vd = _rays(4)
        ret, *_ = model(rgb_lr, pose_lr, o, d, vd, scene_id=0, **RK)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()

    def test_distillation_hook(self):
        model = self._model()
        rgb_lr, pose_lr = self._inputs()
        o, d, vd = _rays(4)

        def teacher(rgb, pose):
            return {k: jnp.zeros((16, 16, 4)) for k in ("xy", "yz", "zx")}

        ret, cons, cos, dist = model(rgb_lr, pose_lr, o, d, vd, scene_id=0,
                                     teacher_apply=teacher, **RK)
        assert float(dist) > 0

    def test_anchor_liif_distillation(self):
        """The in-model anchor-LIIF teacher (tri_dvgo_multiscene.py:314-322,
        769-775): forward returns a nonzero distillation loss, and a
        positive weight_distillation changes the interp-net gradients."""
        model = self._model(liif=True, use_anchor_liif=True)
        assert "anchor_liif" in model.params
        assert "distillation_head" in model.params
        # teacher resolution must not touch geometry: make rays hit content
        model.params["density"] = model.params["density"].at[0].set(5.0)
        rgb_lr, pose_lr = self._inputs()
        o, d, vd = _rays(4)
        ret, cons, cos, dist = model(rgb_lr, pose_lr, o, d, vd, scene_id=0,
                                     **RK)
        assert np.isfinite(float(dist)) and float(dist) > 0

        def loss(interp, w_dist):
            p = dict(model.params)
            p["interp_xy"] = interp
            ret, _, _, dist = model.forward(
                p, model.mask, rgb_lr, pose_lr, o, d, vd, scene_id=0, **RK)
            mse = jnp.mean((ret["rgb_marched"] - 0.5) ** 2)
            return mse + w_dist * dist

        g0 = jax.grad(loss)(model.params["interp_xy"], 0.0)
        g1 = jax.grad(loss)(model.params["interp_xy"], 1.0)
        d0 = np.asarray(g0["layers"][0]["w"])
        d1 = np.asarray(g1["layers"][0]["w"])
        assert not np.allclose(d0, d1, atol=1e-8)

    def test_anchor_liif_requires_liif(self):
        with pytest.raises(ValueError):
            self._model(liif=False, use_anchor_liif=True)

    def test_liif_sd_import(self, tmp_path):
        """load_liif_state_dict maps a torch LIIF checkpoint
        (imnet.layers.{0,2,4,6}) into our Interp_MLP layer convention."""
        torch = pytest.importorskip("torch")
        from directvoxgo_tpu.models import nets
        in_dim = 4 + 2 + 2  # rgbnet_dim + rel_coord + rel_cell
        width = 16
        sd = {}
        gen = np.random.default_rng(0)
        dims = [(in_dim, width), (width, width), (width, width),
                (width, width)]
        for i, (a, b) in zip((0, 2, 4, 6), dims):
            sd[f"imnet.layers.{i}.weight"] = torch.tensor(
                gen.normal(size=(b, a)).astype(np.float32))
            sd[f"imnet.layers.{i}.bias"] = torch.tensor(
                gen.normal(size=(b,)).astype(np.float32))
        path = str(tmp_path / "liif.pth")
        torch.save({"model": {"sd": sd}}, path)

        layers = nets.load_liif_state_dict(path)
        assert layers[0]["w"].shape == (in_dim, width)
        np.testing.assert_allclose(
            np.asarray(layers[1]["w"]),
            sd["imnet.layers.2.weight"].numpy().T)

        model = self._model(liif=True, use_anchor_liif=True,
                            interp_width=width, interp_depth=5,
                            liif_state_dict=path, load_liif_sd=True)
        np.testing.assert_allclose(
            np.asarray(model.params["interp_xy"]["layers"][0]["w"]),
            sd["imnet.layers.0.weight"].numpy().T)
        np.testing.assert_allclose(
            np.asarray(model.params["anchor_liif"]["layers"][3]["w"]),
            sd["imnet.layers.6.weight"].numpy().T)

    def test_weight_distillation_without_teacher_raises(self):
        from directvoxgo_tpu.engine import train_conditioned as cond_lib

        class Args:
            seed = 0

        class CfgTrain(dict):
            __getattr__ = dict.get
        model = self._model()
        with pytest.raises(ValueError, match="anchor-LIIF"):
            cond_lib.train_conditioned_stage(
                Args(), None, CfgTrain(N_rand=4, N_iters=0), model, None,
                None, [None], None, {}, "fine", start=1,
                aux_weights={"weight_distillation": 0.5}, multiscene=True)
