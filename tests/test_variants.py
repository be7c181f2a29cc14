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
