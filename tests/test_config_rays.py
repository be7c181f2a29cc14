"""Config loader and ray-generation tests."""

import os
import textwrap

import numpy as np

from directvoxgo_tpu.config import Config
from directvoxgo_tpu import rays as ray_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfig:
    def test_base_inheritance_and_merge(self, tmp_path):
        (tmp_path / "base.py").write_text(textwrap.dedent("""
            expname = 'base'
            data = {'a': 1, 'b': 2}
            train = {'iters': 100}
        """))
        (tmp_path / "child.py").write_text(textwrap.dedent("""
            _base_ = 'base.py'
            expname = 'child'
            data = {'b': 3, 'c': 4}
        """))
        cfg = Config.fromfile(str(tmp_path / "child.py"))
        assert cfg.expname == "child"
        assert cfg.data.a == 1 and cfg.data.b == 3 and cfg.data.c == 4
        assert cfg.train.iters == 100

    def test_default_config_schema(self):
        cfg = Config.fromfile(os.path.join(REPO, "configs", "default.py"))
        assert cfg.coarse_train.N_iters == 5000
        assert cfg.fine_train.ray_sampler == "in_maskcache"
        assert cfg.fine_model_and_render.num_voxels == 160 ** 3
        assert cfg.fine_train.pg_scale == [1000, 2000, 3000, 4000]
        assert "density" in cfg.fine_train.skip_zero_grad_fields

    def test_lego_config(self):
        cfg = Config.fromfile(os.path.join(REPO, "configs", "nerf",
                                           "lego.py"))
        assert cfg.data.dataset_type == "blender"
        assert cfg.data.white_bkgd is True
        assert cfg.fine_train.N_iters == 15000
        # inherited fields survive the override
        assert cfg.fine_train.pg_scale == [1000, 2000, 3000, 4000]

    def test_dump_roundtrip(self, tmp_path):
        cfg = Config.fromfile(os.path.join(REPO, "configs", "default.py"))
        cfg.dump(str(tmp_path / "dumped.py"))
        cfg2 = Config.fromfile(str(tmp_path / "dumped.py"))
        assert cfg2.fine_train.N_iters == cfg.fine_train.N_iters


class TestRays:
    def test_center_ray_points_down_optical_axis(self):
        H = W = 9
        K = np.array([[10.0, 0, 4.5], [0, 10.0, 4.5], [0, 0, 1]])
        c2w = np.eye(4)[:3]
        rays_o, rays_d = ray_lib.get_rays(H, W, K, c2w, inverse_y=False,
                                          flip_x=False, flip_y=False)
        # center pixel (4,4) at +0.5 offset -> exactly principal point
        np.testing.assert_allclose(rays_d[4, 4], [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(rays_o[0, 0], [0, 0, 0], atol=1e-6)

    def test_inverse_y_convention(self):
        H = W = 5
        K = np.array([[5.0, 0, 2.5], [0, 5.0, 2.5], [0, 0, 1]])
        c2w = np.eye(4)[:3]
        _, d1 = ray_lib.get_rays(H, W, K, c2w, inverse_y=True,
                                 flip_x=False, flip_y=False)
        np.testing.assert_allclose(d1[2, 2], [0, 0, 1], atol=1e-6)

    def test_c2w_rotation_applied(self):
        H = W = 3
        K = np.array([[3.0, 0, 1.5], [0, 3.0, 1.5], [0, 0, 1]])
        # rotate camera 180deg around y: -z -> +z
        c2w = np.array([[-1.0, 0, 0, 1.0], [0, 1, 0, 2.0], [0, 0, -1, 3.0]])
        rays_o, rays_d = ray_lib.get_rays(H, W, K, c2w, inverse_y=False,
                                          flip_x=False, flip_y=False)
        np.testing.assert_allclose(rays_d[1, 1], [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(rays_o[1, 1], [1, 2, 3], atol=1e-6)

    def test_viewdirs_unit_norm(self):
        H, W = 4, 6
        K = np.array([[5.0, 0, 3.0], [0, 5.0, 2.0], [0, 0, 1]])
        c2w = np.eye(4)[:3]
        _, _, vd = ray_lib.get_rays_of_a_view(H, W, K, c2w, ndc=False,
                                              inverse_y=False, flip_x=False,
                                              flip_y=False)
        np.testing.assert_allclose(np.linalg.norm(vd, axis=-1),
                                   np.ones((H, W)), atol=1e-6)

    def test_ndc_rays_near_plane_origin(self):
        H = W = 8
        K = np.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
        c2w = np.eye(4)[:3]
        ro, rd, _ = ray_lib.get_rays_of_a_view(H, W, K, c2w, ndc=True,
                                               inverse_y=False, flip_x=False,
                                               flip_y=False)
        # NDC origins lie on the z=? plane with o2 = 1 + 2*near/oz; oz=-1 ->
        # o2 = -1 (all origins at the near plane in NDC z)
        np.testing.assert_allclose(ro[..., 2], -np.ones((H, W)), atol=1e-5)

    def test_batch_indices_generator_shapes_and_range(self):
        # Note the generator drops the tail of each permutation when
        # N % BS != 0 (reference semantics, lib/ray_utils.py:283-290), so
        # full coverage per epoch is NOT guaranteed — only over many draws.
        gen = ray_lib.batch_indices_generator(10, 3,
                                              np.random.default_rng(0))
        seen = set()
        for _ in range(40):
            batch = next(gen)
            assert len(batch) == 3
            assert all(0 <= int(b) < 10 for b in batch)
            seen.update(int(b) for b in batch)
        assert seen == set(range(10))


def test_device_ray_gen_matches_host():
    """engine/train._rays_of_view_device (on-device flatten-pool regen)
    must match rays.get_rays_of_a_view to float noise, both pinhole and
    NDC, both intrinsic conventions — the host copies drive the segment
    sorts while the device copies feed the sweep, and the builders'
    SEG_GUARD only absorbs last-ulp skew."""
    import jax.numpy as jnp
    from directvoxgo_tpu.engine.train import _rays_of_view_device
    from directvoxgo_tpu import rays as ray_lib

    H, W = 60, 80
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    rng = np.random.default_rng(5)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:, 3] = [0.2, -0.1, 0.05]
    for ndc in (False, True):
        for inverse_y in (False, True):
            ro_h, rd_h, vd_h = ray_lib.get_rays_of_a_view(
                H, W, K, c2w, ndc=ndc, inverse_y=inverse_y,
                flip_x=False, flip_y=False)
            ro_d, rd_d, vd_d = _rays_of_view_device(
                jnp.asarray(K), jnp.asarray(c2w), h=H, w=W, ndc=ndc,
                inverse_y=inverse_y, flip_x=False, flip_y=False)
            for hst, dev in ((ro_h, ro_d), (rd_h, rd_d), (vd_h, vd_d)):
                d = np.abs(np.asarray(hst).reshape(-1, 3)
                           - np.asarray(dev)).max()
                assert d < 1e-4, f"ndc={ndc} inverse_y={inverse_y}: {d}"
