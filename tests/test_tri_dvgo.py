"""Triplane-conditioned model + network-zoo tests."""

import numpy as np
import jax
import jax.numpy as jnp

from directvoxgo_tpu.models import nets
from directvoxgo_tpu.models.tri_dvgo import TriDVGO, anchor_poses


def make_model(**kw):
    defaults = dict(
        xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
        num_voxels=16 ** 3, num_voxels_base=16 ** 3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_width=16,
        n_feats=8, n_resblocks=2, map_width=16, k_density=32, k_color=16)
    defaults.update(kw)
    return TriDVGO(**defaults)


def _cond_inputs(H=16, W=16, seed=0):
    rng = np.random.default_rng(seed)
    rgb_lr = rng.uniform(0, 1, (3, H, W, 9)).astype(np.float32)
    pose_lr = anchor_poses() + rng.normal(scale=0.01, size=(3, 4, 4)) \
        .astype(np.float32)
    return jnp.asarray(rgb_lr), jnp.asarray(pose_lr)


def _rays(n):
    o = np.tile([[0.0, 0.0, 3.0]], (n, 1)).astype(np.float32)
    d = np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
    d[:, :2] *= 0.3
    d[:, 2] = -np.abs(d[:, 2]) - 1
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd)


RK = dict(near=0.5, far=8.0, bg=1.0, stepsize=0.5)


class TestTriDVGO:
    def test_encode_feat_shapes(self):
        model = make_model()
        rgb_lr, pose_lr = _cond_inputs()
        feats = model.encode_feat(model.params, rgb_lr, pose_lr)
        assert set(feats) == {"xy", "yz", "zx"}
        for p in feats.values():
            assert p.shape == (16, 16, 4)

    def test_forward_shapes(self):
        model = make_model()
        rgb_lr, pose_lr = _cond_inputs()
        o, d, vd = _rays(8)
        ret = model(rgb_lr, pose_lr, o, d, vd, render_depth=True, **RK)
        assert ret["rgb_marched"].shape == (8, 3)
        assert ret["depth"].shape == (8,)

    def test_sum_aggregation(self):
        model = make_model(tri_aggregation="sum")
        assert model.k0_dim == 4
        rgb_lr, pose_lr = _cond_inputs()
        o, d, vd = _rays(4)
        ret = model(rgb_lr, pose_lr, o, d, vd, **RK)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()

    def test_liif_path(self):
        model = make_model(liif=True, interp_width=16, interp_depth=3)
        rgb_lr, pose_lr = _cond_inputs()
        o, d, vd = _rays(4)
        ret = model(rgb_lr, pose_lr, o, d, vd, **RK)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()

    def test_liif_feat_unfold(self):
        """3x3 zero-padded unfold feeds the 9x-wide decoder
        (reference tri_dvgo.py:734-737); the flag used to shape-error."""
        model = make_model(liif=True, feat_unfold=True,
                           interp_width=16, interp_depth=3)
        rgb_lr, pose_lr = _cond_inputs()
        o, d, vd = _rays(4)
        ret = model(rgb_lr, pose_lr, o, d, vd, **RK)
        assert np.isfinite(np.asarray(ret["rgb_marched"])).all()

    def test_unfold_plane_layout(self):
        """c-outer channel order c*9 + (di*3+dj), zero padding — exactly
        F.unfold(feat, 3, padding=1).view(_, c*9, h, w)."""
        rng = np.random.default_rng(0)
        p = rng.normal(size=(5, 6, 2)).astype(np.float32)
        out = np.asarray(TriDVGO._unfold_plane_3x3(jnp.asarray(p)))
        assert out.shape == (5, 6, 18)
        u, v = 2, 3
        for c in range(2):
            for wi, (di, dj) in enumerate(
                    (i, j) for i in range(3) for j in range(3)):
                assert out[u, v, c * 9 + wi] == p[u + di - 1, v + dj - 1, c]
        # zero padding at the corner: the (-1,-1) neighbor of (0,0)
        assert out[0, 0, 0] == 0.0

    def test_conditioning_changes_color_not_geometry(self):
        model = make_model()
        model.params["density"] = jnp.full_like(model.params["density"], 5.0)
        o, d, vd = _rays(8)
        r1 = model(*_cond_inputs(seed=1), o, d, vd, **RK)
        r2 = model(*_cond_inputs(seed=2), o, d, vd, **RK)
        np.testing.assert_allclose(np.asarray(r1["alphainv_last"]),
                                   np.asarray(r2["alphainv_last"]), atol=1e-6)
        assert not np.allclose(np.asarray(r1["rgb_marched"]),
                               np.asarray(r2["rgb_marched"]), atol=1e-4)

    def test_gradients_flow_to_encoder(self):
        model = make_model()
        rgb_lr, pose_lr = _cond_inputs()
        o, d, vd = _rays(4)
        model.params["density"] = jnp.full_like(model.params["density"], 5.0)

        def loss(params):
            ret = model.forward(params, model.mask, rgb_lr, pose_lr,
                                o, d, vd, **RK)
            return jnp.mean(ret["rgb_marched"] ** 2)

        g = jax.grad(loss)(model.params)
        gsum = float(sum(jnp.sum(jnp.abs(x)) for x in
                         jax.tree_util.tree_leaves(g["encoder"])))
        assert gsum > 0


class TestNets:
    def test_nerf_mlp(self):
        p = nets.init_nerf_mlp(jax.random.PRNGKey(0), D=4, W=32,
                               input_ch=12, input_ch_views=6, skips=(1,))
        rgb, dens = nets.nerf_mlp_apply(p, jnp.ones((5, 12)),
                                        jnp.ones((5, 6)))
        assert rgb.shape == (5, 3) and dens.shape == (5, 1)

    def test_conv_mapping_pose_and_map_conditioning(self):
        p = nets.init_conv_mapping(jax.random.PRNGKey(0), in_dim=8 + 16,
                                   out_dim=4, n_resblocks=1)
        feat = jnp.ones((1, 8, 8, 8))
        pose = jnp.eye(4)[None]
        out = nets.conv_mapping_apply(p, feat, pose)
        assert out.shape == (1, 4, 4, 4)  # maxpooled by 2

    def test_nl_block_identity_at_init(self):
        p = nets.init_nl_block(jax.random.PRNGKey(0), 8, 1)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 8, 8, 8)).astype(np.float32))
        dens = jnp.ones((1, 8, 8, 1))
        out = nets.nl_block_apply(p, x, dens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_attention_shapes(self):
        p = nets.init_scaled_product_attention(jax.random.PRNGKey(0), 16)
        q = jnp.ones((1, 5, 16))
        kv = jnp.ones((3, 5, 16))
        out = nets.scaled_product_attention_apply(p, q, kv)
        assert out.shape == (1, 5, 16)

    def test_siren(self):
        p = nets.init_siren_rgb_net(jax.random.PRNGKey(0), 3, 8, 16)
        out = nets.siren_rgb_net_apply(p, jnp.ones((4, 8)))
        assert out.shape == (4, 3)

    def test_split_rgbnet(self):
        p = nets.init_split_rgbnet(jax.random.PRNGKey(0), 12, vox_dim=8,
                                   width=32)
        out = nets.split_rgbnet_apply(p, jnp.ones((4, 12)), jnp.ones((4, 8)))
        assert out.shape == (4, 3)

    def test_edsr_shapes(self):
        from directvoxgo_tpu.models import backbone
        params, apply_fn, out_dim = backbone.make_edsr_baseline(
            jax.random.PRNGKey(0), n_resblocks=2, n_feats=8, n_colors=9)
        out = apply_fn(params, jnp.ones((2, 12, 12, 9)))
        assert out.shape == (2, 12, 12, 8) and out_dim == 8

    def test_edsr_upsampling_tail(self):
        from directvoxgo_tpu.models import backbone
        params, apply_fn, out_dim = backbone.make_edsr_baseline(
            jax.random.PRNGKey(0), n_resblocks=1, n_feats=8, n_colors=3,
            no_upsampling=False, scale=2)
        out = apply_fn(params, jnp.ones((1, 6, 6, 3)))
        assert out.shape == (1, 12, 12, 3) and out_dim == 3

    def test_resnet_extractor(self):
        from directvoxgo_tpu.models import backbone
        p = backbone.init_resnet_extractor(jax.random.PRNGKey(0),
                                           width=16, n_blocks=1)
        out = backbone.resnet_extractor_apply(p, jnp.ones((1, 16, 16, 3)))
        assert out.shape == (1, 4, 4, 16)
