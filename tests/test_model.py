"""DirectVoxGO model-level tests: construction, forward contract, occupancy
masking, progressive scaling, and a quick single-batch overfit check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.models.dvgo import DirectVoxGO


def make_model(**kw):
    defaults = dict(
        xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
        num_voxels=32 ** 3, num_voxels_base=32 ** 3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=0)
    defaults.update(kw)
    return DirectVoxGO(**defaults)


def _rand_rays(n, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, :2] *= spread
    d[:, 2] = -np.abs(d[:, 2]) - 1.0  # point roughly at the box
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd)


RK = dict(near=0.5, far=8.0, bg=1.0, stepsize=0.5)


class TestForwardContract:
    def test_coarse_output_shapes(self):
        model = make_model()
        o, d, vd = _rand_rays(16)
        ret = model(o, d, vd, render_depth=True, **RK)
        assert ret["rgb_marched"].shape == (16, 3)
        assert ret["alphainv_last"].shape == (16,)
        assert ret["depth"].shape == (16,)
        assert ret["weights"].ndim == 2 and ret["weights"].shape[0] == 16

    def test_fine_output_shapes_with_mlp(self):
        model = make_model(rgbnet_dim=6, rgbnet_depth=3, rgbnet_width=32,
                           k_color=24)
        o, d, vd = _rand_rays(8)
        ret = model(o, d, vd, **RK)
        assert ret["rgb_marched"].shape == (8, 3)
        assert ret["raw_rgb"].shape == (8, 24, 3)

    def test_empty_grid_returns_background(self):
        model = make_model()  # zero density, alpha_init=1e-2 -> tiny alpha
        model.params["density"] = jnp.full_like(model.params["density"],
                                                -100.0)
        o, d, vd = _rand_rays(8)
        ret = model(o, d, vd, **RK)
        np.testing.assert_allclose(np.asarray(ret["rgb_marched"]),
                                   np.ones((8, 3)), atol=1e-3)
        np.testing.assert_allclose(np.asarray(ret["alphainv_last"]),
                                   np.ones(8), atol=1e-4)

    def test_opaque_grid_ignores_background(self):
        model = make_model()
        model.params["density"] = jnp.full_like(model.params["density"], 100.0)
        # low spread: every ray must actually hit the box, else it returns bg
        o, d, vd = _rand_rays(8, spread=0.1)
        ret_white = model(o, d, vd, **RK)
        ret_black = model(o, d, vd, **{**RK, "bg": 0.0})
        np.testing.assert_allclose(np.asarray(ret_white["rgb_marched"]),
                                   np.asarray(ret_black["rgb_marched"]),
                                   atol=1e-3)

    def test_mask_cache_blocks_everything(self):
        model = make_model()
        model.params["density"] = jnp.full_like(model.params["density"], 100.0)
        model.mask = jnp.zeros_like(model.mask)
        o, d, vd = _rand_rays(8)
        ret = model(o, d, vd, **RK)
        np.testing.assert_allclose(np.asarray(ret["alphainv_last"]),
                                   np.ones(8), atol=1e-5)

    def test_compaction_capacity_does_not_change_result(self):
        """With ample capacity, compacted and dense paths must agree."""
        rng = np.random.default_rng(0)
        dense_model = make_model(rgbnet_dim=6, rgbnet_width=16, k_color=0,
                                 k_density=None, seed=3)
        noise = rng.normal(size=dense_model.params["density"].shape) * 2
        dense_model.params["density"] = jnp.asarray(
            noise.astype(np.float32))
        compact_model = make_model(rgbnet_dim=6, rgbnet_width=16,
                                   k_color=64, k_density=96, seed=3)
        compact_model.params = dense_model.params
        o, d, vd = _rand_rays(8)
        r1 = dense_model(o, d, vd, **RK)
        r2 = compact_model(o, d, vd, **RK)
        np.testing.assert_allclose(np.asarray(r1["rgb_marched"]),
                                   np.asarray(r2["rgb_marched"]), atol=2e-3)


class TestStateSurgery:
    def test_scale_volume_grid_preserves_field(self):
        model = make_model()
        rng = np.random.default_rng(0)
        model.params["density"] = jnp.asarray(
            rng.normal(size=model.params["density"].shape).astype(np.float32))
        o, d, vd = _rand_rays(8)
        before = np.asarray(model(o, d, vd, **RK)["rgb_marched"])
        model.scale_volume_grid(model.num_voxels * 8)  # 2x per axis
        after = np.asarray(model(o, d, vd, **RK)["rgb_marched"])
        # trilinear upsample preserves the interpolant closely
        np.testing.assert_allclose(after, before, atol=0.06)

    def test_maskout_near_cam_vox(self):
        model = make_model()
        cam_o = np.array([[0.0, 0.0, 0.0]], np.float32)
        model.maskout_near_cam_vox(cam_o, near=0.5)
        dens = np.asarray(model.params["density"])
        center = np.array(dens.shape) // 2
        assert dens[tuple(center)] == -100.0
        assert dens[0, 0, 0] == 0.0

    def test_update_occupancy_cache_clears_empty(self):
        model = make_model()
        model.params["density"] = jnp.full_like(model.params["density"],
                                                -100.0)
        model.update_occupancy_cache()
        assert not bool(np.asarray(model.mask).any())

    def test_hit_coarse_geo(self):
        model = make_model()
        # occupy only the +x half
        mask = np.zeros(model.world_size, bool)
        mask[model.world_size[0] // 2:] = True
        model.mask = jnp.asarray(mask)
        rays_o = np.array([[3.0, 0.6, 0.6], [-3.0, -0.6, -0.6]], np.float32)
        rays_d = np.array([[-1.0, 0, 0], [1.0, 0, 0]], np.float32)
        hit = model.hit_coarse_geo(rays_o, rays_d, near=0.2, far=10.0,
                                   stepsize=0.5)
        assert bool(hit[0]) and bool(hit[1])
        rays_o2 = np.array([[-3.0, -0.6, -0.6]], np.float32)
        rays_d2 = np.array([[0.0, 0.0, 1.0]], np.float32)  # misses the box
        hit2 = model.hit_coarse_geo(rays_o2, rays_d2, near=0.2, far=10.0,
                                    stepsize=0.5)
        assert not bool(hit2[0])


class TestOverfit:
    def test_single_batch_adam_reduces_loss(self):
        """Overfit one ray batch with MaskedAdam (the reference's coarse
        recipe: density/k0 at lr 1e-1), loss must drop substantially."""
        from directvoxgo_tpu.optim import MaskedAdam

        model = make_model(num_voxels=16 ** 3, num_voxels_base=16 ** 3,
                           alpha_init=1e-2)
        o, d, vd = _rand_rays(64, spread=0.3)
        target = jnp.asarray(
            np.random.default_rng(0).uniform(0.2, 0.8, (64, 3))
            .astype(np.float32))
        opt = MaskedAdam({"density": {"lr": 0.1}, "k0": {"lr": 0.1}})
        opt_state = opt.init(model.params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(params):
                ret = model.forward(params, model.mask, o, d, vd, **RK)
                return jnp.mean((ret["rgb_marched"] - target) ** 2)
            loss, g = jax.value_and_grad(loss_fn)(params)
            params, opt_state = opt.update(params, g, opt_state)
            return params, opt_state, loss

        params = model.params
        losses = []
        for _ in range(60):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, losses[::10]


class TestImplicitVoxelFeat:
    """Grid-LIIF color (lib/dvgo.py:329-410, 502-551)."""

    def _model(self, **kw):
        from directvoxgo_tpu.models.dvgo import DirectVoxGO
        return DirectVoxGO(
            xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
            num_voxels=16 ** 3, num_voxels_base=16 ** 3, alpha_init=1e-2,
            fast_color_thres=1e-4, rgbnet_dim=6, rgbnet_direct=True,
            rgbnet_width=32, k_density=32, k_color=16,
            implicit_voxel_feat=True, **kw)

    @pytest.mark.parametrize("feat_unfold,cell_decode",
                             [(False, True), (True, False), (True, True)])
    def test_forward_and_grads(self, feat_unfold, cell_decode):
        model = self._model(feat_unfold=feat_unfold, cell_decode=cell_decode)
        assert model.query_mode == "gather"  # sweep path doesn't implement it
        rng = np.random.default_rng(0)
        model.params["k0"] = jnp.asarray(rng.normal(
            0, 0.3, model.params["k0"].shape).astype(np.float32))
        model.params["density"] = jnp.asarray(rng.normal(
            0, 2.0, model.params["density"].shape).astype(np.float32))
        n = 32
        o = np.tile([[0.0, 0.0, 2.5]], (n, 1)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d[:, 2] = -np.abs(d[:, 2]) - 1
        vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
        kw = dict(near=0.2, far=6.0, bg=1.0, stepsize=0.5)

        def loss(p):
            r = model.forward(p, model.mask, jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(vd), **kw)
            return jnp.mean(r["rgb_marched"] ** 2)
        l, g = jax.jit(jax.value_and_grad(loss))(model.params)
        assert np.isfinite(float(l))
        for leaf in jax.tree_util.tree_leaves(g):
            assert bool(jnp.isfinite(leaf).all())

    def test_volume_weights_sum_to_one(self):
        model = self._model()
        rng = np.random.default_rng(1)
        model.params["k0"] = jnp.asarray(rng.normal(
            0, 0.3, model.params["k0"].shape).astype(np.float32))
        px = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 8)).astype(np.float32))
        py = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 8)).astype(np.float32))
        pz = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 8)).astype(np.float32))
        vd_emb = jnp.zeros((4, 8, 3 + 3 * model.viewbase_pe * 2))
        rgb = model._implicit_color(
            model.params["k0"], model.params["rgbnet"], px, py, pz, vd_emb,
            0.5, (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
        r = np.asarray(rgb)
        assert r.shape == (4, 8, 3)
        assert (r >= 0).all() and (r <= 1).all()  # convex blend of sigmoids

    def test_unfold_grid_layout(self):
        """Position-outer channel order (di*9+dj*3+dk)*C + c, replicate
        padding (reference unfold_feat, lib/dvgo.py:186-198)."""
        from directvoxgo_tpu.models.dvgo import DirectVoxGO
        rng = np.random.default_rng(2)
        g = rng.normal(size=(4, 5, 6, 2)).astype(np.float32)
        out = np.asarray(DirectVoxGO._unfold_grid_3x3x3(jnp.asarray(g)))
        assert out.shape == (4, 5, 6, 2 * 27)
        # interior voxel: window position (di,dj,dk) block holds the
        # (x+di-1, y+dj-1, z+dk-1) neighbor
        x, y, z = 2, 2, 3
        for wi, (di, dj, dk) in enumerate(
                (i, j, k) for i in range(3) for j in range(3)
                for k in range(3)):
            np.testing.assert_array_equal(
                out[x, y, z, wi * 2:(wi + 1) * 2],
                g[x + di - 1, y + dj - 1, z + dk - 1])
        # replicate padding at the corner
        np.testing.assert_array_equal(out[0, 0, 0, :2], g[0, 0, 0])


def test_hit_coarse_geo_view_matches_ray_form():
    """Device-side view hit query (rays built on-device from K/c2w) must
    agree with the host-ray form — same sample math, only where the ray
    arithmetic runs differs (f32 either way; no matmul rounding)."""
    from directvoxgo_tpu.models.dvgo import DirectVoxGO
    from directvoxgo_tpu import rays as ray_lib

    model = DirectVoxGO(
        xyz_min=[-1.0, -1.0, -1.0], xyz_max=[1.0, 1.0, 1.0],
        num_voxels=32 ** 3, num_voxels_base=32 ** 3, alpha_init=1e-2,
        rgbnet_dim=0)
    rng = np.random.default_rng(3)
    m = np.zeros((32, 32, 32), bool)
    m[8:20, 10:26, 6:18] = rng.uniform(size=(12, 16, 12)) > 0.6
    model.mask = jnp.asarray(m)

    H = W = 48
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                 np.float32)
    from directvoxgo_tpu.data.load_blender import pose_spherical
    for ang, iy in ((30.0, False), (120.0, True)):
        c2w = np.asarray(pose_spherical(ang, -30.0, 3.5), np.float32)[:3]
        rk = dict(near=0.5, far=6.0, stepsize=0.5)
        got = np.asarray(model.hit_coarse_geo_view(
            H, W, K, c2w, inverse_y=iy, **rk))
        ro, rd, _ = ray_lib.get_rays_of_a_view(
            H, W, K, c2w, ndc=False, inverse_y=iy, flip_x=False,
            flip_y=False)
        want = model.hit_coarse_geo(
            rays_o=ro.reshape(-1, 3), rays_d=rd.reshape(-1, 3), **rk)
        assert got.shape == want.shape
        # identical up to f32 associativity at voxel-rounding knife edges
        assert (got == want).mean() > 0.999
        # bit-packed pull form (8x smaller tunnel transfer) decodes to
        # exactly the boolean mask
        packed = np.asarray(model.hit_coarse_geo_view(
            H, W, K, c2w, inverse_y=iy, packed=True, **rk))
        assert packed.dtype == np.uint8
        assert packed.shape == (-(-(H * W) // 8),)
        np.testing.assert_array_equal(
            np.unpackbits(packed)[:H * W].astype(bool), got)


def test_voxel_count_views_sweep_matches_scatter():
    """The sweep (scatter-free) view counter must agree with the reference
    trilinear-VJP form on nearly every voxel: station samples sit on
    sweep-axis planes instead of fixed arc-length steps, so per-sample
    weights differ by the |d_axis| spacing factor and only borderline
    voxels near the >1 threshold may flip (lib/dvgo.py:265-295)."""
    from directvoxgo_tpu.models.dvgo import DirectVoxGO

    model = DirectVoxGO(
        xyz_min=[-1.0, -1.0, -1.0], xyz_max=[1.0, 1.0, 1.0],
        num_voxels=24 ** 3, num_voxels_base=24 ** 3, alpha_init=1e-2,
        rgbnet_dim=0)
    H = W = 24
    views_o, views_d, imsz = [], [], []
    for ang in (0.0, 0.7, 2.2):
        # camera on a ring, looking at the origin
        cam = np.array([3.0 * np.cos(ang), 3.0 * np.sin(ang), 1.2],
                       np.float32)
        fwd = -cam / np.linalg.norm(cam)
        right = np.cross(fwd, [0.0, 0.0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        i, j = np.meshgrid(np.linspace(-0.35, 0.35, W),
                           np.linspace(-0.35, 0.35, H))
        d = (fwd[None, None] + i[..., None] * right[None, None]
             + j[..., None] * up[None, None]).reshape(-1, 3)
        views_o.append(np.tile(cam, (H * W, 1)).astype(np.float32))
        views_d.append(d.astype(np.float32))
        imsz.append(H * W)

    ro = np.concatenate(views_o)
    rd = np.concatenate(views_d)
    kw = dict(imsz=imsz, near=0.5, far=6.0, stepsize=0.5)
    cnt_scatter = np.asarray(model.voxel_count_views(
        rays_o_tr=ro, rays_d_tr=rd, **kw))
    model.query_mode = "sweep"
    cnt_sweep = np.asarray(model.voxel_count_views(
        rays_o_tr=ro, rays_d_tr=rd, **kw))
    assert cnt_sweep.shape == cnt_scatter.shape
    agree = float((cnt_sweep == cnt_scatter).mean())
    assert agree > 0.97, f"only {agree:.3f} of voxels agree"
    # device-pool path (views dynamic-sliced from the staged pool; only
    # scalars uploaded per view) must match the host-upload path exactly —
    # same rays, same per-view programs, only the slicing differs
    import jax.numpy as jnp
    cnt_dev = np.asarray(model.voxel_count_views(
        rays_o_tr=ro, rays_d_tr=rd,
        rays_dev=(jnp.asarray(ro), jnp.asarray(rd)), **kw))
    np.testing.assert_array_equal(cnt_dev, cnt_sweep)
    # the low-count mask that gates density init (cnt <= 2) must overlap
    both_low = (cnt_scatter <= 2), (cnt_sweep <= 2)
    iou = float((both_low[0] & both_low[1]).sum()
                / max((both_low[0] | both_low[1]).sum(), 1))
    assert iou > 0.95, f"cnt<=2 mask IoU {iou:.3f}"
