"""Unit tests for the kernel-layer ops against independent numpy oracles.

This mirrors the reference's only in-repo oracle pattern (the pure-PyTorch
``sample_ray_py`` kept next to the CUDA sampler, lib/multiscene_dvgo.py:
493-515) but applied systematically to every op, plus gradient checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from directvoxgo_tpu.ops import (
    ray_aabb_tminmax, sample_points_dense, sample_points_ndc, raw2alpha,
    alpha2weight_dense, compact_by_key, trilinear_sample, occupancy_lookup,
    max_pool3d_same, resize_trilinear, world_to_grid, total_variation_add_grad,
)
from directvoxgo_tpu.ops import raymarch as rm


def _rand_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return o, d


class TestRayAABB:
    def test_matches_numpy_oracle(self):
        o, d = _rand_rays(128)
        xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
        xyz_max = np.array([1.0, 1.5, 0.5], np.float32)
        near, far = 0.5, 6.0
        t_min, t_max = ray_aabb_tminmax(jnp.asarray(o), jnp.asarray(d),
                                        jnp.asarray(xyz_min),
                                        jnp.asarray(xyz_max), near, far)
        # oracle (render_utils_kernel.cu:11-35 semantics)
        vec = np.where(d == 0, 1e-6, d)
        a = (xyz_max - o) / vec
        b = (xyz_min - o) / vec
        tmin_ref = np.clip(np.minimum(a, b).max(-1), near, far)
        tmax_ref = np.clip(np.maximum(a, b).min(-1), near, far)
        np.testing.assert_allclose(t_min, tmin_ref, rtol=1e-5)
        np.testing.assert_allclose(t_max, tmax_ref, rtol=1e-5)

    def test_zero_direction_component(self):
        o = np.array([[0.0, 0.0, -5.0]], np.float32)
        d = np.array([[0.0, 0.0, 1.0]], np.float32)
        t_min, t_max = ray_aabb_tminmax(
            jnp.asarray(o), jnp.asarray(d),
            jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]), 0.1, 10.0)
        assert float(t_min[0]) == pytest.approx(4.0, abs=1e-4)
        assert float(t_max[0]) == pytest.approx(6.0, abs=1e-4)


class TestSamplePoints:
    def test_points_on_segment_and_masked(self):
        o, d = _rand_rays(64, seed=1)
        xyz_min = jnp.asarray([-1.0, -1, -1])
        xyz_max = jnp.asarray([1.0, 1, 1])
        stepdist = 0.05
        n_samples = rm.max_samples_for_bbox([-1, -1, -1], [1, 1, 1], stepdist)
        pts, valid, step_id = sample_points_dense(
            jnp.asarray(o), jnp.asarray(d), xyz_min, xyz_max, 0.2, 9.0,
            stepdist, n_samples)
        pts, valid = np.asarray(pts), np.asarray(valid)
        # valid points must lie inside the bbox
        assert np.all(pts[valid] >= -1 - 1e-5)
        assert np.all(pts[valid] <= 1 + 1e-5)
        # consecutive valid points along a ray are stepdist apart
        for i in range(8):
            vi = np.where(valid[i])[0]
            if len(vi) > 1:
                seg = pts[i, vi]
                dists = np.linalg.norm(np.diff(seg, axis=0), axis=1)
                gaps = np.diff(vi)
                np.testing.assert_allclose(dists, stepdist * gaps, rtol=1e-3)

    def test_ndc_sampler_regular(self):
        o = np.zeros((4, 3), np.float32)
        d = np.tile(np.array([[0, 0, 1.0]], np.float32), (4, 1))
        pts, valid, _ = sample_points_ndc(
            jnp.asarray(o), jnp.asarray(d),
            jnp.asarray([-1.0, -1, 0]), jnp.asarray([1.0, 1, 1]), 11)
        np.testing.assert_allclose(np.asarray(pts)[0, :, 2],
                                   np.linspace(0, 1, 11), atol=1e-6)
        assert bool(np.all(valid))


class TestRaw2Alpha:
    def test_matches_closed_form(self):
        d = np.linspace(-10, 15, 101).astype(np.float32)
        shift, interval = 0.3, 0.7
        out = np.asarray(raw2alpha(jnp.asarray(d), shift, interval))
        ref = 1 - (1 + np.exp(d.astype(np.float64) + shift)) ** (-interval)
        np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-6)

    def test_grad_finite_and_stable(self):
        g = jax.grad(lambda x: jnp.sum(raw2alpha(x, 0.0, 0.5)))
        vals = g(jnp.asarray([-100.0, 0.0, 50.0, 500.0]))
        assert np.all(np.isfinite(np.asarray(vals)))


class TestAlpha2Weight:
    def _oracle(self, alpha, valid):
        """Sequential CUDA-loop oracle (render_utils_kernel.cu:430-505)."""
        n, s = alpha.shape
        w = np.zeros_like(alpha)
        ainv = np.ones(n)
        for i in range(n):
            t_cum = 1.0
            for j in range(s):
                if not valid[i, j]:
                    continue
                w[i, j] = t_cum * alpha[i, j]
                t_cum *= 1.0 - alpha[i, j] + 1e-10
                if t_cum < 1e-3:
                    break
            ainv[i] = t_cum
        return w, ainv

    def test_matches_sequential_oracle(self):
        rng = np.random.default_rng(3)
        alpha = rng.uniform(0, 0.9, (32, 40)).astype(np.float32)
        valid = rng.uniform(size=(32, 40)) > 0.3
        w, ainv, live = alpha2weight_dense(jnp.asarray(alpha),
                                           jnp.asarray(valid))
        w_ref, ainv_ref = self._oracle(alpha.astype(np.float64), valid)
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ainv), ainv_ref, atol=1e-5)

    def test_weights_sum_to_one_minus_bg(self):
        alpha = jnp.full((4, 30), 0.2)
        valid = jnp.ones((4, 30), bool)
        w, ainv, _ = alpha2weight_dense(alpha, valid)
        np.testing.assert_allclose(np.asarray(w.sum(-1) + ainv),
                                   np.ones(4), atol=1e-4)

    def test_gradients_match_autodiff_oracle(self):
        """The product-form function is what the CUDA backward implements;
        check our grads against finite differences."""
        rng = np.random.default_rng(5)
        alpha = jnp.asarray(rng.uniform(0.05, 0.6, (4, 8)), jnp.float32)
        valid = jnp.ones((4, 8), bool)
        gw = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
        gl = jnp.asarray(rng.normal(size=(4,)), jnp.float32)

        def f(a):
            w, ainv, _ = alpha2weight_dense(a, valid)
            return jnp.sum(w * gw) + jnp.sum(ainv * gl)

        g = jax.grad(f)(alpha)
        eps = 1e-3
        for (i, j) in [(0, 0), (1, 3), (3, 7), (2, 5)]:
            ap = alpha.at[i, j].add(eps)
            am = alpha.at[i, j].add(-eps)
            fd = (f(ap) - f(am)) / (2 * eps)
            assert float(g[i, j]) == pytest.approx(float(fd), rel=5e-2,
                                                   abs=1e-3)


class TestCompact:
    def test_keeps_smallest_keys_in_order(self):
        key = jnp.asarray([[5.0, 1.0, 3.0, 2.0, 4.0]])
        vals = jnp.asarray([[50.0, 10.0, 30.0, 20.0, 40.0]])
        order, out = compact_by_key(key, 3, vals)
        np.testing.assert_array_equal(np.asarray(out), [[10.0, 20.0, 30.0]])

    def test_multidim_gather(self):
        rng = np.random.default_rng(0)
        key_np = rng.normal(size=(4, 10)).astype(np.float32)
        pts_np = rng.normal(size=(4, 10, 3)).astype(np.float32)
        _, out = compact_by_key(jnp.asarray(key_np), 4, jnp.asarray(pts_np))
        for r in range(4):
            order = np.argsort(key_np[r])[:4]
            np.testing.assert_allclose(np.asarray(out[r]), pts_np[r][order])

    def test_rank2_payloads_match_fallback(self):
        rng = np.random.default_rng(1)
        key_np = rng.normal(size=(8, 20)).astype(np.float32)
        a_np = rng.normal(size=(8, 20)).astype(np.float32)
        b_np = (rng.uniform(size=(8, 20)) > 0.5)
        sk, a_out, b_out = compact_by_key(
            jnp.asarray(key_np), 5, jnp.asarray(a_np), jnp.asarray(b_np))
        for r in range(8):
            order = np.argsort(key_np[r], kind="stable")[:5]
            np.testing.assert_allclose(np.asarray(a_out[r]), a_np[r][order])
            np.testing.assert_array_equal(np.asarray(b_out[r]),
                                          b_np[r][order])

    def test_rank2_sort_is_differentiable(self):
        key = jnp.asarray([[3.0, 1.0, 2.0]])
        vals = jnp.asarray([[10.0, 20.0, 30.0]])

        def f(v):
            _, out = compact_by_key(key, 2, v)
            return jnp.sum(out * jnp.asarray([1.0, 10.0]))

        g = jax.grad(f)(vals)
        # kept order: keys (1,2) -> vals (20, 30) with factors (1, 10)
        np.testing.assert_allclose(np.asarray(g), [[0.0, 1.0, 10.0]])


class TestTrilinear:
    def test_exact_at_grid_points(self):
        rng = np.random.default_rng(0)
        grid = jnp.asarray(rng.normal(size=(5, 6, 7)).astype(np.float32))
        idx = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0],
                           [4.0, 5.0, 6.0]])
        out = trilinear_sample(grid, idx)
        expect = [grid[1, 2, 3], grid[0, 0, 0], grid[4, 5, 6]]
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-6)

    def test_linear_function_reproduced(self):
        # A trilinear interpolant reproduces linear fields exactly.
        xs, ys, zs = np.meshgrid(np.arange(4), np.arange(5), np.arange(6),
                                 indexing="ij")
        grid = (2.0 * xs - 3.0 * ys + 0.5 * zs).astype(np.float32)
        rng = np.random.default_rng(1)
        pts = rng.uniform([0, 0, 0], [3, 4, 5], (50, 3)).astype(np.float32)
        out = trilinear_sample(jnp.asarray(grid), jnp.asarray(pts))
        ref = 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 0.5 * pts[:, 2]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_channels_last(self):
        rng = np.random.default_rng(2)
        grid = jnp.asarray(rng.normal(size=(4, 4, 4, 3)).astype(np.float32))
        out = trilinear_sample(grid, jnp.asarray([[1.5, 2.5, 0.5]]))
        assert out.shape == (1, 3)

    def test_world_to_grid_align_corners(self):
        idx = world_to_grid(jnp.asarray([[-1.0, -1, -1], [1.0, 1, 1]]),
                            jnp.asarray([-1.0, -1, -1]),
                            jnp.asarray([1.0, 1, 1]), (5, 9, 17))
        np.testing.assert_allclose(np.asarray(idx),
                                   [[0, 0, 0], [4, 8, 16]], atol=1e-5)

    def test_grad_scatters_interp_weights(self):
        grid = jnp.zeros((3, 3, 3))
        pt = jnp.asarray([[0.5, 0.0, 0.0]])
        g = jax.grad(lambda gr: jnp.sum(trilinear_sample(gr, pt)))(grid)
        assert float(g[0, 0, 0]) == pytest.approx(0.5)
        assert float(g[1, 0, 0]) == pytest.approx(0.5)
        assert float(jnp.sum(g)) == pytest.approx(1.0)


class TestOccupancy:
    def test_round_lookup_and_oob(self):
        mask = np.zeros((4, 4, 4), bool)
        mask[1, 2, 3] = True
        xyz_min = np.array([0.0, 0, 0], np.float32)
        xyz_max = np.array([3.0, 3, 3], np.float32)
        pts = jnp.asarray([
            [1.2, 2.1, 2.9],   # rounds to (1,2,3) -> True
            [1.6, 2.1, 2.9],   # rounds to (2,2,3) -> False
            [-5.0, 0, 0],      # out of bounds -> False
        ])
        out = occupancy_lookup(jnp.asarray(mask), pts,
                               jnp.asarray(xyz_min), jnp.asarray(xyz_max))
        np.testing.assert_array_equal(np.asarray(out), [True, False, False])


class TestPoolResize:
    def test_max_pool3d(self):
        x = np.zeros((5, 5, 5), np.float32)
        x[2, 2, 2] = 7.0
        out = np.asarray(max_pool3d_same(jnp.asarray(x)))
        assert out[1, 1, 1] == 7.0 and out[3, 3, 3] == 7.0
        assert out[0, 0, 0] == 0.0

    def test_resize_identity(self):
        rng = np.random.default_rng(0)
        g = jnp.asarray(rng.normal(size=(6, 7, 8)).astype(np.float32))
        out = resize_trilinear(g, (6, 7, 8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(g), atol=1e-5)

    def test_resize_preserves_linear_field(self):
        xs, ys, zs = np.meshgrid(np.linspace(0, 1, 5), np.linspace(0, 1, 6),
                                 np.linspace(0, 1, 7), indexing="ij")
        g = (xs + 2 * ys - zs).astype(np.float32)
        out = np.asarray(resize_trilinear(jnp.asarray(g), (9, 11, 13)))
        xs2, ys2, zs2 = np.meshgrid(
            np.linspace(0, 1, 9), np.linspace(0, 1, 11),
            np.linspace(0, 1, 13), indexing="ij")
        np.testing.assert_allclose(out, xs2 + 2 * ys2 - zs2, atol=1e-5)


class TestComponentFormsParity:
    """The hot path uses component (x,y,z) forms; they must agree with the
    packed [...,3] reference forms bit-for-bit."""

    def test_tminmax_parts(self):
        o, d = _rand_rays(64, seed=7)
        mn, mx = (-1.0, -1.0, -1.0), (1.0, 1.5, 0.5)
        t1 = rm.ray_aabb_tminmax(jnp.asarray(o), jnp.asarray(d),
                                 jnp.asarray(mn), jnp.asarray(mx), 0.3, 7.0)
        t2 = rm.ray_aabb_tminmax_parts(
            tuple(jnp.asarray(o[:, i]) for i in range(3)),
            tuple(jnp.asarray(d[:, i]) for i in range(3)), mn, mx, 0.3, 7.0)
        np.testing.assert_allclose(np.asarray(t1[0]), np.asarray(t2[0]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(t1[1]), np.asarray(t2[1]),
                                   rtol=1e-6)

    def test_sample_points_parts(self):
        o, d = _rand_rays(32, seed=8)
        mn, mx = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)
        n = rm.max_samples_for_bbox(mn, mx, 0.07)
        pts, valid, step = rm.sample_points_dense(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(mn), jnp.asarray(mx),
            0.2, 9.0, 0.07, n)
        (px, py, pz), valid2, step2 = rm.sample_points_dense_parts(
            jnp.asarray(o), jnp.asarray(d), mn, mx, 0.2, 9.0, 0.07, n)
        np.testing.assert_allclose(np.asarray(pts[..., 0]), np.asarray(px),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(pz),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid2))

    def test_trilinear_world_parts(self):
        rng = np.random.default_rng(3)
        grid = jnp.asarray(rng.normal(size=(6, 7, 8)).astype(np.float32))
        pts = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        mn, mx = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)
        from directvoxgo_tpu.ops.grid import trilinear_sample_world
        idx = world_to_grid(jnp.asarray(pts), jnp.asarray(mn),
                            jnp.asarray(mx), grid.shape)
        ref = trilinear_sample(grid, idx)
        out = trilinear_sample_world(
            grid, jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.asarray(pts[:, 2]), mn, mx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)

    def test_occupancy_parts_oob(self):
        mask = np.zeros((4, 4, 4), bool)
        mask[1, 2, 3] = True
        from directvoxgo_tpu.ops.grid import occupancy_lookup_parts
        out = occupancy_lookup_parts(
            jnp.asarray(mask),
            jnp.asarray([1.2, 1.6, -5.0]), jnp.asarray([2.1, 2.1, 0.0]),
            jnp.asarray([2.9, 2.9, 0.0]), (0.0, 0.0, 0.0), (3.0, 3.0, 3.0))
        np.testing.assert_array_equal(np.asarray(out), [True, False, False])


class TestTV:
    def _oracle(self, param, grad, wx, wy, wz, dense, bug_compat):
        wx, wy, wz = wx / 6, wy / 6, wz / 6
        if bug_compat:
            wx = wz
        out = grad.copy()
        nx, ny, nz = param.shape
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    if not dense and grad[i, j, k] == 0:
                        continue
                    add = 0.0
                    for (di, dj, dk, w) in [(-1, 0, 0, wx), (1, 0, 0, wx),
                                            (0, -1, 0, wy), (0, 1, 0, wy),
                                            (0, 0, -1, wz), (0, 0, 1, wz)]:
                        ii, jj, kk = i + di, j + dj, k + dk
                        if 0 <= ii < nx and 0 <= jj < ny and 0 <= kk < nz:
                            add += w * np.clip(
                                param[i, j, k] - param[ii, jj, kk], -1, 1)
                    out[i, j, k] += add
        return out

    @pytest.mark.parametrize("dense", [True, False])
    @pytest.mark.parametrize("bug_compat", [True, False])
    def test_matches_oracle(self, dense, bug_compat):
        rng = np.random.default_rng(0)
        param = rng.normal(size=(4, 5, 6)).astype(np.float32) * 2
        grad = rng.normal(size=(4, 5, 6)).astype(np.float32)
        grad[rng.uniform(size=grad.shape) < 0.5] = 0.0
        out = total_variation_add_grad(
            jnp.asarray(param), jnp.asarray(grad), 0.3, 0.5, 0.7,
            dense_mode=dense, bug_compat=bug_compat)
        ref = self._oracle(param.astype(np.float64),
                           grad.astype(np.float64), 0.3, 0.5, 0.7,
                           dense, bug_compat)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("bidir", [False, True])
def test_alpha2weight_saturated_alpha_grad_finite(bidir):
    """alpha == 1.0 in f32 (DMPIGO's opaque last plane) must not NaN the
    jitted backward: the old cumprod/one_minus exclusive product produced
    inf*0 under XLA fusion. AD of the shift-form matches float64 central
    differences at saturated entries (see ops/raymarch.py)."""
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 0.5, (8, 24)).astype(np.float32)
    a[2, 10] = 1.0
    a[5, 0] = 1.0
    valid = rng.uniform(size=(8, 24)) > 0.2
    ct_w = jnp.asarray(rng.normal(size=(8, 24)).astype(np.float32))
    ct_a = jnp.asarray(rng.normal(size=8).astype(np.float32))
    fwd = jnp.asarray(rng.uniform(size=8) > 0.5)

    def f(alpha):
        if bidir:
            w, ainv, _ = rm.alpha2weight_dense_bidir(alpha,
                                                     jnp.asarray(valid), fwd)
        else:
            w, ainv, _ = rm.alpha2weight_dense(alpha, jnp.asarray(valid))
        return jnp.sum(w * ct_w) + jnp.sum(ainv * ct_a)

    g = jax.jit(jax.grad(f))(jnp.asarray(a))
    assert bool(jnp.isfinite(g).all())


def test_mask_bbox_vox_device_matches_host():
    """Device-side mask bbox (renewals queue it, i_print pulls it) must
    match the host form, including the empty-mask full-grid fallback."""
    import jax.numpy as jnp
    from directvoxgo_tpu.ops.grid import mask_bbox_vox, mask_bbox_vox_device

    rng = np.random.default_rng(0)
    m = np.zeros((20, 24, 28), bool)
    m[3:9, 10:18, 5:6] = rng.uniform(size=(6, 8, 1)) > 0.4
    for mask in (m, np.zeros((20, 24, 28), bool)):
        lo_h, hi_h = mask_bbox_vox(mask)
        bb = np.asarray(mask_bbox_vox_device(jnp.asarray(mask)))
        np.testing.assert_allclose(bb[0], lo_h)
        np.testing.assert_allclose(bb[1], hi_h)


def test_alpha2weight_bidir_custom_vjp_matches_autodiff():
    """The hand-derived compositing backward (the reference back_cum
    recurrence as two cumsums) must match autodiff of the plain shifted-
    cumprod construction — including saturated alphas, invalid slots and
    mixed march directions."""
    import jax
    import jax.numpy as jnp
    from directvoxgo_tpu.ops import raymarch as rm

    def plain(alpha, valid, forward):
        alpha = jnp.where(valid, alpha, 0.0)
        om = jnp.where(valid, 1.0 - alpha + rm.T_EPS, 1.0)
        ones = jnp.ones_like(om[..., :1])
        t_f = jnp.cumprod(jnp.concatenate([ones, om[..., :-1]], -1), -1)
        t_b = jnp.cumprod(jnp.concatenate([om[..., 1:], ones],
                                          -1)[..., ::-1], -1)[..., ::-1]
        t = jnp.where(forward[:, None], t_f, t_b)
        live = t >= rm.T_TERMINATE
        w = jnp.where(valid & live, t * alpha, 0.0)
        ainv = jnp.prod(jnp.where(live, om, 1.0), axis=-1)
        return w, ainv

    rng = np.random.default_rng(0)
    n, s = 32, 48
    alpha = rng.uniform(0, 0.6, (n, s)).astype(np.float32)
    alpha[rng.uniform(size=(n, s)) < 0.1] = 0.9999  # near-saturated
    alpha[0, 5] = 1.0  # exactly saturated
    valid = rng.uniform(size=(n, s)) > 0.25
    forward = rng.uniform(size=n) > 0.5
    cw = rng.normal(size=(n, s)).astype(np.float32)
    ci = rng.normal(size=n).astype(np.float32)

    def loss_custom(a):
        w, ainv, _ = rm.alpha2weight_dense_bidir(
            a, jnp.asarray(valid), jnp.asarray(forward))
        return jnp.sum(w * cw) + jnp.sum(ainv * ci)

    def loss_plain(a):
        w, ainv = plain(a, jnp.asarray(valid), jnp.asarray(forward))
        return jnp.sum(w * cw) + jnp.sum(ainv * ci)

    a = jnp.asarray(alpha)
    v1 = float(loss_custom(a))
    v2 = float(loss_plain(a))
    assert abs(v1 - v2) < 1e-4 * max(abs(v2), 1.0)
    g1 = np.asarray(jax.grad(loss_custom)(a))
    g2 = np.asarray(jax.grad(loss_plain)(a))
    scale = max(1.0, np.abs(g2).max())
    assert np.abs(g1 - g2).max() < 2e-5 * scale, np.abs(g1 - g2).max()
