"""Fully implicit image-conditioned model (joint multi-scene).

TPU-native re-design of lib/multiscene_dvgo.py: like the triplane model but
with NO explicit density grid — a skip-connected NeRF MLP predicts (rgb,
density) from the triplane features + view embedding (multiscene_dvgo.py:
219-222, 586-594). Density activates mipnerf-style: ``softplus(d - 1)`` then
``alpha = 1 - exp(-density * interval)`` (``density2alpha``,
multiscene_dvgo.py:134-137, 598-603, 654-656). Free space is still skipped
via a coarse-stage occupancy grid when provided.

The reference keeps a pure-PyTorch ``sample_ray_py`` fallback as its sampler
oracle (multiscene_dvgo.py:493-515); this rebuild's dense static sampler is
itself unit-tested against a numpy oracle (tests/test_ops.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops import raymarch as rm
from . import mlp as mlp_lib
from . import nets
from .tri_dvgo import TriDVGO


def density2alpha(density, interval):
    """``alpha = 1 - exp(-density * interval)`` (multiscene_dvgo.py:654-656),
    in expm1 form for small-alpha accuracy."""
    return -jnp.expm1(-density * interval)


class MultiSceneImplicitDVGO(TriDVGO):
    """Triplane-conditioned NeRF-MLP radiance field (no density grid)."""

    def __init__(self, xyz_min, xyz_max, use_mipnerf_density=True,
                 rgbnet_depth=8, rgbnet_width=256, skips=(2,),
                 **kwargs):
        kwargs.setdefault("alpha_init", 1e-2)
        kwargs.pop("rgbnet_depth", None)
        kwargs.pop("rgbnet_width", None)
        super().__init__(xyz_min, xyz_max, **kwargs)
        # No explicit density grid (multiscene_dvgo.py:143-144).
        del self.params["density"]
        self.use_mipnerf_density = use_mipnerf_density
        if use_mipnerf_density:
            self.act_shift = -1.0  # mipnerf-style (multiscene_dvgo.py:134-137)
        self.skips = tuple(skips)
        self.rgbnet_depth = rgbnet_depth
        self.rgbnet_width = rgbnet_width
        self.rgbnet_kwargs.update({
            "rgbnet_depth": rgbnet_depth, "rgbnet_width": rgbnet_width,
            "skips": tuple(skips),
            "use_mipnerf_density": use_mipnerf_density,
        })
        view_dim = 3 + 3 * self.viewbase_pe * 2
        self.params["rgbnet"] = nets.init_nerf_mlp(
            jax.random.PRNGKey(kwargs.get("seed", 0) + 7),
            D=rgbnet_depth, W=rgbnet_width, input_ch=self.k0_dim,
            input_ch_views=view_dim, skips=self.skips)

    def get_kwargs(self):
        kw = super().get_kwargs()
        kw.update(self.rgbnet_kwargs)
        return kw

    def render(self, params, mask, feats, rays_o, rays_d, viewdirs,
               global_step=None, *, near, far, bg, stepsize,
               render_depth=False, **_):
        bbox_min = tuple(float(x) for x in self.xyz_min)
        bbox_max = tuple(float(x) for x in self.xyz_max)
        stepdist = stepsize * self.voxel_size
        interval = stepsize * self.voxel_size_ratio
        n_cap = rm.max_samples_for_bbox(self.xyz_min, self.xyz_max, stepdist)

        (px, py, pz), valid, step_sl = rm.sample_points_dense_parts(
            rays_o, rays_d, bbox_min, bbox_max, near, far, stepdist, n_cap)
        occ = grid_ops.occupancy_lookup_parts(
            mask, px, py, pz, bbox_min, bbox_max) & valid
        step_f = jnp.broadcast_to(step_sl.astype(jnp.float32)[None, :],
                                  px.shape)

        # The MLP prices every retained sample, so the occupied-sample
        # compaction is the main cost lever here.
        k_d = self.k_density or n_cap
        if k_d < n_cap:
            big = jnp.float32(2 * n_cap)
            key = jnp.where(occ, step_f, big + step_f)
            _, px, py, pz, occ, step_f = rm.compact_by_key(
                key, k_d, px, py, pz, occ, step_f)

        vox_emb = self.query_triplane(params, feats, px, py, pz)
        vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
        vd_emb = jnp.broadcast_to(vd_emb[:, None, :],
                                  (*px.shape, vd_emb.shape[-1]))
        rgb_logit, density = nets.nerf_mlp_apply(params["rgbnet"], vox_emb,
                                                 vd_emb)
        rgb = jax.nn.sigmoid(rgb_logit)
        density = density[..., 0]
        if self.use_mipnerf_density:
            sigma = jax.nn.softplus(density + self.act_shift)
            alpha = density2alpha(sigma, interval)
        else:
            alpha = rm.raw2alpha(density, self.act_shift, interval)
        if self.fast_color_thres > 0:
            occ = occ & (alpha > self.fast_color_thres)
        weights, alphainv_last, live = rm.alpha2weight_dense(alpha, occ)
        wmask = (weights > self.fast_color_thres) \
            if self.fast_color_thres > 0 else live
        w_eff = jnp.where(wmask, weights, 0.0)

        rgb_marched = jnp.sum(w_eff[..., None] * rgb, axis=1) \
            + alphainv_last[..., None] * bg
        ret = {
            "alphainv_last": alphainv_last,
            "weights": w_eff,
            "rgb_marched": rgb_marched,
            "raw_alpha": jnp.where(wmask, alpha, 0.0),
            "raw_rgb": rgb,
            "wmask": wmask,
        }
        if render_depth:
            ret["depth"] = jax.lax.stop_gradient(
                jnp.sum(w_eff * step_f, axis=1))
        return ret
