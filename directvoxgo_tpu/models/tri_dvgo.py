"""Image-conditioned single-scene triplane DVGO.

TPU-native re-design of lib/tri_dvgo.py: a *learned* density voxel grid (as
in DVGO) whose color features come from three image-conditioned 2D planes
instead of a 3D feature grid. Three conditioning views (rgb ⊕ rays_o ⊕
rays_d, 9 channels) pass through an EDSR encoder, then a pose-conditioned
``Mapping`` net per plane — the pose input is the view's pose relative to a
canonical anchor (three spherical anchor poses, tri_dvgo.py:109-116,
667-675). Color queries sample the planes bilinearly at (x,y)/(y,z)/(z,x)
and aggregate by concat or sum (tri_dvgo.py:456-479); the LIIF path replaces
bilinear interp with a 4-tap local ensemble decoded by per-plane MLPs
(tri_dvgo.py:481-567).

Note: the reference's normalized-coordinate ``flip`` makes its "xy" plane
effectively indexed by (z, y) etc. (tri_dvgo.py:459-463, an upstream
convention tangle); since no pretrained weights cross over, this rebuild uses
the literal convention — plane "xy" indexed by (x, y) — which the paired
driver trains end-to-end.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops import raymarch as rm
from ..data.load_blender import pose_spherical
from . import mlp as mlp_lib
from . import nets
from . import backbone
from .dvgo import DirectVoxGO

PLANE_AXES = {"xy": (0, 1), "yz": (1, 2), "zx": (2, 0)}


def anchor_poses():
    """Three canonical spherical anchor poses (tri_dvgo.py:109-116)."""
    return np.stack([
        pose_spherical(theta=0, phi=90, radius=4),
        pose_spherical(theta=90, phi=0, radius=4),
        pose_spherical(theta=90, phi=90, radius=4),
    ], 0).astype(np.float32)


class TriDVGO(DirectVoxGO):
    """Learned density grid + image-conditioned triplane color."""

    def __init__(self, xyz_min, xyz_max,
                 num_voxels=0, num_voxels_base=0, alpha_init=None,
                 mask_cache_path=None, mask_cache_thres=1e-3,
                 fast_color_thres=0,
                 rgbnet_dim=12, rgbnet_direct=True, rgbnet_depth=3,
                 rgbnet_width=128, viewbase_pe=4, posbase_pe=0,
                 tri_aggregation="concat", liif=False,
                 implicit_voxel_feat=False, local_ensemble=True,
                 cell_decode=True, feat_unfold=False,
                 interp_width=128, interp_depth=5,
                 map_depth=1, map_width=64,
                 n_feats=64, n_resblocks=16, res_scale=1,
                 k_density=None, k_color=64, seed=0, **kwargs):
        # Build the base DVGO (density grid, mask cache, sampling config)
        # with NO k0 grid / rgbnet of its own.
        super().__init__(
            xyz_min, xyz_max, num_voxels=num_voxels,
            num_voxels_base=num_voxels_base, alpha_init=alpha_init,
            mask_cache_path=mask_cache_path,
            mask_cache_thres=mask_cache_thres,
            fast_color_thres=fast_color_thres, rgbnet_dim=0,
            k_density=k_density, k_color=k_color, seed=seed)
        del self.params["k0"]

        self.tri_aggregation = tri_aggregation
        self.liif = bool(liif or implicit_voxel_feat)
        self.local_ensemble = local_ensemble
        self.cell_decode = cell_decode
        self.feat_unfold = feat_unfold
        self.rgbnet_dim = rgbnet_dim
        self.rgbnet_direct = rgbnet_direct
        self.viewbase_pe = viewbase_pe
        self.posbase_pe = posbase_pe
        self.k0_dim = rgbnet_dim * 3 if tri_aggregation == "concat" \
            else rgbnet_dim
        self.pose_anchor = anchor_poses()
        self.encoder_kwargs = dict(n_feats=n_feats, n_resblocks=n_resblocks,
                                   res_scale=res_scale)
        self.rgbnet_kwargs = {
            "rgbnet_dim": rgbnet_dim, "rgbnet_direct": rgbnet_direct,
            "rgbnet_depth": rgbnet_depth, "rgbnet_width": rgbnet_width,
            "viewbase_pe": viewbase_pe, "posbase_pe": posbase_pe,
            "tri_aggregation": tri_aggregation, "liif": self.liif,
            "local_ensemble": local_ensemble, "cell_decode": cell_decode,
            "feat_unfold": feat_unfold,
            "interp_width": interp_width, "interp_depth": interp_depth,
            "map_depth": map_depth, "map_width": map_width,
            "n_feats": n_feats, "n_resblocks": n_resblocks,
            "res_scale": res_scale,
        }

        key = jax.random.PRNGKey(seed)
        k_enc, k_map, k_rgb, k_ixy, k_iyz, k_izx = jax.random.split(key, 6)
        enc_params, self._enc_apply, _ = backbone.make_edsr_baseline(
            k_enc, n_resblocks=n_resblocks, n_feats=n_feats,
            res_scale=res_scale, no_upsampling=True, n_colors=9)
        self.params["encoder"] = enc_params
        self.params["map"] = nets.init_mapping(
            k_map, in_dim=n_feats + 16, out_dim=rgbnet_dim,
            depth=map_depth, width=map_width)

        dim0 = 3 + 3 * viewbase_pe * 2
        if rgbnet_direct:
            dim0 += self.k0_dim
        else:
            dim0 += self.k0_dim - 3
        self.rgbnet_dim0 = dim0
        self.params["rgbnet"] = mlp_lib.init_mlp(
            k_rgb, dim0, rgbnet_width, rgbnet_depth, 3)
        self.has_rgbnet = True

        if self.liif:
            # LIIF decoder input: feat + rel_coord(2) [+ rel_cell(2)]
            in_dim = rgbnet_dim + 2 + (2 if cell_decode else 0) \
                if not feat_unfold else rgbnet_dim * 9 + 2 \
                + (2 if cell_decode else 0)
            # the reference shares zx's decoder with yz (tri_dvgo.py:171-176)
            self.params["interp_xy"] = nets.init_interp_mlp(
                k_ixy, in_dim, rgbnet_dim, interp_width, interp_depth)
            self.params["interp_yz"] = nets.init_interp_mlp(
                k_iyz, in_dim, rgbnet_dim, interp_width, interp_depth)
            self.params["interp_zx"] = self.params["interp_yz"]

    def get_kwargs(self):
        return {
            "xyz_min": np.asarray(self.xyz_min),
            "xyz_max": np.asarray(self.xyz_max),
            "num_voxels": self.num_voxels,
            "num_voxels_base": self.num_voxels_base,
            "alpha_init": self.alpha_init,
            "mask_cache_path": self.mask_cache_path,
            "mask_cache_thres": self.mask_cache_thres,
            "fast_color_thres": self.fast_color_thres,
            "k_density": self.k_density,
            "k_color": self.k_color,
            **self.rgbnet_kwargs,
        }

    # --------------------------------------------------------- conditioning

    def encode_feat(self, params, rgb_lr, pose_lr):
        """3 conditioning views -> triplane feature maps.

        Args:
          rgb_lr: [3, H, W, 9] (rgb ⊕ rays_o ⊕ rays_d, NHWC).
          pose_lr: [3, 4, 4] camera poses of the conditioning views.

        Returns dict {'xy','yz','zx'} of [h, w, C] planes
        (tri_dvgo.py:667-675).
        """
        feats3 = self._enc_apply(params["encoder"], rgb_lr)  # [3, h, w, F]
        anchors = jnp.asarray(self.pose_anchor)
        planes = {}
        for i, name in enumerate(("xy", "yz", "zx")):
            rel_pose = (pose_lr[i] - anchors[i])[None]
            mapped = nets.mapping_apply(
                params["map"], feats3[i][None], rel_pose)
            planes[name] = mapped[0]
        return planes

    # ------------------------------------------------------- plane queries

    def _plane_coords(self, name, px, py, pz):
        """Normalized align-corners plane coordinates for world points."""
        a, b = PLANE_AXES[name]
        comps = (px, py, pz)
        return comps[a], comps[b]

    def _norm_to_plane(self, v, axis, n):
        lo, hi = float(self.xyz_min[axis]), float(self.xyz_max[axis])
        return (v - lo) / (hi - lo) * (n - 1.0)

    def query_triplane(self, params, feats, px, py, pz, aux=None):
        """Bilinear triplane feature query + aggregation
        (grid_sampler2D, tri_dvgo.py:456-479). ``aux`` (a dict) collects the
        anchor-LIIF distillation loss when the model carries a teacher
        (tri_dvgo_multiscene.py:769-775)."""
        outs = []
        for name in ("xy", "yz", "zx"):
            a, b = PLANE_AXES[name]
            plane = feats[name]
            u = self._norm_to_plane((px, py, pz)[a], a, plane.shape[0])
            v = self._norm_to_plane((px, py, pz)[b], b, plane.shape[1])
            if self.liif:
                outs.append(self._liif_plane(params, name, plane, u, v,
                                             aux=aux))
            else:
                outs.append(grid_ops.bilinear_sample_parts(plane, u, v))
        if self.tri_aggregation == "concat":
            return jnp.concatenate(outs, -1)
        return outs[0] + outs[1] + outs[2]

    @staticmethod
    def _unfold_plane_3x3(plane):
        """3x3 zero-padded neighborhood concat, channel-outer layout:
        out[..., c*9 + (di*3 + dj)] — exactly ``F.unfold(feat, 3,
        padding=1).view(_, c*9, h, w)`` (reference tri_dvgo.py:734-737)."""
        nu, nv, c = plane.shape
        padded = jnp.pad(plane, ((1, 1), (1, 1), (0, 0)))
        shifts = [padded[di:di + nu, dj:dj + nv] for di in range(3)
                  for dj in range(3)]
        return jnp.stack(shifts, axis=-1).reshape(nu, nv, c * 9)

    def _liif_plane(self, params, name, plane, u, v, aux=None):
        """LIIF local-ensemble interpolation on one plane
        (tri_dvgo.py:481-567): 4 nearest-cell taps, per-tap decoder over
        [feat, rel_coord(, rel_cell)], area-weighted with the diagonal swap.
        With ``feat_unfold`` each tap reads the 3x3-unfolded feature
        (tri_dvgo.py:734-737).

        When the model carries a frozen anchor-LIIF teacher
        (``use_anchor_liif``) and ``aux`` is given, each tap also runs the
        teacher on the same input and accumulates
        ``mse(head(pred), head(anchor_pred)) / n_avg`` into
        ``aux['distillation']`` (tri_dvgo_multiscene.py:769-775; n_avg =
        taps x planes, :722).
        """
        nu, nv = plane.shape[:2]
        if self.feat_unfold:
            plane = self._unfold_plane_3x3(plane)
        interp = params[f"interp_{name}"]
        taps = [(-0.5, -0.5), (-0.5, 0.5), (0.5, -0.5), (0.5, 0.5)] \
            if self.local_ensemble else [(0.0, 0.0)]
        distill = getattr(self, "use_anchor_liif", False) and aux is not None
        n_avg = float(len(taps) * 3)
        preds, areas = [], []
        for du, dv in taps:
            cu = jnp.clip(jnp.round(u + du), 0, nu - 1)
            cv = jnp.clip(jnp.round(v + dv), 0, nv - 1)
            q_feat = grid_ops.nearest_sample_2d_parts(plane, cu, cv)
            rel_u = u - cu
            rel_v = v - cv
            inp = [q_feat, rel_u[..., None], rel_v[..., None]]
            if self.cell_decode:
                cell_u = jnp.full_like(rel_u, 1.0)
                cell_v = jnp.full_like(rel_v, 1.0)
                inp += [cell_u[..., None], cell_v[..., None]]
            inp_cat = jnp.concatenate(inp, -1)
            pred = nets.interp_mlp_apply(interp, inp_cat)
            if distill:
                anchor_pred = jax.lax.stop_gradient(
                    nets.interp_mlp_apply(params["anchor_liif"], inp_cat))
                head = params["distillation_head"]
                pd = jax.nn.relu(jnp.dot(pred, head["w"]) + head["b"])
                ad = jax.nn.relu(jnp.dot(anchor_pred, head["w"]) + head["b"])
                aux["distillation"] = aux.get("distillation", 0.0) \
                    + jnp.mean((pd - ad) ** 2) / n_avg
            preds.append(pred)
            areas.append(jnp.abs(rel_u * rel_v) + 1e-9)
        if self.local_ensemble:
            # diagonal-swap weighting (tri_dvgo.py:551-554)
            areas = [areas[3], areas[2], areas[1], areas[0]]
        tot = sum(areas)
        out = 0.0
        for p, a in zip(preds, areas):
            out = out + p * (a / tot)[..., None]
        return out

    # ------------------------------------------------------------ forward

    def render(self, params, mask, feats, rays_o, rays_d, viewdirs,
               global_step=None, *, near, far, bg, stepsize,
               render_depth=False, **_):
        """Volume render with triplane color (tri_dvgo.py render path)."""
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

        k_d = self.k_density or n_cap
        if k_d < n_cap:
            big = jnp.float32(2 * n_cap)
            key = jnp.where(occ, step_f, big + step_f)
            _, px, py, pz, occ, step_f = rm.compact_by_key(
                key, k_d, px, py, pz, occ, step_f)

        density = grid_ops.trilinear_sample_world(
            params["density"], px, py, pz, bbox_min, bbox_max)
        alpha = rm.raw2alpha(density, self.act_shift, interval)
        if self.fast_color_thres > 0:
            occ = occ & (alpha > self.fast_color_thres)
        weights, alphainv_last, live = rm.alpha2weight_dense(alpha, occ)
        wmask = (weights > self.fast_color_thres) \
            if self.fast_color_thres > 0 else live
        w_eff = jnp.where(wmask, weights, 0.0)

        k_c = self.k_color or 0
        if k_c and k_c < w_eff.shape[-1]:
            _, w_eff, px, py, pz, step_f, alpha, wmask = rm.compact_by_key(
                -w_eff, k_c, w_eff, px, py, pz, step_f, alpha, wmask)

        aux = {}
        k0 = self.query_triplane(params, feats, px, py, pz, aux=aux)
        vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
        vd_emb = jnp.broadcast_to(vd_emb[:, None, :],
                                  (*px.shape, vd_emb.shape[-1]))
        if self.rgbnet_direct:
            feat = jnp.concatenate([k0, vd_emb], -1)
            rgb = jax.nn.sigmoid(
                mlp_lib.mlp_apply(params["rgbnet"], feat))
        else:
            feat = jnp.concatenate([k0[..., 3:], vd_emb], -1)
            logit = mlp_lib.mlp_apply(params["rgbnet"], feat)
            rgb = jax.nn.sigmoid(logit + k0[..., :3])

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
        if "distillation" in aux:
            ret["distillation"] = aux["distillation"]
        if render_depth:
            ret["depth"] = jax.lax.stop_gradient(
                jnp.sum(w_eff * step_f, axis=1))
        return ret

    def forward(self, params, mask, rgb_lr, pose_lr, rays_o, rays_d,
                viewdirs, global_step=None, **render_kwargs):
        feats = self.encode_feat(params, rgb_lr, pose_lr)
        return self.render(params, mask, feats, rays_o, rays_d, viewdirs,
                           global_step, **render_kwargs)

    def __call__(self, rgb_lr, pose_lr, rays_o, rays_d, viewdirs,
                 global_step=None, **kw):
        return self.forward(self.params, self.mask, jnp.asarray(rgb_lr),
                            jnp.asarray(pose_lr), jnp.asarray(rays_o),
                            jnp.asarray(rays_d), jnp.asarray(viewdirs), **kw)
