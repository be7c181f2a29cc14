"""Joint multi-scene DirectVoxGO: per-scene stacked grids, shared color net.

TPU-native re-design of lib/dvgo_multiscene.py: density carries a leading
scene axis ``[n_scene, X, Y, Z]`` (dvgo_multiscene.py:70); in the coarse
configuration k0 is per-scene ``[n_scene, X, Y, Z, 3]`` while in the fine
configuration the feature grid and rgbnet are shared across scenes
(dvgo_multiscene.py:89-97). The occupancy mask is scene-indexed
(dvgo_multiscene.py:601-636) and ``forward`` takes a ``scene_id``
(dvgo_multiscene.py:468). Grid selection is a ``dynamic_slice`` on the scene
axis; everything downstream reuses the single-scene render path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops import raymarch as rm
from .dvgo import DirectVoxGO


class DirectVoxGOMultiScene(DirectVoxGO):
    def __init__(self, xyz_min, xyz_max, n_scene=1, **kwargs):
        self.n_scene = int(n_scene)
        super().__init__(xyz_min, xyz_max, **kwargs)
        # Re-create the grids with a leading scene axis.
        self.params["density"] = jnp.zeros((self.n_scene, *self.world_size),
                                           jnp.float32)
        if not self.has_rgbnet:
            # Coarse: per-scene rgb grids (dvgo_multiscene.py:89-90).
            self.params["k0"] = jnp.zeros(
                (self.n_scene, *self.world_size, self.k0_dim), jnp.float32)
        self.k0_per_scene = not self.has_rgbnet
        if kwargs.get("mask_cache_path"):
            self.mask = self._multiscene_mask_from_coarse_ckpt(
                kwargs["mask_cache_path"], kwargs.get("mask_cache_thres",
                                                      1e-3))
        else:
            self.mask = jnp.ones((self.n_scene, *self.world_size), bool)

    def _multiscene_mask_from_coarse_ckpt(self, path, thres):
        from ..engine import checkpoint as ckpt_lib
        st = ckpt_lib.load_checkpoint_file(path)
        c_kwargs = st["model_kwargs"]
        c_density = jnp.asarray(st["model_state_dict"]["density"])
        assert c_density.ndim == 4, "expected [n_scene, X, Y, Z] density"
        pooled = jax.vmap(grid_ops.max_pool3d_same)(c_density)
        alpha = rm.raw2alpha(pooled, c_kwargs["act_shift"],
                             c_kwargs["voxel_size_ratio"])
        c_mask = alpha >= thres
        pts = self.grid_points()
        c_min = np.asarray(c_kwargs["xyz_min"], np.float32)
        c_max = np.asarray(c_kwargs["xyz_max"], np.float32)
        return jnp.stack([
            grid_ops.occupancy_lookup(c_mask[s], pts, c_min, c_max)
            for s in range(self.n_scene)], 0)

    def get_kwargs(self):
        kw = super().get_kwargs()
        kw["n_scene"] = self.n_scene
        return kw

    # ------------------------------------------------------- state surgery

    def maskout_near_cam_vox(self, cam_o, near, scene_id=None):
        """Per-scene near-camera maskout (dvgo_multiscene.py:224-237)."""
        if scene_id is None:
            raise ValueError("multiscene maskout needs a scene_id")
        pts = self.grid_points()
        cam_o = jnp.asarray(cam_o, jnp.float32)
        d2 = jnp.min(jnp.sum((pts[..., None, :] - cam_o) ** 2, -1), -1)
        nearest = jnp.sqrt(d2)
        upd = jnp.where(nearest <= near, -100.0,
                        self.params["density"][scene_id])
        self.params["density"] = self.params["density"].at[scene_id].set(upd)

    def scale_volume_grid(self, num_voxels):
        """Per-scene progressive scaling (dvgo_multiscene.py:239-281)."""
        print("dvgo_ms: scale_volume_grid start")
        ori = self.world_size
        self._set_grid_resolution(num_voxels)
        print("dvgo_ms: scale from", ori, "to", self.world_size)
        resize = jax.vmap(lambda g: grid_ops.resize_trilinear(
            g, self.world_size))
        self.params["density"] = resize(self.params["density"])
        if self.k0_dim > 0:
            if self.k0_per_scene:
                self.params["k0"] = resize(self.params["k0"])
            else:
                self.params["k0"] = grid_ops.resize_trilinear(
                    self.params["k0"], self.world_size)
        alpha = rm.raw2alpha(
            jax.vmap(grid_ops.max_pool3d_same)(self.params["density"]),
            self.act_shift, self.voxel_size_ratio)
        self.mask = alpha > self.fast_color_thres
        print("dvgo_ms: scale_volume_grid finish")

    def update_occupancy_cache(self, scene_id=None):
        alpha = rm.raw2alpha(
            jax.vmap(grid_ops.max_pool3d_same)(self.params["density"]),
            self.act_shift, self.voxel_size_ratio)
        new = self.mask & (alpha > self.fast_color_thres)
        if scene_id is None:
            self.mask = new
        else:
            self.mask = self.mask.at[scene_id].set(new[scene_id])

    # ------------------------------------------------------------ forward

    def forward(self, params, mask, rays_o, rays_d, viewdirs,
                scene_id=0, global_step=None, **render_kwargs):
        density = params["density"][scene_id]
        k0 = params.get("k0")
        if k0 is not None and self.k0_per_scene:
            k0 = k0[scene_id]
        return self._render_rays(
            density, k0, params.get("rgbnet"), mask[scene_id],
            rays_o, rays_d, viewdirs, **render_kwargs)

    def __call__(self, rays_o, rays_d, viewdirs, scene_id=0,
                 global_step=None, **kw):
        return self.forward(self.params, self.mask, jnp.asarray(rays_o),
                            jnp.asarray(rays_d), jnp.asarray(viewdirs),
                            scene_id=scene_id, **kw)

    def hit_coarse_geo(self, rays_o, rays_d, scene_id=0, **kw):
        """Scene-indexed occupancy test (ray_utils.py:186-227 counterpart)."""
        saved = self.mask
        try:
            self.mask = saved[scene_id]
            return super().hit_coarse_geo(rays_o, rays_d, **kw)
        finally:
            self.mask = saved
