"""DirectVoxGO: dense density + color voxel grids with a shallow view MLP.

TPU-native re-design of the reference model (lib/dvgo.py:30-577). The model
object holds *static* configuration; learnable state lives in a ``params``
pytree and the occupancy mask in a separate array, so every compute path is a
pure jittable function. The ragged CUDA hot path becomes:

  1. dense ``[n_rays, n_samples]`` sampling with validity masks
     (:func:`...ops.raymarch.sample_points_dense`),
  2. an optional fixed-capacity compaction of occupied samples (replacing the
     ``mask_cache`` boolean compression, lib/dvgo.py:469-473),
  3. masked cumprod compositing with early termination
     (:func:`...ops.raymarch.alpha2weight_dense`),
  4. a top-k-by-weight compaction before the color query (replacing the two
     ``fast_color_thres`` compressions, lib/dvgo.py:478-494) so the MLP only
     runs on samples that matter.

Grid layouts are channels-last ``[X, Y, Z(, C)]``.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops import raymarch as rm
from ..ops import sweep as sweep_ops
from ..ops.tv import total_variation_add_grad
from . import mlp as mlp_lib


# Override for how the top-K color compaction gathers station samples
# (None = ops.sweep.COMPACT_GATHER default). Module-level so TPU probes and
# tests can A/B "onehot" vs "gather" — see ops/sweep.topk_station_select.
_COMPACT_GATHER = None


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("new_size", "act_shift", "interval",
                                    "thres", "c_bounds"))
def _pg_rescale_jit(density, k0, c_mask, xs, ys, zs, *, new_size,
                    act_shift, interval, thres, c_bounds):
    """Progressive-scaling rescale as ONE compiled program: trilinear
    upsample of density/k0 + self-alpha occupancy + coarse-ckpt mask
    lookup. Same math as the previous eager composition (maxpool of the
    activated density; device-broadcast point lattice), fused so a pg
    event costs one compile + one dispatch instead of ~40 shape-fresh
    eager programs over the remote tunnel (36-66 s measured, PERF_LOG)."""
    d = grid_ops.resize_trilinear(density, new_size)
    k = grid_ops.resize_trilinear(k0, new_size) if k0 is not None else None
    alpha = grid_ops.max_pool3d_same(rm.raw2alpha(d, act_shift, interval))
    mask = alpha > thres
    if c_mask is not None:
        mn, mx = c_bounds
        cm = grid_ops.occupancy_lookup_parts(
            c_mask, xs[:, None, None], ys[None, :, None],
            zs[None, None, :], mn, mx)
        mask = cm & mask
    return d, k, mask


class DirectVoxGO:
    """Per-scene voxel-grid radiance field (reference lib/dvgo.py:30-577)."""

    def __init__(self, xyz_min, xyz_max,
                 num_voxels=0, num_voxels_base=0,
                 alpha_init=None,
                 mask_cache_path=None, mask_cache_thres=1e-3,
                 fast_color_thres=0,
                 rgbnet_dim=0, rgbnet_direct=False, rgbnet_full_implicit=False,
                 rgbnet_depth=3, rgbnet_width=128,
                 viewbase_pe=4, posbase_pe=0,
                 implicit_voxel_feat=False, feat_unfold=False,
                 local_ensemble=True, cell_decode=True,
                 k_density=None, k_color=64,
                 query_mode="sweep",
                 sweep_color_topk=0,
                 world_size_quantum=1,
                 seed=0,
                 **kwargs):
        self.xyz_min = np.asarray(xyz_min, np.float32)
        self.xyz_max = np.asarray(xyz_max, np.float32)
        self.fast_color_thres = float(fast_color_thres)
        self.posbase_pe = int(posbase_pe)
        # Station budget for the compacted color-MLP path (0 = dense). See
        # forward_sweep: the reference prunes samples below fast_color_thres
        # before its color MLP (lib/dvgo.py:478-494); with static shapes that
        # becomes "run the MLP on the top-K samples per ray by weight".
        self.sweep_color_topk = int(sweep_color_topk)
        # 'sweep': station-sweep matmul queries (TPU fast path);
        # 'gather': reference-faithful point sampling via XLA gathers.
        self.query_mode = query_mode
        # Color-MLP compute dtype on the sweep path (None = full f32).
        self.mlp_dtype = jnp.bfloat16
        # Grid-sweep interp/channel dtype (bf16 = the shipping fast path;
        # f32 enables exact-parity comparisons, tests/test_torch_parity.py).
        self.sweep_dtype = jnp.bfloat16

        # Grid dims rounded to a multiple of this (1 = reference-exact
        # truncation, lib/dvgo.py:155-165). Quantized dims make compiled
        # program shapes REPEAT across runs: the fine bbox comes from the
        # coarse occupancy (a few voxels of run-to-run jitter under the
        # compile-aware draw policy), and at quantum 1 every run's pg
        # stages recompile every step program (13-22 s each measured, r5).
        self.world_size_quantum = max(int(world_size_quantum), 1)

        # Base grid resolution -> act_shift (lib/dvgo.py:55-62).
        self.num_voxels_base = num_voxels_base
        self.voxel_size_base = float(
            ((self.xyz_max - self.xyz_min).prod() / num_voxels_base) ** (1 / 3))
        self.alpha_init = alpha_init
        self.act_shift = float(np.log(1.0 / (1.0 - alpha_init) - 1.0))
        print("dvgo: set density bias shift to", self.act_shift)

        self._set_grid_resolution(num_voxels)

        # Capacity knobs for the static compactions (new, TPU-specific).
        self.k_density = k_density
        self.k_color = int(k_color) if k_color else 0

        key = jax.random.PRNGKey(seed)
        self.params = {"density": jnp.zeros(self.world_size, jnp.float32)}

        self.rgbnet_kwargs = {
            "rgbnet_dim": rgbnet_dim, "rgbnet_direct": rgbnet_direct,
            "rgbnet_full_implicit": rgbnet_full_implicit,
            "rgbnet_depth": rgbnet_depth, "rgbnet_width": rgbnet_width,
            "viewbase_pe": viewbase_pe, "posbase_pe": posbase_pe,
            "implicit_voxel_feat": implicit_voxel_feat,
            "feat_unfold": feat_unfold, "local_ensemble": local_ensemble,
            "cell_decode": cell_decode,
        }
        self.implicit_voxel_feat = implicit_voxel_feat
        self.feat_unfold = feat_unfold
        self.local_ensemble = local_ensemble
        self.cell_decode = cell_decode
        if implicit_voxel_feat:
            # Reference-parity mode; only the gather forward implements it.
            self.query_mode = "gather"
        self.rgbnet_full_implicit = rgbnet_full_implicit
        self.rgbnet_direct = rgbnet_direct
        self.rgbnet_depth = rgbnet_depth
        self.rgbnet_width = rgbnet_width
        self.viewbase_pe = viewbase_pe
        self.rgbnet_dim = rgbnet_dim
        if rgbnet_dim <= 0:
            # Coarse stage: k0 is a direct RGB grid, no MLP (lib/dvgo.py:83-87).
            self.k0_dim = 3
            self.params["k0"] = jnp.zeros((*self.world_size, self.k0_dim),
                                          jnp.float32)
            self.has_rgbnet = False
        else:
            # Fine stage: feature grid + shallow MLP (lib/dvgo.py:88-133).
            self.k0_dim = 0 if rgbnet_full_implicit else rgbnet_dim
            self.params["k0"] = jnp.zeros((*self.world_size, self.k0_dim),
                                          jnp.float32)
            dim0 = 3 + 3 * viewbase_pe * 2
            if rgbnet_full_implicit:
                pass
            elif posbase_pe > 0:
                dim0 += 3 + 3 * posbase_pe * 2
            elif rgbnet_direct:
                dim0 += self.k0_dim
            else:
                dim0 += self.k0_dim - 3
            if implicit_voxel_feat:
                # Grid-LIIF color: per-corner decoder input = (possibly
                # 27-unfolded) feature + rel_coord(3) [+ cell(3)] + view
                # embedding (lib/dvgo.py:109-118).
                imnet_in = self.k0_dim * (27 if feat_unfold else 1) + 3 \
                    + (3 if cell_decode else 0)
                dim0 = imnet_in + 3 + 3 * viewbase_pe * 2
                print("dvgo: implicit_voxel_feat dim0", dim0)
            self.rgbnet_dim0 = dim0
            self.params["rgbnet"] = mlp_lib.init_mlp(
                key, dim0, rgbnet_width, rgbnet_depth, 3)
            self.has_rgbnet = True
            print("dvgo: feature voxel grid", self.params["k0"].shape)

        # Occupancy mask from a coarse checkpoint, evaluated at this model's
        # grid points (lib/dvgo.py:135-153). The mask always has the density
        # grid's shape and this model's bounds.
        self.mask_cache_path = mask_cache_path
        self.mask_cache_thres = mask_cache_thres
        if mask_cache_path:
            self.mask = self._mask_from_coarse_ckpt(mask_cache_path,
                                                    mask_cache_thres)
        else:
            self.mask = jnp.ones(self.world_size, bool)

    # ------------------------------------------------------------------ setup

    def _set_grid_resolution(self, num_voxels):
        """Grid resolution from a voxel-count budget (lib/dvgo.py:155-165)."""
        self.num_voxels = num_voxels
        self.voxel_size = float(
            ((self.xyz_max - self.xyz_min).prod() / num_voxels) ** (1 / 3))
        q = getattr(self, "world_size_quantum", 1)
        # Quantize only production-scale dims: under 64 voxels a +-q/2
        # rounding is a >5% geometry perturbation (it collapsed window-
        # class formation at 32^3 test scale), while at the 128-176 pg
        # stages it is <=3% and buys cross-run compile-cache hits.
        self.world_size = tuple(
            q * round(int(v) / q) if q > 1 and int(v) >= 64 else int(v)
            for v in (self.xyz_max - self.xyz_min) / self.voxel_size)
        self.voxel_size_ratio = self.voxel_size / self.voxel_size_base
        print("dvgo: world_size      ", self.world_size)
        print("dvgo: voxel_size_ratio", self.voxel_size_ratio)

    def _coarse_mask_src(self, path, thres):
        """(coarse occupancy grid, bounds) from a coarse ckpt, cached —
        pg_scale re-evaluates the fine-resolution mask at every rescale,
        but the coarse-side derivation (ckpt read, maxpool, alpha) never
        changes (lib/dvgo.py:583-593, 139-148)."""
        cache = getattr(self, "_coarse_mask_cache", None)
        if cache is None or cache[0] != (path, thres):
            from ..engine import checkpoint as ckpt_lib
            st = ckpt_lib.load_checkpoint_file(path)
            c_kwargs = st["model_kwargs"]
            c_density = jnp.asarray(st["model_state_dict"]["density"])
            pooled = grid_ops.max_pool3d_same(c_density)
            alpha = rm.raw2alpha(pooled, c_kwargs["act_shift"],
                                 c_kwargs["voxel_size_ratio"])
            c_mask = alpha >= thres
            c_min = tuple(float(v) for v in
                          np.asarray(c_kwargs["xyz_min"], np.float64))
            c_max = tuple(float(v) for v in
                          np.asarray(c_kwargs["xyz_max"], np.float64))
            cache = ((path, thres), c_mask, c_min, c_max)
            self._coarse_mask_cache = cache
        return cache[1], cache[2], cache[3]

    def _mask_from_coarse_ckpt(self, path, thres):
        """Coarse-ckpt occupancy evaluated at this grid's points. The point
        lattice is built from three 1-D axis vectors broadcast on device —
        the previous host meshgrid + upload moved [X,Y,Z,3] floats (~50 MB
        at the 170-class stage) over the dev tunnel per call."""
        c_mask, c_min, c_max = self._coarse_mask_src(path, thres)
        # numpy float64 linspaces cast to f32: bit-identical coordinates to
        # the old meshgrid path, but only 3 tiny 1-D uploads.
        xs = jnp.asarray(np.linspace(self.xyz_min[0], self.xyz_max[0],
                                     self.world_size[0]), jnp.float32)
        ys = jnp.asarray(np.linspace(self.xyz_min[1], self.xyz_max[1],
                                     self.world_size[1]), jnp.float32)
        zs = jnp.asarray(np.linspace(self.xyz_min[2], self.xyz_max[2],
                                     self.world_size[2]), jnp.float32)
        return grid_ops.occupancy_lookup_parts(
            c_mask, xs[:, None, None], ys[None, :, None], zs[None, None, :],
            c_min, c_max)

    def grid_points(self):
        """[X, Y, Z, 3] world coords of every voxel center (align-corners)."""
        xs = np.linspace(self.xyz_min[0], self.xyz_max[0], self.world_size[0])
        ys = np.linspace(self.xyz_min[1], self.xyz_max[1], self.world_size[1])
        zs = np.linspace(self.xyz_min[2], self.xyz_max[2], self.world_size[2])
        return jnp.asarray(np.stack(
            np.meshgrid(xs, ys, zs, indexing="ij"), -1), jnp.float32)

    def get_kwargs(self):
        """Self-describing ckpt manifest (lib/dvgo.py:167-184)."""
        return {
            "xyz_min": np.asarray(self.xyz_min),
            "xyz_max": np.asarray(self.xyz_max),
            "num_voxels": self.num_voxels,
            "num_voxels_base": self.num_voxels_base,
            "alpha_init": self.alpha_init,
            "act_shift": self.act_shift,
            "voxel_size_ratio": self.voxel_size_ratio,
            "mask_cache_path": self.mask_cache_path,
            "mask_cache_thres": self.mask_cache_thres,
            "fast_color_thres": self.fast_color_thres,
            "k_density": self.k_density,
            "k_color": self.k_color,
            "query_mode": self.query_mode,
            "sweep_color_topk": self.sweep_color_topk,
            "world_size_quantum": self.world_size_quantum,
            **self.rgbnet_kwargs,
        }

    # ------------------------------------------------------- state surgery

    def maskout_near_cam_vox(self, cam_o, near):
        """Set density=-100 for voxels within ``near`` of any camera
        (lib/dvgo.py:215-226)."""
        pts = self.grid_points()
        cam_o = jnp.asarray(cam_o, jnp.float32)
        d2 = jnp.min(jnp.sum(
            (pts[..., None, :] - cam_o) ** 2, -1), -1)
        nearest = jnp.sqrt(d2)
        self.params["density"] = jnp.where(
            nearest <= near, -100.0, self.params["density"])

    def scale_volume_grid(self, num_voxels):
        """Progressive scaling: trilinear-upsample grids, refresh the mask
        (lib/dvgo.py:228-263)."""
        import time as _t
        _t0 = _t.time()
        print("dvgo: scale_volume_grid start")
        ori = self.world_size
        self._set_grid_resolution(num_voxels)
        print("dvgo: scale_volume_grid from", ori, "to", self.world_size)
        # ONE jitted program per pg event. The previous eager composition
        # (resize x2, maxpool/alpha chain, coarse-mask lookup, ~40 small
        # programs) re-compiled at every new grid shape — sub-second
        # compiles the persistent cache doesn't keep — and measured
        # 36-66 s per pg event over the remote tunnel (PERF_LOG run4).
        c_mask = c_bounds = None
        xs = ys = zs = None
        if self.mask_cache_path:
            c_mask, c_mn, c_mx = self._coarse_mask_src(
                self.mask_cache_path, self.mask_cache_thres)
            c_bounds = (c_mn, c_mx)
            xs, ys, zs = (jnp.asarray(np.linspace(
                float(self.xyz_min[a]), float(self.xyz_max[a]),
                self.world_size[a]), jnp.float32) for a in range(3))
        k0 = self.params["k0"] if self.k0_dim > 0 else None
        d, k, mask = _pg_rescale_jit(
            self.params["density"], k0, c_mask, xs, ys, zs,
            new_size=tuple(self.world_size),
            act_shift=float(self.act_shift),
            interval=float(self.voxel_size_ratio),
            thres=float(self.fast_color_thres), c_bounds=c_bounds)
        self.params["density"] = d
        self.params["k0"] = k if k is not None else jnp.zeros(
            (*self.world_size, self.k0_dim), jnp.float32)
        self.mask = mask
        print(f"dvgo: scale_volume_grid finish ({_t.time()-_t0:.1f} s, "
              "fused)")

    def update_occupancy_cache(self):
        """Periodic mask renewal: ``mask &= maxpool(alpha) > thres``
        (run.py:330-332). One jitted program — the eager op-by-op form
        dispatched ~5 programs per renewal, each paying remote-dispatch
        backpressure behind the training queue."""
        self.mask = self._update_occ_jit(self.params["density"], self.mask)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _update_occ_jit(self, density, mask):
        alpha = grid_ops.max_pool3d_same(self.activate_density(density))
        return mask & (alpha > self.fast_color_thres)

    def sweep_clip_for_axis(self, axis, quantum=16, fixed_sizes=None,
                            bbox=None):
        """(clip_sizes, clip_offsets) for :meth:`forward_sweep`: the occupancy
        mask's bbox in permuted order, sizes rounded up to ``quantum`` voxels
        so periodic mask renewals rarely change the compiled shape (offsets
        are runtime). Returns (None, zeros) when clipping wouldn't shrink
        anything. Host-side; call at stage start / mask renewal, not per step.

        ``fixed_sizes`` (permuted order): reuse an already-compiled box shape
        — offsets are refit to the current bbox and the sizes returned
        verbatim when every extent still fits (the engine's recompile
        hysteresis; mask renewals only intersect the mask, so extents only
        shrink within a stage). Returns None sizes if an extent outgrew it.
        """
        if getattr(self.mask, "ndim", 0) != 3:
            return None, np.zeros(3, np.int32)  # scene-stacked masks: skip
        if bbox is not None:
            # host (lo, hi) rows precomputed on device at renewal time and
            # pulled with the i_print batch (grid_ops.mask_bbox_vox_device)
            lo, hi = bbox
        else:
            cache = getattr(self, "_mask_bbox_cache", None)
            if cache is not None and cache[0] is self.mask:
                lo, hi = cache[1]
            else:
                lo, hi = grid_ops.mask_bbox_vox(self.mask)
                self._mask_bbox_cache = (self.mask, (lo, hi))
        perm = sweep_ops._PERMS[axis]
        if fixed_sizes is not None:
            offs = []
            for q, a in zip(fixed_sizes, perm):
                g = self.world_size[a]
                ext = int(hi[a] - lo[a] + 1)
                if ext > q or q > g:
                    return None, np.zeros(3, np.int32)  # outgrown: recompile
                offs.append(int(min(lo[a], g - q)))
            return tuple(fixed_sizes), np.asarray(offs, np.int32)
        sizes, offs = [], []
        for a in perm:
            g = self.world_size[a]
            ext = int(hi[a] - lo[a] + 1)
            q = min(_round_up(ext, quantum), g)
            sizes.append(q)
            offs.append(int(min(lo[a], g - q)))
        if all(s == self.world_size[a] for s, a in zip(sizes, perm)):
            return None, np.zeros(3, np.int32)
        return tuple(sizes), np.asarray(offs, np.int32)

    def tv_axis_scales(self):
        """Per-axis TV weight scale factors (weight=1), for the engine's
        boxed sparse-TV path (engine/train.py make_train_step)."""
        s = max(self.world_size) / 128.0
        return (s, s, s)

    def density_total_variation_grad(self, param, grad, weight, dense_mode):
        """TV gradient with the reference's resolution scaling
        (lib/dvgo.py:297-300)."""
        w = weight * max(self.world_size) / 128.0
        return total_variation_add_grad(param, grad, w, w, w, dense_mode)

    def k0_total_variation_grad(self, param, grad, weight, dense_mode):
        w = weight * max(self.world_size) / 128.0
        return total_variation_add_grad(param, grad, w, w, w, dense_mode)

    # ----------------------------------------------------------- sampling

    @property
    def n_samples_cap(self):
        """Static per-ray sample capacity (bbox diagonal / stepdist at the
        default stepsize is set lazily by callers via ``set_sample_cap``)."""
        return self._n_samples_cap

    def set_sample_cap(self, stepsize):
        stepdist = stepsize * self.voxel_size
        self._n_samples_cap = rm.max_samples_for_bbox(
            self.xyz_min, self.xyz_max, stepdist)

    def activate_density(self, density, interval=None):
        interval = interval if interval is not None else self.voxel_size_ratio
        return rm.raw2alpha(density, self.act_shift, interval)

    def grid_sampler(self, xyz, grid):
        """Trilinear query at world coords (lib/dvgo.py:312-328)."""
        idx = grid_ops.world_to_grid(xyz, jnp.asarray(self.xyz_min),
                                     jnp.asarray(self.xyz_max), grid.shape[:3])
        return grid_ops.trilinear_sample(grid, idx)

    def hit_coarse_geo(self, rays_o, rays_d, near, far, stepsize,
                       defer=False, **_):
        """True for rays whose samples hit the cached occupancy
        (lib/dvgo.py:412-423). Chunked host wrapper around a jitted core.

        ``defer=True`` returns ``(device_chunks, n)`` without syncing, so a
        caller looping over many views can dispatch every query before
        pulling any result (each sync over the remote tunnel costs a ~27 ms+
        round trip; the serial per-view form measured 45-66 s for a 40-view
        400^2 gather — see rays.get_training_rays_in_maskcache_sampling)."""
        rays_o = np.asarray(rays_o, np.float32).reshape(-1, 3)
        rays_d = np.asarray(rays_d, np.float32).reshape(-1, 3)
        n = rays_o.shape[0]
        # Large chunks: this runs once per training view at stage start, and
        # on the remote-attached chip per-dispatch latency (~27 ms) dominates
        # the lookup compute — 8192-ray chunks cost 20 s of pure dispatch
        # for a 24-view 400^2 gather.
        chunk = 65536
        n_pad = _round_up(max(n, 1), chunk)
        ro = np.concatenate([rays_o, np.zeros((n_pad - n, 3), np.float32)])
        rd = np.concatenate([rays_d, np.ones((n_pad - n, 3), np.float32)])
        outs = []
        for i in range(0, n_pad, chunk):
            outs.append(self._hit_coarse_geo_jit(
                self.mask, ro[i:i + chunk], rd[i:i + chunk],
                float(near), float(far), float(stepsize)))
        if defer:
            return outs, n
        return np.concatenate([np.asarray(o) for o in outs])[:n]

    def _hit_from_rays(self, mask, rays_o, rays_d, near, far, stepsize):
        stepdist = stepsize * self.voxel_size
        n_samples = rm.max_samples_for_bbox(self.xyz_min, self.xyz_max,
                                            stepdist)
        bbox_min = tuple(float(v) for v in self.xyz_min)
        bbox_max = tuple(float(v) for v in self.xyz_max)
        (px, py, pz), valid, _ = rm.sample_points_dense_parts(
            rays_o, rays_d, bbox_min, bbox_max, near, far, stepdist,
            n_samples)
        occ = grid_ops.occupancy_lookup_parts(mask, px, py, pz,
                                              bbox_min, bbox_max)
        return jnp.any(occ & valid, axis=-1)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def _hit_coarse_geo_jit(self, mask, rays_o, rays_d, near, far, stepsize):
        return self._hit_from_rays(mask, rays_o, rays_d, near, far, stepsize)

    def hit_coarse_geo_view(self, H, W, K, c2w, near, far, stepsize,
                            inverse_y=False, flip_x=False, flip_y=False,
                            packed=False, **_):
        """One whole view's hit mask with DEVICE-side ray generation.

        The host-ray form ships ~3.8 MB of rays up per 400^2 view (~176 MB
        for a 46-view gather — tens of seconds over the dev tunnel); here
        only (K, c2w) go up and [H*W] booleans come back, and the per-pixel
        ray math (rays.get_rays 'center' mode) runs on-device. K and c2w
        are traced, so every view of a split shares one compiled program.
        Returns a device array — callers batch the pulls.

        ``packed=True`` returns a ``uint8[ceil(H*W/8)]`` bit-pack instead
        (np.unpackbits bit order): the pull is the gather's last big
        transfer (100 x 800^2 bools = 64 MB over the dev tunnel measured as
        the bulk of a 90 s fine-stage gather), and packing on-device cuts
        it 8x. Decode with ``np.unpackbits(a)[:H*W]``."""
        return self._hit_view_jit(
            self.mask, jnp.asarray(np.asarray(K, np.float32)),
            jnp.asarray(np.asarray(c2w, np.float32)[:3, :4]), int(H),
            int(W), bool(inverse_y), bool(flip_x), bool(flip_y),
            float(near), float(far), float(stepsize), bool(packed))

    @functools.partial(jax.jit,
                       static_argnums=(0, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    def _hit_view_jit(self, mask, K, c2w, H, W, inverse_y, flip_x, flip_y,
                      near, far, stepsize, packed=False):
        j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                            jnp.arange(W, dtype=jnp.float32), indexing="ij")
        i, j = i + 0.5, j + 0.5
        if flip_x:
            i = i[:, ::-1]
        if flip_y:
            j = j[::-1, :]
        u = (i - K[0, 2]) / K[0, 0]
        v = (j - K[1, 2]) / K[1, 1]
        if inverse_y:
            dirs = (u, v, jnp.ones_like(u))
        else:
            dirs = (u, -v, -jnp.ones_like(u))
        # Elementwise row combination, NOT a dot: TPU matmuls default to
        # bf16 operands, which would perturb sample points vs the host f32
        # ray math that builds the training pool.
        rot = c2w[:3, :3]
        rays_d = jnp.stack(
            [dirs[0] * rot[r, 0] + dirs[1] * rot[r, 1] + dirs[2] * rot[r, 2]
             for r in range(3)], -1).reshape(-1, 3)
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        hit = self._hit_from_rays(mask, rays_o, rays_d, near, far,
                                  stepsize)
        if not packed:
            return hit
        n8 = -(-(H * W) // 8) * 8
        bits = jnp.pad(hit, (0, n8 - H * W)).reshape(-1, 8)
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
        return jnp.sum(bits.astype(jnp.uint8) * weights, axis=-1,
                       dtype=jnp.uint8)

    # ------------------------------------------------------------ forward

    def forward(self, params, mask, rays_o, rays_d, viewdirs,
                global_step=None, **render_kwargs):
        """Volume rendering over a ray batch (lib/dvgo.py:450-577).

        Pure function of (params, mask, rays); returns a dict with
        ``rgb_marched [N,3]``, ``alphainv_last [N]``, dense per-sample fields
        ``weights/raw_alpha/raw_rgb`` shaped ``[N, K]``(+channel), and
        optionally ``depth [N]``.
        """
        return self._render_rays(
            params["density"], params.get("k0"), params.get("rgbnet"),
            mask, rays_o, rays_d, viewdirs, **render_kwargs)

    def _render_rays(self, density_grid, k0_grid, rgbnet_params, mask,
                     rays_o, rays_d, viewdirs, *, near, far, bg, stepsize,
                     render_depth=False, **_):
        """Core render path over explicit grids (shared with the multiscene
        variant, which selects per-scene grids first).

        Coordinates are carried as (x, y, z) component tensors [N, S] — the
        packed [N, S, 3] layout maps xyz onto the 128-lane minor axis and is
        ~3 orders of magnitude slower on the TPU vector unit.
        """
        bbox_min = tuple(float(v) for v in self.xyz_min)
        bbox_max = tuple(float(v) for v in self.xyz_max)
        stepdist = stepsize * self.voxel_size
        interval = stepsize * self.voxel_size_ratio
        n_cap = rm.max_samples_for_bbox(self.xyz_min, self.xyz_max, stepdist)

        # 1. dense sampling + occupancy (sample_pts_on_rays + mask_cache).
        (px, py, pz), valid, step_sl = rm.sample_points_dense_parts(
            rays_o, rays_d, bbox_min, bbox_max, near, far, stepdist, n_cap)
        occ = grid_ops.occupancy_lookup_parts(
            mask, px, py, pz, bbox_min, bbox_max) & valid
        step_f = jnp.broadcast_to(step_sl.astype(jnp.float32)[None, :],
                                  px.shape)

        # 2. fixed-capacity compaction of occupied samples in step order.
        k_d = self.k_density or n_cap
        if k_d < n_cap:
            big = jnp.float32(2 * n_cap)
            key = jnp.where(occ, step_f, big + step_f)
            _, px, py, pz, occ, step_f = rm.compact_by_key(
                key, k_d, px, py, pz, occ, step_f)

        # 3. density -> alpha -> weights (Raw2Alpha + Alphas2Weights).
        density = grid_ops.trilinear_sample_world(
            density_grid, px, py, pz, bbox_min, bbox_max)
        alpha = rm.raw2alpha(density, self.act_shift, interval)
        if self.fast_color_thres > 0:
            occ = occ & (alpha > self.fast_color_thres)
        weights, alphainv_last, live = rm.alpha2weight_dense(alpha, occ)
        if self.fast_color_thres > 0:
            wmask = weights > self.fast_color_thres
        else:
            wmask = live
        w_eff = jnp.where(wmask, weights, 0.0)

        # 4. top-k-by-weight compaction before the color query. Weight that
        # the cap drops is returned to the background term so
        # sum(weights) + alphainv_last stays 1 — without this, truncated
        # rays (translucent content with > k_color significant samples)
        # darken relative to the reference, which keeps ALL above-threshold
        # samples (lib/dvgo.py:478-494). Quantified in PERF_LOG.md
        # (capacity sweep); the shipping sweep path has no compaction.
        k_c = self.k_color if (self.has_rgbnet and self.k_color) else 0
        if k_c and k_c < w_eff.shape[-1]:
            w_total = jnp.sum(w_eff, axis=-1)
            _, w_eff, px, py, pz, step_f, alpha, wmask = rm.compact_by_key(
                -w_eff, k_c, w_eff, px, py, pz, step_f, alpha, wmask)
            alphainv_last = alphainv_last + jax.lax.stop_gradient(
                w_total - jnp.sum(w_eff, axis=-1))

        # 5. color.
        if self.has_rgbnet and self.implicit_voxel_feat:
            vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
            vd_emb = jnp.broadcast_to(vd_emb[:, None, :],
                                      (*px.shape, vd_emb.shape[-1]))
            rgb = self._implicit_color(k0_grid, rgbnet_params, px, py, pz,
                                       vd_emb, stepsize,
                                       bbox_min, bbox_max)
            rgb_marched = jnp.sum(w_eff[..., None] * rgb, axis=1) \
                + alphainv_last[..., None] * bg
            ret = {
                "alphainv_last": alphainv_last, "weights": w_eff,
                "rgb_marched": rgb_marched,
                "raw_alpha": jnp.where(wmask, alpha, 0.0),
                "raw_rgb": rgb, "wmask": wmask,
            }
            if render_depth:
                ret["depth"] = jax.lax.stop_gradient(
                    jnp.sum(w_eff * step_f, axis=1))
            return ret
        if not self.rgbnet_full_implicit:
            k0 = grid_ops.trilinear_sample_world(
                k0_grid, px, py, pz, bbox_min, bbox_max)
        if not self.has_rgbnet:
            rgb = jax.nn.sigmoid(k0)
        else:
            vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
            vd_emb = jnp.broadcast_to(vd_emb[:, None, :],
                                      (*px.shape, vd_emb.shape[-1]))
            if self.rgbnet_full_implicit:
                feat = vd_emb
            elif self.posbase_pe > 0:
                pts = jnp.stack([px, py, pz], -1)
                pos_emb = mlp_lib.positional_encoding(pts, self.posbase_pe)
                feat = jnp.concatenate([pos_emb, vd_emb], -1)
            elif self.rgbnet_direct:
                feat = jnp.concatenate([k0, vd_emb], -1)
            else:
                feat = jnp.concatenate([k0[..., 3:], vd_emb], -1)
            logit = mlp_lib.mlp_apply(rgbnet_params, feat)
            if self.rgbnet_direct or self.rgbnet_full_implicit \
                    or self.posbase_pe > 0:
                rgb = jax.nn.sigmoid(logit)
            else:
                rgb = jax.nn.sigmoid(logit + k0[..., :3])

        # 6. ray marching (segment_coo -> masked sum over the sample axis).
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

    # ------------------------------------------------- grid-LIIF color

    @staticmethod
    def _unfold_grid_3x3x3(grid):
        """3x3x3 replicate-padded neighborhood concat, position-outer
        layout: out[..., (di*9+dj*3+dk)*C + c] — reference ``unfold_feat``
        (lib/dvgo.py:186-198: F.pad(mode='replicate') then cat(dim=1) per
        window position)."""
        nx, ny, nz, c = grid.shape
        padded = jnp.pad(grid, ((1, 1), (1, 1), (1, 1), (0, 0)),
                         mode="edge")
        shifts = [padded[i:i + nx, j:j + ny, k:k + nz]
                  for i in range(3) for j in range(3) for k in range(3)]
        return jnp.concatenate(shifts, axis=-1)

    def _implicit_color(self, k0_grid, rgbnet_params, px, py, pz, vd_emb,
                        stepsize, bbox_min, bbox_max):
        """LIIF interpolation on the voxel feature grid (lib/dvgo.py:329-410,
        502-551): 8 corner taps via half-voxel-shifted nearest lookup, the
        color MLP decodes [feat, rel_coord(, cell), viewdir emb] per corner,
        and the sigmoided predictions are volume-weighted.

        Reference quirks preserved: NO diagonal volume swap (the "TODO swap
        volume ???" branch, :550), and ``cell`` is the un-rescaled
        ``2*stepsize/world_size`` vector (:352-355). ``rel_coord`` uses the
        reference's normalized-delta-times-world_size scale (~2x voxel
        units, :394-397).
        """
        nx, ny, nz = k0_grid.shape[:3]
        c = k0_grid.shape[-1]
        grid = self._unfold_grid_3x3x3(k0_grid) if self.feat_unfold \
            else k0_grid
        grid_flat = grid.reshape(-1, grid.shape[-1])
        ix, iy, iz = grid_ops.world_to_grid_parts(
            px, py, pz, bbox_min, bbox_max, (nx, ny, nz))

        shifts = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1)
                  for sz in (-1, 1)] if self.local_ensemble else [(0, 0, 0)]
        cell = [2.0 * stepsize / nx, 2.0 * stepsize / ny,
                2.0 * stepsize / nz] if self.cell_decode else None

        preds, volumes = [], []
        for sx, sy, sz in shifts:
            cx = jnp.clip(jnp.floor(ix) + (sx > 0), 0, nx - 1)
            cy = jnp.clip(jnp.floor(iy) + (sy > 0), 0, ny - 1)
            cz = jnp.clip(jnp.floor(iz) + (sz > 0), 0, nz - 1)
            lin = ((cx.astype(jnp.int32) * ny + cy.astype(jnp.int32)) * nz
                   + cz.astype(jnp.int32))
            q_feat = jnp.take(grid_flat, lin, axis=0)
            # ~2x voxel-unit deltas (reference rel_coord scale)
            rx, ry, rz = [2.0 * (i - q) for i, q in
                          ((ix, cx), (iy, cy), (iz, cz))]
            inp = [q_feat, rx[..., None], ry[..., None], rz[..., None]]
            if cell is not None:
                inp += [jnp.full_like(rx[..., None], v) for v in cell]
            feat = jnp.concatenate(inp + [vd_emb], -1)
            logit = mlp_lib.mlp_apply(rgbnet_params, feat)
            preds.append(jax.nn.sigmoid(logit))
            volumes.append(jnp.abs(rx * ry * rz) + 1e-9)
        tot = sum(volumes)
        rgb = 0.0
        for p, v in zip(preds, volumes):
            rgb = rgb + p * (v / tot)[..., None]
        return rgb

    # ----------------------------------------------------- sweep forward

    def forward_sweep(self, params, mask, rays_o, rays_d, viewdirs, axis,
                      *, near, far, bg, stepsize, render_depth=False,
                      clip_sizes=None, clip_offsets=None,
                      grids_pre_clipped=False, tile_windows=None,
                      block_windows=None, **_):
        """Station-sweep volume rendering (the TPU fast path).

        Same math as :meth:`forward` but every grid query is an MXU matmul
        (:mod:`...ops.sweep`): samples sit on half-voxel stations along the
        batch's dominant ``axis``; density, occupancy-mask and color features
        are swept in one pass (stacked channels), so there are no gathers in
        the forward and no scatters in the backward. The color MLP runs on
        every station (cheap on the MXU), with ``fast_color_thres``
        implemented as masks rather than compactions.

        ``axis`` must be static under jit; the train engine groups ray
        batches by dominant axis. ``clip_sizes`` (static, permuted order) +
        ``clip_offsets`` (traced int32 [3]) restrict the sweep to the
        occupancy-mask bbox — see :func:`...ops.sweep.sweep_samples`; the
        engine derives them via :meth:`sweep_clip_for_axis`.

        ``grids_pre_clipped``: ``params['density']``/``params['k0']`` and
        ``mask`` are already the clip box (xyz order). The train engine uses
        this to differentiate w.r.t. the box slices directly, so grid
        gradients stay box-sized end-to-end — the full-grid pad + layout
        copy the dynamic_slice VJP otherwise inserts cost ~1.5 ms/step at
        160^3 (profiled: copy.25 + fusion.57 in tools/trace_train_step.py).
        """
        # Cast channels to the sweep's compact dtype before concat+transpose
        # so the layout shuffles move half the bytes; slice BEFORE the cast
        # when clipping (casting the full 160^3 k0 then slicing wasted
        # 0.7 ms/step, convert_element_type.46 in the trace).
        sdt = self.sweep_dtype
        density, k0, mask_g = params["density"], params.get("k0"), mask
        if clip_sizes is not None and not grids_pre_clipped:
            perm = sweep_ops._PERMS[axis]
            inv = {ax: i for i, ax in enumerate(perm)}
            sizes_xyz = tuple(int(clip_sizes[inv[a]]) for a in range(3))
            offs_xyz = tuple(clip_offsets[inv[a]] for a in range(3))
            density = jax.lax.dynamic_slice(density, offs_xyz, sizes_xyz)
            mask_g = jax.lax.dynamic_slice(mask_g, offs_xyz, sizes_xyz)
            if k0 is not None and self.k0_dim > 0:
                k0 = jax.lax.dynamic_slice(
                    k0, (*offs_xyz, jnp.int32(0)),
                    (*sizes_xyz, k0.shape[3]))
        chans = [density.astype(sdt)[..., None],
                 mask_g.astype(sdt)[..., None]]
        if self.k0_dim > 0:
            chans.append(k0.astype(sdt))
        grid_cat = jnp.concatenate(chans, axis=-1)

        bbox_min = tuple(float(v) for v in self.xyz_min)
        bbox_max = tuple(float(v) for v in self.xyz_max)
        if block_windows is not None and clip_sizes is None:
            # Per-p-block (u, v) windows: B composed clip-box sub-sweeps
            # concatenated along the station axis (see
            # ops/sweep.build_ray_segments_blocked for the exactness
            # argument and the measured ~0.16x FLOP blend).
            block_sizes, (u_off, v_off) = block_windows
            out = sweep_ops.sweep_samples_blocked(
                grid_cat, rays_o, rays_d, bbox_min, bbox_max, axis,
                block_sizes, u_off, v_off, stepsize=stepsize,
                interp_dtype=sdt)
        else:
            out = sweep_ops.sweep_samples(grid_cat, None, rays_o, rays_d,
                                          bbox_min, bbox_max, axis,
                                          stepsize=stepsize,
                                          march_order=False,
                                          interp_dtype=sdt,
                                          clip_sizes=clip_sizes,
                                          clip_offsets=clip_offsets,
                                          pre_clipped=True,
                                          world_size=tuple(self.world_size),
                                          tile_windows=tile_windows)
        # vals is channels-LEADING [C, N, S]: slicing channels off the
        # leading dim keeps every downstream tensor [N, S] or [N, S, >=128]
        # (TPU tiles pad the minor dim to 128 lanes; [N, S, smallC]
        # materializations move ~9x the real bytes).
        vals, t, fwd = out["vals"], out["t"], out["forward"]
        density_s = vals[0]
        mask_s = vals[1]
        k0_cl = vals[2:]

        # Validity: inside the ray's [near,far]-clamped bbox segment and in
        # (conservatively interpolated) occupied space. The reference filters
        # by the nearest voxel's mask (lib/dvgo.py:469-473); interpolated
        # mask > 0 keeps a superset — alpha/weight thresholds prune the rest.
        t_lo, t_hi = rm.ray_aabb_tminmax(rays_o, rays_d,
                                         jnp.asarray(self.xyz_min),
                                         jnp.asarray(self.xyz_max),
                                         near, far)
        valid = (t >= t_lo[:, None]) & (t <= t_hi[:, None]) \
            & (t_hi > t_lo)[:, None] & (mask_s > 0)

        # interval per ray (reference: stepsize * voxel_size_ratio,
        # lib/dvgo.py:466; here the station spacing along the ray varies per
        # ray by 1/|unit_d_axis|).
        interval = (out["interval"] / self.voxel_size_base)[:, None]
        alpha = rm.raw2alpha(density_s, self.act_shift, interval)
        occ = valid
        if self.fast_color_thres > 0:
            occ = occ & (alpha > self.fast_color_thres)
        weights, alphainv_last, live = rm.alpha2weight_dense_bidir(
            alpha, occ, fwd)
        if self.fast_color_thres > 0:
            wmask = weights > self.fast_color_thres
        else:
            wmask = live
        w_eff = jnp.where(wmask, weights, 0.0)

        mlp_dtype = self.mlp_dtype
        # --- Top-K station compaction for the color path ------------------
        # The reference drops samples with weight <= fast_color_thres before
        # running the color MLP (lib/dvgo.py:488-494) — late in training only
        # ~10-50 of the ~160 stations per ray survive. Static shapes forbid
        # data-dependent sizes, so the analogue is: gather the top-K stations
        # per ray by weight and run the MLP (the dominant [N, S, width]
        # HBM-traffic term) on [N, K] only. Exact whenever a ray has <= K
        # above-threshold samples (below-threshold ones contribute nothing);
        # gated to big sweeps (s_total > max(96, 2K)) so small/early-stage
        # grids — where weights are still spread over every station — keep
        # the dense path. All differentiable gathers go through a one-hot
        # [N, K, S] matmul (batched dot_general over rays): its transpose is
        # again a matmul, so the backward has no XLA scatter anywhere.
        s_total = t.shape[1]
        topk = self.sweep_color_topk
        compact = (self.has_rgbnet and not self.implicit_voxel_feat
                   and not self.rgbnet_full_implicit
                   and self.fast_color_thres > 0
                   and 0 < topk < s_total and s_total > max(96, 2 * topk))
        if compact:
            idx, sel_nk, sel_cl = sweep_ops.topk_station_select(
                w_eff, topk, gather_mode=_COMPACT_GATHER)
            w_eff = sel_nk(w_eff)
            wmask = jnp.take_along_axis(wmask, idx, axis=1)
            alpha = jnp.take_along_axis(alpha, idx, axis=1)
            t = sel_nk(t)
            if self.k0_dim > 0:
                k0_cl = sel_cl(k0_cl)
        # Rematerialize the color MLP in the backward pass only when its
        # [N, S, width] hidden activations are big enough to pressure HBM
        # (>4M samples ~ >1 GB of bf16 residuals per layer). Below that,
        # storing residuals is 2.8 ms/step FASTER than recomputing
        # (measured at 8192x159, PERF_LOG.md).
        n_samples_est = rays_o.shape[0] * (
            topk if compact else
            (clip_sizes[0] if clip_sizes is not None
             else self.world_size[axis]) *
            sweep_ops.substeps_for_stepsize(stepsize))
        maybe_remat = jax.checkpoint if n_samples_est > 4_000_000 \
            else (lambda f, **kw: f)
        mlp_split_cl = maybe_remat(functools.partial(
            mlp_lib.mlp_apply_split_cl, compute_dtype=mlp_dtype))
        if not self.has_rgbnet:
            rgb_cl = jax.nn.sigmoid(k0_cl)          # [3, N, S]
        else:
            vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
            if self.rgbnet_full_implicit:
                feat = jnp.broadcast_to(vd_emb[:, None, :],
                                        (*t.shape, vd_emb.shape[-1]))
                logit = jax.checkpoint(functools.partial(
                    mlp_lib.mlp_apply, compute_dtype=mlp_dtype))(
                        params["rgbnet"], feat)
                logit_cl = jnp.transpose(logit, (2, 0, 1))
            elif self.posbase_pe > 0:
                pts = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
                pos_emb = mlp_lib.positional_encoding(pts, self.posbase_pe)
                logit = jax.checkpoint(functools.partial(
                    mlp_lib.mlp_apply_split, compute_dtype=mlp_dtype))(
                        params["rgbnet"], pos_emb, vd_emb)
                logit_cl = jnp.transpose(logit, (2, 0, 1))
            elif self.rgbnet_direct:
                logit_cl = mlp_split_cl(params["rgbnet"], k0_cl, vd_emb)
            else:
                logit_cl = mlp_split_cl(params["rgbnet"], k0_cl[3:], vd_emb)
            if self.rgbnet_direct or self.rgbnet_full_implicit \
                    or self.posbase_pe > 0:
                rgb_cl = jax.nn.sigmoid(logit_cl)
            else:
                rgb_cl = jax.nn.sigmoid(logit_cl + k0_cl[:3])

        rgb_marched = jnp.einsum("ns,cns->nc", w_eff, rgb_cl) \
            + alphainv_last[..., None] * bg
        ret = {
            "alphainv_last": alphainv_last,
            "weights": w_eff,
            "rgb_marched": rgb_marched,
            "raw_alpha": jnp.where(wmask, alpha, 0.0),
            "raw_rgb_cl": rgb_cl,
            "wmask": wmask,
        }
        if render_depth:
            d_norm = jnp.sqrt(jnp.sum(rays_d * rays_d, axis=-1))
            t_safe = jnp.where(wmask, t, 0.0)
            ret["depth"] = jax.lax.stop_gradient(
                jnp.sum(w_eff * t_safe, axis=1) * d_norm)
        return ret

    # ------------------------------------------------ fused train forward

    def supports_fused_step(self):
        """Whether the fully fused Pallas train step (sweep + compositing
        chain + MLP in two kernels, ops/pallas_train_fused.py) can replace
        the XLA chain for this model's config. The fused kernels implement
        exactly the standard DVGO fine-stage composition
        (lib/dvgo.py:450-577): trilinear station queries, a 3-layer split
        MLP over (k0 feats, view embedding), fast_color_thres gating."""
        return (self.has_rgbnet and not self.implicit_voxel_feat
                and not self.rgbnet_full_implicit and self.posbase_pe == 0
                and self.k0_dim > 0 and self.rgbnet_depth == 3
                and self.fast_color_thres > 0
                and self.sweep_dtype == jnp.bfloat16
                and (self.k0_dim if self.rgbnet_direct
                     else self.k0_dim - 3) >= 1)

    def forward_sweep_fused(self, params, mask, rays_o, rays_d, viewdirs,
                            axis, target, *, near, far, bg, stepsize,
                            clip_offsets=None, window=None, s_blk=None,
                            nt=None, interpret=False, **_):
        """Fused-kernel train forward (ops/pallas_train_fused.py).

        Same math as :meth:`forward_sweep` + the loss-facing reductions,
        but the whole [N, S] chain lives in VMEM; only [N]-sized outputs
        reach HBM. Grids must arrive PRE-CLIPPED to the sweep box (the
        region-mode train step's contract); ``clip_offsets`` is the traced
        permuted-order box start for the ray-coordinate shift. The ray
        batch must be direction-uniform along ``axis`` (the engine's
        segment builder guarantees this — ops/sweep.build_ray_segments_2d).

        ``window=(wu, wv)`` (static ints, wu % 16 == wv % 8 == 0) enables
        per-(station-block, ray-TILE) windowed slab reads inside the
        kernels: each (8-station block, 512-ray tile) grid cell touches
        only its own (wu, wv) in-plane sub-window — bounded by the tile
        spread plus ~4 voxels of per-ray drift instead of the whole
        traversal's drift (ops/pallas_train_fused.blocktile_uv_bases).
        Exact whenever every cell's footprint fits the class — the
        engine's tile builder groups same-class tiles into batches
        (ops/sweep.build_ray_tiles_blocktile).

        Returns dict(rgb_marched [N,3], alphainv_last [N], rgbper_sum [N]):
        rgbper_sum is ``sum_s w_eff * ||rgb_s - target||^2`` per ray, i.e.
        the inner term of the reference's per-point rgb loss
        (run.py:380-384) with weights detached.
        """
        from ..ops import pallas_train_fused as ptf

        # Mosaic kernels need a TPU; CPU callers (tests, the forced-mode
        # engine gate) fall back to interpret mode automatically.
        interpret = interpret or jax.default_backend() != "tpu"
        k = sweep_ops.substeps_for_stepsize(stepsize)
        density, k0 = params["density"], params["k0"]
        perm = sweep_ops._PERMS[axis]
        density_pm = jnp.transpose(density.astype(jnp.float32), perm)
        mask_pm = jnp.transpose(mask.astype(jnp.float32), perm)
        k0_pm = jnp.transpose(k0.astype(jnp.float32), (*perm, 3))

        bbox_min = tuple(float(v) for v in self.xyz_min)
        bbox_max = tuple(float(v) for v in self.xyz_max)
        o_pv, d_pv = sweep_ops.rays_to_voxel(
            rays_o, rays_d, bbox_min, bbox_max, tuple(self.world_size),
            axis)
        if clip_offsets is not None:
            offs_f = clip_offsets.astype(jnp.float32)
            o_pv = tuple(o - offs_f[i] for i, o in enumerate(o_pv))
        dp = d_pv[0]
        dp_safe = jnp.where(dp == 0, 1e-10, dp)
        t_lo, t_hi = rm.ray_aabb_tminmax(
            rays_o, rays_d, jnp.asarray(self.xyz_min),
            jnp.asarray(self.xyz_max), near, far)
        d_norm = jnp.sqrt(jnp.sum(rays_d * rays_d, axis=-1))
        interval = d_norm / (k * jnp.maximum(jnp.abs(dp), 1e-10)) \
            / self.voxel_size_base
        n = rays_o.shape[0]
        zeros = jnp.zeros((n,), jnp.float32)
        rays16 = jnp.stack(
            [o_pv[0], o_pv[1], o_pv[2], dp_safe, d_pv[1], d_pv[2],
             t_lo, t_hi, interval,
             target[:, 0], target[:, 1], target[:, 2],
             zeros, zeros, zeros, zeros]).astype(jnp.float32)

        fdim = self.k0_dim if self.rgbnet_direct else self.k0_dim - 3
        layers = params["rgbnet"]["layers"]
        w1, b1 = layers[0]["w"], layers[0]["b"]
        vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
        shared = jnp.dot(vd_emb, w1[fdim:],
                         preferred_element_type=jnp.float32) + b1
        sh1_t = shared.T.astype(jnp.float32)

        wu, wv = (int(window[0]), int(window[1])) if window else (0, 0)
        cfg = ptf.FusedCfg(
            k=int(k), f=int(fdim), width=int(self.rgbnet_width),
            act_shift=float(self.act_shift),
            thres=float(self.fast_color_thres), bg=float(bg),
            direct=bool(self.rgbnet_direct), wu=wu, wv=wv,
            s_blk=int(s_blk or ptf.S_BLK), nt=int(nt or ptf.NT),
            interpret=interpret)
        rgb, ainv, rgbper = ptf.fused_chain(
            cfg, density_pm, k0_pm, mask_pm, rays16, sh1_t,
            params["rgbnet"])
        return {"rgb_marched": rgb, "alphainv_last": ainv,
                "rgbper_sum": rgbper}

    def __call__(self, rays_o, rays_d, viewdirs, global_step=None, **kw):
        """Eager convenience wrapper over :meth:`forward`."""
        return self.forward(self.params, self.mask,
                            jnp.asarray(rays_o), jnp.asarray(rays_d),
                            jnp.asarray(viewdirs), global_step, **kw)

    # ---------------------------------------------------- pervoxel-lr init

    def voxel_count_views(self, rays_o_tr, rays_d_tr, imsz, near, far,
                          stepsize, downrate=1, irregular_shape=False,
                          rays_dev=None):
        """Count, per voxel, how many training views touch it.

        The reference backprops through grid_sample of a ones-grid
        (lib/dvgo.py:265-295). Two implementations:

        * sweep models: the count field IS the station-sweep transpose with
          ones cotangents — per station a dense [Gu,N]x[N,Gv] interp-row
          product on the MXU, no scatter. The XLA scatter form below queued
          ~165 s of TPU work at lego scale (the per-sample 8-corner
          scatter-add is the pathological op class on TPU); this runs in a
          few seconds. Station samples sit on sweep-axis planes rather than
          the reference's fixed arc-length steps, so per-sample weights
          differ by the |d_axis| spacing factor (<= sqrt(3)); the >1
          view-threshold makes the resulting count field near-identical
          (tested against the scatter form in tests/test_model.py).
        * otherwise: VJP of the trilinear sampler (exact reference weights).
        """
        print("dvgo: voxel_count_views start")
        import time as _t
        t0 = _t.time()
        # A/B hook (tools/ab_count_views.py): the sweep form's station
        # spacing differs from the reference's arc-length steps by up to
        # sqrt(3) per sample (freeze-mask IoU 0.98 vs the scatter oracle);
        # DVGO_COUNT_FORM forces one form regardless of query_mode so the
        # divergence can be A/B'd end-to-end at fixture scale.
        form = os.environ.get("DVGO_COUNT_FORM", "")
        if form not in ("", "sweep", "exact"):
            # A leaked/typo'd value (e.g. 'Sweep') silently forcing the
            # ~165 s-queued exact form would degrade every startup.
            raise ValueError(
                f"DVGO_COUNT_FORM={form!r}: expected 'sweep' or 'exact'")
        use_sweep = (form == "sweep" if form
                     else getattr(self, "query_mode", "gather") == "sweep")
        if use_sweep:
            out = self._voxel_count_views_sweep(
                rays_o_tr, rays_d_tr, imsz, stepsize, downrate,
                rays_dev=rays_dev)
            print(f"dvgo: voxel_count_views finish (sweep form, eps time: "
                  f"{_t.time()-t0} sec)")
            return out
        count = jnp.zeros(self.world_size, jnp.float32)
        n_samples = int(np.linalg.norm(np.array(self.world_size) + 1)
                        / stepsize) + 1
        rng = np.arange(n_samples, dtype=np.float32)[None]

        @jax.jit
        def chunk_grad(rays_o, rays_d, ray_w):
            vec = jnp.where(rays_d == 0, 1e-6, rays_d)
            rate_a = (jnp.asarray(self.xyz_max) - rays_o) / vec
            rate_b = (jnp.asarray(self.xyz_min) - rays_o) / vec
            t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), -1),
                             near, far)
            step = stepsize * self.voxel_size * jnp.asarray(rng)
            interpx = t_min[..., None] + step / jnp.linalg.norm(
                rays_d, axis=-1, keepdims=True)
            pts = rays_o[..., None, :] + rays_d[..., None, :] \
                * interpx[..., None]

            def total(ones_grid):
                # ray_w zeroes padded rays so they don't pollute the count.
                return jnp.sum(
                    self.grid_sampler(pts, ones_grid) * ray_w[:, None])

            return jax.grad(total)(jnp.ones(self.world_size, jnp.float32))

        views_o = np.split(np.asarray(rays_o_tr), np.cumsum(imsz)[:-1]) \
            if not isinstance(rays_o_tr, list) else rays_o_tr
        views_d = np.split(np.asarray(rays_d_tr), np.cumsum(imsz)[:-1]) \
            if not isinstance(rays_d_tr, list) else rays_d_tr
        CHUNK = 65536  # dispatch-latency bound at stage start; see
        # hit_coarse_geo on the chunk-size choice.
        for ro, rd in zip(views_o, views_d):
            ro = np.asarray(ro)
            rd = np.asarray(rd)
            while ro.ndim > 3:  # split() leaves a leading length-1 dim
                ro, rd = ro[0], rd[0]
            if ro.ndim == 3:  # [H, W, 3] image layout
                ro = ro[::downrate, ::downrate].reshape(-1, 3)
                rd = rd[::downrate, ::downrate].reshape(-1, 3)
            else:
                ro = ro.reshape(-1, 3)
                rd = rd.reshape(-1, 3)
            # Per-view grad accumulation over ray chunks, then threshold —
            # matching ones.grad accumulation in the reference (dvgo.py:281-292).
            n = ro.shape[0]
            n_pad = _round_up(max(n, 1), CHUNK)
            ro = np.concatenate([ro, np.zeros((n_pad - n, 3), np.float32)])
            rd = np.concatenate([rd, np.ones((n_pad - n, 3), np.float32)])
            ray_w = np.zeros((n_pad,), np.float32)
            ray_w[:n] = 1.0
            g_view = jnp.zeros(self.world_size, jnp.float32)
            for i in range(0, n_pad, CHUNK):
                g_view = g_view + chunk_grad(jnp.asarray(ro[i:i + CHUNK]),
                                             jnp.asarray(rd[i:i + CHUNK]),
                                             jnp.asarray(ray_w[i:i + CHUNK]))
            count = count + (g_view > 1).astype(jnp.float32)
        print(f"dvgo: voxel_count_views finish (eps time: {_t.time()-t0} sec)")
        return count

    def _voxel_count_views_sweep(self, rays_o_tr, rays_d_tr, imsz, stepsize,
                                 downrate=1, rays_dev=None):
        """Scatter-free view counting (see :meth:`voxel_count_views`).

        ``rays_dev``: optional (rays_o, rays_d) DEVICE arrays holding the
        same flattened ray pool — each view is then dynamic-sliced on
        device and only two scalars go up per view. Without it, per-view
        host rays are uploaded: ~4.5 MB x 46 views = ~200 MB, measured as
        a 286 s queue drain at the first clip-plan pull when the dev
        tunnel's bandwidth troughs (the engine device-puts the identical
        pool immediately before this call). Host path kept for image-layout
        (``downrate``) views.
        """
        from ..ops import sweep as sweep_ops

        count = jnp.zeros(self.world_size, jnp.float32)
        k = sweep_ops.substeps_for_stepsize(stepsize)
        count_fns = {}  # (axis, n) -> jitted per-view count-field fn

        def make_count_fn(axis, n):
            perm = sweep_ops._PERMS[axis]
            gp, gu, gv = (int(self.world_size[a]) for a in perm)
            inv_perm = tuple(int(x) for x in np.argsort(perm))
            no_vb = jnp.zeros((0,), jnp.int32)

            @jax.jit
            def count_fn(ro, rd, ray_w):
                rays_pv = sweep_ops.rays_to_voxel(
                    ro, rd, self.xyz_min, self.xyz_max, self.world_size,
                    axis)

                def tot(grid_perm):
                    vals, _ = sweep_ops.station_sweep(
                        grid_perm, rays_pv, no_vb, 1, k, (gu, gv),
                        (jnp.float32, jnp.float32), 0)
                    return jnp.sum(vals[0] * ray_w[:, None])

                g = jax.grad(tot)(jnp.zeros((gp, gu, gv), jnp.float32))
                return jnp.transpose(g, inv_perm)

            return count_fn

        def make_count_fn_dev(axis, n_pad):
            perm = sweep_ops._PERMS[axis]
            gp, gu, gv = (int(self.world_size[a]) for a in perm)
            inv_perm = tuple(int(x) for x in np.argsort(perm))
            no_vb = jnp.zeros((0,), jnp.int32)

            @jax.jit
            def count_fn(ro_all, rd_all, start, lo, hi):
                # the view's rays sliced FROM THE DEVICE POOL; rows outside
                # [lo, hi) (clamped-slice overlap into neighboring views —
                # real rays, never degenerate) are zero-weighted
                ro = jax.lax.dynamic_slice_in_dim(ro_all, start, n_pad)
                rd = jax.lax.dynamic_slice_in_dim(rd_all, start, n_pad)
                ar = jnp.arange(n_pad, dtype=jnp.int32)
                ray_w = ((ar >= lo) & (ar < hi)).astype(jnp.float32)
                rays_pv = sweep_ops.rays_to_voxel(
                    ro, rd, self.xyz_min, self.xyz_max, self.world_size,
                    axis)

                def tot(grid_perm):
                    vals, _ = sweep_ops.station_sweep(
                        grid_perm, rays_pv, no_vb, 1, k, (gu, gv),
                        (jnp.float32, jnp.float32), 0)
                    return jnp.sum(vals[0] * ray_w[:, None])

                g = jax.grad(tot)(jnp.zeros((gp, gu, gv), jnp.float32))
                return jnp.transpose(g, inv_perm)

            return count_fn

        views_o = np.split(np.asarray(rays_o_tr), np.cumsum(imsz)[:-1]) \
            if not isinstance(rays_o_tr, list) else rays_o_tr
        views_d = np.split(np.asarray(rays_d_tr), np.cumsum(imsz)[:-1]) \
            if not isinstance(rays_d_tr, list) else rays_d_tr
        use_dev = (rays_dev is not None and downrate == 1
                   and not isinstance(rays_o_tr, list)
                   and np.asarray(rays_o_tr).ndim == 2
                   and int(rays_dev[0].shape[0]) == int(np.sum(imsz)))
        n_total = int(np.sum(imsz))
        offset = 0
        for ro, rd in zip(views_o, views_d):
            ro, rd = np.asarray(ro), np.asarray(rd)
            while ro.ndim > 3:
                ro, rd = ro[0], rd[0]
            if ro.ndim == 3:
                ro = ro[::downrate, ::downrate].reshape(-1, 3)
                rd = rd[::downrate, ::downrate].reshape(-1, 3)
            else:
                ro = ro.reshape(-1, 3)
                rd = rd.reshape(-1, 3)
            # One sweep axis per view (the camera's dominant look direction
            # by ray majority): off-axis rays still sample correctly, just
            # at wider station spacing.
            axes = sweep_ops.dominant_axis(rd, self.xyz_min, self.xyz_max,
                                           self.world_size)
            axis = int(np.bincount(axes, minlength=3).argmax())
            n = ro.shape[0]
            n_pad = _round_up(max(n, 1), 1024)
            if use_dev and n_pad <= n_total:
                start = min(offset, max(n_total - n_pad, 0))
                shift = offset - start  # clamped-slice shift at pool end
                key = ("dev", axis, n_pad)
                if key not in count_fns:
                    count_fns[key] = make_count_fn_dev(axis, n_pad)
                g_view = count_fns[key](rays_dev[0], rays_dev[1],
                                        jnp.int32(start), jnp.int32(shift),
                                        jnp.int32(shift + n))
                count = count + (g_view > 1).astype(jnp.float32)
                offset += n
                continue
            offset += n
            ray_w = np.zeros((n_pad,), np.float32)
            ray_w[:n] = 1.0
            ro = np.concatenate([ro, np.zeros((n_pad - n, 3), np.float32)])
            rd_pad = np.ones((n_pad - n, 3), np.float32)
            rd_pad[:, axis] = 1.0  # keep padded rays' d_p nonzero
            rd = np.concatenate([rd, rd_pad])
            key = (axis, n_pad)
            if key not in count_fns:
                count_fns[key] = make_count_fn(axis, n_pad)
            g_view = count_fns[key](jnp.asarray(ro), jnp.asarray(rd),
                                    jnp.asarray(ray_w))
            count = count + (g_view > 1).astype(jnp.float32)
        return count
