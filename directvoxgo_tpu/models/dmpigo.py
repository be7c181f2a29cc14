"""DirectMPIGO: multiplane-image grid for forward-facing (NDC) scenes.

TPU-native re-design of the reference model (lib/dmpigo.py:17-290). The NDC
sampler is already regular (``N_samples`` equidistant points per ray,
render_utils_kernel.cu:238-287), which makes this the natural static-shape
model: no ragged bookkeeping at all — the whole forward is
``[n_rays, n_samples]`` from the start.

Differences vs DirectVoxGO:
  * world_size = [X, Y, mpi_depth] from a voxel budget over the xy extent
    (lib/dmpigo.py:97-107); ``voxel_size_ratio = 256 / mpi_depth``.
  * density initialized so each plane's stop probability is 1/mpi_depth and
    the last plane is opaque (lib/dmpigo.py:37-44); ``act_shift = 0``.
  * anisotropic TV weights wxy/wz (lib/dmpigo.py:147-157).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops import raymarch as rm
from ..ops import sweep as sweep_ops
from ..ops.tv import total_variation_add_grad
from . import mlp as mlp_lib
from .dvgo import DirectVoxGO, _round_up


class DirectMPIGO:
    # The NDC sampler IS a z-station sweep (see forward_sweep) — the engine
    # must route every ray to axis 2 instead of grouping by dominant axis.
    forced_sweep_axis = 2

    def __init__(self, xyz_min, xyz_max,
                 num_voxels=0, mpi_depth=0,
                 mask_cache_path=None, mask_cache_thres=1e-3,
                 fast_color_thres=0,
                 rgbnet_dim=0, rgbnet_depth=3, rgbnet_width=128,
                 viewbase_pe=0,
                 k_color=64,
                 query_mode="sweep",
                 sweep_color_topk=0,
                 seed=0,
                 **kwargs):
        self.xyz_min = np.asarray(xyz_min, np.float32)
        self.xyz_max = np.asarray(xyz_max, np.float32)
        self.fast_color_thres = float(fast_color_thres)
        self.act_shift = 0.0
        self.k_color = int(k_color) if k_color else 0
        self.query_mode = query_mode
        # Station budget for the compacted color-MLP path (0 = dense);
        # see models/dvgo.py forward_sweep and ops/sweep.topk_station_select.
        self.sweep_color_topk = int(sweep_color_topk)
        self.mlp_dtype = jnp.bfloat16
        # Grid-sweep interp/channel dtype (see models/dvgo.py).
        self.sweep_dtype = jnp.bfloat16

        self._set_grid_resolution(num_voxels, mpi_depth)

        # Density init: per-plane stop probability 1/mpi_depth, last plane
        # opaque (lib/dmpigo.py:37-44).
        g = np.full([mpi_depth], 1.0 / mpi_depth - 1e-6)
        p = [1 - g[0]]
        for i in range(1, len(g)):
            p.append((1 - g[:i + 1].sum()) / (1 - g[:i].sum()))
        density_init = np.zeros(self.world_size, np.float32)
        for i in range(len(p)):
            density_init[..., i] = np.log(
                p[i] ** (-1 / self.voxel_size_ratio) - 1)
        density_init[..., -1] = 10.0
        self.params = {"density": jnp.asarray(density_init)}

        self.rgbnet_kwargs = {
            "rgbnet_dim": rgbnet_dim, "rgbnet_depth": rgbnet_depth,
            "rgbnet_width": rgbnet_width, "viewbase_pe": viewbase_pe,
        }
        self.viewbase_pe = viewbase_pe
        self.rgbnet_dim = rgbnet_dim
        if rgbnet_dim <= 0:
            self.k0_dim = 3
            self.params["k0"] = jnp.zeros((*self.world_size, 3), jnp.float32)
            self.has_rgbnet = False
        else:
            self.k0_dim = rgbnet_dim
            self.params["k0"] = jnp.zeros((*self.world_size, rgbnet_dim),
                                          jnp.float32)
            dim0 = (3 + 3 * viewbase_pe * 2) + self.k0_dim
            self.params["rgbnet"] = mlp_lib.init_mlp(
                jax.random.PRNGKey(seed), dim0, rgbnet_width, rgbnet_depth, 3)
            self.has_rgbnet = True
        print("dmpigo: density", self.params["density"].shape,
              "k0", self.params["k0"].shape)

        self.mask_cache_path = mask_cache_path
        self.mask_cache_thres = mask_cache_thres
        if mask_cache_path:
            self.mask = self._mask_from_coarse_ckpt(mask_cache_path,
                                                    mask_cache_thres)
        else:
            self.mask = jnp.ones(self.world_size, bool)

    def _set_grid_resolution(self, num_voxels, mpi_depth):
        """Resolution from budget: xy from sqrt(num_voxels / depth / area)
        (lib/dmpigo.py:97-107)."""
        self.num_voxels = num_voxels
        self.mpi_depth = mpi_depth
        extent = self.xyz_max - self.xyz_min
        r = float(np.sqrt(num_voxels / mpi_depth / (extent[0] * extent[1])))
        self.world_size = (int(extent[0] * r), int(extent[1] * r),
                           int(mpi_depth))
        self.voxel_size_ratio = 256.0 / mpi_depth
        # xy voxel size used for stepdist bookkeeping (not used by the NDC
        # sampler, which is index-regular).
        self.voxel_size = 1.0 / r
        print("dmpigo: world_size      ", self.world_size)
        print("dmpigo: voxel_size_ratio", self.voxel_size_ratio)

    def _mask_from_coarse_ckpt(self, path, thres):
        from ..engine import checkpoint as ckpt_lib
        st = ckpt_lib.load_checkpoint_file(path)
        c_kwargs = st["model_kwargs"]
        c_density = jnp.asarray(st["model_state_dict"]["density"])
        pooled = grid_ops.max_pool3d_same(c_density)
        alpha = rm.raw2alpha(pooled, c_kwargs["act_shift"],
                             c_kwargs["voxel_size_ratio"])
        c_mask = alpha >= thres
        pts = self.grid_points()
        return grid_ops.occupancy_lookup(
            c_mask, pts, np.asarray(c_kwargs["xyz_min"], np.float32),
            np.asarray(c_kwargs["xyz_max"], np.float32))

    def grid_points(self):
        xs = np.linspace(self.xyz_min[0], self.xyz_max[0], self.world_size[0])
        ys = np.linspace(self.xyz_min[1], self.xyz_max[1], self.world_size[1])
        zs = np.linspace(self.xyz_min[2], self.xyz_max[2], self.world_size[2])
        return jnp.asarray(np.stack(
            np.meshgrid(xs, ys, zs, indexing="ij"), -1), jnp.float32)

    def get_kwargs(self):
        return {
            "xyz_min": np.asarray(self.xyz_min),
            "xyz_max": np.asarray(self.xyz_max),
            "num_voxels": self.num_voxels,
            "mpi_depth": self.mpi_depth,
            "act_shift": self.act_shift,
            "voxel_size_ratio": self.voxel_size_ratio,
            "mask_cache_path": self.mask_cache_path,
            "mask_cache_thres": self.mask_cache_thres,
            "fast_color_thres": self.fast_color_thres,
            "k_color": self.k_color,
            "query_mode": self.query_mode,
            "sweep_color_topk": self.sweep_color_topk,
            **self.rgbnet_kwargs,
        }

    # ------------------------------------------------------- state surgery

    def scale_volume_grid(self, num_voxels, mpi_depth):
        """Progressive scaling (lib/dmpigo.py:124-145)."""
        from .dvgo import _pg_rescale_jit
        print("dmpigo: scale_volume_grid start")
        ori = self.world_size
        self._set_grid_resolution(num_voxels, mpi_depth)
        print("dmpigo: scale from", ori, "to", self.world_size)
        # ONE jitted program per pg event (dvgo._pg_rescale_jit, no coarse
        # mask for MPI): the eager composition dispatched several
        # shape-fresh sub-second programs per event that the persistent
        # cache never keeps — 17.8-22.6 s per pg event over the remote
        # tunnel on the fern-scale NDC run (r5).
        d, k, mask = _pg_rescale_jit(
            self.params["density"], self.params["k0"], None, None, None,
            None, new_size=tuple(self.world_size),
            act_shift=float(self.act_shift),
            interval=float(self.voxel_size_ratio),
            thres=float(self.fast_color_thres), c_bounds=None)
        self.params["density"] = d
        self.params["k0"] = k
        self.mask = mask
        print("dmpigo: scale_volume_grid finish (fused)")

    def update_occupancy_cache(self):
        self_alpha = grid_ops.max_pool3d_same(
            self.activate_density(self.params["density"]))
        self.mask = self.mask & (self_alpha > self.fast_color_thres)

    def tv_axis_scales(self):
        """Per-axis TV weight scale factors (weight=1), for the engine's
        boxed sparse-TV path (engine/train.py make_train_step)."""
        sxy = max(self.world_size[:2]) / 128.0
        sz = self.mpi_depth / 128.0
        return (sxy, sxy, sz)

    def density_total_variation_grad(self, param, grad, weight, dense_mode):
        """Anisotropic TV (lib/dmpigo.py:147-151)."""
        wxy = weight * max(self.world_size[:2]) / 128.0
        wz = weight * self.mpi_depth / 128.0
        return total_variation_add_grad(param, grad, wxy, wxy, wz, dense_mode)

    def k0_total_variation_grad(self, param, grad, weight, dense_mode):
        wxy = weight * max(self.world_size[:2]) / 128.0
        wz = weight * self.mpi_depth / 128.0
        return total_variation_add_grad(param, grad, wxy, wxy, wz, dense_mode)

    def activate_density(self, density, interval=None):
        interval = interval if interval is not None else self.voxel_size_ratio
        return rm.raw2alpha(density, self.act_shift, interval)

    # ----------------------------------------------------------- sampling

    def n_samples(self, stepsize):
        return int((self.mpi_depth - 1) / stepsize) + 1

    def hit_coarse_geo(self, rays_o, rays_d, near, far, stepsize, **_):
        rays_o = np.asarray(rays_o, np.float32).reshape(-1, 3)
        rays_d = np.asarray(rays_d, np.float32).reshape(-1, 3)
        n = rays_o.shape[0]
        chunk = 8192
        n_pad = _round_up(max(n, 1), chunk)
        ro = np.concatenate([rays_o, np.zeros((n_pad - n, 3), np.float32)])
        rd = np.concatenate([rays_d, np.ones((n_pad - n, 3), np.float32)])
        outs = []
        for i in range(0, n_pad, chunk):
            outs.append(self._hit_coarse_geo_jit(
                self.mask, ro[i:i + chunk], rd[i:i + chunk], float(stepsize)))
        return np.concatenate([np.asarray(o) for o in outs])[:n]

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _hit_coarse_geo_jit(self, mask, rays_o, rays_d, stepsize):
        bbox_min = tuple(float(v) for v in self.xyz_min)
        bbox_max = tuple(float(v) for v in self.xyz_max)
        (px, py, pz), valid = self._sample_ndc_parts(
            rays_o, rays_d, self.n_samples(stepsize), bbox_min, bbox_max)
        occ = grid_ops.occupancy_lookup_parts(mask, px, py, pz,
                                              bbox_min, bbox_max)
        return jnp.any(occ & valid, axis=-1)

    @staticmethod
    def _sample_ndc_parts(rays_o, rays_d, n_samples, bbox_min, bbox_max):
        """Regular NDC sampler, component form (cu:238-264 semantics)."""
        frac = jnp.arange(n_samples, dtype=jnp.float32) / (n_samples - 1)
        pts = []
        valid = None
        for i, (lo, hi) in enumerate(zip(bbox_min, bbox_max)):
            p = rays_o[:, i][:, None] + rays_d[:, i][:, None] * frac[None, :]
            ok = (p >= float(lo)) & (p <= float(hi))
            valid = ok if valid is None else (valid & ok)
            pts.append(p)
        return tuple(pts), valid

    # ------------------------------------------------------------ forward

    def forward(self, params, mask, rays_o, rays_d, viewdirs,
                global_step=None, *, near, far, bg, stepsize,
                render_depth=False, **_):
        """Volume rendering (lib/dmpigo.py:200-283). NDC rays assumed
        (near==0, far==1 — lib/dmpigo.py:185)."""
        bbox_min = tuple(float(v) for v in self.xyz_min)
        bbox_max = tuple(float(v) for v in self.xyz_max)
        interval = stepsize * self.voxel_size_ratio
        n_s = self.n_samples(stepsize)

        (px, py, pz), valid = self._sample_ndc_parts(
            rays_o, rays_d, n_s, bbox_min, bbox_max)
        occ = grid_ops.occupancy_lookup_parts(
            mask, px, py, pz, bbox_min, bbox_max) & valid
        step_f = jnp.broadcast_to(
            jnp.arange(n_s, dtype=jnp.float32)[None, :], px.shape)

        density = grid_ops.trilinear_sample_world(
            params["density"], px, py, pz, bbox_min, bbox_max)
        alpha = rm.raw2alpha(density, self.act_shift, interval)
        if self.fast_color_thres > 0:
            occ = occ & (alpha > self.fast_color_thres)
        weights, alphainv_last, live = rm.alpha2weight_dense(alpha, occ)
        if self.fast_color_thres > 0:
            wmask = weights > self.fast_color_thres
        else:
            wmask = live
        w_eff = jnp.where(wmask, weights, 0.0)

        # Dropped weight is returned to the background term (see
        # models/dvgo.py step 4 and the PERF_LOG.md capacity sweep).
        k_c = self.k_color if (self.has_rgbnet and self.k_color) else 0
        if k_c and k_c < w_eff.shape[-1]:
            w_total = jnp.sum(w_eff, axis=-1)
            _, w_eff, px, py, pz, step_f, alpha, wmask = rm.compact_by_key(
                -w_eff, k_c, w_eff, px, py, pz, step_f, alpha, wmask)
            alphainv_last = alphainv_last + jax.lax.stop_gradient(
                w_total - jnp.sum(w_eff, axis=-1))

        vox_emb = grid_ops.trilinear_sample_world(
            params["k0"], px, py, pz, bbox_min, bbox_max)
        if not self.has_rgbnet:
            rgb = jax.nn.sigmoid(vox_emb)
        else:
            vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
            vd_emb = jnp.broadcast_to(vd_emb[:, None, :],
                                      (*px.shape, vd_emb.shape[-1]))
            feat = jnp.concatenate([vox_emb, vd_emb], -1)
            rgb = jax.nn.sigmoid(mlp_lib.mlp_apply(params["rgbnet"], feat))

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

    # ----------------------------------------------------- sweep forward

    # Same host-side occupancy-bbox clip planning as DVGO (the methods only
    # touch self.mask / self.world_size, which both models share).
    sweep_clip_for_axis = DirectVoxGO.sweep_clip_for_axis

    def forward_sweep(self, params, mask, rays_o, rays_d, viewdirs, axis,
                      *, near, far, bg, stepsize, render_depth=False,
                      clip_sizes=None, clip_offsets=None,
                      grids_pre_clipped=False, **_):
        """Station-sweep volume rendering — the TPU fast path for MPI grids.

        The reference's NDC sampler takes ``n_s = (mpi_depth-1)/stepsize + 1``
        samples at uniform ray fractions ``t_j = j/(n_s-1)``
        (render_utils_kernel.cu:238-264). NDC rays all have exactly
        ``o_z = -1, d_z = 2`` (ndc_rays shifts origins to the near plane), and
        the scene bbox spans exactly ``z ∈ [-1, 1]``, so sample ``j`` of EVERY
        ray sits on the fixed grid plane ``z_vox = j * stepsize`` — the
        reference sampler is already a z-station sweep. This method evaluates
        it as such: every grid query is an MXU matmul
        (:func:`...ops.sweep.sweep_samples` along axis 2), no gathers, no
        scatters in the backward. Same math as :meth:`forward` with one
        documented difference: occupancy uses the interpolated mask channel
        (> 0 keeps a superset) instead of the nearest-voxel lookup, and the
        alpha/weight thresholds prune the rest — identical to the DVGO sweep
        contract (models/dvgo.py forward_sweep).

        ``axis`` is accepted for engine-signature parity but must be 2 (the
        engine routes all rays here via ``forced_sweep_axis``).
        """
        assert axis == 2, "MPI sweep is along z (forced_sweep_axis)"
        k = sweep_ops.substeps_for_stepsize(stepsize)
        sdt = self.sweep_dtype
        density, k0, mask_g = params["density"], params["k0"], mask
        if clip_sizes is not None and not grids_pre_clipped:
            # Slice before the bf16 cast (same ordering as DVGO: casting the
            # full grid then slicing wastes a full-grid pass).
            perm = sweep_ops._PERMS[2]
            inv = {ax: i for i, ax in enumerate(perm)}
            sizes_xyz = tuple(int(clip_sizes[inv[a]]) for a in range(3))
            offs_xyz = tuple(clip_offsets[inv[a]] for a in range(3))
            density = jax.lax.dynamic_slice(density, offs_xyz, sizes_xyz)
            mask_g = jax.lax.dynamic_slice(mask_g, offs_xyz, sizes_xyz)
            k0 = jax.lax.dynamic_slice(k0, (*offs_xyz, jnp.int32(0)),
                                       (*sizes_xyz, k0.shape[3]))
        grid_cat = jnp.concatenate(
            [density.astype(sdt)[..., None],
             mask_g.astype(sdt)[..., None],
             k0.astype(sdt)], axis=-1)

        bbox_min = tuple(float(v) for v in self.xyz_min)
        bbox_max = tuple(float(v) for v in self.xyz_max)
        out = sweep_ops.sweep_samples(grid_cat, None, rays_o, rays_d,
                                      bbox_min, bbox_max, 2,
                                      stepsize=stepsize, march_order=False,
                                      interp_dtype=sdt,
                                      clip_sizes=clip_sizes,
                                      clip_offsets=clip_offsets,
                                      pre_clipped=True,
                                      world_size=tuple(self.world_size))
        vals, t, fwd = out["vals"], out["t"], out["forward"]
        density_s, mask_s, k0_cl = vals[0], vals[1], vals[2:]
        n_s = t.shape[1]

        # Validity: the reference's per-component bbox test (cu:247-252) is
        # exactly the ray/AABB t-interval for a straight NDC-space line;
        # interpolated mask > 0 keeps a superset of the nearest-voxel
        # occupancy test (alpha/weight thresholds prune the rest).
        t_lo, t_hi = rm.ray_aabb_tminmax(rays_o, rays_d,
                                         jnp.asarray(self.xyz_min),
                                         jnp.asarray(self.xyz_max),
                                         near, far)
        valid = (t >= t_lo[:, None]) & (t <= t_hi[:, None]) \
            & (t_hi > t_lo)[:, None] & (mask_s > 0)

        interval = stepsize * self.voxel_size_ratio  # lib/dmpigo.py:213
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

        # Top-K station compaction before the color MLP (the reference's
        # fast_color_thres pruning, lib/dmpigo.py via dvgo's shared path;
        # see models/dvgo.py forward_sweep for the full rationale). MPI
        # sweeps have mpi_depth*2 stations (256-512 for LLFF) of which only
        # a handful carry weight once geometry forms.
        topk = self.sweep_color_topk
        step_idx = None
        compact = (self.has_rgbnet and self.fast_color_thres > 0
                   and 0 < topk < n_s and n_s > max(96, 2 * topk))
        if compact:
            step_idx, sel_nk, sel_cl = sweep_ops.topk_station_select(
                w_eff, topk)
            w_eff = sel_nk(w_eff)
            wmask = jnp.take_along_axis(wmask, step_idx, axis=1)
            alpha = jnp.take_along_axis(alpha, step_idx, axis=1)
            k0_cl = sel_cl(k0_cl)

        if not self.has_rgbnet:
            rgb_cl = jax.nn.sigmoid(k0_cl)          # [3, N, S]
        else:
            vd_emb = mlp_lib.positional_encoding(viewdirs, self.viewbase_pe)
            logit_cl = jax.checkpoint(functools.partial(
                mlp_lib.mlp_apply_split_cl, compute_dtype=self.mlp_dtype))(
                    params["rgbnet"], k0_cl, vd_emb)
            rgb_cl = jax.nn.sigmoid(logit_cl)

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
            # Depth in sample-index units like :meth:`forward` (step_f = j);
            # station s is absolute plane p_offset*k + s (compacted: the
            # kept stations' indices).
            s_of_sample = step_idx.astype(jnp.float32) if compact \
                else jnp.arange(n_s, dtype=jnp.float32)[None, :]
            step_f = out["p_offset"] * k + s_of_sample
            ret["depth"] = jax.lax.stop_gradient(
                jnp.sum(w_eff * step_f, axis=1))
        return ret

    def __call__(self, rays_o, rays_d, viewdirs, global_step=None, **kw):
        return self.forward(self.params, self.mask,
                            jnp.asarray(rays_o), jnp.asarray(rays_d),
                            jnp.asarray(viewdirs), global_step, **kw)
