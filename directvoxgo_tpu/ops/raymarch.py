"""Ray-marching ops under static shapes (jnp reference implementations).

The reference's ragged sampler ``sample_pts_on_rays`` emits a data-dependent
flat point list ``[M, 3]`` with ``ray_id``/``step_id`` (lib/cuda/
render_utils_kernel.cu:138-236). XLA requires static shapes, so here every ray
carries a fixed budget of ``n_samples`` slots laid out as ``[n_rays,
n_samples]`` with a validity mask; the repeated boolean-mask compressions of
the reference (lib/dvgo.py:462-494) become fixed-capacity compactions
(:func:`compact_by_key`) — drop-to-capacity instead of dynamic length.

The compositing scan ``alpha2weight`` with early termination
(render_utils_kernel.cu:430-505) becomes a masked exclusive cumprod along the
sample axis; because rays are rows, no segment bookkeeping is needed and JAX
autodiff reproduces the hand-written CUDA backward exactly (the reverse
``back_cum`` recurrence, render_utils_kernel.cu:507-531, is the VJP of this
product form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference adds 1e-10 inside the transmittance product
# (render_utils_kernel.cu:450) and terminates rays at T < 1e-3 (:451).
T_EPS = 1e-10
T_TERMINATE = 1e-3


def ray_aabb_tminmax(rays_o, rays_d, xyz_min, xyz_max, near, far):
    """Per-ray AABB slab intersection -> (t_min, t_max), clamped to [near,far].

    Mirrors ``infer_t_minmax`` (render_utils_kernel.cu:11-35): zero direction
    components are replaced by 1e-6 and both ts are clamped into [near, far].
    """
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), -1), near, far)
    t_max = jnp.clip(jnp.min(jnp.maximum(rate_a, rate_b), -1), near, far)
    return t_min, t_max


def ray_aabb_tminmax_parts(o, d, xyz_min, xyz_max, near, far):
    """Component form of :func:`ray_aabb_tminmax` (hot path).

    ``o``/``d`` are 3-tuples of [n_rays] arrays; bbox is static floats.
    """
    t_lo, t_hi = None, None
    for ov, dv, lo, hi in zip(o, d, xyz_min, xyz_max):
        vec = jnp.where(dv == 0, 1e-6, dv)
        a = (float(hi) - ov) / vec
        b = (float(lo) - ov) / vec
        lo_t = jnp.minimum(a, b)
        hi_t = jnp.maximum(a, b)
        t_lo = lo_t if t_lo is None else jnp.maximum(t_lo, lo_t)
        t_hi = hi_t if t_hi is None else jnp.minimum(t_hi, hi_t)
    return (jnp.clip(t_lo, near, far), jnp.clip(t_hi, near, far))


def sample_points_dense_parts(rays_o, rays_d, xyz_min, xyz_max, near, far,
                              stepdist, n_samples):
    """Component form of :func:`sample_points_dense` (hot path).

    Returns ((px, py, pz) each [n_rays, n_samples], valid, step_id[S]).
    """
    o = tuple(rays_o[:, i] for i in range(3))
    d = tuple(rays_d[:, i] for i in range(3))
    t_min, t_max = ray_aabb_tminmax_parts(o, d, xyz_min, xyz_max, near, far)
    n_steps = jnp.maximum(jnp.ceil((t_max - t_min) / stepdist), 1.0)
    rnorm = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])

    step_id = jnp.arange(n_samples, dtype=jnp.int32)
    dist = stepdist * step_id.astype(rays_o.dtype)
    pts = []
    in_bbox = None
    for ov, dv, lo, hi in zip(o, d, xyz_min, xyz_max):
        start = ov + dv * t_min
        unit = dv / rnorm
        p = start[:, None] + unit[:, None] * dist[None, :]
        ok = (p >= float(lo)) & (p <= float(hi))
        in_bbox = ok if in_bbox is None else (in_bbox & ok)
        pts.append(p)
    in_segment = step_id[None, :] < n_steps[:, None]
    return tuple(pts), in_segment & in_bbox, step_id


def max_samples_for_bbox(xyz_min, xyz_max, stepdist):
    """Static per-ray sample capacity: bbox diagonal / step distance.

    This is the same bound the reference itself uses for a dense pass
    (``voxel_count_views``, lib/dvgo.py:268).
    """
    import numpy as np
    diag = float(np.linalg.norm(np.asarray(xyz_max) - np.asarray(xyz_min)))
    return int(np.ceil(diag / stepdist)) + 1


def sample_points_dense(rays_o, rays_d, xyz_min, xyz_max, near, far,
                        stepdist, n_samples):
    """Sample up to ``n_samples`` equidistant points per ray inside the AABB.

    Matches ``sample_pts_on_rays`` semantics (render_utils_kernel.cu:160-236):
    points at ``o + d*t_min + unit(d) * stepdist * step`` for
    ``step in [0, N_steps)`` with ``N_steps = max(ceil((t_max-t_min)/
    stepdist), 1)``; points outside the bbox are masked (the reference filters
    them, lib/dvgo.py:444-447).

    Returns:
      pts:   [n_rays, n_samples, 3] world-space points.
      valid: [n_rays, n_samples] bool; in-segment AND in-bbox.
      step_id: [n_samples] int32 per-slot step index (shared across rays).
    """
    t_min, t_max = ray_aabb_tminmax(rays_o, rays_d, xyz_min, xyz_max, near, far)
    n_steps = jnp.maximum(jnp.ceil((t_max - t_min) / stepdist), 1.0)
    rnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    start = rays_o + rays_d * t_min[..., None]
    unit_d = rays_d / rnorm

    step_id = jnp.arange(n_samples, dtype=jnp.int32)
    dist = stepdist * step_id.astype(rays_o.dtype)
    pts = start[:, None, :] + unit_d[:, None, :] * dist[None, :, None]

    in_segment = step_id[None, :] < n_steps[:, None]
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    return pts, in_segment & in_bbox, step_id


def sample_points_ndc(rays_o, rays_d, xyz_min, xyz_max, n_samples):
    """Regular NDC sampler: ``o + d * (i/(n-1))`` (no raggedness).

    Mirrors ``sample_ndc_pts_on_rays`` (render_utils_kernel.cu:238-287).
    """
    frac = jnp.arange(n_samples, dtype=rays_o.dtype) / (n_samples - 1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * frac[None, :, None]
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    step_id = jnp.arange(n_samples, dtype=jnp.int32)
    return pts, in_bbox, step_id


def raw2alpha(density, shift, interval):
    """``alpha = 1 - exp(-softplus(density + shift) * interval)``.

    Same function as the reference's ``Raw2Alpha``/``raw2alpha`` kernel
    (lib/dvgo.py:618-631, render_utils_kernel.cu:354-393); the softplus form
    is numerically stable for large density, and JAX autodiff of it equals the
    hand-written backward ``interval*(1+e)^(-interval-1)*e`` (cu:404) with the
    same large-``e`` behavior the CUDA clamp targets. ``-expm1`` instead of
    ``1-exp`` keeps full precision at small alphas (XLA's vectorized ``exp``
    loses ~30 ulp near 1, which matters because ``fast_color_thres`` compares
    alphas at the 1e-7 scale).
    """
    return -jnp.expm1(-jax.nn.softplus(density + shift) * interval)


def alpha2weight_dense(alpha, valid):
    """Volume-rendering weights with early ray termination, dense layout.

    Per ray (row), over valid samples in step order:
      ``T_i = prod_{j<i, valid_j, live_j} (1 - alpha_j + 1e-10)``
      ``w_i = T_i * alpha_i`` while the ray is live; a sample is live iff the
      transmittance *entering* it is >= 1e-3 (the CUDA loop computes sample i
      then breaks when T drops below 1e-3; render_utils_kernel.cu:445-457).
      ``alphainv_last`` is the transmittance after the last live sample.

    Args:
      alpha: [n_rays, n_samples] in [0, 1); invalid slots may hold anything.
      valid: [n_rays, n_samples] bool.

    Returns:
      weights: [n_rays, n_samples] (zero at invalid/terminated slots).
      alphainv_last: [n_rays] background transmittance.
      live: [n_rays, n_samples] bool; True where the sample was composited.
    """
    alpha = jnp.where(valid, alpha, 0.0)
    one_minus = jnp.where(valid, 1.0 - alpha + T_EPS, 1.0)
    # T_excl[i] = transmittance entering sample i: exclusive product via a
    # SHIFTED cumprod, not cumprod/one_minus — the division form's backward
    # produces inf*0 under XLA fusion when a sample saturates (alpha == 1 in
    # f32, e.g. DMPIGO's opaque last plane) and the whole gradient NaNs out.
    # The shift form's AD gradient matches float64 central differences at
    # saturated entries to ~1e-9 (see tests/test_ops.py saturation test).
    t_excl = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]], -1), -1)
    live = t_excl >= T_TERMINATE
    weights = jnp.where(valid & live, t_excl * alpha, 0.0)
    # Transmittance after the last composited sample: product of one_minus
    # over valid & live slots only.
    alphainv_last = jnp.prod(jnp.where(live, one_minus, 1.0), axis=-1)
    return weights, alphainv_last, live & valid


@jax.custom_vjp
def alpha2weight_dense_bidir(alpha, valid, forward):
    """:func:`alpha2weight_dense` for rows that march in either direction.

    The station sweep returns samples in slab order; rays with a negative
    sweep-axis direction march from the last column to the first. Rather
    than flipping the big per-sample tensors, compute the exclusive
    transmittance in both directions (two cheap [N,S] cumprods) and select
    per row — sums used downstream (rgb compositing, losses, depth) are
    order-free.

    Hand-derived VJP: XLA's autodiff of the shifted-cumprod construction
    spends ~2x the necessary [N,S] passes (cumprod VJPs, concat/flip/slice
    transposes) in the train step's latency-bound tail; the closed form is
    the reference backward's ``back_cum`` recurrence
    (render_utils_kernel.cu:507-561) as two exclusive cumsums:

      dL/da_k = keep_k * dw_k * T_k
                - valid_k * (S_k + live_k * dA * A) / om_k

    with ``S_k = sum over samples AFTER k in march order of dw_i * w_i``.
    The termination mask ``live`` is treated as locally constant, exactly
    like autodiff of the comparison.

    Args:
      alpha, valid: [n_rays, n_samples].
      forward: [n_rays] bool; True = row marches left-to-right.
    """
    out, _ = _a2w_bidir_fwd(alpha, valid, forward)
    return out


def _a2w_bidir_fwd(alpha, valid, forward):
    alpha_m = jnp.where(valid, alpha, 0.0)
    one_minus = jnp.where(valid, 1.0 - alpha_m + T_EPS, 1.0)
    # Exclusive products via shifted cumprods (NOT cumprod/one_minus): see
    # :func:`alpha2weight_dense` on the saturated-alpha NaN the division
    # form produces under jit.
    ones = jnp.ones_like(one_minus[..., :1])
    t_excl_f = jnp.cumprod(
        jnp.concatenate([ones, one_minus[..., :-1]], -1), -1)
    t_excl_b = jnp.cumprod(
        jnp.concatenate([one_minus[..., 1:], ones], -1)[..., ::-1],
        -1)[..., ::-1]
    t_excl = jnp.where(forward[:, None], t_excl_f, t_excl_b)
    live = t_excl >= T_TERMINATE
    weights = jnp.where(valid & live, t_excl * alpha_m, 0.0)
    alphainv_last = jnp.prod(jnp.where(live, one_minus, 1.0), axis=-1)
    out = (weights, alphainv_last, live & valid)
    res = (weights, alphainv_last, t_excl, one_minus, live, valid, forward)
    return out, res


def _a2w_bidir_bwd(res, cts):
    d_w, d_inv, _ = cts  # the boolean live-mask output carries no gradient
    weights, alphainv_last, t_excl, one_minus, live, valid, forward = res
    keep = valid & live
    wd = d_w * weights  # dw_i * w_i (weights already masked by keep)
    # S_k = sum of wd over samples strictly AFTER k in march order:
    # forward rows -> right-exclusive cumsum; backward rows -> left.
    csum = jnp.cumsum(wd, axis=-1)
    total = csum[..., -1:]
    s_fwd = total - csum            # sum_{i>k}
    s_bwd = csum - wd               # sum_{i<k}
    s = jnp.where(forward[:, None], s_fwd, s_bwd)
    a_term = jnp.where(live, (d_inv * alphainv_last)[:, None], 0.0)
    # re-clamp before the reciprocal: under jit XLA reassociates the
    # forward's (1 - alpha) + eps into 1 - (alpha - eps) which rounds to 0
    # at saturated alpha in f32 (--xla_allow_excess_precision) — the very
    # NaN the shifted-cumprod forward exists to avoid
    inv_om = jnp.where(valid, 1.0 / jnp.maximum(one_minus, T_EPS), 0.0)
    d_alpha = jnp.where(keep, d_w * t_excl, 0.0) - (s + a_term) * inv_om
    return d_alpha, None, None


alpha2weight_dense_bidir.defvjp(_a2w_bidir_fwd, _a2w_bidir_bwd)


def compact_by_key(key, k, *arrays, fill_values=None):
    """Gather, per row, the ``k`` entries with the smallest ``key``.

    The TPU-native replacement for the reference's dynamic boolean-mask
    compressions (lib/dvgo.py:469-494): a fixed-capacity selection. When all
    payloads are rank-2 this lowers to a single multi-operand ``lax.sort``
    (key + payloads co-sorted), which compiles and runs far better on TPU
    than argsort + batched take_along_axis; higher-rank payloads fall back
    to the gather path.

    Args:
      key: [n_rays, n_samples] float sort key (use ``step + BIG*(~keep)`` to
        keep wanted samples in step order, or ``-weight`` for top-k weights).
      k: static capacity.
      arrays: arrays shaped [n_rays, n_samples, ...] to gather alongside.

    Returns: (sorted_key[:, :k] — callers usually discard, gathered arrays...).
    """
    if all(a.ndim == 2 for a in arrays):
        sorted_ops = jax.lax.sort((key, *arrays), dimension=-1, num_keys=1,
                                  is_stable=True)
        return tuple(op[:, :k] for op in sorted_ops)
    order = jnp.argsort(key, axis=-1)[:, :k]
    outs = []
    for arr in arrays:
        idx = order
        if arr.ndim > 2:
            idx = order.reshape(order.shape + (1,) * (arr.ndim - 2))
        outs.append(jnp.take_along_axis(arr, idx, axis=1))
    return (jnp.take_along_axis(key, order, axis=1), *outs)
