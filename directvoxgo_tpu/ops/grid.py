"""Voxel-grid sampling ops (jnp reference implementations).

These replace the reference's uses of ``F.grid_sample`` (lib/dvgo.py:312-328),
``maskcache_lookup`` (lib/cuda/render_utils_kernel.cu:290-351),
``F.max_pool3d`` (lib/dvgo.py:589) and ``F.interpolate(..., trilinear,
align_corners=True)`` (lib/dvgo.py:228-263).

Grid layout is TPU-idiomatic channels-last ``[X, Y, Z, C]`` (the reference uses
torch's ``[1, C, X, Y, Z]``); the torch ``grid_sample`` zyx coordinate flip
(lib/dvgo.py:316) is unnecessary here because we index grids directly in xyz
order. ``align_corners=True`` semantics: world position ``xyz_min`` maps to
voxel index 0 and ``xyz_max`` to index ``dim-1``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import numpy as np


def mask_bbox_vox(mask):
    """Inclusive voxel-coordinate bounding box of a boolean occupancy mask,
    padded by one voxel per side (so trilinear interpolation anywhere with a
    nonzero mask value stays inside the box).

    Host-side helper behind the sweep paths' free-space clipping — the TPU
    analogue of the reference maskcache's per-sample skipping
    (lib/cuda/render_utils_kernel.cu:447-455): instead of skipping samples,
    whole station/slab ranges outside this box are never swept.

    Returns (lo, hi) float64 arrays of shape [3]; the full grid when the mask
    is empty.
    """
    m = np.asarray(mask)
    if not m.any():
        return np.zeros(3), np.asarray(m.shape, np.float64) - 1.0
    lo, hi = [], []
    for a in range(3):
        axes = tuple(x for x in range(3) if x != a)
        nz = np.flatnonzero(m.any(axis=axes))
        lo.append(max(nz[0] - 1.0, 0.0))
        hi.append(min(nz[-1] + 1.0, m.shape[a] - 1.0))
    return np.asarray(lo), np.asarray(hi)


@functools.partial(jax.jit, static_argnums=())
def mask_bbox_vox_device(mask):
    """:func:`mask_bbox_vox` computed ON DEVICE, returning a [2, 3] f32
    array (lo row, hi row) instead of pulling the whole mask to the host.

    The training engine queues this at every occupancy renewal and
    piggybacks the 6-scalar pull on the next i_print's batched transfer —
    the host-side form's ~4 MB mask pull had to wait behind the whole
    dispatch backlog (~19 s per renewal over the remote link, PERF_LOG
    round 3). Empty masks return the full grid, matching the host form.
    """
    lo, hi = [], []
    any_all = jnp.any(mask)
    for a in range(3):
        axes = tuple(x for x in range(3) if x != a)
        line = jnp.any(mask, axis=axes)
        iota = jnp.arange(line.shape[0], dtype=jnp.float32)
        big = jnp.float32(line.shape[0])
        first = jnp.min(jnp.where(line, iota, big))
        last = jnp.max(jnp.where(line, iota, -1.0))
        lo.append(jnp.where(any_all, jnp.maximum(first - 1.0, 0.0), 0.0))
        hi.append(jnp.where(any_all,
                            jnp.minimum(last + 1.0, line.shape[0] - 1.0),
                            jnp.float32(line.shape[0] - 1.0)))
    return jnp.stack([jnp.stack(lo), jnp.stack(hi)])

# TPU layout note: the vector unit is 8x128 lanes with the LAST dim mapped to
# lanes. Arithmetic on `[..., 3]` tensors (xyz packed in the minor dim) uses
# 3 of 128 lanes and forces relayouts around gathers — measured 1600x slower
# than the same math done per-component on `[..., S]` tensors. Hence every
# hot-path op below has a *component* form taking (x, y, z) separately with
# the bbox as static python floats; the packed `[..., 3]` wrappers remain for
# cold paths and tests.


def world_to_grid(xyz, xyz_min, xyz_max, world_size):
    """Map world coords [..., 3] to continuous voxel indices (align_corners)."""
    sizes = jnp.asarray(world_size, dtype=xyz.dtype)
    unit = (xyz - xyz_min) / (xyz_max - xyz_min)
    return unit * (sizes - 1.0)


def _flat_gather(grid_flat, ix, iy, iz, ny, nz):
    lin = (ix * ny + iy) * nz + iz
    return jnp.take(grid_flat, lin, axis=0)


def trilinear_sample_parts(grid, ix, iy, iz):
    """Trilinear interpolation, component form (hot path).

    Args:
      grid: ``[X, Y, Z]`` or ``[X, Y, Z, C]``.
      ix, iy, iz: continuous voxel coordinates, any (matching) batch shape.

    Returns ``[...]`` or ``[..., C]``.
    """
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    nx, ny, nz, nc = grid.shape
    grid_flat = grid.reshape(nx * ny * nz, nc)

    ix = jnp.clip(ix, 0.0, nx - 1.0)
    iy = jnp.clip(iy, 0.0, ny - 1.0)
    iz = jnp.clip(iz, 0.0, nz - 1.0)
    x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, max(nx - 2, 0))
    y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, max(ny - 2, 0))
    z0 = jnp.clip(jnp.floor(iz).astype(jnp.int32), 0, max(nz - 2, 0))
    fx, fy, fz = ix - x0, iy - y0, iz - z0
    x1 = jnp.minimum(x0 + 1, nx - 1)
    y1 = jnp.minimum(y0 + 1, ny - 1)
    z1 = jnp.minimum(z0 + 1, nz - 1)

    if nc > 1:
        fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]

    def g(a, b, c):
        out = _flat_gather(grid_flat, a, b, c, ny, nz)
        return out if nc > 1 else out[..., 0]

    c00 = g(x0, y0, z0) * (1 - fz) + g(x0, y0, z1) * fz
    c01 = g(x0, y1, z0) * (1 - fz) + g(x0, y1, z1) * fz
    c10 = g(x1, y0, z0) * (1 - fz) + g(x1, y0, z1) * fz
    c11 = g(x1, y1, z0) * (1 - fz) + g(x1, y1, z1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def world_to_grid_parts(x, y, z, xyz_min, xyz_max, world_size):
    """Component world->voxel mapping with static (python float) bbox."""
    out = []
    for v, lo, hi, n in zip((x, y, z), xyz_min, xyz_max, world_size):
        s = (float(n) - 1.0) / (float(hi) - float(lo))
        out.append((v - float(lo)) * s)
    return tuple(out)


def trilinear_sample_world(grid, x, y, z, xyz_min, xyz_max):
    """World-space trilinear query, component form (hot path)."""
    ix, iy, iz = world_to_grid_parts(x, y, z, xyz_min, xyz_max,
                                     grid.shape[:3])
    return trilinear_sample_parts(grid, ix, iy, iz)


def occupancy_lookup_parts(mask, x, y, z, xyz_min, xyz_max):
    """Nearest-voxel occupancy lookup, component form (hot path).

    ``xyz_min``/``xyz_max`` must be static python sequences; out-of-bounds
    points return False (render_utils_kernel.cu:300-319 semantics).
    """
    nx, ny, nz = mask.shape
    comps = []
    inb = None
    for v, lo, hi, n in zip((x, y, z), xyz_min, xyz_max, (nx, ny, nz)):
        s = (n - 1.0) / (float(hi) - float(lo))
        idx = jnp.round((v - float(lo)) * s)
        ok = (idx >= 0) & (idx <= n - 1)
        inb = ok if inb is None else (inb & ok)
        comps.append(jnp.clip(idx, 0, n - 1).astype(jnp.int32))
    xi, yi, zi = comps
    lin = (xi * ny + yi) * nz + zi
    return jnp.take(mask.reshape(-1), lin, axis=0) & inb


def trilinear_sample(grid, idx):
    """Trilinearly interpolate ``grid`` at continuous voxel indices ``idx``.

    Args:
      grid: ``[X, Y, Z]`` or ``[X, Y, Z, C]`` array.
      idx:  ``[..., 3]`` float voxel-space coordinates (0..dim-1 spans the
            grid; out-of-range coordinates are clamped to the border, which
            matches torch ``grid_sample(align_corners=True)`` for in-bbox
            points — callers mask out-of-bbox points separately, mirroring the
            reference where out-of-bbox samples are filtered before the
            query, lib/dvgo.py:444-447).

    Returns: ``[...]`` or ``[..., C]`` interpolated values.
    """
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    nx, ny, nz, nc = grid.shape
    grid_flat = grid.reshape(nx * ny * nz, nc)

    idx = jnp.clip(idx, 0.0, jnp.asarray([nx - 1, ny - 1, nz - 1], idx.dtype))
    i0 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0,
                  jnp.asarray([max(nx - 2, 0), max(ny - 2, 0), max(nz - 2, 0)]))
    frac = idx - i0.astype(idx.dtype)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1 = jnp.minimum(x0 + 1, nx - 1)
    y1 = jnp.minimum(y0 + 1, ny - 1)
    z1 = jnp.minimum(z0 + 1, nz - 1)
    fx, fy, fz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]

    c000 = _flat_gather(grid_flat, x0, y0, z0, ny, nz)
    c001 = _flat_gather(grid_flat, x0, y0, z1, ny, nz)
    c010 = _flat_gather(grid_flat, x0, y1, z0, ny, nz)
    c011 = _flat_gather(grid_flat, x0, y1, z1, ny, nz)
    c100 = _flat_gather(grid_flat, x1, y0, z0, ny, nz)
    c101 = _flat_gather(grid_flat, x1, y0, z1, ny, nz)
    c110 = _flat_gather(grid_flat, x1, y1, z0, ny, nz)
    c111 = _flat_gather(grid_flat, x1, y1, z1, ny, nz)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fx) + c1 * fx
    return out[..., 0] if squeeze else out


def occupancy_lookup(mask, xyz, xyz_min, xyz_max):
    """Nearest-voxel boolean occupancy lookup; out-of-bounds -> False.

    Mirrors ``maskcache_lookup`` (render_utils_kernel.cu:300-319):
    ``ijk = round(xyz * scale + shift)`` with ``scale=(shape-1)/extent`` and
    ``shift=-xyz_min*scale`` (lib/dvgo.py:600-602). Packed-[...,3] wrapper
    over :func:`occupancy_lookup_parts`; requires a concrete bbox.
    """
    import numpy as np
    mn = tuple(float(v) for v in np.asarray(xyz_min))
    mx = tuple(float(v) for v in np.asarray(xyz_max))
    return occupancy_lookup_parts(mask, xyz[..., 0], xyz[..., 1],
                                  xyz[..., 2], mn, mx)


def bilinear_sample_parts(plane, iu, iv):
    """Bilinear interpolation on a 2D feature plane, component form.

    Args:
      plane: ``[U, V, C]`` (or ``[U, V]``).
      iu, iv: continuous plane coordinates (align-corners: 0..dim-1).

    The 2D analog of :func:`trilinear_sample_parts`, used by the triplane
    models (reference ``grid_sampler2D``, lib/tri_dvgo.py:456-479).
    """
    squeeze = plane.ndim == 2
    if squeeze:
        plane = plane[..., None]
    nu, nv, nc = plane.shape
    flat = plane.reshape(nu * nv, nc)

    iu = jnp.clip(iu, 0.0, nu - 1.0)
    iv = jnp.clip(iv, 0.0, nv - 1.0)
    u0 = jnp.clip(jnp.floor(iu).astype(jnp.int32), 0, max(nu - 2, 0))
    v0 = jnp.clip(jnp.floor(iv).astype(jnp.int32), 0, max(nv - 2, 0))
    fu, fv = iu - u0, iv - v0
    u1 = jnp.minimum(u0 + 1, nu - 1)
    v1 = jnp.minimum(v0 + 1, nv - 1)
    if nc > 1:
        fu, fv = fu[..., None], fv[..., None]

    def g(a, b):
        out = jnp.take(flat, a * nv + b, axis=0)
        return out if nc > 1 else out[..., 0]

    c0 = g(u0, v0) * (1 - fv) + g(u0, v1) * fv
    c1 = g(u1, v0) * (1 - fv) + g(u1, v1) * fv
    return c0 * (1 - fu) + c1 * fu


def nearest_sample_2d_parts(plane, iu, iv):
    """Nearest-neighbor 2D plane lookup (LIIF taps, lib/tri_dvgo.py:498)."""
    squeeze = plane.ndim == 2
    if squeeze:
        plane = plane[..., None]
    nu, nv, nc = plane.shape
    flat = plane.reshape(nu * nv, nc)
    u = jnp.clip(jnp.round(iu).astype(jnp.int32), 0, nu - 1)
    v = jnp.clip(jnp.round(iv).astype(jnp.int32), 0, nv - 1)
    out = jnp.take(flat, u * nv + v, axis=0)
    return out[..., 0] if squeeze else out


def max_pool3d_same(x):
    """3x3x3 max pool, stride 1, 'same' padding on a ``[X, Y, Z]`` grid.

    Replaces ``F.max_pool3d(..., kernel_size=3, padding=1, stride=1)``
    (lib/dvgo.py:256, run.py:331).
    """
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x, neg_inf, jax.lax.max,
        window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)))


def _interp_matrix(n_new, n_old, dtype=jnp.float32):
    """[n_new, n_old] linear-interpolation matrix with align_corners=True.

    Built host-side in numpy: shapes are static at every call site, and the
    previous on-device `.at[].add` form dispatched two eager scatter
    programs per axis that re-compiled at every progressive-scaling shape
    (sub-second compiles the persistent cache doesn't keep)."""
    if n_old == 1:
        return jnp.asarray(np.ones((n_new, 1), np.float32), dtype)
    if n_new == 1:
        w = np.zeros((1, n_old), np.float32)
        w[0, 0] = 1.0
        return jnp.asarray(w, dtype)
    pos = np.arange(n_new, dtype=np.float64) * ((n_old - 1) / (n_new - 1))
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_old - 2)
    frac = (pos - lo).astype(np.float32)
    rows = np.arange(n_new)
    w = np.zeros((n_new, n_old), np.float32)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, lo + 1), frac)
    return jnp.asarray(w, dtype)


def resize_trilinear(grid, new_size):
    """Trilinear resize with align_corners=True via separable 1D matmuls.

    Replaces ``F.interpolate(grid, size, mode='trilinear',
    align_corners=True)`` used by progressive scaling (lib/dvgo.py:235-239).
    Separable interpolation as three dense matmuls keeps the op on the MXU.

    Args:
      grid: ``[X, Y, Z]`` or ``[X, Y, Z, C]``.
      new_size: (X', Y', Z').
    """
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    nx, ny, nz, nc = grid.shape
    mx = _interp_matrix(new_size[0], nx, grid.dtype)
    my = _interp_matrix(new_size[1], ny, grid.dtype)
    mz = _interp_matrix(new_size[2], nz, grid.dtype)
    # HIGHEST precision: the default matmul precision truncates to bf16 on
    # the MXU, which would corrupt the grids at every progressive-scaling
    # step; this op runs a handful of times per stage, so exactness wins.
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ax,xyzc->ayzc", mx, grid, precision=hi)
    out = jnp.einsum("by,ayzc->abzc", my, out, precision=hi)
    out = jnp.einsum("cz,abzd->abcd", mz, out, precision=hi)
    return out[..., 0] if squeeze else out
