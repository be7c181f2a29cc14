"""Total-variation gradient injection.

Replaces ``total_variation_add_grad`` (lib/cuda/total_variation_kernel.cu:
13-67): adds, for each voxel, the 6-neighbor clamped-difference gradient
directly into the parameter's gradient (the reference bypasses autograd and
writes into ``param.grad``; here the caller adds the returned tensor to the
grads pytree before the optimizer step — same effect, functional).

Quirk preserved behind a flag: the reference applies ``wz`` (not ``wx``) to
the x-axis neighbor terms (total_variation_kernel.cu:31-32). With isotropic
weights (DVGO passes weight,weight,weight — lib/dvgo.py:297-305) this is a
no-op; for DMPIGO's anisotropic wxy/wz (lib/dmpigo.py:147-157) it changes the
result, and the published LLFF numbers were produced with it, so
``bug_compat=True`` is the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _axis_term(param, axis, w):
    """w * sum over both neighbors of clamp(param - neighbor, -1, 1).

    Border handling by EDGE-replicated neighbors (self - self = 0), not
    wrap-around + iota masking: the previous roll/where form lowered to
    ~6 materialized full-tensor passes per axis and cost ~24 ms/iter on
    the fern-scale k0 grid alone (tools/tv_step_profile.py); slices and
    concatenation fuse into the consuming elementwise loop."""
    sl_hi = [slice(None)] * param.ndim
    sl_hi[axis] = slice(1, None)
    sl_last = [slice(None)] * param.ndim
    sl_last[axis] = slice(-1, None)
    up = jnp.concatenate(
        [param[tuple(sl_hi)], param[tuple(sl_last)]], axis=axis)
    sl_lo = [slice(None)] * param.ndim
    sl_lo[axis] = slice(None, -1)
    sl_first = [slice(None)] * param.ndim
    sl_first[axis] = slice(None, 1)
    dn = jnp.concatenate(
        [param[tuple(sl_first)], param[tuple(sl_lo)]], axis=axis)
    return w * (jnp.clip(param - up, -1.0, 1.0)
                + jnp.clip(param - dn, -1.0, 1.0))


def tv_term(param, wx, wy, wz, bug_compat=True):
    """The TV gradient term ALONE (no grad add, no sparse gating), with the
    same /6 and edge-replication semantics as ``total_variation_add_grad``.

    Used by the engine's region-mode sparse-TV path: in sparse mode the TV
    term is gated by ``grad != 0``, and batch gradients are nonzero only
    inside the drawn clip/window box — so the term only needs evaluating on
    a 1-voxel-haloed slice of the box, never the full grid
    (engine/train.py make_train_step)."""
    wx, wy, wz = wx / 6.0, wy / 6.0, wz / 6.0
    w_for_x = wz if bug_compat else wx
    return (_axis_term(param, 0, w_for_x)
            + _axis_term(param, 1, wy)
            + _axis_term(param, 2, wz))


def _tv_rows_pallas(param, grad, w_x, w_y, w_z, dense_mode,
                    interpret=False):
    """Single-pass fused TV+add as a Pallas row-stencil kernel.

    The jnp formulations materialize the six shifted-neighbor reads (XLA
    does not fuse them into one loop): 25.4 ms for the k0 TV term alone at
    the fern-scale grid vs its ~5 ms bandwidth bound (/tmp probes, PERF_LOG
    r5). Here each grid step processes one x-row: the x+-1 neighbor rows
    arrive via edge-CLAMPED BlockSpec index maps (x-1 -> row 0 at the
    border, i.e. self-difference = 0, the edge-replication semantics of
    ``_axis_term``), and the y/z stencils are in-VMEM shifts of the resident
    row. HBM traffic: 3 reads of param + grad + out ~= 3 GB -> ~6 ms.
    """
    from jax.experimental import pallas as pl

    x = param.shape[0]
    row = param.shape[1:]  # (Y, Z) or (Y, Z, C)
    nd = len(row)

    def kernel(pm_ref, pc_ref, pp_ref, g_ref, o_ref):
        p = pc_ref[0]
        c = lambda a: jnp.clip(a, -1.0, 1.0)  # noqa: E731
        tv = w_x * (c(p - pm_ref[0]) + c(p - pp_ref[0]))

        def shift_pair(a, ax):
            hi = [slice(None)] * nd
            hi[ax] = slice(1, None)
            last = [slice(None)] * nd
            last[ax] = slice(-1, None)
            up = jnp.concatenate([a[tuple(hi)], a[tuple(last)]], axis=ax)
            lo = [slice(None)] * nd
            lo[ax] = slice(None, -1)
            first = [slice(None)] * nd
            first[ax] = slice(None, 1)
            dn = jnp.concatenate([a[tuple(first)], a[tuple(lo)]], axis=ax)
            return up, dn

        up_y, dn_y = shift_pair(p, 0)
        tv = tv + w_y * (c(p - up_y) + c(p - dn_y))
        up_z, dn_z = shift_pair(p, 1)
        tv = tv + w_z * (c(p - up_z) + c(p - dn_z))
        g = g_ref[0]
        if not dense_mode:
            tv = jnp.where(g != 0, tv, 0.0)
        o_ref[0] = g + tv

    blk = (1,) + row
    zeros = (0,) * nd
    spec_c = pl.BlockSpec(blk, lambda i: (i, *zeros))
    spec_m = pl.BlockSpec(blk, lambda i: (jnp.maximum(i - 1, 0), *zeros))
    spec_p = pl.BlockSpec(blk, lambda i: (jnp.minimum(i + 1, x - 1),
                                          *zeros))
    return pl.pallas_call(
        kernel,
        grid=(x,),
        in_specs=[spec_m, spec_c, spec_p, spec_c],
        out_specs=spec_c,
        out_shape=jax.ShapeDtypeStruct(param.shape, param.dtype),
        interpret=interpret,
    )(param, param, param, grad)


def _use_pallas(param):
    # Opt-in only (DVGO_TV_PALLAS=1): Mosaic pads a row window's trailing
    # two dims to (8, 128) tiles, so [X, Y, Z, C] grids with small C pay
    # ~128/C of VMEM and DMA (measured: the fern k0 [404,323,128,9] row
    # window costs 40.4 MB vs 1.5 MB unpadded — compile-time VMEM OOM).
    # The engine avoids needing a full-grid TV kernel at all in sparse
    # mode (boxed tv_term above); the dense phase keeps the jnp path.
    import os
    if os.environ.get("DVGO_TV_PALLAS", "") not in ("1", "force"):
        return False
    # one row (+2 halo rows) + grad + out must fit VMEM comfortably,
    # counting Mosaic's lane padding on the trailing dim
    shape = list(param.shape[1:])
    shape[-1] = -(-shape[-1] // 128) * 128
    row_bytes = 4 * int(np.prod(shape))
    return param.shape[0] >= 8 and 5 * row_bytes < 12 * 2 ** 20


def total_variation_add_grad(param, grad, wx, wy, wz, dense_mode,
                             bug_compat=True):
    """Return ``grad`` plus the TV gradient of ``param``.

    Args:
      param, grad: ``[X, Y, Z]`` or ``[X, Y, Z, C]`` arrays (channels, if
        present, are independent — matching the reference where the flat index
        walks each channel's 3D block separately).
      wx, wy, wz: axis weights; each is divided by 6 as in the reference
        (total_variation_kernel.cu:45-47).
      dense_mode: if False, only voxels with nonzero incoming grad receive the
        TV term (total_variation_kernel.cu:21), the sparse-update speedup.
      bug_compat: apply wz to the x axis as the reference does.
    """
    wx, wy, wz = wx / 6.0, wy / 6.0, wz / 6.0
    w_for_x = wz if bug_compat else wx
    if _use_pallas(param):
        return _tv_rows_pallas(param, grad, w_for_x, wy, wz, dense_mode)
    tv = (_axis_term(param, 0, w_for_x)
          + _axis_term(param, 1, wy)
          + _axis_term(param, 2, wz))
    if not dense_mode:
        tv = jnp.where(grad != 0, tv, 0.0)
    return grad + tv
