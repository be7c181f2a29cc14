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

import jax.numpy as jnp


def _axis_term(param, axis, w):
    """w * sum over both neighbors of clamp(param - neighbor, -1, 1)."""
    fwd = jnp.clip(param - jnp.roll(param, -1, axis), -1.0, 1.0)
    bwd = jnp.clip(param - jnp.roll(param, 1, axis), -1.0, 1.0)
    # Zero the wrap-around contributions at the borders.
    n = param.shape[axis]
    idx = jnp.arange(n)
    shape = [1] * param.ndim
    shape[axis] = n
    idx = idx.reshape(shape)
    fwd = jnp.where(idx < n - 1, fwd, 0.0)
    bwd = jnp.where(idx > 0, bwd, 0.0)
    return w * (fwd + bwd)


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
    tv = (_axis_term(param, 0, w_for_x)
          + _axis_term(param, 1, wy)
          + _axis_term(param, 2, wz))
    if not dense_mode:
        tv = jnp.where(grad != 0, tv, 0.0)
    return grad + tv
