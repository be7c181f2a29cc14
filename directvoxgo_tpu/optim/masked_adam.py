"""MaskedAdam: the reference's fused Adam variants as a functional transform.

Reference semantics (lib/masked_adam.py + lib/cuda/adam_upd_kernel.cu):

  * plain Adam with bias correction folded into a scalar step size
    ``lr * sqrt(1-b2^t) / (1-b1^t)`` (adam_upd.cpp:72);
  * ``skip_zero_grad``: entries whose gradient is exactly zero are skipped
    entirely — no moment decay on untouched voxels (adam_upd_kernel.cu:35).
    An optax ``masked`` wrapper that still decays moments would be wrong
    (SURVEY.md §7.2 item 4);
  * per-voxel lr: a multiplier tensor applied to the step for params whose
    shape matches (``set_pervoxel_lr``: ``count/count.max()``,
    lib/masked_adam.py:35-37, adam_upd_kernel.cu:56);
  * per-step exponential lr decay ``lr *= 0.1^(1/(lrate_decay*1000))``
    applied by the train loop (run.py:400-406) — here the caller passes the
    current ``lr_scale`` so the whole step stays jittable.

State layout is a pytree mirror of the params: ``{name: {'exp_avg', 'exp_avg_sq'}}``
plus a scalar ``step`` shared across params (the reference increments each
param's step every optimizer step, so one counter suffices).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def init_adam_state(params):
    """Zero moments for a params pytree. ``per_lr`` is None until
    ``set_pervoxel_lr`` fills it (lib/masked_adam.py:35-37)."""
    return {
        "step": jnp.zeros((), jnp.int32),
        "exp_avg": jax.tree_util.tree_map(jnp.zeros_like, params),
        "exp_avg_sq": jax.tree_util.tree_map(jnp.zeros_like, params),
        "per_lr": None,
    }


def adam_param_update(param, grad, exp_avg, exp_avg_sq, step, lr,
                      beta1=0.9, beta2=0.99, eps=1e-8,
                      skip_zero_grad=False, per_lr=None):
    """One Adam update for a single tensor. ``step`` is the post-increment
    step count (1-based, as in the reference's lazy state init +
    ``state['step'] += 1``)."""
    step_f = step.astype(jnp.float32)
    step_size = lr * jnp.sqrt(1.0 - beta2 ** step_f) / (1.0 - beta1 ** step_f)
    new_avg = beta1 * exp_avg + (1.0 - beta1) * grad
    new_sq = beta2 * exp_avg_sq + (1.0 - beta2) * grad * grad
    upd = step_size * new_avg / (jnp.sqrt(new_sq) + eps)
    if per_lr is not None:
        upd = upd * per_lr
    new_param = param - upd
    if skip_zero_grad:
        touched = grad != 0
        new_param = jnp.where(touched, new_param, param)
        new_avg = jnp.where(touched, new_avg, exp_avg)
        new_sq = jnp.where(touched, new_sq, exp_avg_sq)
    return new_param, new_avg, new_sq


@dataclass
class MaskedAdam:
    """Optimizer over named param groups.

    ``group_cfg`` maps a top-level param name (e.g. 'density', 'k0',
    'rgbnet') to ``{'lr': float, 'skip_zero_grad': bool}`` — produced by
    ``create_optimizer_or_freeze_model``'s ``lrate_<name>`` convention
    (lib/utils.py:20-48). ``per_lr`` (if set) applies to params whose shape
    matches it (lib/masked_adam.py:60).
    """

    group_cfg: Dict[str, Dict[str, Any]]
    beta1: float = 0.9
    beta2: float = 0.99
    eps: float = 1e-8
    # Per-step exponential lr decay multiplier (run.py:400-406):
    # lr(t) = lr0 * lr_decay_factor^t with t = steps since group creation.
    lr_decay_factor: float = 1.0

    def init(self, params):
        trainable = {k: params[k] for k in self.group_cfg if k in params}
        return init_adam_state(trainable)

    @staticmethod
    def set_pervoxel_lr(state, count):
        state = dict(state)
        state["per_lr"] = count.astype(jnp.float32) / count.max()
        return state

    def update(self, params, grads, state, regions=None):
        """Apply one step. Returns (new_params, new_state).

        ``params``/``grads`` are dicts name -> pytree; only names present in
        ``group_cfg`` are updated, others pass through unchanged (frozen).

        ``regions`` (optional) maps a param name to ``(offsets, sizes)`` —
        traced int32 [3] start voxels + a static (x, y, z) extent — limiting
        the update to that grid sub-box. Only applied to ``skip_zero_grad``
        params whose leading dims match the grid: their gradients are exactly
        zero outside the swept clip box, so skipping those voxels is *exact*
        (moments and params there would be untouched anyway) and saves the
        full-grid moment read/write bandwidth every step.
        """
        step = state["step"] + 1
        # The reference multiplies lr by the decay factor *after* each step
        # (run.py:400-406), so step i (1-based) uses factor^(i-1).
        lr_scale = jnp.asarray(self.lr_decay_factor, jnp.float32) \
            ** state["step"].astype(jnp.float32)
        per_lr_arr = state.get("per_lr")
        new_params = dict(params)
        new_avg = dict(state["exp_avg"])
        new_sq = dict(state["exp_avg_sq"])
        for name, cfg in self.group_cfg.items():
            if name not in params:
                continue
            lr = cfg["lr"] * lr_scale
            skip = bool(cfg.get("skip_zero_grad", False))
            region = (regions or {}).get(name) if skip else None

            def upd_leaf(p, g, m, v, _lr=lr, _skip=skip, _region=region):
                per_lr = None
                if per_lr_arr is not None and p.shape == per_lr_arr.shape:
                    per_lr = per_lr_arr
                if _region is not None and p.ndim >= 3:
                    offs, sizes = _region
                    start = tuple(offs[i] for i in range(3)) \
                        + (jnp.int32(0),) * (p.ndim - 3)
                    box = tuple(sizes) + p.shape[3:]

                    def cut(x):
                        return None if x is None else jax.lax.dynamic_slice(
                            x, start, box)

                    # The train step may hand the gradient already
                    # box-shaped (it differentiated w.r.t. the slice).
                    g_cut = g if g.shape == tuple(box) else cut(g)
                    np_, nm_, nv_ = adam_param_update(
                        cut(p), g_cut, cut(m), cut(v), step, _lr,
                        self.beta1, self.beta2, self.eps,
                        skip_zero_grad=True, per_lr=cut(per_lr))
                    return (jax.lax.dynamic_update_slice(p, np_, start),
                            jax.lax.dynamic_update_slice(m, nm_, start),
                            jax.lax.dynamic_update_slice(v, nv_, start))
                return adam_param_update(
                    p, g, m, v, step, _lr, self.beta1, self.beta2, self.eps,
                    skip_zero_grad=_skip, per_lr=per_lr)

            p_leaves, treedef = jax.tree_util.tree_flatten(params[name])
            g_leaves = treedef.flatten_up_to(grads[name])
            m_leaves = treedef.flatten_up_to(state["exp_avg"][name])
            v_leaves = treedef.flatten_up_to(state["exp_avg_sq"][name])
            outs = [upd_leaf(p, g, m, v)
                    for p, g, m, v in zip(p_leaves, g_leaves, m_leaves, v_leaves)]
            new_params[name] = jax.tree_util.tree_unflatten(
                treedef, [o[0] for o in outs])
            new_avg[name] = jax.tree_util.tree_unflatten(
                treedef, [o[1] for o in outs])
            new_sq[name] = jax.tree_util.tree_unflatten(
                treedef, [o[2] for o in outs])
        return new_params, {"step": step, "exp_avg": new_avg,
                            "exp_avg_sq": new_sq,
                            "per_lr": state.get("per_lr")}
