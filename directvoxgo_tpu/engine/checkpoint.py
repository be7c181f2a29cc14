"""Checkpoint I/O.

Keeps the reference's self-describing layout (run.py:420-437): a dict
``{global_step, model_kwargs, model_state_dict, optimizer_state_dict}``, where
``model_kwargs`` lets :func:`load_model` reconstruct the model class without
the original config (lib/utils.py:63-79). Files keep the reference's ``.tar``
names (``{stage}_last.tar``) but contain a pickled dict of numpy arrays —
NOT torch checkpoints: reference ``.tar`` files cannot be loaded here (and
vice versa) despite the identical naming/layout convention.

Loading goes through a **restricted unpickler** that only reconstructs
numpy arrays/dtypes and plain containers, so pointing ``mask_cache_path`` /
``--ft_path`` at an untrusted file cannot execute code (plain
``pickle.load`` runs arbitrary ``__reduce__`` payloads).
"""

from __future__ import annotations

import io
import pickle

import numpy as np
import jax
import jax.numpy as jnp


_SAFE_GLOBALS = {
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "_reconstruct"),   # pre-numpy-2 pickles
    ("numpy._core.multiarray", "scalar"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.numeric", "_frombuffer"),
    ("numpy.core.numeric", "_frombuffer"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.dtypes", "Float32DType"),
    ("numpy.dtypes", "Float64DType"),
    ("numpy.dtypes", "Int32DType"),
    ("numpy.dtypes", "Int64DType"),
    ("numpy.dtypes", "BoolDType"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    """Allows only the numpy-array plumbing our checkpoints actually use."""

    def find_class(self, module, name):
        if (module, name) in _SAFE_GLOBALS or (
                module == "numpy.dtypes" and name.endswith("DType")):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint contains disallowed global {module}.{name} — "
            "refusing to unpickle (only numpy arrays and plain containers "
            "are expected; torch/reference checkpoints are not loadable)")


def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, (jnp.ndarray, np.ndarray))
        else x, tree)


def save_checkpoint_file(path, payload):
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint_file(path):
    with open(path, "rb") as f:
        return _RestrictedUnpickler(io.BytesIO(f.read())).load()


def model_state_dict(model):
    """Flatten model params + mask into a state dict."""
    state = {"mask": np.asarray(model.mask)}
    for name, sub in model.params.items():
        state[name] = _to_numpy(sub)
    return state


def load_model_state(model, state):
    model.mask = jnp.asarray(state["mask"])
    for name in model.params:
        model.params[name] = jax.tree_util.tree_map(
            jnp.asarray, state[name])
    return model


def save_model_checkpoint(path, model, global_step, optimizer_state=None):
    save_checkpoint_file(path, {
        "global_step": global_step,
        "model_kwargs": model.get_kwargs(),
        "model_state_dict": model_state_dict(model),
        "optimizer_state_dict": _to_numpy(optimizer_state),
    })
    print("checkpoint: saved", path)


def load_model(model_class, path):
    """Reconstruct a model from its checkpoint manifest
    (lib/utils.py:63-79)."""
    st = load_checkpoint_file(path)
    model = model_class(**st["model_kwargs"])
    load_model_state(model, st["model_state_dict"])
    return model
