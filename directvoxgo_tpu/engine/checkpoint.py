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
import os
import pickle
import threading

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
    """Device->host the whole tree in one batched pull.

    ``jax.device_get`` issues the transfers together; the link (PCIe on a
    directly-attached TPU, the dev tunnel here) is the bottleneck, so
    per-leaf threading buys nothing, and host-side slab slicing costs a
    compiled slice program per distinct shape. Measured 6.9-27 MB/s over
    the tunnel either way (PERF_LOG round 3) — the real lever is moving
    fewer bytes (:func:`_compact_for_save`) and overlapping the pull with
    downstream work (async saves + the in-memory handoff cache).
    """
    is_dev = lambda x: isinstance(x, jnp.ndarray) \
        and not isinstance(x, np.ndarray)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    from .fetchguard import guarded_get, timeout_default
    # checkpoint pulls move 100s of MB; give them 4x the per-scalar budget
    pulled = guarded_get([x for x in leaves if is_dev(x)],
                         "checkpoint tree", timeout=4 * timeout_default())
    it = iter(pulled)
    return jax.tree_util.tree_unflatten(
        treedef, [next(it) if is_dev(x) else x for x in leaves])


# Float32 leaves with at least this many elements are stored as float16
# (run-scale voxel grids and their Adam moments; MLP weights and the tiny
# test-suite grids stay exact). Halves the device->host pull and the file.
_COMPACT_MIN_ELEMS = 1_000_000


def _compact_for_save(tree):
    """Device-side pre-save pass: big f32 grids -> f16, and every other
    device leaf copied. The new arrays double as a SNAPSHOT, so an async
    writer can keep pulling while later train steps donate the originals."""
    def one(x):
        if not isinstance(x, jnp.ndarray) or isinstance(x, np.ndarray):
            return x
        if x.dtype == jnp.float32 and x.size >= _COMPACT_MIN_ELEMS:
            return x.astype(jnp.float16)
        return jnp.copy(x)
    return jax.tree_util.tree_map(one, tree)


def _restore_f32(tree):
    """Undo :func:`_compact_for_save`: f16 master state re-widens to the
    framework's f32 (works on numpy and device leaves alike)."""
    def one(x):
        if isinstance(x, np.ndarray) and x.dtype == np.float16:
            return x.astype(np.float32)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float16:
            return x.astype(jnp.float32)
        return x
    return jax.tree_util.tree_map(one, tree)


# Async save machinery: the device->host checkpoint pull is the single
# largest non-compute cost of a full run over a remote-attached chip
# (measured 90-370 s for the ~600 MB fine-stage state at 7-27 MB/s,
# PERF_LOG round 3). Stage-end saves therefore hand the (compacted,
# snapshotted) payload to a writer thread and return; consumers that would
# read the file straight back (compute_bbox_by_coarse_geo, the fine stage's
# MaskCache) get the device-side payload from an in-memory cache instead of
# waiting on the round trip. Writer threads are non-daemon, so the
# interpreter joins them at exit — a finished process always has its
# checkpoints on disk.
_PENDING = {}    # abspath -> threading.Thread
_MEM_CACHE = {}  # abspath -> device payload (insertion-ordered)
_MEM_CACHE_CAP = 2


def checkpoint_exists(path):
    """True if the checkpoint is on disk OR still in flight from an async
    save (resume probes must see a just-dispatched save as present)."""
    ap = os.path.abspath(path)
    return ap in _MEM_CACHE or ap in _PENDING or os.path.isfile(path)


def wait_for_pending_saves(path=None):
    """Join outstanding async checkpoint writers (all, or one path's)."""
    items = [(p, t) for p, t in list(_PENDING.items())
             if path is None or p == os.path.abspath(path)]
    for p, t in items:
        t.join()
        _PENDING.pop(p, None)


def save_checkpoint_file(path, payload, async_=False):
    ap = os.path.abspath(path)
    wait_for_pending_saves(ap)
    if not async_:
        np_payload = _to_numpy(payload)
        _MEM_CACHE.pop(ap, None)
        _write_file(ap, np_payload)
        return
    payload = _compact_for_save(payload)
    _MEM_CACHE[ap] = payload
    while len(_MEM_CACHE) > _MEM_CACHE_CAP:
        _MEM_CACHE.pop(next(iter(_MEM_CACHE)))
    t = threading.Thread(target=lambda: _write_file(ap, _to_numpy(payload)),
                         name=f"ckpt-write:{os.path.basename(ap)}")
    _PENDING[ap] = t
    t.start()


def _write_file(ap, np_payload):
    tmp = ap + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(np_payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, ap)
    print("checkpoint: saved", ap)


def load_checkpoint_file(path):
    ap = os.path.abspath(path)
    if ap in _MEM_CACHE:
        return _restore_f32(_MEM_CACHE[ap])
    wait_for_pending_saves(ap)
    with open(path, "rb") as f:
        return _restore_f32(_RestrictedUnpickler(io.BytesIO(f.read())).load())


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


def save_model_checkpoint(path, model, global_step, optimizer_state=None,
                          async_=False):
    state = {"mask": model.mask}
    state.update(model.params)
    save_checkpoint_file(path, {
        "global_step": global_step,
        "model_kwargs": model.get_kwargs(),
        "model_state_dict": state,
        "optimizer_state_dict": optimizer_state,
    }, async_=async_)


def load_model(model_class, path):
    """Reconstruct a model from its checkpoint manifest
    (lib/utils.py:63-79)."""
    st = load_checkpoint_file(path)
    model = model_class(**st["model_kwargs"])
    load_model_state(model, st["model_state_dict"])
    return model
