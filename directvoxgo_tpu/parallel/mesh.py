"""Data-parallel-over-rays sharding utilities (new capability).

The reference is strictly single-GPU (SURVEY.md §2.2: no torch.distributed /
NCCL anywhere). The TPU-native scaling story is SPMD over a 1-D ``data`` mesh
axis: ray batches are sharded across chips, voxel grids and MLP params are
replicated, and XLA inserts the grid-gradient all-reduce over ICI
automatically when the jitted train step's outputs are marked replicated.

Usage:
    mesh = make_mesh(jax.devices())
    step = jax.jit(train_step,
                   in_shardings=(replicate(mesh), ..., shard_rays(mesh)),
                   out_shardings=replicate(mesh))
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(devices=None):
    """1-D mesh over all (or the given) devices, axis name 'data'."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_rays(mesh, ndim=2):
    """Sharding that splits the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(mesh):
    return NamedSharding(mesh, P())


def shard_batch_tree(mesh, tree):
    """Place every array in ``tree`` with its leading axis sharded."""
    def place(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))
    return jax.tree_util.tree_map(place, tree)
