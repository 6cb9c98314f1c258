"""Device mesh and sharding helpers.

The reference's distribution story is Lightning DataParallel/DDP over NCCL
(train.py:12,55; main.py:118-120,162).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a batch-sharded training step: parameters are
replicated, the batch is split over the ``data`` axis, and XLA inserts the
gradient ``psum`` over ICI automatically when the jit'd step is given
NamedSharding constraints.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(data_parallel: int = -1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a 1-D data-parallel mesh over the given (or all local) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data_parallel == -1:
        data_parallel = len(devices)
    if data_parallel > len(devices):
        raise ValueError(
            f"requested {data_parallel} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:data_parallel]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded along axis 0."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
