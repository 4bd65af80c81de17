"""Device mesh and sharding layout for data-parallel training.

The reference trains with PyTorch DDP over NCCL (8 GPUs, SURVEY.md §2.5);
the TPU-native equivalent is a 1-D ``data`` mesh with batch-sharded inputs
and replicated parameters under ``jax.jit`` — XLA inserts the gradient
all-reduce and the BatchNorm cross-replica statistics automatically (because
batch reductions are written over the global batch axis).  Multi-host (DCN)
extends the same mesh via ``jax.distributed.initialize`` without code
changes; the model (~30-60M params) needs no parameter sharding.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a pytree of host arrays with the batch axis over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
