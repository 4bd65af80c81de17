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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host initialization (the reference's torch.distributed.launch
    equivalent, tools/dist_train.sh:8-10). With no arguments, relies on
    jax.distributed's environment auto-detection (TPU pods, SLURM); on
    explicit args (or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars) initializes a CPU/GPU cluster. Returns True
    if a multi-process runtime was initialized."""
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_global_mesh() -> Mesh:
    """1-D data mesh over every device in the cluster (all hosts)."""
    return Mesh(np.asarray(jax.devices()), axis_names=("data",))


def shard_global_batch(mesh: Mesh, batch: Any) -> Any:
    """Build a globally-sharded batch from per-process host shards: each
    process provides its local slice of the global batch (global batch =
    per-process batch x num_processes); jax.make_array_from_process_local_data
    assembles the distributed arrays."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def gather_to_host(tree: Any) -> Any:
    """Fetch (possibly distributed) device results to every host — the
    multi-process eval gather (reference multi_gpu_test collect,
    tools/test.py:233-234)."""
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
        ),
        tree,
    )
