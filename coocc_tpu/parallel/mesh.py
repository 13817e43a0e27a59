"""Device mesh + sharding helpers (the TPU-native 'distributed backend').

Replaces the reference's torch.distributed.launch + NCCL DDP layer
(reference: tools/dist_train.sh:1-17, apis/mmdet_train.py:72-92) with a
jax.sharding Mesh: data parallelism shards the batch axis over the 'data'
axis; gradients/metrics are psum'd by the compiler inside jit. Multi-host
extends the same mesh over DCN via jax.distributed.initialize — no separate
code path.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch with the leading axis sharded over the mesh.

    None leaves pass through (Batch fields are Optional).
    """
    sh = batch_sharding(mesh, axis)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
