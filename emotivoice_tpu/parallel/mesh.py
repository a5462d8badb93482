"""Device mesh + sharding layout.

The reference scales with single-node torch DDP over NCCL
(`train_am_vocoder_joint.py:203,281-282`); here scaling is a
`jax.sharding.Mesh` with axes ('data', 'model') and NamedSharding
annotations — XLA inserts the gradient all-reduces over ICI/DCN.

Model size (~37M params) fits a single chip, so the default layout
replicates parameters and shards the batch over 'data'. The 'model' axis is
reserved for tensor-parallel sharding of the vocoder channel dim / attention
heads if the model is scaled up.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel_size: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel_size == 0, (n, model_parallel_size)
    arr = np.asarray(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put a host batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
