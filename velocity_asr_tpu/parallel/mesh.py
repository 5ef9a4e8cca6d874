"""Mesh construction and sharding specs.

The reference ships only a dead `distributed:` config stanza
(/root/reference/configs/train.yaml:87-91, backend "nccl", never used).
Here distribution is first-class and TPU-native: a (data, model) mesh,
batch sharded over `data`, gradients reduced by XLA psum over ICI, and
tensor parallelism over `model` (parallel/tp.py: the CTC head — the
large-vocab preset's dominant ~9.6M params — shards over the vocab
axis; the 6M-param acoustic trunk stays replicated). No user-level comm
library.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree batch with the leading axis sharded over data."""
    def place(x):
        return jax.device_put(x, data_sharding(mesh, ndim=x.ndim))

    return jax.tree_util.tree_map(place, batch)
