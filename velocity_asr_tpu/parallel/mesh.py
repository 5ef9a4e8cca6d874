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


def _default_slice_index(d) -> Optional[int]:
    return getattr(d, "slice_index", None)


def order_devices_hierarchical(devices: Sequence, slice_index_of=None) -> list:
    """Order devices slice-major for a multi-slice (DCN-connected) pod.

    On multi-slice TPU deployments `jax.devices()` carries a
    `slice_index`; devices within a slice share ICI while slices talk
    over DCN. Laying the mesh's data axis out slice-major (slice is the
    OUTER stride, intra-slice neighbors adjacent) means (a) a model axis
    of size <= the per-slice count never straddles DCN, and (b) XLA's
    gradient all-reduce decomposes hierarchically — reduce-scatter over
    ICI inside each slice, the small cross-slice exchange over DCN —
    which is the scaling recipe for DP over slices. Single-slice (or
    CPU/GPU) device lists come back unchanged except for a stable
    (slice, id) sort.

    Pure list manipulation so it is unit-testable without multi-slice
    hardware (tests/test_parallel.py stubs `slice_index`).

    slice_index_of (optional): override for reading a device's slice index
    — lets tests and the driver dryrun simulate a multi-slice topology on
    the virtual CPU mesh (e.g. `lambda d: d.id // 4` = 2 slices of 4).
    """
    slice_index_of = slice_index_of or _default_slice_index
    devices = list(devices)
    keyed = [(slice_index_of(d), getattr(d, "id", i), d)
             for i, d in enumerate(devices)]
    if any(k[0] is None for k in keyed):
        return devices  # no slice topology exposed: keep caller's order
    groups: dict = {}
    for s, i, d in keyed:
        groups.setdefault(s, []).append((i, d))
    sizes = {len(v) for v in groups.values()}
    if len(sizes) > 1:
        return devices  # ragged slices: no safe hierarchical layout
    out = []
    for s in sorted(groups):
        out.extend(d for _, d in sorted(groups[s]))
    return out


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_index_of=None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    Multi-slice pods are handled transparently: devices are ordered
    slice-major (see order_devices_hierarchical) so the data axis spans
    slices on its outer stride and the model axis stays intra-slice.
    slice_index_of overrides slice discovery (simulated multi-slice on the
    virtual CPU mesh; see order_devices_hierarchical).
    """
    slice_of = slice_index_of or _default_slice_index
    devices = list(devices if devices is not None else jax.devices())
    devices = order_devices_hierarchical(devices, slice_index_of=slice_of)
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    slice_sizes = {slice_of(d) or 0 for d in devices}
    if n_model > 1 and len(slice_sizes) > 1:
        per_slice = len(devices) // len(slice_sizes)
        assert per_slice % n_model == 0, (
            f"model axis {n_model} would straddle DCN (per-slice device "
            f"count {per_slice}); choose n_model dividing the slice size"
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
