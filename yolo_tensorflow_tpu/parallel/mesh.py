"""Device mesh + sharding layout.

Replaces the reference's multi-GPU story — pthread-per-GPU with periodic
host-staged weight *averaging* (src/network.c:1091 train_networks, :1072
sync_nets) — with the TPU-native design: a ``jax.sharding.Mesh`` with a
``data`` axis (batch sharding; gradients all-reduce over ICI every step via
GSPMD-inserted psum, which is mathematically stronger than sync_nets'
every-4-batches parameter averaging) and an optional ``spatial`` axis
(height-dimension sharding of activations; XLA inserts conv halo exchanges),
the convnet analogue of sequence parallelism.

Tensor/pipeline/expert parallelism are deliberately absent: at YOLO sizes
(<62M params) parameters replicate trivially and DP(+spatial) saturates the
chip — documented in SURVEY.md §2c.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization: ``jax.distributed.initialize`` with
    explicit or environment-driven (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) settings. After this,
    ``jax.devices()`` is GLOBAL across all hosts, so ``make_mesh`` builds
    a multi-host mesh and GSPMD routes the data-parallel gradient psum
    over ICI within each slice and DCN across hosts — the multi-host
    extension of the reference's single-node train_networks
    (src/network.c:1091), which it never had.

    Call once per process before any other JAX work (train CLI:
    ``--coordinator host:port --num-processes N --process-id i``).
    """
    import os
    kw = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(num_data: Optional[int] = None, num_spatial: int = 1,
              devices=None) -> Mesh:
    """Mesh over the (global, if jax.distributed is initialized) device
    set: data-parallel axis first, optional spatial axis second. Devices
    are ordered process-major (jax.devices() ordering), so each host's
    local devices land in contiguous data-axis rows and per-host input
    feeding (shard_batch with local arrays) lines up with the sharding."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_spatial
    n = num_data * num_spatial
    grid = np.asarray(devices[:n]).reshape(num_data, num_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C): batch over data, height over spatial."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...): batch over data only (labels, truth boxes)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, images, truths):
    """Place a host batch onto the mesh with the training layout.

    Single-host: a plain sharded device_put. Multi-host (after
    init_distributed): each process passes its LOCAL slice of the global
    batch — the per-host rows of the data axis — and the global array is
    assembled without any cross-host transfer
    (jax.make_array_from_process_local_data); the train runner feeds each
    process a disjoint sample shard, so local slices really are local
    data."""
    if jax.process_count() > 1:
        return (jax.make_array_from_process_local_data(
                    image_sharding(mesh), np.asarray(images)),
                jax.make_array_from_process_local_data(
                    batch_sharding(mesh), np.asarray(truths)))
    return (jax.device_put(images, image_sharding(mesh)),
            jax.device_put(truths, batch_sharding(mesh)))
