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


def make_mesh(num_data: Optional[int] = None, num_spatial: int = 1,
              devices=None) -> Mesh:
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
    """Place a host batch onto the mesh with the training layout."""
    return (jax.device_put(images, image_sharding(mesh)),
            jax.device_put(truths, batch_sharding(mesh)))
