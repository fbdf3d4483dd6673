"""Device mesh construction for data-parallel FAD.

The reference has no distributed layer at all (SURVEY.md §2, §5.8) — its only
concurrency is a decode thread pool. The TPU-native equivalent is a 1-D
``Mesh`` over chips: the per-file/per-patch batch is sharded over the 'data'
axis with shard_map, and the streaming (N, Σx, Σxxᵀ) accumulators are
psum-reduced over ICI. Multi-host pods extend the same mesh via
jax.distributed (initialize() before calling data_mesh()).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def pad_to_shards(n: int, num_shards: int) -> int:
    """Smallest multiple of num_shards >= n (batch padding for even sharding)."""
    return ((n + num_shards - 1) // num_shards) * num_shards
