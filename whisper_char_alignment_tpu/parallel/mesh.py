"""Device mesh + sharding helpers (data parallelism over utterances).

The reference has no parallelism at all (SURVEY.md §2c: batch_size=1, single
device). Here the batch axis is the one semantically-meaningful parallel axis:
a 1-D mesh over ICI, inputs sharded on axis 0, params replicated — XLA partitions
every jitted step (mel, decode, teacher-forced capture, DTW) across chips with no
code changes, and metric counters reduce with ``psum`` where they live on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None) -> Mesh:
    # under a multi-process (jax.distributed) run, each process builds a mesh
    # over its OWN devices: data parallelism across processes happens by scp
    # sharding (cli/infer_ali --multihost), not by a global mesh
    devices = (jax.local_devices() if jax.process_count() > 1
               else jax.devices())
    n = n_data or len(devices)
    return Mesh(np.array(devices[:n]), ("data",))


def shard_batch(tree, mesh: Mesh):
    """Shard every array in ``tree`` along axis 0 of the 'data' mesh axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    """Replicate params across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
