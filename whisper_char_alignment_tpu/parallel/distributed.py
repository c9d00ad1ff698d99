"""Multi-host initialization for dataset sweeps (SURVEY.md §2c / §5).

Single-host is the default and needs nothing. For multi-host sweeps (e.g.
probe_oracle over a large corpus on a pod slice), call :func:`initialize` first:
JAX wires hosts over DCN, each host runs the pipeline on its shard of the scp,
and scalar metric counters are reduced with :func:`allreduce_counters`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op when unconfigured single-host)."""
    import jax

    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_entries(entries, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Round-robin shard of scp entries for this host."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return entries[pi::pc]


def allreduce_counters(counters: Dict[str, float]) -> Dict[str, float]:
    """Sum scalar metric counters (tp/fp/fn/...) across hosts via a psum on the
    global device mesh; identity on single-host."""
    import jax
    # explicit import: jax.experimental has no lazy `multihost_utils` attr on
    # current jax — relying on jax-internal side-effect imports is fragile
    from jax.experimental import multihost_utils
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return dict(counters)
    keys = sorted(counters)
    local = jnp.asarray([float(counters[k]) for k in keys], jnp.float32)
    summed = multihost_utils.process_allgather(local).sum(0)
    return {k: float(v) for k, v in zip(keys, np.asarray(summed))}


def broadcast_scalar(value: float) -> float:
    """Process 0's value on every process (identity single-host); used to agree
    on one output-file timestamp across a multihost run.

    The value rides as SPLIT int32 words, never as one float: jnp.float64
    silently downcasts to float32 under the default x64-disabled config, and a
    float32 unix timestamp (~1.77e9, 24-bit mantissa) quantizes to a ~128 s
    grid — two runs in the same bucket would share an output stem and the
    second would overwrite the first's metrics/predictions (round-4 review)."""
    import jax
    from jax.experimental import multihost_utils
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return float(value)
    scaled = int(round(float(value) * 1000.0))  # ms precision, exact in int
    words = jnp.asarray([scaled // (1 << 31), scaled % (1 << 31)], jnp.int32)
    out = np.asarray(multihost_utils.broadcast_one_to_all(words))
    return (int(out[0]) * (1 << 31) + int(out[1])) / 1000.0
