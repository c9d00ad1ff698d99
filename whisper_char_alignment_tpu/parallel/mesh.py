"""Device mesh + sharding helpers (data and tensor parallelism).

The reference has no parallelism at all (SURVEY.md §2c: batch_size=1, single
device). Here the batch axis is the primary parallel axis: a mesh over ICI,
inputs sharded on axis 0, params replicated — XLA partitions every jitted step
(mel, decode, teacher-forced capture, DTW) across chips with no code changes,
and metric counters reduce with ``psum`` where they live on device. An optional
'model' axis additionally shards the attention/FFN weight columns (tensor
parallelism — the lever for large-v3, where per-chip HBM gates cross-K/V reuse
off and the teacher-forced forward dominates; docs/DESIGN.md round-4 note).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def disable_compile_cache_for_cpu_collectives(devices) -> None:
    """Turn the persistent compilation cache OFF when a >1-device CPU mesh is
    about to be used (process-wide; tests/conftest.py restores it per test).

    Incident (round 4): multi-device XLA:CPU programs DESERIALIZED from the
    persistent cache deadlock in the in-process collective rendezvous — the
    suite aborted with `AwaitAndLogIfStuck ... InProcessCommunicator::
    AllGather` LOG(FATAL) after the 600 s terminate timeout, reproducibly
    (same test set, warm AOT load: deadlock; cold in-process compile of the
    IDENTICAL programs: pass — even for executables compiled by the same
    host minutes earlier, so this is not the cross-host staleness class that
    utils/compile_cache.py keys away). Freshly-compiled mesh programs have
    never deadlocked, so CPU-mesh work simply opts out of the cache; TPU
    meshes are unaffected (the bug is in the XLA:CPU thunk-runtime AOT-load
    path).
    """
    try:
        platforms = {d.platform for d in np.asarray(devices).ravel().tolist()}
    except Exception:
        platforms = {getattr(d, "platform", "?") for d in devices}
    if platforms == {"cpu"} and np.asarray(devices).size > 1 \
            and jax.config.jax_enable_compilation_cache:
        jax.config.update("jax_enable_compilation_cache", False)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """(data,) mesh, or (data, model) when ``n_model > 1``.

    The 1-D shape is kept for the pure-data-parallel case so every existing
    caller/cache key is unchanged; ``P('data', ...)`` specs work on both.
    """
    # under a multi-process (jax.distributed) run, each process builds a mesh
    # over its OWN devices: data parallelism across processes happens by scp
    # sharding (cli/infer_ali --multihost), not by a global mesh
    devices = (jax.local_devices() if jax.process_count() > 1
               else jax.devices())
    if n_data is not None and n_data < 1:
        # callers encode "no mesh"/"auto" as None BEFORE calling; a negative
        # count must not slice devices[:-k] into a silently-smaller mesh
        # (round-4 review finding: `--data_parallel -1 --tensor_parallel 2`)
        raise ValueError(f"n_data must be >= 1 or None (auto), got {n_data}")
    n_model = max(1, n_model)
    if n_model == 1:
        n = n_data or len(devices)
        if n > len(devices):
            # consistent with the 2-D branch: never SILENTLY shrink the mesh
            # (a scaling measurement at half the requested width, round-4
            # review finding)
            raise ValueError(f"mesh ({n},) needs {n} devices, "
                             f"have {len(devices)}")
        disable_compile_cache_for_cpu_collectives(devices[:n])
        return Mesh(np.array(devices[:n]), ("data",))
    n = n_data or len(devices) // n_model
    if n < 1 or n * n_model > len(devices):
        raise ValueError(f"mesh ({n}x{n_model}) needs {max(n, 1) * n_model} "
                         f"devices, have {len(devices)}")
    disable_compile_cache_for_cpu_collectives(devices[:n * n_model])
    return Mesh(np.array(devices[:n * n_model]).reshape(n, n_model),
                ("data", "model"))


def data_size(mesh: Mesh) -> int:
    """Devices on the batch ('data') axis — the batch-padding multiple."""
    return mesh.shape.get("data", mesh.devices.size)


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


def tensor_parallel_spec(path, x) -> P:
    """Weight PartitionSpec for the 'model' axis (the layout proven parity-
    exact by ``__graft_entry__.dryrun_multichip`` since round 2): q/k/v and
    fc1 split on OUTPUT columns (each chip computes its head/FFN slice with
    no collective), out-proj and fc2 split on INPUT rows (XLA inserts one
    all-reduce per block after each); everything else — convs, layer norms,
    embeddings, biases — replicated. Stacked (L, d_in, d_out) layout.

    int8-quantized leaves follow their float twin: ``w8`` (L, d_in, d_out)
    shards exactly like ``w``; the per-output-channel scale ``s``
    (L, 1, d_out) shards on its output axis for column-split projections and
    stays replicated for row-split ones (their outputs are full per chip).
    Matching only 'w' silently replicated every quantized encoder weight —
    tensor parallelism measured without actually sharding the encoder
    (round-4 review finding)."""
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if "attn" in names or "cross_attn" in names:
        if parent in ("q", "k", "v") and leaf in ("w", "w8", "s"):
            return P(None, None, "model")
        if parent == "out" and leaf in ("w", "w8"):
            return P(None, "model", None)
    if "mlp" in names:
        if "fc1" in names and leaf in ("w", "w8", "s"):
            return P(None, None, "model")
        if "fc2" in names and leaf in ("w", "w8"):
            return P(None, "model", None)
    return P()


def shard_params(tree, mesh: Mesh):
    """Lay out the weight pytree for the mesh: tensor-parallel over a >1
    'model' axis, plain replication otherwise."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return replicate(tree, mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, tensor_parallel_spec(path, x))), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
