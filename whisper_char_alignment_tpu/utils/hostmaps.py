"""Bound the process's virtual-memory mapping count under XLA:CPU.

Every XLA:CPU executable the process compiles or AOT-loads from the
persistent cache holds anonymous (code, rodata, data) mappings per JIT'd
kernel — a scan-stacked Whisper program holds thousands. A single process
that keeps compiling distinct programs (the pytest suite: hundreds of jit
signatures across ~450 tests) accumulates mappings monotonically until it
crosses the kernel's ``vm.max_map_count`` (default 65530). Past the ceiling
``mmap`` fails with ENOMEM, LLVM's execution engine logs
"LLVM compilation error: Cannot allocate memory", and an unchecked
allocation-failure path SIGSEGVs the process inside
``jax/_src/compilation_cache.py::get_executable_and_time``.

Measured on this image (round 5): the full suite crossed 59,689 mappings in
its final minutes and died at the ceiling with exit 139, reproducibly; the
fast tier alone and the slow tier alone stay under it — which is exactly the
"tiers pass alone, full suite crashes" signature rounds 4-5 misattributed to
cross-host cache poisoning. (The cpu_aot_loader "Target machine feature
+prefer-no-scatter is not supported on the host machine" E-log that drove
that theory is benign self-noise: XLA's compile path appends tuning features
to the serialized attribute list that LLVM's host detection never reports,
so the warning fires for every persistent-cache load, including entries the
same process wrote seconds earlier — verified empirically.)

``jax.clear_caches()`` releases the executables and their mappings (measured:
702 -> 464 mappings after clearing 40 live jits), at the price of re-jitting
whatever runs next — cheap for persistent-cache hits, a real recompile only
for programs opted out of the cache (CPU-mesh collectives). The guard below
therefore clears ONLY when the process approaches the ceiling.
"""

import gc
import os
import sys

_DEFAULT_HEADROOM = 20_000
_MIN_THRESHOLD = 20_000


def mapping_count() -> int:
    """Number of VM mappings of this process (0 where /proc is absent)."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return f.read().count(b"\n")
    except OSError:
        return 0


def mapping_limit() -> int:
    """The kernel's vm.max_map_count (default 65530 when unreadable)."""
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65530


def clear_threshold() -> int:
    """Mapping count above which jax caches should be dropped.

    ``WCA_MAX_HOST_MAPPINGS`` overrides; otherwise the kernel limit minus
    headroom for one large program's burst (a medium-shaped whisper jit was
    measured adding ~8k mappings in one compile window).
    """
    env = os.environ.get("WCA_MAX_HOST_MAPPINGS")
    if env:
        return int(env)
    return max(_MIN_THRESHOLD, mapping_limit() - _DEFAULT_HEADROOM)


def clear_jax_caches_if_crowded(threshold: int | None = None) -> bool:
    """Drop jax's executable caches when the mapping count nears the kernel
    ceiling. Returns True if a clear happened. Safe to call often: the count
    check is one /proc read (~1 ms at 50k mappings)."""
    if threshold is None:
        threshold = clear_threshold()
    n = mapping_count()
    if n <= threshold:
        return False
    import jax

    jax.clear_caches()
    gc.collect()
    print(
        f"[hostmaps] {n} VM mappings > threshold {threshold} "
        f"(limit {mapping_limit()}): cleared jax caches -> {mapping_count()}",
        file=sys.stderr,
    )
    return True
