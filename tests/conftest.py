"""Test harness config: force an 8-virtual-device CPU mesh before JAX initializes.

Multi-chip sharding is tested on host-device meshes per SURVEY.md §4 — real TPUs are
not required for correctness tests. Note: the axon TPU plugin ignores the
``JAX_PLATFORMS`` env var, so the platform must be forced via ``jax.config``.
Set ``WCA_TEST_TPU=1`` to run the suite on the real chip instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU collectives LOG(FATAL) the whole pytest process when a
    # rendezvous participant thread is >40 s late (default); on a loaded
    # 1-core host time-sharing 8 virtual devices that deadline is reachable
    # by scheduling starvation alone (round-4 incident: the fast tier
    # aborted inside dryrun_multichip, "only 3 of them arrived on time").
    # Termination raised to 10 min (XLA's warn-stuck log keeps stalls
    # visible; its interval has no registered XLA_FLAGS name).
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()

import jax

if not os.environ.get("WCA_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's long tail is CPU jit compiles;
# warm runs of the fast tier (`pytest -m "not slow"`) reuse them. Subprocess
# tests (bench smoke, multihost) set their own cache dir. The dir is keyed by
# the host CPU identity + jaxlib version (utils/compile_cache.py has the
# full rationale): XLA:CPU AOT executables are host-specific, so as
# defense-in-depth a cache written on one fleet host is never read on
# another. (The r4/r5 full-suite crashes originally attributed to cross-host
# entries turned out to be vm.max_map_count exhaustion — see
# utils/hostmaps.py and the _bound_host_mappings fixture below.)
if not os.environ.get("WCA_TEST_NO_CACHE"):
    if os.environ.get("WCA_TEST_TPU"):
        # on the real chip, share the cache every TPU script uses — the
        # CPU-identity tag below is meaningless for TPU executables, and a
        # fresh dir would recompile every warm signature at minutes each
        # (round-4 review finding)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_wca"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    else:
        from whisper_char_alignment_tpu.utils.compile_cache import \
            cpu_cache_dir

        jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest


@pytest.fixture(autouse=True)
def _bound_host_mappings():
    """Keep the suite's VM mapping count under the kernel's vm.max_map_count.

    Every XLA:CPU executable holds per-kernel anon mappings; one pytest
    process compiling ~450 tests' worth of distinct programs crosses the
    65530 default ceiling near the end of the full suite, after which mmap
    ENOMEM SIGSEGVs the process inside jax's cache deserialization (the
    r4/r5 "tiers pass alone, full suite dies" incidents — root-caused round 5
    by sampling /proc/self/maps to 59,689 right before the crash). Clearing
    jax's caches releases the mappings; do it only when close to the ceiling
    so warm executables are kept the rest of the time."""
    yield
    from whisper_char_alignment_tpu.utils.hostmaps import \
        clear_jax_caches_if_crowded

    clear_jax_caches_if_crowded()


@pytest.fixture(autouse=True)
def _restore_compilation_cache_flag():
    """CPU-mesh helpers turn the persistent compilation cache OFF for the
    mesh programs they are about to compile (parallel/mesh.py::
    disable_compile_cache_for_cpu_collectives — deserialized multi-device
    XLA:CPU executables deadlock in the collective rendezvous). Restore the
    flag after each test so only the mesh test itself pays cold compiles and
    the rest of the suite keeps its warm cache."""
    was = jax.config.jax_enable_compilation_cache
    yield
    if jax.config.jax_enable_compilation_cache != was:
        jax.config.update("jax_enable_compilation_cache", was)
