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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("WCA_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
