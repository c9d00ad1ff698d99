"""The VM-mapping-count guard (utils/hostmaps.py).

Regression context: the full suite (one pytest process, ~450 tests) crossed
the kernel's vm.max_map_count (65530 default) in its final minutes and
SIGSEGV'd inside jax's persistent-cache deserialization — reproducibly, while
the fast tier alone and the slow tier alone passed. The conftest autouse
fixture calls clear_jax_caches_if_crowded() after every test; these tests pin
the helper's contract.
"""

import numpy as np
import pytest

from whisper_char_alignment_tpu.utils import hostmaps


def test_mapping_count_positive_on_linux():
    n = hostmaps.mapping_count()
    assert n > 100  # a live CPython+jax process holds hundreds of mappings


def test_mapping_limit_readable():
    assert hostmaps.mapping_limit() >= 20_000


def test_threshold_env_override(monkeypatch):
    monkeypatch.setenv("WCA_MAX_HOST_MAPPINGS", "12345")
    assert hostmaps.clear_threshold() == 12345


def test_threshold_tracks_kernel_limit(monkeypatch):
    monkeypatch.delenv("WCA_MAX_HOST_MAPPINGS", raising=False)
    monkeypatch.setattr(hostmaps, "mapping_limit", lambda: 65530)
    assert hostmaps.clear_threshold() == 65530 - 20_000
    # a tiny limit still leaves a sane floor instead of thrashing at 0
    monkeypatch.setattr(hostmaps, "mapping_limit", lambda: 25_000)
    assert hostmaps.clear_threshold() == 20_000


def test_noop_below_threshold(monkeypatch):
    calls = []
    import jax

    monkeypatch.setattr(jax, "clear_caches", lambda: calls.append(1))
    assert hostmaps.clear_jax_caches_if_crowded(threshold=10**9) is False
    assert not calls


def test_clears_above_threshold_and_releases_mappings():
    """End-to-end: compile fresh jits, then force a clear (threshold below
    the current count) and observe the mapping count drop — the mechanism
    that keeps the full suite under the kernel ceiling."""
    import jax
    import jax.numpy as jnp

    fns = []
    for i in range(8):
        f = jax.jit(lambda x, k=float(i + 2): jnp.tanh(x * k) @ x.T)
        f(np.ones((16 + i, 16 + i), np.float32)).block_until_ready()
        fns.append(f)
    before = hostmaps.mapping_count()
    del fns
    assert hostmaps.clear_jax_caches_if_crowded(threshold=1) is True
    after = hostmaps.mapping_count()
    assert after < before, (before, after)
