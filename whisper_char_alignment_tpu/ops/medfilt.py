"""Median filter along the frame axis.

Replaces ``whisper.timing.median_filter`` (reference call sites: timing.py:9, 65, 158
— applied to raw cross-attention QK logits *before* softmax). Semantics mirrored
exactly: odd width >= 3, reflect padding on the last axis, sliding-window median;
inputs whose last axis is <= width//2 are returned unchanged.

The filter is a static small-width sort network once vmapped: we stack the ``width``
shifted views on a new trailing axis and sort — XLA fuses this into the surrounding
elementwise work, so no dedicated Pallas kernel is needed for widths 3..9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(1,))
def median_filter(x: jax.Array, width: int) -> jax.Array:
    """Apply a width-``width`` median filter over the last axis of ``x``."""
    assert width > 0 and width % 2 == 1, "`width` should be an odd positive number"
    pad = width // 2
    if x.shape[-1] <= pad:
        return x
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = jnp.stack(
        [jax.lax.slice_in_dim(xp, k, k + x.shape[-1], axis=-1) for k in range(width)],
        axis=-1,
    )
    return jnp.sort(windows, axis=-1)[..., pad]


@functools.partial(jax.jit, static_argnums=(1,))
def median_filter_masked(x: jax.Array, width: int, valid_len: jax.Array) -> jax.Array:
    """Per-item masked median filter: for each batch item, behaves exactly as if
    ``x[b, ..., :valid_len[b]]`` had been sliced first (reflect padding at the true
    right edge), which is what the reference does by physically slicing before
    filtering (timing.py:64-65). Frames >= valid_len are passed through unfiltered
    (they are masked out downstream anyway). Items with valid_len <= width//2 are
    returned unchanged (published short-input semantics).

    x: (B, ..., F); valid_len: (B,) int32.
    """
    assert width > 0 and width % 2 == 1
    pad = width // 2
    f = x.shape[-1]

    def one(xi, m):
        # m = last valid index; reflect window indices at 0 and at m
        i = jnp.arange(f)[:, None]
        k = jnp.arange(width)[None, :]
        j = jnp.abs(i + k - pad)  # left reflect
        j = jnp.where(j > m, 2 * m - j, j)  # right reflect at the true edge
        j = jnp.clip(j, 0, f - 1)
        windows = xi[..., j]  # (..., F, width)
        out = jnp.sort(windows, axis=-1)[..., pad]
        # frames beyond the valid region keep their raw values
        beyond = jnp.arange(f) > m
        out = jnp.where(beyond, xi, out)
        # whisper semantics: inputs with valid length <= pad are returned unchanged
        return jnp.where(m + 1 <= pad, xi, out)

    return jax.vmap(one)(x, valid_len.astype(jnp.int32) - 1)


def median_filter_np(x: np.ndarray, width: int) -> np.ndarray:
    """NumPy twin of :func:`median_filter` (host fallback / test oracle)."""
    assert width > 0 and width % 2 == 1
    pad = width // 2
    x = np.asarray(x)
    if x.shape[-1] <= pad:
        return x
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.stack([xp[..., k:k + x.shape[-1]] for k in range(width)], axis=-1)
    return np.sort(windows, axis=-1)[..., pad]
