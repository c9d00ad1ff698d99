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


def _median_of(slices):
    """Median of ``w`` same-shaped arrays via odd-even transposition compare-
    exchange (pure elementwise min/max — XLA fuses the whole network, no
    (..., w) stack is ever materialized)."""
    vals = list(slices)
    w = len(vals)
    for p in range(w):
        start = p % 2
        for i in range(start, w - 1, 2):
            lo = jnp.minimum(vals[i], vals[i + 1])
            hi = jnp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo, hi
    return vals[w // 2]


@functools.partial(jax.jit, static_argnums=(1,))
def median_filter_masked(x: jax.Array, width: int, valid_len: jax.Array) -> jax.Array:
    """Per-item masked median filter: for each batch item, behaves exactly as if
    ``x[b, ..., :valid_len[b]]`` had been sliced first (reflect padding at the true
    right edge), which is what the reference does by physically slicing before
    filtering (timing.py:64-65). Frames >= valid_len are passed through unfiltered
    (they are masked out downstream anyway). Items with valid_len <= width//2 are
    returned unchanged (published short-input semantics).

    x: (B, ..., F); valid_len: (B,) int32.

    Fast path: a fused median network over ``width`` shifted slices of the
    full-edge reflect-padded array (no gather), then the ``width//2`` columns at
    each item's true right edge — the only columns whose windows cross it — are
    recomputed with a tiny per-item gather and scattered back.
    """
    assert width > 0 and width % 2 == 1
    pad = width // 2
    f = x.shape[-1]
    b = x.shape[0]
    m = valid_len.astype(jnp.int32) - 1  # (B,) last valid index
    mb = m.reshape((b,) + (1,) * (x.ndim - 1))

    # base pass: reflect at the FULL array edges, median network over slices
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    base = _median_of([jax.lax.slice_in_dim(xp, k, k + f, axis=-1)
                       for k in range(width)])

    # correction: columns c in [valid_len - pad, valid_len) read past the item's
    # edge in the base pass; recompute them with per-item reflected windows
    cols = m[:, None] - jnp.arange(pad)[None, :]  # (B, pad) columns to fix
    win = cols[:, :, None] + (jnp.arange(width) - pad)[None, None, :]  # (B,pad,w)
    win = jnp.abs(win)  # left reflect
    win = jnp.where(win > m[:, None, None], 2 * m[:, None, None] - win, win)
    win = jnp.clip(win, 0, f - 1).reshape(b, pad * width)
    idx = win.reshape((b,) + (1,) * (x.ndim - 2) + (pad * width,))
    gathered = jnp.take_along_axis(x, idx, axis=-1)
    gathered = gathered.reshape(x.shape[:-1] + (pad, width))
    fixed = jnp.sort(gathered, axis=-1)[..., pad]  # (..., pad)
    cols_idx = jnp.clip(cols, 0, f - 1).reshape(
        (b,) + (1,) * (x.ndim - 2) + (pad,))
    cols_idx = jnp.broadcast_to(cols_idx, x.shape[:-1] + (pad,))
    out = jnp.put_along_axis(base, cols_idx,
                             jnp.broadcast_to(fixed, x.shape[:-1] + (pad,)),
                             axis=-1, inplace=False)

    # frames beyond the valid region keep their raw values; items with
    # valid_len <= pad are returned unchanged (whisper short-input semantics)
    frame_ids = jnp.arange(f).reshape((1,) * (x.ndim - 1) + (f,))
    out = jnp.where(frame_ids > mb, x, out)
    return jnp.where(mb + 1 <= pad, x, out)


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
