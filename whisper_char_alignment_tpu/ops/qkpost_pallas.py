"""Fused QK-postprocess Pallas kernel: medfilt -> scaled f32 softmax -> masks.

The teacher-forced capture applies, per decoder layer, the reference's
per-utterance pipeline (timing.py:63-66) to the raw cross-attention logits:
frame masking (the fixed-shape twin of physical slicing), a width-w median
filter ON LOGITS with reflect padding at each item's true right edge, a scaled
f32 softmax, and padded-token-row zeroing. The XLA path (qk_to_attention +
ops/medfilt.median_filter_masked) walks the (B, H, T, F) f32 tensor ~8 times
(~170 ms of the capture stage at B=32 medium); this kernel does one read and
one write per (item, head) map, with the whole (T, F) panel resident in VMEM.

Semantics match qk_to_attention exactly:
- the median network (reused from ops/medfilt._median_of) and the per-item
  right-edge reflected windows produce bit-identical medians (comparison-only
  selection, same values);
- items with valid_len <= width//2 pass through unfiltered (published
  short-input semantics);
- frames >= frame_len become -inf before the softmax, token rows >= token_len
  are zeroed after.
The softmax reduction order may differ from XLA's at the ~1e-7 level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .medfilt import _median_of


def _kernel(fl_ref, tl_ref, scale_ref, qk_ref, out_ref, *, width, tblk, f):
    b = pl.program_id(0)
    m = fl_ref[b] - 1  # last valid frame column for this item
    tl = tl_ref[b]
    qk_scale = scale_ref[0]
    x = qk_ref[0, 0].astype(jnp.float32)  # (T_blk, F)
    col = jax.lax.broadcasted_iota(jnp.int32, (tblk, f), 1)
    # global token-row index (the T axis is gridded so VMEM stays bounded for
    # long transcripts; every op here is row-independent)
    row = (jax.lax.broadcasted_iota(jnp.int32, (tblk, f), 0)
           + pl.program_id(2) * tblk)
    pad = width // 2

    # base medfilt pass: width shifted views with FULL-edge reflect (identical
    # values to slicing a reflect-padded copy; lane rolls + edge fixes)
    vals = []
    for s in range(-pad, pad + 1):
        # v[:, j] = x[:, j + s] (wrapped); pltpu.roll wants non-negative shifts
        v = pltpu.roll(x, (-s) % f, axis=1)
        for jj in range(-s):  # left edge: j + s < 0 -> reflect to x[:, -(j+s)]
            v = jnp.where(col == jj, x[:, -s - jj][:, None], v)
        for jj in range(s):  # right edge: j + s >= F -> reflect inside
            j = f - 1 - jj
            v = jnp.where(col == j, x[:, 2 * (f - 1) - (j + s)][:, None], v)
        vals.append(v)
    base = _median_of(vals)

    # per-item edge correction: the pad columns at [m - pad + 1, m] read past
    # the item's true edge above; recompute with per-item reflected windows.
    # Mosaic has no arbitrary-lane dynamic load, so column i is extracted with
    # a masked lane reduction (i is unique, the sum selects exactly x[:, i])
    for p in range(pad):
        c = m - p
        window = []
        for k in range(width):
            i = jnp.abs(c - pad + k)  # left reflect
            i = jnp.where(i > m, 2 * m - i, i)  # right reflect at the true edge
            i = jnp.clip(i, 0, f - 1)
            window.append(jnp.sum(jnp.where(col == i, x, 0.0), axis=1,
                                  keepdims=True))  # (T, 1) == x[:, i]
        base = jnp.where(col == c, _median_of(window), base)

    # short inputs pass through unfiltered (published semantics)
    base = jnp.where(m + 1 <= pad, x, base)
    logits = jnp.where(col <= m, base * qk_scale, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    out_ref[0, 0] = jnp.where(row < tl, attn, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("width", "attn_dtype",
                                             "interpret"))
def qk_postprocess_fused(qk, frame_len, token_len, width: int,
                         qk_scale=1.0, attn_dtype=jnp.float32,
                         interpret: bool = False):
    """qk (B, H, T, F) [+ mask already applied]; returns attn (B, H, T, F).
    ``qk_scale`` may be a traced scalar (rides the scalar-prefetch lane)."""
    b, h, t, f = qk.shape
    # block the token axis so VMEM stays bounded for long transcripts (each
    # (T_blk, F) f32 panel is ~width+3 live temporaries); rows are independent
    tblk = t
    if t > 128:
        for cand in (128, 112, 96, 80, 64, 48, 32, 16, 8):
            if t % cand == 0:
                tblk = cand
                break
    kernel = functools.partial(_kernel, width=width, tblk=tblk, f=f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, h, t // tblk),
        in_specs=[
            pl.BlockSpec((1, 1, tblk, f), lambda i, j, k, *_: (i, j, k, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tblk, f),
                               lambda i, j, k, *_: (i, j, k, 0)),
    )
    scale_arr = jnp.asarray(qk_scale, jnp.float32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, f), attn_dtype),
        interpret=interpret,
    )(frame_len.astype(jnp.int32), token_len.astype(jnp.int32), scale_arr, qk)
