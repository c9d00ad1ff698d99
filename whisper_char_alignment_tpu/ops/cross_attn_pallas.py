"""Fused decode-step cross-attention Pallas kernel.

The greedy decode loop is bound by streaming the cross-attention K/V from HBM
every step (reference behavior: whisper's decoder cross-attends over all 1500
encoder positions each sampled token). The XLA int8 path only recovered -8% of
the theoretical 2x because the dequantized operand materializes in HBM
(docs/DESIGN.md). This kernel reads the int8 K/V directly (half the bytes),
dequantizes in VMEM, and fuses q@K -> masked softmax -> w@V into one pass per
layer, so no (B, H, 1, F) intermediate round-trips to HBM.

Layouts match models/whisper.py::precompute_cross_kv: K/V (B, H, hd, F) with a
per-(item, head, frame) f32 scale (B, H, 1, F); q (B, H, 1, hd) already scaled
by hd**-0.25. A bf16 (unquantized) variant shares the kernel body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _body(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, n_heads, head_dim,
          n_frames, k_scale, quantized):
    """One batch item: qk = (q @ K) * scales -> softmax -> @ V, ALL heads at
    once.

    All compute is VPU elementwise + reductions over (H, hd, F) tiles — the
    matmuls have M=1, so the MXU would waste 127/128 rows; the op is
    bandwidth-bound either way and VPU keeps everything in f32 lanes. The
    head axis rides as the leading (untiled) dim of one big 3-D op instead of
    a Python loop of H small 2-D ops (the round-2 kernel's serialization —
    16 separate (hd, F) reductions left most VPU lanes idle between ops).
    """
    q = q_ref[0].astype(jnp.float32)  # (H, 1, hd)
    k = k_ref[0].astype(jnp.float32)  # (H, hd, F)
    qk = jnp.sum(k * q.transpose(0, 2, 1), axis=1)  # (H, F)
    if quantized:
        qk = qk * ks_ref[0][:, 0, :].astype(jnp.float32)
    qk = qk * k_scale
    w = jax.nn.softmax(qk, axis=-1)  # (H, F) f32
    if quantized:
        w = w * vs_ref[0][:, 0, :].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)  # (H, hd, F)
    o_ref[0] = jnp.sum(v * w[:, None, :], axis=2)[:, None, :]  # (H, 1, hd)


@functools.partial(jax.jit, static_argnames=("k_scale", "interpret"))
def cross_attn_step_int8(q, k8, k_s, v8, v_s, *, k_scale: float,
                         interpret: bool = False):
    """q (B, H, 1, hd) [already * hd**-0.25]; k8/v8 (B, H, hd, F) int8;
    k_s/v_s (B, H, 1, F) f32. Returns (B, H, 1, hd) f32.

    ``k_scale`` is the remaining hd**-0.25 factor the caller would have applied
    to K (models/whisper.py decode_step applies q and k scales separately)."""
    b, n_heads, head_dim, n_frames = k8.shape
    kernel = functools.partial(_body, n_heads=n_heads, head_dim=head_dim,
                               n_frames=n_frames, k_scale=k_scale,
                               quantized=True)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_heads, 1, head_dim), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, head_dim, n_frames),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, 1, n_frames), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, head_dim, n_frames),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, 1, n_frames), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_heads, 1, head_dim),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_heads, 1, head_dim), jnp.float32),
        interpret=interpret,
    )(q, k8, k_s, v8, v_s)
    return out


@functools.partial(jax.jit, static_argnames=("k_scale", "interpret"))
def cross_attn_step(q, k, v, *, k_scale: float, interpret: bool = False):
    """Unquantized variant: k/v (B, H, hd, F) in any float dtype."""
    b, n_heads, head_dim, n_frames = k.shape
    kernel = functools.partial(_body, n_heads=n_heads, head_dim=head_dim,
                               n_frames=n_frames, k_scale=k_scale,
                               quantized=False)
    out = pl.pallas_call(
        lambda q_ref, k_ref, v_ref, o_ref: kernel(
            q_ref, k_ref, None, v_ref, None, o_ref),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_heads, 1, head_dim), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, head_dim, n_frames),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, head_dim, n_frames),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_heads, 1, head_dim),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_heads, 1, head_dim), jnp.float32),
        interpret=interpret,
    )(q, k, v)
    return out
