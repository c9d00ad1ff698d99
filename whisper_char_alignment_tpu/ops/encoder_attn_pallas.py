"""Fused encoder self-attention Pallas kernel, shape-tuned for Whisper.

The XLA encoder attention materializes the (T, T) logit matrix in f32 per
(layer, item): ~4.6 GB written + re-read per layer at B=32, T=1500 — the
measured encoder bottleneck (docs/DESIGN.md). Whisper's T (1500) and head_dim
(64) are small enough that one (T_pad, hd) K and V panel fits in VMEM
(~200 KB each in bf16), so no online-softmax bookkeeping is needed: each
program computes one q-block's full score row panel in VMEM, does the f32
softmax there (matching upstream whisper's ``qk.float().softmax(-1)`` island),
and multiplies by the resident V. The stock flash kernel lost to XLA at these
shapes (its online-softmax machinery buys nothing when K/V are VMEM-resident).

Semantics match models/whisper.py::_qkv_attention: q and k arrive pre-scaled
by head_dim**-0.25, softmax in f32, probabilities cast back to the compute
dtype before the V matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid, t_pad):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BQ, T_pad) f32
    if n_valid < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_kt(q_ref, kt_ref, v_ref, o_ref, *, n_valid, t_pad):
    """Variant consuming K pre-transposed to (hd, T): the score dot is a
    natural (BQ, hd) @ (hd, T) with no in-kernel transpose of the K panel."""
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BQ, T_pad) f32
    if n_valid < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_valid", "block_q", "interpret"))
def encoder_self_attention_kt(q, k, v, n_valid: int, block_q: int = 512,
                              interpret: bool = False):
    """A/B variant of :func:`encoder_self_attention` that feeds the kernel a
    pre-transposed (hd, T) K panel (one XLA transpose outside the grid instead
    of a per-program relayout inside the score dot)."""
    b, h, t, hd = q.shape
    t_pad = ((t + block_q - 1) // block_q) * block_q

    def prep(x):
        x = x.reshape(b * h, t, hd)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qf, vf = prep(q), prep(v)
    kt = prep(k).transpose(0, 2, 1)  # (BH, hd, T_pad)
    kernel = functools.partial(_kernel_kt, n_valid=n_valid, t_pad=t_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, t_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
        interpret=interpret,
    )(qf, kt, vf)
    return out[:, :t].reshape(b, h, t, hd)


@functools.partial(jax.jit, static_argnames=("n_valid", "block_q", "interpret"))
def encoder_self_attention(q, k, v, n_valid: int, block_q: int = 512,
                           interpret: bool = False):
    """q/k/v (B, H, T, hd), q and k pre-scaled; attends over cols < n_valid.

    T is padded to a block_q multiple internally; rows >= n_valid of the output
    are garbage (the caller slices them off, exactly like the XLA path's
    padded positions)."""
    b, h, t, hd = q.shape
    t_pad = ((t + block_q - 1) // block_q) * block_q

    def prep(x):
        x = x.reshape(b * h, t, hd)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)
    kernel = functools.partial(_kernel, n_valid=n_valid, t_pad=t_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :t].reshape(b, h, t, hd)
