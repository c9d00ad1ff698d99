"""Fused decode-step cross-attention kernel vs the XLA reference math
(models/whisper.py decode_step's einsum/softmax/einsum cross block)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.ops.cross_attn_pallas import (
    cross_attn_step, cross_attn_step_int8)


def _reference(q, k, v, k_scale):
    qk = jnp.einsum("bhtd,bhdf->bhtf", q, k.astype(jnp.float32) * k_scale,
                    preferred_element_type=jnp.float32)
    w = jax.nn.softmax(qk, axis=-1)
    return jnp.einsum("bhtf,bhdf->bhtd", w, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def _quant(x):
    # x (B, H, hd, F): per-frame-column scale over the hd axis -> (B, H, 1, F)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return q, scale


@pytest.mark.parametrize("frames", [
    pytest.param(96, marks=pytest.mark.slow), 250])
def test_bf16_kernel_matches_reference(frames):
    b, h, hd = 3, 4, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, h, 1, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, h, hd, frames)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, h, hd, frames)).astype(np.float32))
    k_scale = hd ** -0.25
    want = np.asarray(_reference(q, k, v, k_scale))
    got = np.asarray(cross_attn_step(q, k, v, k_scale=k_scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_int8_kernel_matches_dequantized_reference():
    b, h, hd, frames = 2, 4, 64, 160
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (b, h, 1, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, h, hd, frames)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, h, hd, frames)).astype(np.float32))
    k8, ks = _quant(k)
    v8, vs = _quant(v)
    k_scale = hd ** -0.25
    # reference math on the DEQUANTIZED tensors — the kernel must match the
    # XLA int8 path bit-for-bit in exact arithmetic, not approximate fp noise
    k_dq = k8.astype(jnp.float32) * ks
    v_dq = v8.astype(jnp.float32) * vs
    want = np.asarray(_reference(q, k_dq, v_dq, k_scale))
    got = np.asarray(cross_attn_step_int8(q, k8, ks, v8, vs, k_scale=k_scale,
                                          interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_int8_quantization_error_bounded():
    """End-to-end output drift from quantization stays small relative to the
    attention output scale (the opt-in accuracy risk is bounded)."""
    b, h, hd, frames = 2, 2, 64, 128
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(0, 1, (b, h, 1, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, h, hd, frames)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, h, hd, frames)).astype(np.float32))
    k8, ks = _quant(k)
    v8, vs = _quant(v)
    exact = np.asarray(_reference(q, k, v, hd ** -0.25))
    got = np.asarray(cross_attn_step_int8(q, k8, ks, v8, vs,
                                          k_scale=hd ** -0.25, interpret=True))
    denom = np.abs(exact).max()
    assert np.abs(got - exact).max() / denom < 0.08
