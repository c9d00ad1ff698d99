"""Fused encoder self-attention kernel vs the XLA einsum+f32-softmax path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.ops.encoder_attn_pallas import (
    encoder_self_attention)


def _xla_reference(q, k, v):
    qk = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("t,n_valid", [
    pytest.param(256, 256, marks=pytest.mark.slow),
    pytest.param(300, 300, marks=pytest.mark.slow),
    (300, 250)])  # fast tier: the masked non-multiple case subsumes the rest
def test_fused_kernel_matches_xla(t, n_valid):
    b, h, hd = 2, 3, 64
    rng = np.random.default_rng(0)
    scale = hd ** -0.25
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32)) * scale
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32)) * scale
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32))
    got = np.asarray(encoder_self_attention(q, k, v, n_valid=n_valid,
                                            block_q=128, interpret=True))
    want = np.asarray(_xla_reference(q, k[:, :, :n_valid], v[:, :, :n_valid]))
    # rows < n_valid must match; rows beyond attend over the same masked cols
    np.testing.assert_allclose(got[:, :, :n_valid], want[:, :, :n_valid],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t,n_valid", [
    pytest.param(256, 256, marks=pytest.mark.slow), (300, 250)])
def test_kt_variant_matches_xla(t, n_valid):
    from whisper_char_alignment_tpu.ops.encoder_attn_pallas import (
        encoder_self_attention_kt)

    b, h, hd = 2, 3, 64
    rng = np.random.default_rng(1)
    scale = hd ** -0.25
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32)) * scale
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32)) * scale
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32))
    got = np.asarray(encoder_self_attention_kt(q, k, v, n_valid=n_valid,
                                               block_q=128, interpret=True))
    want = np.asarray(_xla_reference(q, k[:, :, :n_valid], v[:, :, :n_valid]))
    np.testing.assert_allclose(got[:, :, :n_valid], want[:, :, :n_valid],
                               rtol=2e-5, atol=2e-5)


def test_encode_audio_fused_matches_xla_mode():
    """Full encoder with attn_mode='fused' (interpret via CPU) vs 'xla'."""
    dims = tiny_test_dims(n_vocab=64, n_audio_ctx=40, n_text_ctx=16,
                          state=128, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.normal(
        0, 1, (2, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32))
    ref = np.asarray(wmodel.encode_audio(params, dims, mel, attn_mode="xla"))
    import whisper_char_alignment_tpu.ops.encoder_attn_pallas as eap
    orig = eap.encoder_self_attention

    def interp(q, k, v, n_valid, block_q=512, interpret=False):
        return orig(q, k, v, n_valid=n_valid, block_q=block_q, interpret=True)

    eap.encoder_self_attention = interp
    try:
        got = np.asarray(wmodel.encode_audio(params, dims, mel,
                                             attn_mode="fused"))
    finally:
        eap.encoder_self_attention = orig
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)
