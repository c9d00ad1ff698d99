"""int8 cross-KV decode: quantization error bound and end-to-end smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    mel = np.random.default_rng(0).normal(
        0, 1, (2, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32)
    return tok, dims, params, jnp.asarray(mel)


def test_quantization_error_bound(setup):
    tok, dims, params, mel = setup
    xa = wmodel.encode_audio(params, dims, mel)
    k_f, v_f = wmodel.precompute_cross_kv(params, dims, xa)
    (kq, ks), (vq, vs) = wmodel.precompute_cross_kv(params, dims, xa,
                                                    quantize=True)
    k_deq = np.asarray(kq, np.float32) * np.asarray(ks)
    # per-column scaling -> error bounded by half a quantization step
    err = np.abs(k_deq - np.asarray(k_f))
    bound = np.asarray(ks) / 2 + 1e-6
    assert (err <= np.broadcast_to(bound, err.shape)).all()
    rel = err.max() / (np.abs(np.asarray(k_f)).max() + 1e-9)
    assert rel < 0.01


def test_int8_decode_runs_and_is_close(setup):
    tok, dims, params, mel = setup
    opts = decoding.DecodingOptions(language="en", sample_len=8)
    base = decoding.decode(params, dims, tok, mel, opts)
    q = decoding.decode(params, dims, tok, mel, opts, kv_int8=True)
    assert len(q) == 2
    # greedy paths may diverge after a near-tie, but the first sampled token
    # (forced timestamp, strong margins) must agree
    for a, b in zip(base, q):
        if a.tokens and b.tokens:
            assert a.tokens[0] == b.tokens[0]
