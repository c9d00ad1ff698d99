"""Opt-in int8 encoder (per-channel int8 weights + per-row int8 activations
on the MXU path): error bounds vs the bf16/f32 path and end-to-end pipeline
smoke with coherent alignments."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=64, n_text_ctx=32,
                          state=32, head=4, layers=3)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    return tok, dims, params


def test_linear_int8_matches_dense():
    """One dense layer: the int8 path must track the f32 matmul within the
    combined weight+activation quantization budget."""
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, (64, 96)).astype(np.float32)
    b = rng.normal(0, 0.1, (96,)).astype(np.float32)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 10, 64)), jnp.float32)
    dense = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    want = np.asarray(wmodel._linear(dense, x))

    amax = np.abs(w).max(axis=0, keepdims=True)
    s = amax / 127.0
    q = {"w8": jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8),
         "s": jnp.asarray(s), "b": jnp.asarray(b)}
    got = np.asarray(wmodel._linear(q, x))  # routes via _linear_int8
    err = np.abs(got - want).max()
    assert err < 0.02 * np.abs(want).max(), err


def test_quantized_encoder_states_close(setup):
    """Full encoder: quantized vs exact states within a small relative error
    (per-layer LayerNorm keeps the drift bounded across depth)."""
    tok, dims, params = setup
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.normal(0, 1, (2, dims.n_mels, 2 * dims.n_audio_ctx)),
                      jnp.float32)
    exact = np.asarray(wmodel.encode_audio(params, dims, mel))
    q = wmodel.quantize_encoder_int8(params)
    approx = np.asarray(wmodel.encode_audio(q, dims, mel))
    rel = np.abs(approx - exact).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 0.05, rel
    # the decoder tree is untouched (bit-identical leaves)
    for a, b in zip(jax.tree.leaves(params["decoder"]),
                    jax.tree.leaves(q["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pipeline_encoder_int8_smoke(tmp_path, setup):
    """cfg.encoder_int8 end-to-end through the batched pipeline: coherent
    boundary arrays on a synthetic corpus."""
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
    from whisper_char_alignment_tpu.runner import AlignmentPipeline

    tok, dims, params = setup
    scp = make_timit_corpus(str(tmp_path), n_utts=3, seconds=(0.3, 0.6),
                            words_per_utt=(3, 4), seed=2)
    cfg = AlignConfig.recommended(topk=2, batch_size=3, use_gt_transcript=True,
                                  encoder_int8=True, decode_sample_len=4)
    pipe = AlignmentPipeline(params, dims, tok, cfg)
    res = list(pipe.run_dataset(TIMIT(scp), progress=False))
    assert len(res) == 3
    for r in res:
        assert not r.skipped
        assert len(r.start_times) == len(r.words) - 1
        assert (np.diff(r.end_times) >= -1e-9).all()


def test_cast_params_preserves_quantized_leaves(setup):
    """Regression (ADVICE r03, medium): serve/transcribe cast params to the
    compute dtype AFTER load-time quantization; a blanket astype destroyed the
    int8 w8 leaves (silently degrading to a float dot) and bf16-rounded the
    f32 scales. cast_params must keep w8 int8 and s f32, cast the rest, and
    produce encoder states identical to quantize-after-cast."""
    from whisper_char_alignment_tpu.cli import common

    tok, dims, params = setup
    q = wmodel.quantize_encoder_int8(params)
    cast = common.cast_params(q, jnp.bfloat16)
    blocks = cast["encoder"]["blocks"]
    assert blocks["attn"]["q"]["w8"].dtype == jnp.int8
    assert blocks["attn"]["q"]["s"].dtype == jnp.float32
    assert blocks["mlp"]["fc1"]["w8"].dtype == jnp.int8
    # non-quantized leaves did cast
    assert cast["decoder"]["tok_emb"].dtype == jnp.bfloat16
    # the quantized codes themselves are untouched by the cast (same w8/s
    # bits — the cast must not re-derive them from rounded weights)
    np.testing.assert_array_equal(
        np.asarray(blocks["attn"]["q"]["w8"]),
        np.asarray(q["encoder"]["blocks"]["attn"]["q"]["w8"]))
    np.testing.assert_array_equal(
        np.asarray(blocks["attn"]["q"]["s"]),
        np.asarray(q["encoder"]["blocks"]["attn"]["q"]["s"]))
    # and the encoder still runs the int8 path within the int8 error budget
    # of the unquantized f32 forward (a destroyed w8 tree errors or diverges)
    mel = jnp.asarray(np.random.default_rng(3).normal(
        0, 1, (1, dims.n_mels, 2 * dims.n_audio_ctx)), jnp.float32)
    exact = np.asarray(wmodel.encode_audio(params, dims, mel), np.float32)
    got = np.asarray(wmodel.encode_audio(cast, dims, mel,
                                         compute_dtype=jnp.bfloat16),
                     np.float32)
    rel = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 0.06, rel
