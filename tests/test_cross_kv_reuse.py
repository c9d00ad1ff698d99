"""Cross-K/V reuse: the teacher-forced capture pass may consume the decode
loop's precomputed per-layer cross-attention K/V stacks (same projections from
the same encoder states, stored in the decode-loop (B, H, hd, F) layout) instead
of recomputing them. These tests pin (1) numerical equivalence of the reused
path at the decode_text level, (2) end-to-end pipeline identity with the flag on
vs off, and (3) the automatic fallback when skip-guards reorder live rows."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
from whisper_char_alignment_tpu.data.dataset import Utterance
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.runner import AlignmentPipeline
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=48, n_text_ctx=64,
                          state=16, head=2, layers=3)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    return tok, dims, params


def test_decode_text_reuse_matches_recompute(setup):
    _, dims, params = setup
    rng = np.random.default_rng(0)
    b, t = 3, 12
    xa = jnp.asarray(rng.normal(0, 1, (b, dims.n_audio_ctx,
                                       dims.n_audio_state)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, dims.n_vocab, (b, t)), jnp.int32)
    token_len = jnp.asarray([t, t - 3, t - 1], jnp.int32)
    frame_len = jnp.asarray([48, 20, 33], jnp.int32)

    logits_ref, attn_ref = wmodel.decode_text(
        params, dims, tokens, xa, medfilt_width=3, frame_len=frame_len,
        token_len=token_len)
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa)
    logits_kv, attn_kv = wmodel.decode_text(
        params, dims, tokens, None, medfilt_width=3, frame_len=frame_len,
        token_len=token_len, cross_kv=cross_kv)

    np.testing.assert_allclose(np.asarray(attn_kv), np.asarray(attn_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logits_kv), np.asarray(logits_ref),
                               rtol=1e-6, atol=1e-5)
    # the discrete DTW output must be identical
    jf_ref, _, _ = timing.force_align_batch(attn_ref, token_len, frame_len,
                                            sot_len=3, aggregation="topk",
                                            topk=2)
    jf_kv, _, _ = timing.force_align_batch(attn_kv, token_len, frame_len,
                                           sot_len=3, aggregation="topk",
                                           topk=2)
    np.testing.assert_array_equal(np.asarray(jf_kv), np.asarray(jf_ref))


def _make_utts(rng, texts, seconds):
    utts = []
    for i, (text, sec) in enumerate(zip(texts, seconds)):
        n = int(16000 * sec)
        audio = rng.normal(0, 0.1, n).astype(np.float32)
        utts.append(Utterance(audio=audio, duration=n, text=text,
                              starts=[0.0], ends=[0.1], fid=f"u{i}"))
    return utts


@pytest.mark.parametrize("default_timing", [
    False, pytest.param(True, marks=pytest.mark.slow)])
def test_pipeline_reuse_flag_is_invisible(setup, default_timing):
    tok, dims, params = setup
    rng = np.random.default_rng(1)
    utts = _make_utts(rng, ["hello world", "a be sea", "deep blue"],
                      [0.5, 0.3, 0.4])
    outs = {}
    for reuse in (True, False):
        cfg = AlignConfig(aligned_unit_type="char", aggr="topk", topk=3,
                          medfilt_width=3, batch_size=3, reuse_cross_kv=reuse,
                          default_whisper_timing=default_timing,
                          model="tiny-test")
        pipe = AlignmentPipeline(params, dims, tok, cfg)
        pipe.transcribe_override = lambda batch: [u.text for u in batch]
        outs[reuse] = pipe.align_batch(utts)
    for a, b in zip(outs[True], outs[False]):
        assert a.words == b.words
        np.testing.assert_array_equal(a.start_times, b.start_times)
        np.testing.assert_array_equal(a.end_times, b.end_times)
        if a.word_probabilities is not None:
            np.testing.assert_allclose(a.word_probabilities,
                                       b.word_probabilities, atol=1e-6)


def test_pipeline_reuse_falls_back_on_skip_reorder(setup):
    """A skip-guarded utterance in the middle reorders live rows; the runner
    must silently drop the K/V reuse and still produce results identical to
    the no-reuse configuration."""
    tok, dims, params = setup
    rng = np.random.default_rng(2)
    # the middle utterance's char tokens exceed n_text_ctx=64 -> skipped
    utts = _make_utts(
        rng, ["hello world", "a" * 100, "deep blue sea"], [0.5, 0.4, 0.3])
    outs = {}
    for reuse in (True, False):
        cfg = AlignConfig(aligned_unit_type="char", aggr="topk", topk=3,
                          medfilt_width=3, batch_size=3, reuse_cross_kv=reuse,
                          model="tiny-test")
        pipe = AlignmentPipeline(params, dims, tok, cfg)
        pipe.transcribe_override = lambda batch: [u.text for u in batch]
        outs[reuse] = pipe.align_batch(utts)
    assert outs[True][1].skipped and outs[False][1].skipped
    for a, b in zip(outs[True], outs[False]):
        assert a.words == b.words
        np.testing.assert_array_equal(a.start_times, b.start_times)
        np.testing.assert_array_equal(a.end_times, b.end_times)


@pytest.mark.slow
def test_pipeline_with_beam_options(setup):
    """Beam decoding slots into the production pipeline's async decode path
    (DecodeFuture + cross-KV reuse request falls back to xa-only cleanly)."""
    from whisper_char_alignment_tpu.models import decoding

    tok, dims, params = setup
    rng = np.random.default_rng(4)
    utts = _make_utts(rng, ["hello world", "deep blue"], [0.4, 0.3])
    cfg = AlignConfig(aligned_unit_type="char", aggr="topk", topk=3,
                      medfilt_width=3, batch_size=2, model="tiny-test")
    pipe = AlignmentPipeline(params, dims, tok, cfg)
    pipe.options = decoding.DecodingOptions(language="en", sample_len=6,
                                            beam_size=2)
    outs = pipe.align_batch(utts)
    assert len(outs) == 2
    for o in outs:
        assert isinstance(o.transcription, str)
    texts, _, _ = pipe.transcribe_batch(utts)
    assert len(texts) == 2


@pytest.mark.slow
def test_kv_size_gate(setup, monkeypatch):
    """The reuse path auto-disables when the K/V stacks would exceed the HBM
    budget (measured OOM at medium B=32 on a 16 GB chip); results are
    unchanged."""
    from whisper_char_alignment_tpu import runner as runner_mod
    from whisper_char_alignment_tpu.config import MODEL_DIMS

    # medium bf16: 2 * 24 * B * 1024 * 1500 * 2 bytes
    md = MODEL_DIMS["medium"]
    assert runner_mod._cross_kv_bytes(md, 32, jnp.bfloat16) == (
        2 * 24 * 32 * 1024 * 1500 * 2)
    assert runner_mod._cross_kv_bytes(md, 32, jnp.bfloat16) > 3_000_000_000
    assert runner_mod._cross_kv_bytes(md, 16, jnp.bfloat16) < 3_000_000_000

    tok, dims, params = setup
    rng = np.random.default_rng(5)
    utts = _make_utts(rng, ["hello world", "deep blue"], [0.4, 0.3])
    outs = {}
    for cap in ("1", str(10 ** 12)):
        monkeypatch.setenv("WCA_REUSE_KV_MAX_BYTES", cap)
        cfg = AlignConfig(aligned_unit_type="char", aggr="topk", topk=3,
                          medfilt_width=3, batch_size=2, model="tiny-test")
        pipe = AlignmentPipeline(params, dims, tok, cfg)
        pipe.transcribe_override = lambda batch: [u.text for u in batch]
        outs[cap] = pipe.align_batch(utts)
    for a, b in zip(outs["1"], outs[str(10 ** 12)]):
        assert a.words == b.words
        np.testing.assert_array_equal(a.start_times, b.start_times)
        np.testing.assert_array_equal(a.end_times, b.end_times)
