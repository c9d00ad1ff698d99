"""Integration parity: the batched, padded, bucketed pipeline must produce exactly
the same boundaries as the single-utterance reference-style flow (get_attentions +
force_align per utterance), for mixed-length batches and both unit types."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu import constants
from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
from whisper_char_alignment_tpu.data.dataset import Utterance
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.runner import AlignmentPipeline
from whisper_char_alignment_tpu.text import retokenize
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

TRANSCRIPTS = ["hello world", "the quick brown fox", "greasy wash water"]


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=48, n_text_ctx=64,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(7), dims)
    rng = np.random.default_rng(0)
    utts = []
    for i, seconds in enumerate([0.51, 0.29, 0.40]):
        n = int(16000 * seconds)
        audio = rng.normal(0, 0.1, n).astype(np.float32)
        utts.append(Utterance(audio=audio, duration=n, text="a b",
                              starts=[0.0], ends=[0.1], fid=f"u{i}"))
    return tok, dims, params, utts


def single_utterance_flow(tok, dims, params, utt, transcription,
                          aligned_unit_type, aggregation, topk,
                          medfilt_width=3, qk_scale=1.0):
    """The reference README flow, one utterance at a time, no batching."""
    n_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    audio = np.asarray(pad_or_trim(utt.audio, n_samples))
    mel = log_mel_spectrogram(jnp.asarray(audio)[None])
    tr_norm = retokenize.remove_punctuation(transcription)
    text_tokens = retokenize.encode(tr_norm, tok, aligned_unit_type)
    tokens = [*tok.sot_sequence, tok.no_timestamps, *text_tokens, tok.eot]
    max_frames = min(max(utt.duration // 320, 1), dims.n_audio_ctx)
    attn, _ = timing.get_attentions(
        params, dims, mel, jnp.asarray([tokens], jnp.int32),
        jnp.asarray([len(tokens)], jnp.int32),
        jnp.asarray([max_frames], jnp.int32), medfilt_width=medfilt_width,
        qk_scale=qk_scale)
    ws = np.asarray(attn)[:, 0]  # (L, H, T, F)
    words, starts, ends, matrix, scores = timing.force_align(
        ws, text_tokens, tok, aligned_unit_type=aligned_unit_type,
        aggregation=aggregation, topk=topk, frame_len=int(max_frames))
    return words, starts, ends


@pytest.mark.parametrize("unit,aggr,topk,medfilt,qk_scale", [
    ("char", "topk", 3, 3, 1.0),
    # further recipes cover the same contract across the whole option grid
    # (units x aggregations x medfilt widths x qk_scale); fast tier keeps one
    pytest.param("subword", "mean", -1, 3, 1.0, marks=pytest.mark.slow),
    pytest.param("char", "mean", -1, 7, 1.0, marks=pytest.mark.slow),
    pytest.param("subword", "topk", 5, 1, 0.5, marks=pytest.mark.slow)])
def test_batched_pipeline_equals_single_flow(setup, unit, aggr, topk, medfilt,
                                             qk_scale, monkeypatch):
    tok, dims, params, utts = setup
    cfg = AlignConfig(aligned_unit_type=unit, aggr=aggr, topk=topk,
                      medfilt_width=medfilt, qk_scale=qk_scale, batch_size=3)
    pipe = AlignmentPipeline(params, dims, tok, cfg)

    pipe.transcribe_override = lambda batch: TRANSCRIPTS[:len(batch)]
    batched = pipe.align_batch(utts)

    for utt, transcription, res in zip(utts, TRANSCRIPTS, batched):
        words, starts, ends = single_utterance_flow(
            tok, dims, params, utt, transcription, unit, aggr, topk,
            medfilt_width=medfilt, qk_scale=qk_scale)
        assert res.words == words, f"{utt.fid} ({unit}/{aggr})"
        np.testing.assert_array_equal(res.start_times, starts,
                                      err_msg=f"{utt.fid} starts")
        np.testing.assert_array_equal(res.end_times, ends,
                                      err_msg=f"{utt.fid} ends")


def test_duplicate_fids_do_not_cross_wire(setup):
    """Round-4 regression: _collect_align once keyed device rows by fid, so a
    batch whose utterances all share one fid — exactly what serve's
    micro-batcher submits — gave every utterance the LAST row's jump times and
    the FIRST row's matrix. Device rows must be consumed positionally: a
    duplicate-fid batch must equal the identical unique-fid batch field by
    field."""
    import dataclasses

    tok, dims, params, utts = setup
    cfg = AlignConfig(aligned_unit_type="char", aggr="topk", topk=3,
                      medfilt_width=3, batch_size=3)
    pipe = AlignmentPipeline(params, dims, tok, cfg)
    pipe.transcribe_override = lambda batch: TRANSCRIPTS[:len(batch)]

    unique = pipe.align_batch(utts, return_matrix=True)
    dup_utts = [dataclasses.replace(u, fid="utterance") for u in utts]
    dup = pipe.align_batch(dup_utts, return_matrix=True)

    # guard against a vacuous comparison: rows must actually differ
    assert not np.array_equal(unique[0].end_times, unique[1].end_times) or \
        not np.array_equal(unique[0].start_times, unique[1].start_times) or \
        unique[0].words != unique[1].words or \
        not np.array_equal(unique[0].matrix, unique[1].matrix)
    for a, b in zip(unique, dup):
        assert a.words == b.words
        np.testing.assert_array_equal(a.start_times, b.start_times)
        np.testing.assert_array_equal(a.end_times, b.end_times)
        np.testing.assert_array_equal(a.matrix, b.matrix)
        np.testing.assert_array_equal(a.scores[0], b.scores[0])
        np.testing.assert_array_equal(a.scores[1], b.scores[1])
        assert a.word_probabilities == b.word_probabilities
