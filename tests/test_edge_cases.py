"""Edge-case robustness: all-skipped batches, empty transcripts, device traces."""

import os

import numpy as np

import jax

from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
from whisper_char_alignment_tpu.data.dataset import Utterance
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.runner import AlignmentPipeline
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer
import pytest


def _pipe(batch_size=2):
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    cfg = AlignConfig.recommended(topk=2, batch_size=batch_size)
    return AlignmentPipeline(params, dims, tok, cfg)


def test_all_skipped_batch():
    pipe = _pipe()
    too_long = [Utterance(audio=np.zeros(16000 * 31, np.float32),
                          duration=16000 * 31, text="x", starts=[0.0],
                          ends=[31.0], fid=f"long{i}") for i in range(2)]
    res = pipe.align_batch(too_long)
    assert all(r.skipped for r in res)


def test_empty_transcription_yields_empty_alignment(monkeypatch):
    pipe = _pipe()
    # empty transcription -> ' ' guard
    pipe.transcribe_override = lambda utts: ["" for _ in utts]
    rng = np.random.default_rng(0)
    utts = [Utterance(audio=rng.normal(0, .1, 8000).astype(np.float32),
                      duration=8000, text="a b", starts=[0.0], ends=[0.3],
                      fid=f"u{i}") for i in range(2)]
    res = pipe.align_batch(utts)
    for r in res:
        assert not r.skipped
        assert r.words == [] and len(r.end_times) == 0


@pytest.mark.slow
def test_device_trace_writes_files(tmp_path):
    from whisper_char_alignment_tpu.utils.profiling import device_trace

    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with device_trace(d):
        jnp.ones((8, 8)).sum().block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_device_trace_disabled_is_noop():
    from whisper_char_alignment_tpu.utils.profiling import device_trace

    with device_trace(None):
        pass
