"""Output writers (txt/srt/vtt/tsv/json), the transcribe CLI end-to-end with
the offline test model, and the task=translate sot-token override."""

import io
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer
from whisper_char_alignment_tpu.utils import writers


RESULT = {
    "text": " hello world again",
    "language": "en",
    "segments": [
        {"id": 0, "seek": 0, "start": 0.0, "end": 1.5,
         "text": " hello world", "tokens": [1, 2], "temperature": 0.0,
         "avg_logprob": -0.5, "compression_ratio": 1.0,
         "no_speech_prob": 0.01},
        {"id": 1, "seek": 150, "start": 3661.007, "end": 3662.5,
         "text": " again", "tokens": [3], "temperature": 0.0,
         "avg_logprob": -0.4, "compression_ratio": 1.0,
         "no_speech_prob": 0.02},
    ],
}


def test_format_timestamp():
    assert writers.format_timestamp(0.0) == "00:00.000"
    assert writers.format_timestamp(1.5) == "00:01.500"
    assert writers.format_timestamp(3661.007) == "01:01:01.007"
    assert writers.format_timestamp(1.5, always_include_hours=True,
                                    decimal_marker=",") == "00:00:01,500"


def test_srt_vtt_tsv_txt_json():
    buf = io.StringIO()
    writers.write_srt(RESULT, buf)
    assert buf.getvalue() == (
        "1\n00:00:00,000 --> 00:00:01,500\nhello world\n\n"
        "2\n01:01:01,007 --> 01:01:02,500\nagain\n\n")
    buf = io.StringIO()
    writers.write_vtt(RESULT, buf)
    assert buf.getvalue() == (
        "WEBVTT\n\n00:00.000 --> 00:01.500\nhello world\n\n"
        "01:01:01.007 --> 01:01:02.500\nagain\n\n")
    buf = io.StringIO()
    writers.write_tsv(RESULT, buf)
    assert buf.getvalue() == ("start\tend\ttext\n"
                              "0\t1500\thello world\n"
                              "3661007\t3662500\tagain\n")
    buf = io.StringIO()
    writers.write_txt(RESULT, buf)
    assert buf.getvalue() == "hello world\nagain\n"
    buf = io.StringIO()
    writers.write_json(RESULT, buf)
    assert json.loads(buf.getvalue()) == RESULT


def test_get_writer_all(tmp_path):
    w = writers.get_writer("all", str(tmp_path))
    w(RESULT, "/somewhere/clip.wav")
    for ext in ("txt", "srt", "vtt", "tsv", "json"):
        assert (tmp_path / f"clip.{ext}").exists(), ext
    with pytest.raises(ValueError):
        writers.get_writer("mp4", str(tmp_path))


@pytest.mark.slow
def test_transcribe_cli_end_to_end(tmp_path):
    from whisper_char_alignment_tpu.audio.wav import save as wav_save
    from whisper_char_alignment_tpu.cli.transcribe import main

    audio = (np.random.default_rng(0).normal(0, 0.05, 16000 * 2)
             .astype(np.float32))
    path = str(tmp_path / "clip.wav")
    wav_save(path, audio, 16000)
    out_dir = str(tmp_path / "out")
    rc = main([path, "--test_model", "--output_dir", out_dir,
               "--output_format", "srt", "--language", "en",
               "--temperature_increment_on_fallback", "0.5",
               "--logprob_threshold", "-1000000", "--no_speech_threshold",
               "1.0"])
    assert rc == 0
    srt = open(os.path.join(out_dir, "clip.srt")).read()
    assert "-->" in srt


def test_task_translate_overrides_sot_token():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    mel = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (dims.n_mels, 2 * dims.n_audio_ctx)), jnp.float32)
    seen = {}
    real = decoding._decode_loop

    def spy(params_, dims_, mel_, prompt, *a, **kw):
        seen["prompt"] = np.asarray(prompt).tolist()
        return real(params_, dims_, mel_, prompt, *a, **kw)

    decoding._decode_loop = spy
    try:
        decoding.decode(params, dims, tok, mel, decoding.DecodingOptions(
            language="en", task="translate", sample_len=2))
        assert seen["prompt"][2] == tok.translate
        decoding.decode(params, dims, tok, mel, decoding.DecodingOptions(
            language="en", task="transcribe", sample_len=2))
        assert seen["prompt"][2] == tok.transcribe
    finally:
        decoding._decode_loop = real
