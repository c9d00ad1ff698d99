"""Sample-rate conversion: polyphase resampler fidelity and the any-rate WAV
entry points (api/cli accept non-16 kHz; the reference dataset path stays
strictly 16 kHz for parity)."""

import numpy as np
import pytest

from whisper_char_alignment_tpu.audio import resample as rs
from whisper_char_alignment_tpu.audio.wav import save as wav_save


def _sine(freq, sr, seconds):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_identity_and_length():
    x = _sine(440, 16000, 0.5)
    assert rs.resample(x, 16000) is not x  # copy semantics via asarray ok
    np.testing.assert_array_equal(rs.resample(x, 16000), x)
    y = rs.resample(_sine(440, 8000, 0.5), 8000)
    assert abs(y.size - 16000 * 0.5) <= 1
    y = rs.resample(_sine(440, 44100, 0.5), 44100)
    assert abs(y.size - 16000 * 0.5) <= 1


@pytest.mark.parametrize("sr_in", [8000, 22050, 44100, 48000])
def test_sine_fidelity(sr_in):
    """A 1 kHz tone survives the rate change: compare the interior against a
    directly synthesized 16 kHz tone (filter edges excluded)."""
    y = rs.resample(_sine(1000, sr_in, 0.5), sr_in)
    ref = _sine(1000, 16000, 0.5)[:y.size]
    m = slice(200, y.size - 200)
    np.testing.assert_allclose(y[m], ref[m], atol=5e-3)


def test_load_resampled(tmp_path):
    path = str(tmp_path / "a8k.wav")
    wav_save(path, _sine(500, 8000, 0.3), 8000)
    y = rs.load_resampled(path)
    assert y.dtype == np.float32
    assert abs(y.size - 16000 * 0.3) <= 1


def test_invalid_rates():
    with pytest.raises(ValueError):
        rs.resample(np.zeros(10, np.float32), 0)


@pytest.mark.slow
def test_api_align_accepts_non_16k(tmp_path):
    from whisper_char_alignment_tpu import api

    m = api.test_model()
    path = str(tmp_path / "a44k.wav")
    wav_save(path, _sine(300, 44100, 0.6), 44100)
    res = api.align(m, path)
    assert res.fid == "a44k"
    assert isinstance(res.transcription, str)
