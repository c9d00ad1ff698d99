"""Fused Pallas STFT+mel kernel parity vs the XLA frontend (interpret on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
from whisper_char_alignment_tpu.ops.mel_pallas import log_mel_pallas


@pytest.mark.parametrize("seconds", [0.5, 2.0])
def test_parity_vs_xla_frontend(seconds):
    rng = np.random.default_rng(0)
    n = int(16000 * seconds)
    clip = (rng.normal(0, 0.1, n)
            + 0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)).astype(np.float32)
    audio = np.stack([np.asarray(pad_or_trim(clip)),
                      np.asarray(pad_or_trim(clip * 0.5))])
    a = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    b = np.asarray(log_mel_pallas(jnp.asarray(audio), interpret=True))
    assert b.shape == (2, 80, 3000)
    np.testing.assert_allclose(b, a, atol=5e-5)
