"""Log-mel frontend parity vs a torch oracle implementing the published whisper
algorithm (torch.stft center/reflect + |.|^2 + mel matmul + log10/clip/scale)."""

import numpy as np
import pytest
import torch

from whisper_char_alignment_tpu import constants
from whisper_char_alignment_tpu.audio import mel as mel_mod


def _torch_log_mel(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Oracle: whisper.audio.log_mel_spectrogram algorithm in torch, using the same
    Slaney filterbank (the filterbank itself is validated structurally below)."""
    t = torch.from_numpy(audio.astype(np.float32))
    window = torch.hann_window(constants.N_FFT)
    stft = torch.stft(t, constants.N_FFT, constants.HOP_LENGTH, window=window,
                      return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_mod.mel_filterbank(n_mels))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


def _rand_audio(rng, seconds=1.0):
    n = int(constants.SAMPLE_RATE * seconds)
    return (rng.normal(0, 0.1, n) +
            0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / constants.SAMPLE_RATE)
            ).astype(np.float32)


def test_pad_or_trim():
    x = np.ones(10, np.float32)
    assert mel_mod.pad_or_trim(x, 16).shape == (16,)
    assert mel_mod.pad_or_trim(x, 16)[10:].sum() == 0
    assert mel_mod.pad_or_trim(x, 4).shape == (4,)
    np.testing.assert_array_equal(mel_mod.pad_or_trim(x, 10), x)


def test_filterbank_matches_independent_construction():
    """Pin mel_filterbank against a structurally independent derivation of
    librosa's Slaney filterbank: scalar Slaney hz<->mel conversions (piecewise
    linear/log formula transcribed here, NOT imported from the module under
    test) and pointwise triangle construction per filter (rising/falling
    edges + 2/width normalization), in float64. The torch log-mel parity
    oracle below reuses the production filterbank, so WITHOUT this test a
    filterbank error would be invisible to the whole file (the structural
    checks alone tolerate percent-level deviations)."""
    sr, n_fft = constants.SAMPLE_RATE, constants.N_FFT

    def hz_to_mel(f):
        # Slaney: linear below 1 kHz (f / (200/3)), log above
        if f < 1000.0:
            return f / (200.0 / 3.0)
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def mel_to_hz(m):
        if m < 15.0:
            return m * (200.0 / 3.0)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    n_mels = 80
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    edges = np.array([mel_to_hz(m) for m in mels])
    bin_freqs = np.arange(n_fft // 2 + 1) * (sr / n_fft)

    oracle = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, center, hi = edges[m], edges[m + 1], edges[m + 2]
        for k, f in enumerate(bin_freqs):
            if lo < f < hi:
                w = ((f - lo) / (center - lo) if f <= center
                     else (hi - f) / (hi - center))
                oracle[m, k] = w * 2.0 / (hi - lo)

    fb = mel_mod.mel_filterbank(n_mels).astype(np.float64)
    np.testing.assert_allclose(fb, oracle, atol=1e-6)


def test_filterbank_structure():
    fb = mel_mod.mel_filterbank(80)
    assert fb.shape == (80, constants.N_FFT // 2 + 1)
    assert (fb >= 0).all()
    # each filter is unimodal with a single triangular peak
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()  # peak bins increase with mel index
    # Slaney normalization: each filter integrates (in Hz) to ~2/width * area = 1
    # equivalently sum(fb * df) ~ 1 where df = (sr/2) / (n_fft//2)
    df = (constants.SAMPLE_RATE / 2) / (constants.N_FFT // 2)
    sums = fb.sum(axis=1) * df
    # triangles sampled on a coarse FFT grid: allow loose tolerance, exclude the
    # narrowest low-frequency filters (few bins per triangle)
    assert np.all(np.abs(sums[10:] - 1.0) < 0.15)


def test_filterbank_slaney_breakpoint():
    # below 1 kHz the mel scale is linear: centers of the first filters are evenly
    # spaced in Hz
    hz_pts = mel_mod._mel_to_hz_slaney(
        np.linspace(0, mel_mod._hz_to_mel_slaney(8000), 82))
    d = np.diff(hz_pts[:10])
    assert np.allclose(d, d[0], rtol=1e-6)


@pytest.mark.parametrize("seconds,n_mels", [(0.37, 80), (1.0, 80), (3.3, 80),
                                            (1.0, 128)])
def test_log_mel_parity_vs_torch(seconds, n_mels):
    # n_mels=128 is the large-v3 frontend (MODEL_DIMS["large-v3"].n_mels)
    rng = np.random.default_rng(0)
    audio = mel_mod.pad_or_trim(_rand_audio(rng, seconds))
    expect = _torch_log_mel(np.asarray(audio), n_mels=n_mels)
    got = np.asarray(mel_mod.log_mel_spectrogram(audio, n_mels=n_mels))
    assert got.shape == (n_mels, constants.N_FRAMES)
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_log_mel_batched_matches_single():
    rng = np.random.default_rng(1)
    a = np.stack([np.asarray(mel_mod.pad_or_trim(_rand_audio(rng))) for _ in range(3)])
    batched = np.asarray(mel_mod.log_mel_spectrogram(a))
    for i in range(3):
        single = np.asarray(mel_mod.log_mel_spectrogram(a[i]))
        # per-utterance dynamic-range max -> batching must not couple utterances
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_matmul_dft_path_matches_fft():
    rng = np.random.default_rng(2)
    audio = mel_mod.pad_or_trim(_rand_audio(rng, 0.61))
    a = np.asarray(mel_mod.log_mel_spectrogram(audio, use_fft=True))
    b = np.asarray(mel_mod.log_mel_spectrogram(audio, use_fft=False))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_sine_peak_lands_in_correct_mel_bin():
    # 1 kHz tone: peak filter should be the one whose center is nearest 1 kHz
    n = constants.N_SAMPLES
    audio = np.sin(2 * np.pi * 1000 * np.arange(n) / constants.SAMPLE_RATE
                   ).astype(np.float32)
    m = np.asarray(mel_mod.log_mel_spectrogram(audio))
    hz_pts = mel_mod._mel_to_hz_slaney(
        np.linspace(0, mel_mod._hz_to_mel_slaney(8000), 82))
    centers = hz_pts[1:-1]
    expected_bin = int(np.abs(centers - 1000).argmin())
    assert abs(int(m.mean(axis=1).argmax()) - expected_bin) <= 1
