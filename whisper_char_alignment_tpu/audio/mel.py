"""Log-mel spectrogram frontend.

Re-implements the reference's audio frontend (reference call sites: dataset.py:47-48,
README.md:102-103 — ``whisper.pad_or_trim`` + ``whisper.log_mel_spectrogram``) in JAX:

    pad/trim to 480_000 samples -> centered STFT (N_FFT=400, HOP=160, periodic Hann,
    reflect padding, drop last frame) -> |.|^2 -> 80-bin Slaney mel filterbank ->
    log10 clamped at 1e-10 -> dynamic-range clip at (max - 8) -> (x + 4) / 4

The mel filterbank is computed from the Slaney formula (librosa ``filters.mel`` with
htk=False, norm='slaney') rather than loaded from the whisper package's ``.npz``
asset. The dynamic-range max is per-utterance (the reference only ever calls this on
single utterances; a cross-batch max would couple utterances).

STFT design: on TPU the 3001-frame x 400-tap framing + rFFT is expressed as one
reflect-pad + gather + ``jnp.fft.rfft`` — XLA lowers the FFT natively; the mel
projection is a (n_mels, 201) x (201, frames) matmul that rides the MXU. The default
path expresses the rFFT as two MXU matmuls against cos/sin DFT bases
(``use_fft=False``) — exact for N_FFT=400 and required on backends without a native
FFT lowering (the axon TPU plugin); ``use_fft=True`` selects ``jnp.fft.rfft``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants


def pad_or_trim(array, length: int = constants.N_SAMPLES, axis: int = -1):
    """Pad with zeros or trim ``array`` to exactly ``length`` along ``axis``."""
    xp = jnp if isinstance(array, jax.Array) else np
    n = array.shape[axis]
    if n > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        return array[tuple(sl)]
    if n < length:
        pad = [(0, 0)] * array.ndim
        pad[axis] = (0, length - n)
        return xp.pad(array, pad)
    return array


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_mels: int = constants.N_MELS, n_fft: int = constants.N_FFT,
                   sample_rate: int = constants.SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular mel filterbank
    (n_mels, n_fft//2 + 1), float32 — matches librosa.filters.mel defaults, which is
    what the whisper package ships as its ``mel_filters.npz`` asset."""
    fftfreqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_min = _hz_to_mel_slaney(0.0)
    mel_max = _hz_to_mel_slaney(sample_rate / 2)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _frame_indices(n_samples: int, n_fft: int, hop: int) -> np.ndarray:
    n_frames = 1 + n_samples // hop  # torch.stft center=True frame count
    return np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int):
    k = np.arange(n_fft // 2 + 1)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = -2.0 * np.pi * k * n / n_fft
    return (np.cos(ang).astype(np.float32).T, np.sin(ang).astype(np.float32).T)


@functools.partial(jax.jit, static_argnames=("n_mels", "use_fft"))
def log_mel_spectrogram(audio: jax.Array, n_mels: int = constants.N_MELS,
                        use_fft: bool = False) -> jax.Array:
    """Compute the Whisper log-mel spectrogram of 16 kHz ``audio``.

    ``audio``: (..., n_samples) float32, typically already pad_or_trim'd to 30 s.
    Returns (..., n_mels, n_samples // HOP) — 3000 frames for 30 s input.
    """
    n_fft, hop = constants.N_FFT, constants.HOP_LENGTH
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    lead = audio.shape[:-1]
    audio = audio.reshape((-1, audio.shape[-1]))
    n_samples = audio.shape[-1]

    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))  # periodic Hann
    padded = jnp.pad(audio, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
    idx = jnp.asarray(_frame_indices(n_samples, n_fft, hop))
    frames = padded[:, idx] * window  # (B, n_frames, n_fft)
    frames = frames[:, :-1]  # whisper drops the final STFT frame (stft[..., :-1])

    if use_fft:
        spec = jnp.fft.rfft(frames, axis=-1)
        magnitudes = jnp.abs(spec) ** 2
    else:
        cos_b, sin_b = _dft_bases(n_fft)
        re = jnp.dot(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
        im = jnp.dot(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32)
        magnitudes = re * re + im * im

    filters = jnp.asarray(mel_filterbank(n_mels))
    mel_spec = jnp.einsum("mf,btf->bmt", filters, magnitudes)

    log_spec = jnp.log10(jnp.clip(mel_spec, min=1e-10))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    )
    log_spec = (log_spec + 4.0) / 4.0
    out = log_spec.reshape(lead + log_spec.shape[-2:])
    return out[0] if squeeze else out
