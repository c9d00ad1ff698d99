"""Fused Pallas STFT+mel kernel (SURVEY.md §2b #10's TPU-native frontend).

The kernel fuses Hann windowing, the rFFT (two MXU matmuls against cos/sin DFT
bases), the mel projection, and the log10 over 512-frame blocks streamed through
VMEM by the Pallas pipeline. Framing (reflect pad + strided window gather) stays in
XLA: the 160-sample hop is not 128-lane aligned, so in-kernel reshaping of raw
audio is not Mosaic-expressible; the gather is one cheap pass.

Only the global dynamic-range clip (``max - 8``) happens outside the kernel (it is
a full-spectrogram reduction). The XLA matmul-DFT path in ``audio/mel.py`` remains
the default (same semantics, works everywhere); select this kernel with
WCA_MEL_IMPL=pallas or call it directly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from ..audio.mel import _dft_bases, _frame_indices, mel_filterbank

_FRAMES_PER_BLOCK = 512
_HOP = constants.HOP_LENGTH  # 160
_NFFT = constants.N_FFT  # 400
_NFFT_PAD = 512  # taps zero-padded to a lane multiple
_NBINS_PAD = 256  # 201 rfft bins zero-padded
_NMELS_PAD = 128  # 80 mel bins zero-padded


def _mel_kernel(frames_ref, window_ref, cos_ref, sin_ref, melt_ref, out_ref):
    frames = frames_ref[0] * window_ref[0]  # (512, NFFT_PAD)
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    mag = re * re + im * im  # (512, 256); padded bins are exactly zero
    mel = jnp.dot(mag, melt_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(audio: jax.Array, n_mels: int = constants.N_MELS,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Whisper log-mel via the fused Pallas kernel.

    audio: (B, n_samples) float32, already pad_or_trim'd. Returns
    (B, n_mels, n_samples // HOP), identical semantics to
    ``audio.mel.log_mel_spectrogram``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # CPU supports interpret only
    assert n_mels <= _NMELS_PAD
    bsz, n_samples = audio.shape
    n_frames = n_samples // _HOP
    n_blocks = -(-n_frames // _FRAMES_PER_BLOCK)
    frames_pad = n_blocks * _FRAMES_PER_BLOCK

    padded = jnp.pad(audio, ((0, 0), (_NFFT // 2, _NFFT // 2)), mode="reflect")
    idx = jnp.asarray(_frame_indices(n_samples, _NFFT, _HOP))[:n_frames]
    frames = padded[:, idx]  # (B, n_frames, 400)
    frames = jnp.pad(frames, ((0, 0), (0, frames_pad - n_frames),
                              (0, _NFFT_PAD - _NFFT)))

    window = np.zeros((1, _NFFT_PAD), np.float32)
    window[0, :_NFFT] = np.hanning(_NFFT + 1)[:-1]
    cos_b, sin_b = _dft_bases(_NFFT)  # (400, 201) each
    cos_p = np.zeros((_NFFT_PAD, _NBINS_PAD), np.float32)
    sin_p = np.zeros((_NFFT_PAD, _NBINS_PAD), np.float32)
    cos_p[:_NFFT, :cos_b.shape[1]] = cos_b
    sin_p[:_NFFT, :sin_b.shape[1]] = sin_b
    fb = mel_filterbank(n_mels)  # (n_mels, 201)
    melt = np.zeros((_NBINS_PAD, _NMELS_PAD), np.float32)
    melt[:fb.shape[1], :n_mels] = fb.T

    out = pl.pallas_call(
        _mel_kernel,
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec((1, _FRAMES_PER_BLOCK, _NFFT_PAD),
                         lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NFFT_PAD), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NFFT_PAD, _NBINS_PAD), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NFFT_PAD, _NBINS_PAD), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NBINS_PAD, _NMELS_PAD), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _FRAMES_PER_BLOCK, _NMELS_PAD),
                               lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, frames_pad, _NMELS_PAD),
                                       jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(window), jnp.asarray(cos_p), jnp.asarray(sin_p),
      jnp.asarray(melt))

    log_spec = out[:, :n_frames, :n_mels].transpose(0, 2, 1)  # (B, n_mels, F)
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0
