"""TPU-native Whisper word-alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``30stomercury/whisper-char-alignment`` ("Whisper Has an Internal Word Aligner",
ASRU 2025): teacher-forced Whisper cross-attention QK capture, median-filter +
softmax + unsupervised head selection, and monotonic DTW word-boundary extraction —
as one batched, jitted, mesh-shardable program instead of a per-utterance CPU loop.
"""

from . import constants
from .config import AlignConfig, ModelDims, MODEL_DIMS

__version__ = "0.1.0"

# `from whisper_char_alignment_tpu import api` resolves as a normal submodule
# import; nothing heavier than constants/config is imported eagerly here.
