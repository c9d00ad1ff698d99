"""High-level single-utterance API.

Mirrors the reference README's library-style flow (reference README.md:76-153):
load audio -> mel -> transcribe -> normalize -> char/subword tokenize ->
get_attentions -> force_align -> (word, start, end) tuples. One call:

    from whisper_char_alignment_tpu import api
    model = api.load_model("medium", checkpoint="medium.npz", tokenizer_dir=...)
    result = api.align(model, "sample/test.wav")
    for w, s, e in zip(result.words[:-1], result.start_times, result.end_times):
        print(f"{s:.2f} {e:.2f} {w.strip()}")
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import constants
from .config import AlignConfig, ModelDims
from .data.dataset import Utterance
from .models import convert, whisper as wmodel
from .runner import AlignmentPipeline, UttAlignment
from .text.tokenizer import WhisperTokenizer, get_test_tokenizer, get_tokenizer


@dataclasses.dataclass
class Model:
    params: dict
    dims: ModelDims
    tokenizer: WhisperTokenizer
    name: str = "medium"


def _load_audio(audio) -> "tuple[np.ndarray, str]":
    """Path or array -> (mono 16 kHz float32, fid). Any-rate WAVs are
    resampled (audio/resample.py); arrays are taken as 16 kHz."""
    if isinstance(audio, str):
        from .audio.resample import load_resampled

        return load_resampled(audio), os.path.splitext(
            os.path.basename(audio))[0]
    return np.asarray(audio, np.float32).reshape(-1), "utterance"


def load_model(name: str = "medium", checkpoint: Optional[str] = None,
               tokenizer_dir: Optional[str] = None,
               dtype=jnp.float32) -> Model:
    """Load weights (.pt/.npz via env WCA_CHECKPOINT if not given) + tokenizer."""
    checkpoint = checkpoint or os.environ.get("WCA_CHECKPOINT")
    if not checkpoint:
        raise FileNotFoundError(
            "no checkpoint: pass checkpoint= or set WCA_CHECKPOINT")
    params, dims = convert.load_checkpoint(checkpoint)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    tok = get_tokenizer(not name.endswith(".en"), language="English",
                        tokenizer_dir=tokenizer_dir)
    return Model(params=params, dims=dims, tokenizer=tok, name=name)


def test_model(seed: int = 0) -> Model:
    """Deterministic random tiny model + toy tokenizer (offline smoke)."""
    from .config import tiny_test_dims

    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=1500, n_text_ctx=448,
                          state=32, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(seed), dims)
    return Model(params=params, dims=dims, tokenizer=tok, name="test")


def align(model: Model, audio: Union[str, np.ndarray],
          aligned_unit_type: str = "char", aggregation: str = "topk",
          topk: int = 10, medfilt_width: int = 3, qk_scale: float = 1.0,
          compute_dtype=jnp.float32, decode_options=None, gt_text: str = "",
          **kwargs) -> UttAlignment:
    """Align one utterance with the README-recommended recipe defaults.

    ``decode_options``: an optional ``decoding.DecodingOptions`` for the
    transcription pass (language, suppress_tokens, sample_len, beam_size,
    ...) — the library twin of the reference's ``whisper.DecodingOptions``
    argument (ref README.md:95). ``gt_text`` carries ground-truth text onto
    the utterance for ``use_gt_transcript=True`` runs (align known text while
    the transcription pass still executes — the reference CLI's --use_gt
    evaluation mode)."""
    data, fid = _load_audio(audio)

    cfg = AlignConfig(aligned_unit_type=aligned_unit_type, aggr=aggregation,
                      topk=topk, medfilt_width=medfilt_width, qk_scale=qk_scale,
                      batch_size=1, model=model.name, **kwargs)
    pipe = AlignmentPipeline(model.params, model.dims, model.tokenizer, cfg,
                             compute_dtype=compute_dtype)
    if decode_options is not None:
        pipe.options = decode_options
    utt = Utterance(audio=data.astype(np.float32), duration=data.size,
                    text=gt_text, starts=[], ends=[], fid=fid)
    return pipe.align_batch([utt], return_matrix=True)[0]


def align_long(model: Model, audio: Union[str, np.ndarray],
               batch_size: int = 8, compute_dtype=jnp.float32,
               **align_kwargs) -> UttAlignment:
    """Align audio of ANY length by fixed 30 s windows (an extension — the
    reference simply skips utterances over 30 s, infer_ali.py:78-81).

    Each window is transcribed and aligned independently (the model's context
    is architecturally 30 s); word boundaries are offset by the window start
    and concatenated. Words spanning a window boundary are split between the
    adjacent windows — for reference-exact behavior on <=30 s inputs use
    :func:`align`, which this delegates to when the audio fits one window.
    """
    data, fid = _load_audio(audio)
    # the MODEL's window, not the 30 s constant: short-window models (tiny
    # test dims) would otherwise route 30 s of audio to align(), which
    # pads/trims to the model window and silently drops the tail
    # (round-4 review finding)
    window = 2 * model.dims.n_audio_ctx * constants.HOP_LENGTH
    if data.size <= window:
        return align(model, data, compute_dtype=compute_dtype, **align_kwargs)
    chunks = [data[i:i + window] for i in range(0, data.size, window)]
    utts = [Utterance(audio=np.ascontiguousarray(c, np.float32),
                      duration=c.size, text="", starts=[], ends=[],
                      fid=f"{fid}#{k}") for k, c in enumerate(chunks)]
    cfg = AlignConfig(batch_size=min(batch_size, len(utts)), model=model.name,
                      aligned_unit_type=align_kwargs.pop("aligned_unit_type",
                                                         "char"),
                      aggr=align_kwargs.pop("aggregation", "topk"),
                      topk=align_kwargs.pop("topk", 10),
                      medfilt_width=align_kwargs.pop("medfilt_width", 3),
                      qk_scale=align_kwargs.pop("qk_scale", 1.0),
                      **align_kwargs)
    pipe = AlignmentPipeline(model.params, model.dims, model.tokenizer, cfg,
                             compute_dtype=compute_dtype)
    by_chunk = {int(r.fid.rsplit("#", 1)[1]): r
                for r in pipe.run_dataset(list(utts), progress=False)}
    words: list = []
    starts: list = []
    ends: list = []
    texts: list = []
    chunk_seconds = window / constants.SAMPLE_RATE
    for k in sorted(by_chunk):
        res = by_chunk[k]
        base = k * chunk_seconds
        if res.words:
            words.extend(res.words[:-1])  # drop each chunk's eot group
            starts.extend(float(s) + base for s in res.start_times)
            ends.extend(float(e) + base for e in res.end_times)
        texts.append(res.transcription)
    return UttAlignment(
        fid=fid, words=words + ["<|endoftext|>"],
        start_times=np.asarray(starts), end_times=np.asarray(ends),
        transcription=" ".join(t for t in texts if t), text="",
        starts=[], ends=[])


def transcribe(model: Model, audio: Union[str, np.ndarray], **kwargs) -> dict:
    """Long-form transcription (the ``whisper.transcribe`` equivalent):
    30 s seek windows, temperature fallback, no-speech skipping, and
    condition-on-previous-text via prompt tokens. Returns the published
    ``{"text", "segments", "language"}`` schema. See
    :mod:`whisper_char_alignment_tpu.transcribe` for the knobs."""
    from .transcribe import transcribe as _transcribe

    data, _ = _load_audio(audio)
    kwargs.setdefault("model_name", model.name)
    return _transcribe(model.params, model.dims, model.tokenizer, data,
                       **kwargs)

