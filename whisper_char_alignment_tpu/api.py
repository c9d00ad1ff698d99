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
from .audio import wav
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
          compute_dtype=jnp.float32, **kwargs) -> UttAlignment:
    """Align one utterance with the README-recommended recipe defaults."""
    if isinstance(audio, str):
        data, sr = wav.load(audio)
        assert sr == constants.SAMPLE_RATE, f"expected 16 kHz audio, got {sr}"
        data = data.reshape(-1) if data.shape[0] == 1 else data.mean(0)
        fid = os.path.splitext(os.path.basename(audio))[0]
    else:
        data = np.asarray(audio, np.float32).reshape(-1)
        fid = "utterance"

    cfg = AlignConfig(aligned_unit_type=aligned_unit_type, aggr=aggregation,
                      topk=topk, medfilt_width=medfilt_width, qk_scale=qk_scale,
                      batch_size=1, model=model.name, **kwargs)
    pipe = AlignmentPipeline(model.params, model.dims, model.tokenizer, cfg,
                             compute_dtype=compute_dtype)
    utt = Utterance(audio=data.astype(np.float32), duration=data.size, text="",
                    starts=[], ends=[], fid=fid)
    return pipe.align_batch([utt], return_matrix=True)[0]
