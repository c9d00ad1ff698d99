"""Skip-and-continue resilience (reference infer_ali.py:78-81): overlong
utterances are reported and skipped while the rest of the batch aligns."""

import numpy as np

import jax

from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
from whisper_char_alignment_tpu.data.dataset import Utterance
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.runner import AlignmentPipeline
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


def test_overlong_utterance_skipped_others_align():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    cfg = AlignConfig.recommended(topk=2, batch_size=2)
    pipe = AlignmentPipeline(params, dims, tok, cfg)

    rng = np.random.default_rng(0)
    ok = Utterance(audio=rng.normal(0, .1, 16000 // 2).astype(np.float32),
                   duration=16000 // 2, text="hi there", starts=[0.0, 0.2],
                   ends=[0.2, 0.5], fid="ok")
    # > 30 s -> frame count over MAX_FRAMES -> must be skipped
    too_long = Utterance(audio=np.zeros(16000 * 31, np.float32),
                         duration=16000 * 31, text="x", starts=[0.0],
                         ends=[31.0], fid="long")
    res = pipe.align_batch([ok, too_long])
    by_fid = {r.fid: r for r in res}
    assert by_fid["long"].skipped
    assert not by_fid["ok"].skipped
    assert len(by_fid["ok"].start_times) == len(by_fid["ok"].end_times)
