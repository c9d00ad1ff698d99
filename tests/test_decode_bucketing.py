"""Frame-bucketed decode: full-window bucket is exactly the unbucketed decode;
smaller buckets run and only change results through the attended window."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    mel = np.random.default_rng(0).normal(
        0, 1, (2, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32)
    return tok, dims, params, jnp.asarray(mel)


def test_full_bucket_identical(setup):
    tok, dims, params, mel = setup
    opts = decoding.DecodingOptions(language="en", sample_len=8)
    a = decoding.decode(params, dims, tok, mel, opts)
    b = decoding.decode(params, dims, tok, mel, opts,
                        kv_frames=dims.n_audio_ctx)
    assert [r.tokens for r in a] == [r.tokens for r in b]


def test_small_bucket_runs(setup):
    tok, dims, params, mel = setup
    opts = decoding.DecodingOptions(language="en", sample_len=8)
    res = decoding.decode(params, dims, tok, mel, opts, kv_frames=16)
    assert len(res) == 2 and all(isinstance(r.text, str) for r in res)


@pytest.mark.slow
def test_pipeline_bucket_flag(tmp_path):
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.config import AlignConfig
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.runner import AlignmentPipeline

    scp = make_timit_fixture(str(tmp_path), n_utts=2, seconds=0.4)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    cfg = AlignConfig.recommended(topk=2, batch_size=2, decode_frame_bucket=16)
    pipe = AlignmentPipeline(params, dims, tok, cfg)
    ds = TIMIT(scp)
    res = pipe.align_batch([ds[0], ds[1]])
    assert len(res) == 2
