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


# ---------------------------------------------------------------------------
# guarded frame-bucket mode: margin-tracked bucketed decode + full-window
# re-decode of flagged rows (the bucket twin of --decode_kv_int8_guarded)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def guard_setup():
    """A wider batch so the guard's per-row merge is exercised, and a bucket
    small enough (8 of 32 frames) that random-weight diffuse attention makes
    truncation actually flip transcripts."""
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=48,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    mel = np.random.default_rng(3).normal(
        0, 1, (8, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32)
    opts = decoding.DecodingOptions(language="en", sample_len=16)
    return tok, dims, params, jnp.asarray(mel), opts


def _token_lists(results):
    return [r.tokens for r in results]


def test_bucket_guard_requires_kv_frames(guard_setup):
    """kv_frames_guard without kv_frames has nothing to guard: loud error,
    not a silently-unbucketed decode."""
    tok, dims, params, mel, opts = guard_setup
    with pytest.raises(ValueError, match="kv_frames"):
        decoding.decode(params, dims, tok, mel, opts, kv_frames_guard=1.0)


def test_bucket_guard_all_flagged_equals_exact(guard_setup):
    """guard=inf flags every row -> the merged output must be BIT-identical
    to the full-window decode (the re-decode must drop the bucketing, not
    just the quantization)."""
    tok, dims, params, mel, opts = guard_setup
    exact = decoding.decode(params, dims, tok, mel, opts)
    guarded = decoding.decode(params, dims, tok, mel, opts, kv_frames=8,
                              kv_frames_guard=1e9)
    assert _token_lists(exact) == _token_lists(guarded)
    for a, b in zip(exact, guarded):
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, rtol=1e-6)
        np.testing.assert_allclose(a.no_speech_prob, b.no_speech_prob,
                                   rtol=1e-6)


def test_bucket_guard_zero_equals_plain_bucket(guard_setup):
    """guard=0 flags nothing -> identical to the plain bucketed path (margin
    tracking itself must not perturb the decode)."""
    tok, dims, params, mel, opts = guard_setup
    plain = decoding.decode(params, dims, tok, mel, opts, kv_frames=8)
    guarded = decoding.decode(params, dims, tok, mel, opts, kv_frames=8,
                              kv_frames_guard=0.0)
    assert _token_lists(plain) == _token_lists(guarded)


def test_bucket_guard_catches_truncation_flips(guard_setup):
    """Oracle test for the guard itself: at an 8-of-32-frame bucket the
    random-weight model's diffuse attention loses real softmax mass, flipping
    transcripts vs the full window; the guarded decode under the SAME bucket
    must match the exact path because every flip happens at a sampled step
    whose top1-top2 margin is far below the default guard."""
    tok, dims, params, mel, opts = guard_setup
    exact = decoding.decode(params, dims, tok, mel, opts)
    plain = decoding.decode(params, dims, tok, mel, opts, kv_frames=8)
    flipped = sum(a.tokens != b.tokens for a, b in zip(exact, plain))
    assert flipped >= 1, "8-frame bucket was expected to flip a transcript"
    guarded = decoding.decode(params, dims, tok, mel, opts, kv_frames=8,
                              kv_frames_guard=decoding
                              .default_bucket_guard_margin())
    assert _token_lists(guarded) == _token_lists(exact)


def test_combined_guards_redecode_fully_exact(guard_setup):
    """int8 guard + bucket guard together: the re-decode must turn BOTH
    perturbations off (the pre-round-4 combined path re-decoded bucketed)."""
    tok, dims, params, mel, opts = guard_setup
    exact = decoding.decode(params, dims, tok, mel, opts)
    guarded = decoding.decode(params, dims, tok, mel, opts, kv_frames=8,
                              kv_int8_guard=1e9, kv_frames_guard=1e9)
    assert _token_lists(exact) == _token_lists(guarded)


def test_unguarded_int8_survives_bucket_redecode(guard_setup):
    """An UNGUARDED kv_int8 alongside a bucket guard was opted into without
    parity claims: the full re-decode (guard=inf) must keep int8 on, i.e.
    equal the full-window int8 decode, not the exact one."""
    tok, dims, params, mel, opts = guard_setup
    int8_full = decoding.decode(params, dims, tok, mel, opts, kv_int8=True)
    guarded = decoding.decode(params, dims, tok, mel, opts, kv_frames=8,
                              kv_int8=True, kv_frames_guard=1e9)
    assert _token_lists(int8_full) == _token_lists(guarded)


@pytest.mark.slow
def test_pipeline_bucket_guarded_flag(tmp_path):
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.config import AlignConfig
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.runner import AlignmentPipeline

    scp = make_timit_fixture(str(tmp_path), n_utts=2, seconds=0.4)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    # guarded without a bucket: loud constructor error
    with pytest.raises(ValueError, match="decode_frame_bucket"):
        AlignmentPipeline(params, dims, tok, AlignConfig.recommended(
            topk=2, batch_size=2, decode_frame_bucket_guarded=True))
    cfg = AlignConfig.recommended(topk=2, batch_size=2,
                                  decode_frame_bucket=16,
                                  decode_frame_bucket_guarded=True)
    pipe = AlignmentPipeline(params, dims, tok, cfg)
    ds = TIMIT(scp)
    # align_batch consumes the guarded decode through DecodeFuture: the
    # guarded re-decode path runs at .result() time inside the pipeline
    res = pipe.align_batch([ds[0], ds[1]])
    assert len(res) == 2
