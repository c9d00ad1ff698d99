"""Long-form transcribe(): seek-loop behavior, schema, fallback ladder, and
prompt conditioning plumbing on a tiny random model (window = 2*n_audio_ctx
mel frames, so multi-window audio stays CPU-fast)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu import constants, transcribe as T
from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=32,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    return tok, dims, params


def _audio(seconds, seed=0):
    n = int(constants.SAMPLE_RATE * seconds)
    return np.random.default_rng(seed).normal(0, 0.1, n).astype(np.float32)


def test_single_window_matches_direct_decode(setup):
    """With the fallback gates off, one-window transcribe is exactly a greedy
    decode of the padded window; the segment tokens concatenate to it."""
    tok, dims, params = setup
    window_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    audio = _audio(0.8 * window_samples / constants.SAMPLE_RATE)
    out = T.transcribe(params, dims, tok, audio,
                       temperature=0.0, compression_ratio_threshold=None,
                       logprob_threshold=None, no_speech_threshold=None,
                       language="en", sample_len=8)
    mel = log_mel_spectrogram(
        jnp.asarray(pad_or_trim(audio, window_samples)), n_mels=dims.n_mels)
    ref = decoding.decode(params, dims, tok, mel,
                          decoding.DecodingOptions(language="en", sample_len=8))
    # tokens after the last consecutive-timestamp pair are dropped by the
    # published seek logic (they re-decode in the next window), so the kept
    # tokens are a prefix of the direct decode
    cat = [t for s in out["segments"] for t in s["tokens"]]
    assert cat and ref.tokens[:len(cat)] == cat
    assert out["language"] == "en"
    assert out["text"] == tok.decode([t for t in cat if t < tok.eot])


@pytest.mark.slow
def test_multi_window_covers_audio(setup):
    tok, dims, params = setup
    window_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    seconds = 2.6 * window_samples / constants.SAMPLE_RATE
    audio = _audio(seconds, seed=1)
    # without_timestamps: every iteration consumes exactly one window (random
    # weights emit arbitrary timestamps, which would let a single timestamped
    # window seek past the whole content)
    out = T.transcribe(params, dims, tok, audio,
                       temperature=0.0, compression_ratio_threshold=None,
                       logprob_threshold=None, no_speech_threshold=None,
                       language="en", sample_len=8, without_timestamps=True)
    segs = out["segments"]
    assert segs, "no segments produced"
    content_seconds = audio.size / constants.SAMPLE_RATE
    for k, s in enumerate(segs):
        assert s["id"] == k
        for key in ("seek", "start", "end", "text", "tokens", "temperature",
                    "avg_logprob", "compression_ratio", "no_speech_prob"):
            assert key in s
        assert 0.0 <= s["start"] <= s["end"]
    # seeks non-decreasing; three decode windows for 2.6 windows of content
    # (a single window may yield several segments when the decode emits
    # consecutive timestamp pairs — random weights do, published parsing kept)
    seeks = [s["seek"] for s in segs]
    assert seeks[0] == 0 and seeks == sorted(seeks)
    assert sorted(set(seeks)) == [0, 48, 96], seeks
    frames_per_second = constants.SAMPLE_RATE // constants.HOP_LENGTH
    assert max(seeks) < content_seconds * frames_per_second


def test_fallback_ladder_reaches_last_temperature(setup):
    """An unsatisfiable compression-ratio gate must walk the ladder to its
    final temperature (the published decode_with_fallback contract)."""
    tok, dims, params = setup
    audio = _audio(0.3, seed=2)
    out = T.transcribe(params, dims, tok, audio,
                       temperature=(0.0, 0.7),
                       compression_ratio_threshold=-1.0,  # always fails
                       logprob_threshold=None, no_speech_threshold=None,
                       language="en", sample_len=6)
    assert all(s["temperature"] == 0.7 for s in out["segments"])


@pytest.mark.slow
def test_prompt_conditioning_plumbing(setup, monkeypatch):
    """The second window's decode must receive the first window's tokens as
    its conditioning prompt (and none when conditioning is off); an
    initial_prompt seeds the first window."""
    tok, dims, params = setup
    window_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    audio = _audio(2.4 * window_samples / constants.SAMPLE_RATE, seed=3)
    seen = []
    real_decode = decoding.decode

    def spy(params_, dims_, tok_, mel_, options=None, **kw):
        seen.append(options.prompt)
        return real_decode(params_, dims_, tok_, mel_, options, **kw)

    monkeypatch.setattr(decoding, "decode", spy)
    common = dict(temperature=0.0, compression_ratio_threshold=None,
                  logprob_threshold=None, no_speech_threshold=None,
                  language="en", sample_len=6)

    out = T.transcribe(params, dims, tok, audio, **common)
    assert seen[0] is None
    if len(seen) > 1:  # later windows carry the accumulated tokens
        assert seen[1] is not None and len(seen[1]) > 0

    seen.clear()
    T.transcribe(params, dims, tok, audio, condition_on_previous_text=False,
                 **common)
    assert all(p is None for p in seen)

    seen.clear()
    T.transcribe(params, dims, tok, audio, initial_prompt="hello", **common)
    assert seen[0] == tok.encode(" hello")
    assert out["segments"]


def test_no_speech_skip(setup, monkeypatch):
    """A window whose no_speech_prob crosses the threshold (without a
    confident logprob) produces no segments and the seek advances past it."""
    tok, dims, params = setup
    audio = _audio(0.3, seed=4)
    real_decode = decoding.decode

    def spy(params_, dims_, tok_, mel_, options=None, **kw):
        r = real_decode(params_, dims_, tok_, mel_, options, **kw)
        setattr(r, "no_speech_prob", 0.99)
        setattr(r, "avg_logprob", -5.0)
        return r

    monkeypatch.setattr(decoding, "decode", spy)
    out = T.transcribe(params, dims, tok, audio, temperature=0.0,
                       compression_ratio_threshold=None,
                       logprob_threshold=-1.0, no_speech_threshold=0.6,
                       language="en", sample_len=6)
    assert out["segments"] == []
    assert out["text"] == ""


@pytest.mark.slow
def test_word_timestamps(setup):
    """word_timestamps attaches per-word intervals that tile the segment
    tokens, with probabilities on the published default-heads path and the
    paper's topk path available as word_aggr='topk'."""
    tok, dims, params = setup
    window_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    audio = _audio(1.6 * window_samples / constants.SAMPLE_RATE, seed=5)
    common = dict(temperature=0.0, compression_ratio_threshold=None,
                  logprob_threshold=None, no_speech_threshold=None,
                  language="en", sample_len=6, without_timestamps=True,
                  word_timestamps=True)
    for aggr in ("default", "topk"):
        out = T.transcribe(params, dims, tok, audio, word_aggr=aggr, **common)
        segs = [s for s in out["segments"] if s.get("words")]
        assert segs, "no segment got word timings"
        for s in segs:
            n_text = sum(1 for t in s["tokens"] if t < tok.eot)
            n_word_tokens = sum(len(w["tokens"]) for w in s["words"])
            # the per-word token groups must TILE the segment's text tokens —
            # a split that drops or duplicates tokens breaks every boundary
            assert n_word_tokens == n_text and n_word_tokens >= 1
            starts = [w["start"] for w in s["words"]]
            ends = [w["end"] for w in s["words"]]
            assert all(a <= b + 1e-9 for a, b in zip(starts, ends))
            assert starts == sorted(starts)  # DTW word starts are monotonic
            assert s["start"] == starts[0] and s["end"] == ends[-1]
            for w in s["words"]:
                assert (w["probability"] is None) == (aggr == "topk")


def test_empty_and_subhop_audio_runs_zero_windows(setup):
    """Published seek loop: content_frames <= 0 means no windows — empty or
    sub-hop-length audio returns the empty result instead of decoding one
    all-zero window (which could hallucinate a segment)."""
    tok, dims, params = setup
    for n in (0, constants.HOP_LENGTH - 1):
        out = T.transcribe(params, dims, tok, np.zeros((n,), np.float32),
                           language="en", sample_len=4)
        assert out == {"text": "", "segments": [], "language": "en"}


def test_merge_punctuations_unit():
    words = [
        {"word": " (", "tokens": [1], "start": 0.0, "end": 0.1,
         "probability": None},
        {"word": " hi", "tokens": [2], "start": 0.1, "end": 0.2,
         "probability": None},
        {"word": "!", "tokens": [3], "start": 0.2, "end": 0.3,
         "probability": None},
    ]
    out = T._merge_punctuations(list(map(dict, words)), T._PREPEND_PUNCT,
                                T._APPEND_PUNCT)
    assert [w["word"] for w in out] == [" ( hi!"]
    assert out[0]["tokens"] == [1, 2, 3]


@pytest.mark.slow
def test_user_prompt_kwarg_is_dropped(setup):
    """The loop owns the conditioning prompt (published behavior overwrites a
    caller-supplied one); passing prompt= must not crash."""
    tok, dims, params = setup
    audio = _audio(0.3, seed=6)
    out = T.transcribe(params, dims, tok, audio, temperature=0.0,
                       compression_ratio_threshold=None,
                       logprob_threshold=None, no_speech_threshold=None,
                       language="en", sample_len=4, prompt=[1, 2, 3])
    assert "segments" in out


@pytest.mark.slow
def test_prompt_bucketing_bounds_signatures(setup, monkeypatch):
    """Conditioning context is kept in prompt_bucket-token steps (bounded jit
    signatures); prompt_bucket=1 keeps exact lengths."""
    tok, dims, params = setup
    window_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    audio = _audio(3.4 * window_samples / constants.SAMPLE_RATE, seed=7)
    seen = []
    real_decode = decoding.decode

    def spy(params_, dims_, tok_, mel_, options=None, **kw):
        seen.append(0 if options.prompt is None else len(options.prompt))
        return real_decode(params_, dims_, tok_, mel_, options, **kw)

    monkeypatch.setattr(decoding, "decode", spy)
    common = dict(temperature=0.0, compression_ratio_threshold=None,
                  logprob_threshold=None, no_speech_threshold=None,
                  language="en", sample_len=7, without_timestamps=True)
    T.transcribe(params, dims, tok, audio, prompt_bucket=8, **common)
    assert any(n > 0 for n in seen), "conditioning never engaged"
    # lengths are exact below one bucket, floored to a multiple above it
    assert all(n < 8 or n % 8 == 0 for n in seen), seen

    seen_bucketed = list(seen)
    seen.clear()
    T.transcribe(params, dims, tok, audio, prompt_bucket=1, **common)
    # exact mode may carry lengths the bucketed mode rounded away
    assert len(seen) >= 1 and seen[0] == 0
    del seen_bucketed


def test_resolved_sot_sequence():
    tok = get_test_tokenizer()
    sot = T._resolved_sot_sequence(tok, None, "transcribe")
    assert sot == list(tok.sot_sequence)
    code = tok.all_language_codes[3]
    sot = T._resolved_sot_sequence(tok, code, "translate")
    assert sot[1] == tok.sot + 1 + 3
    assert sot[2] == tok.translate


def test_invalid_beam_patience_rejected():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    mel = jnp.zeros((dims.n_mels, 48), jnp.float32)
    with pytest.raises(ValueError):
        decoding.decode(params, dims, tok, mel, decoding.DecodingOptions(
            language="en", beam_size=2, patience=0.2))


def test_cli_str2bool():
    from whisper_char_alignment_tpu.cli.transcribe import str2bool
    import argparse
    assert str2bool("False") is False and str2bool("false") is False
    assert str2bool("True") is True
    with pytest.raises(argparse.ArgumentTypeError):
        str2bool("nope")


@pytest.mark.slow
def test_transcribe_with_beam_multi_window(setup):
    """Beam search composes with the long-form seek loop (published: the
    fallback ladder keeps beam options only at t=0) and with conditioning."""
    tok, dims, params = setup
    window_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    audio = _audio(2.3 * window_samples / constants.SAMPLE_RATE, seed=11)
    out = T.transcribe(params, dims, tok, audio, temperature=0.0,
                       compression_ratio_threshold=None,
                       logprob_threshold=None, no_speech_threshold=None,
                       language="en", sample_len=6, beam_size=2,
                       without_timestamps=True)
    segs = out["segments"]
    # >= 2 decode windows: random weights may emit a stray consecutive
    # timestamp pair (nothing suppresses timestamps in without_timestamps
    # mode, published behavior) whose large value seeks past the remainder
    assert len({s["seek"] for s in segs}) >= 2
    assert all(s["temperature"] == 0.0 for s in segs)


def test_language_normalized_on_every_path(setup):
    """Round-4 self-review: the zero-content early return and the seek loop
    must report the SAME resolved language code ('English' -> 'en'), and
    junk must raise on both paths rather than depending on audio length."""
    tok, dims, params = setup
    empty = np.zeros(10, np.float32)
    out = T.transcribe(params, dims, tok, empty, language="English")
    assert out == {"text": "", "segments": [], "language": "en"}
    with pytest.raises(ValueError, match="language"):
        T.transcribe(params, dims, tok, empty, language="klingon")
    full = T.transcribe(params, dims, tok, _audio(0.4), language="English",
                        sample_len=4, without_timestamps=True)
    assert full["language"] == "en"
    with pytest.raises(ValueError, match="language"):
        T.transcribe(params, dims, tok, _audio(0.4), language="klingon",
                     sample_len=4, without_timestamps=True)
