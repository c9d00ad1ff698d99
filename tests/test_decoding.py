"""Greedy decode-loop parity: the jitted while_loop + vectorized filters must
reproduce a naive per-step Python implementation of the published decoding rules
running on the same model (teacher-forced re-forward each step, no KV cache)."""

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
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    rng = np.random.default_rng(0)
    mel = rng.normal(0, 1, (2, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32)
    return tok, dims, params, mel


def _log_softmax(x):
    x = x - np.max(x[np.isfinite(x)]) if np.isfinite(x).any() else x
    e = np.exp(x)
    return x - np.log(e.sum())


def naive_decode(params, dims, tok, mel_1, options: decoding.DecodingOptions,
                 sample_len):
    """Published decode loop, one utterance, no cache: re-forward every step."""
    use_ts = not options.without_timestamps
    prompt = list(tok.sot_sequence_including_notimestamps if not use_ts
                  else tok.sot_sequence)
    sample_begin = len(prompt)
    suppress = decoding._get_suppress_tokens(tok, options)
    blank_ids = tok.encode(" ") + [tok.eot]
    ts_begin = tok.timestamp_begin
    max_init_idx = (round(options.max_initial_timestamp / 0.02)
                    if (use_ts and options.max_initial_timestamp) else None)

    tokens = list(prompt)
    sum_lp = 0.0
    for _ in range(sample_len):
        # pad to one fixed length so the oracle forward has a single jit
        # signature (causal masking makes the padded tail irrelevant)
        buf = tokens + [tok.eot] * (dims.n_text_ctx - len(tokens))
        logits_full, _ = wmodel.forward(params, dims, jnp.asarray(mel_1)[None],
                                        jnp.asarray([buf], jnp.int32),
                                        return_qk=False)
        logits = np.asarray(logits_full)[0, len(tokens) - 1].astype(np.float64)
        logits[list(suppress)] = -np.inf
        if len(tokens) == sample_begin:
            logits[blank_ids] = -np.inf
        if use_ts:
            logits[tok.no_timestamps] = -np.inf
            seq = tokens[sample_begin:]
            last_was = len(seq) >= 1 and seq[-1] >= ts_begin
            penult_was = len(seq) < 2 or seq[-2] >= ts_begin
            if last_was:
                if penult_was:
                    logits[ts_begin:] = -np.inf
                else:
                    logits[:tok.eot] = -np.inf
            ts = [t for t in seq if t >= ts_begin]
            if ts:
                last = ts[-1] if (last_was and not penult_was) else ts[-1] + 1
                logits[ts_begin:last] = -np.inf
            if len(tokens) == sample_begin:
                logits[:ts_begin] = -np.inf
                if max_init_idx is not None:
                    logits[ts_begin + max_init_idx + 1:] = -np.inf
            lp = _log_softmax(logits)
            ts_lp = np.logaddexp.reduce(lp[ts_begin:])
            if ts_lp > lp[:ts_begin].max():
                logits[:ts_begin] = -np.inf
        nxt = int(np.argmax(logits))
        sum_lp += _log_softmax(logits)[nxt]
        tokens.append(nxt)
        if nxt == tok.eot:
            break
    out = tokens[sample_begin:]
    if tok.eot in out:
        out = out[:out.index(tok.eot)]
    return out, sum_lp


@pytest.mark.parametrize("without_timestamps", [False, True])
def test_decode_matches_naive_oracle(setup, without_timestamps):
    tok, dims, params, mel = setup
    sample_len = 10
    options = decoding.DecodingOptions(language="en",
                                       without_timestamps=without_timestamps,
                                       sample_len=sample_len)
    results = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    for k in range(mel.shape[0]):
        expect_tokens, _ = naive_decode(params, dims, tok, mel[k], options,
                                        sample_len)
        assert results[k].tokens == expect_tokens, (
            f"item {k}: {results[k].tokens} vs {expect_tokens}")
        assert results[k].text == tok.decode(expect_tokens).strip()


def test_decode_single_input_returns_single_result(setup):
    tok, dims, params, mel = setup
    res = decoding.decode(params, dims, tok, jnp.asarray(mel[0]),
                          decoding.DecodingOptions(language="en", sample_len=4))
    assert isinstance(res, decoding.DecodingResult)
    assert isinstance(res.text, str)
    assert res.language == "en"


def test_first_sampled_token_is_timestamp_within_cap(setup):
    tok, dims, params, mel = setup
    res = decoding.decode(params, dims, tok, jnp.asarray(mel),
                          decoding.DecodingOptions(language="en", sample_len=6))
    for r in res:
        # raw sampled sequence begins with a timestamp <= <|1.00|> unless empty
        raw = r.tokens
        if raw:
            first_full = raw[0]
            # note: r.tokens excludes nothing before eot; the first generated token
            assert first_full >= tok.timestamp_begin
            assert first_full <= tok.timestamp_begin + 50


@pytest.mark.slow
def test_language_none_autodetects(setup):
    """language=None triggers detection, and decoding proceeds with each item's
    detected language token in its sot sequence (published decode behavior)."""
    tok, dims, params, mel = setup
    res = decoding.decode(params, dims, tok, jnp.asarray(mel),
                          decoding.DecodingOptions(language=None, sample_len=6))
    det = decoding.detect_language(params, dims, tok, jnp.asarray(mel))
    # EVERY item must match the explicit-language run for ITS detected code
    # (a bug that broadcasts item 0's language token across the batch would
    # pass an item-0-only check); one decode per distinct code
    by_code = {}
    for i, (r, (code, _)) in enumerate(zip(res, det)):
        assert r.language == code
        if code not in by_code:
            by_code[code] = decoding.decode(
                params, dims, tok, jnp.asarray(mel),
                decoding.DecodingOptions(language=code, sample_len=6))
        assert r.tokens == by_code[code][i].tokens, i


def test_custom_suppress_token_list(setup):
    """suppress_tokens as an explicit comma list (the non-'-1' branch) is
    honored: those ids never appear in the output."""
    tok, dims, params, mel = setup
    base = decoding.decode(params, dims, tok, jnp.asarray(mel),
                           decoding.DecodingOptions(language="en", sample_len=8))
    banned = sorted({t for r in base for t in r.tokens
                     if t < tok.eot})[:2]
    if not banned:
        pytest.skip("greedy output had no text tokens to ban")
    opts = decoding.DecodingOptions(
        language="en", sample_len=8,
        suppress_tokens=",".join(str(t) for t in banned))
    res = decoding.decode(params, dims, tok, jnp.asarray(mel), opts)
    for r in res:
        assert not (set(r.tokens) & set(banned))


def test_suppress_set_construction(setup):
    tok, dims, params, mel = setup
    s = decoding._get_suppress_tokens(tok, decoding.DecodingOptions())
    # specials always suppressed
    for t in (tok.transcribe, tok.translate, tok.sot, tok.sot_prev, tok.sot_lm,
              tok.no_speech):
        assert t in s
    # the non-speech symbol set is included under the "-1" default
    assert set(tok.non_speech_tokens) <= set(s)
    s2 = decoding._get_suppress_tokens(
        tok, decoding.DecodingOptions(suppress_tokens="5,7"))
    assert 5 in s2 and 7 in s2 and not (set(tok.non_speech_tokens) - {5, 7}) <= set(s2)


@pytest.mark.slow
def test_long_decode_224_steps_matches_naive_oracle():
    """The published decode default is sample_len = n_text_ctx // 2 = 224 with
    early exit (reference infer_ali.py:26 caps MAX_LENGTH=448). Exercise the
    timestamp-rule state machine at real sampled lengths against the naive
    per-step oracle, and check the step accounting."""
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=240,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(7), dims)
    mel = np.random.default_rng(5).normal(
        0, 1, (1, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32)
    sample_len = 224
    options = decoding.DecodingOptions(language="en", sample_len=sample_len)
    res = decoding.decode(params, dims, tok, jnp.asarray(mel), options)[0]
    expect_tokens, _ = naive_decode(params, dims, tok, mel[0], options,
                                    sample_len)
    assert res.tokens == expect_tokens
    # body iterations: (prompt steps) + (sampled steps incl. the eot step,
    # capped at sample_len); no eot -> exactly sample_len sampled steps
    sample_begin = len(tok.sot_sequence)
    assert res.n_steps == sample_begin - 1 + min(len(expect_tokens) + 1,
                                                 sample_len)


def test_decode_early_exit_on_all_finished(setup):
    """When every item samples eot immediately, the while_loop must stop after
    the prompt + 1 sampled step even with sample_len=224 — the early-exit path
    that makes full-length decode affordable on real transcripts."""
    tok, dims, params, mel = setup
    # suppress every non-special token except eot; with timestamps disabled the
    # first sampled token can only be eot
    banned = [str(t) for t in range(dims.n_vocab) if t != tok.eot]
    options = decoding.DecodingOptions(
        language="en", sample_len=223, without_timestamps=True,
        suppress_blank=False, suppress_tokens=",".join(banned))
    res = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    sample_begin = len(tok.sot_sequence_including_notimestamps)
    for r in res:
        assert r.tokens == []
    assert res[0].n_steps == sample_begin  # prompt steps + the eot step


def test_detect_language_runs(setup):
    tok, dims, params, mel = setup
    code, probs = decoding.detect_language(params, dims, tok, jnp.asarray(mel[0]))
    assert code in tok.all_language_codes
    assert abs(sum(probs.values()) - 1.0) < 1e-3


def test_suppress_tokens_published_semantics(setup):
    """Round-4 review: '-1' ANYWHERE in the set expands to the non-speech
    symbols and the -1 itself never reaches the mask build (numpy would
    negative-index the LAST vocab entry — the highest timestamp token); int
    iterables are accepted like the published API."""
    tok, dims, params, mel = setup
    base = set(decoding._get_suppress_tokens(tok, decoding.DecodingOptions()))
    assert set(tok.non_speech_tokens) <= base and -1 not in base
    mixed = decoding._get_suppress_tokens(
        tok, decoding.DecodingOptions(suppress_tokens="-1,123"))
    assert -1 not in mixed
    assert set(mixed) == base | {123}
    assert decoding._get_suppress_tokens(
        tok, decoding.DecodingOptions(suppress_tokens=[-1, 123])) == mixed
    # no -1 -> the non-speech set is NOT added (only specials + no_speech)
    bare = set(decoding._get_suppress_tokens(
        tok, decoding.DecodingOptions(suppress_tokens=None)))
    assert bare < base


def test_language_full_names_resolve_and_junk_raises(setup):
    """Round-4 review: language='English' must decode as 'en' (published
    TO_LANGUAGE_CODE behavior), and an unknown language must raise instead of
    silently decoding in the tokenizer's construction-time default."""
    tok, dims, params, mel = setup
    lt_name, tt = decoding.resolved_special_tokens(tok, "English", "translate")
    lt_code, _ = decoding.resolved_special_tokens(tok, "en", None)
    assert (lt_name == lt_code
            == tok.sot + 1 + tok.all_language_codes.index("en"))
    assert tt == tok.translate
    with pytest.raises(ValueError, match="language"):
        decoding.resolved_special_tokens(tok, "klingon", None)
    with pytest.raises(ValueError, match="language"):
        decoding.decode(params, dims, tok, jnp.asarray(mel),
                        decoding.DecodingOptions(language="klingon",
                                                 sample_len=2))


def test_decode_handles_tokenizer_without_no_speech(setup):
    """Round-4 review: _get_suppress_tokens supports no_speech=None but the
    decode loop crashed at trace time on it; the published result for that
    tokenizer shape is no_speech_prob=NaN."""
    import copy

    tok, dims, params, mel = setup
    tok2 = copy.copy(tok)
    tok2.no_speech = None
    r = decoding.decode(params, dims, tok2, jnp.asarray(mel),
                        decoding.DecodingOptions(without_timestamps=True,
                                                 sample_len=3))
    assert all(np.isnan(x.no_speech_prob) for x in r)


def test_prefill_matches_stepwise_prompt_consumption(setup, monkeypatch):
    """WCA_DECODE_PREFILL=1 (default; the published decoder's first forward
    runs the whole initial sequence in one pass) must be transcript-identical
    to stepwise prompt consumption, with avg_logprob / no_speech_prob drift
    bounded at the reduction-reassociation ulp level."""
    tok, dims, params, _ = setup
    rng = np.random.default_rng(5)
    mels = jnp.asarray(rng.normal(
        0, 1, (4, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32))
    for opts in [
            decoding.DecodingOptions(language="en", sample_len=8),
            decoding.DecodingOptions(language="en", sample_len=8,
                                     without_timestamps=True),
            decoding.DecodingOptions(language="en", sample_len=6,
                                     prompt=list(range(4, 12))),
            # forced prefix lives AFTER the sot sequence (inside
            # sample_begin), and with a prompt too the no-speech probe's
            # sot_index sits strictly inside the prefilled range
            decoding.DecodingOptions(language="en", sample_len=6,
                                     prefix=[9, 10, 11]),
            decoding.DecodingOptions(language="en", sample_len=5,
                                     prompt=list(range(4, 10)),
                                     prefix=[9, 10])]:
        monkeypatch.setenv("WCA_DECODE_PREFILL", "0")
        r0 = decoding.decode(params, dims, tok, mels, opts)
        monkeypatch.setenv("WCA_DECODE_PREFILL", "1")
        r1 = decoding.decode(params, dims, tok, mels, opts)
        for a, b in zip(r0, r1):
            assert a.tokens == b.tokens
            assert a.text == b.text
            assert a.avg_logprob == pytest.approx(b.avg_logprob, abs=5e-5)
            assert a.no_speech_prob == pytest.approx(b.no_speech_prob,
                                                     abs=1e-6)
            assert a.n_steps == b.n_steps  # positions reached, not iterations


def test_prefill_cache_matches_sequential_steps(setup):
    """decode_prefill's cache columns and its no-speech logits row must match
    decode_step walked over the same prompt one position at a time (same
    ctx-wide masked reductions; only tree-reassociation ulps may differ)."""
    tok, dims, params, _ = setup
    b = 3
    rng = np.random.default_rng(9)
    xa = jnp.asarray(rng.normal(
        0, 1, (b, dims.n_audio_ctx, dims.n_text_state)).astype(np.float32))
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa)
    prompt = jnp.asarray(np.tile(
        np.array([tok.sot, tok.sot + 1, tok.no_timestamps, 5], np.int32),
        (b, 1)))
    p = prompt.shape[1]

    cache_seq = wmodel.init_kv_cache(dims, b, p + 2)
    logits_rows = []
    for i in range(p):
        lg, cache_seq = wmodel.decode_step(params, dims, prompt[:, i:i + 1],
                                           jnp.int32(i), cache_seq, cross_kv)
        logits_rows.append(np.asarray(lg))

    cache_pf = wmodel.init_kv_cache(dims, b, p + 2)
    lg_at, cache_pf = wmodel.decode_prefill(params, dims, prompt, cache_pf,
                                            cross_kv, logits_at=1)
    np.testing.assert_allclose(np.asarray(lg_at), logits_rows[1],
                               rtol=0, atol=2e-5)
    for kk in ("k", "v"):
        np.testing.assert_allclose(np.asarray(cache_pf[kk]),
                                   np.asarray(cache_seq[kk]),
                                   rtol=0, atol=1e-5)
    # a decode continued from either cache sees the same next logits
    nxt = jnp.full((b, 1), 7, jnp.int32)
    lg_a, _ = wmodel.decode_step(params, dims, nxt, jnp.int32(p), cache_seq,
                                 cross_kv)
    lg_b, _ = wmodel.decode_step(params, dims, nxt, jnp.int32(p), cache_pf,
                                 cross_kv)
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=0, atol=2e-5)


def test_prefill_env_flag_validated(setup, monkeypatch):
    monkeypatch.setenv("WCA_DECODE_PREFILL", "yes")
    with pytest.raises(ValueError, match="WCA_DECODE_PREFILL"):
        decoding._prefill_enabled()
