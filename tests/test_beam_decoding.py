"""Beam-search and temperature-sampling decode parity.

The jitted beam loop (models/beam.py) must reproduce a naive Python
implementation of the published BeamSearchDecoder — dict-of-sequences
candidate merging, per-step finished banking capped at round(beam*patience),
finalize top-up with unfinished beams, maximum-likelihood ranking — running on
the same model with a full re-forward each step. Sampling is checked
structurally (rules respected, logprob bookkeeping, determinism under a fixed
rng, best_of ranking)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import beam, decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(3), dims)
    rng = np.random.default_rng(0)
    mel = rng.normal(0, 1, (2, dims.n_mels, 2 * dims.n_audio_ctx)).astype(
        np.float32)
    return tok, dims, params, mel


def _log_softmax(x):
    m = np.max(x[np.isfinite(x)])
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum())


def _forward_last(params, dims, tok, mel_1, tokens):
    buf = list(tokens) + [tok.eot] * (dims.n_text_ctx - len(tokens))
    logits, _ = wmodel.forward(params, dims, jnp.asarray(mel_1)[None],
                               jnp.asarray([buf], jnp.int32), return_qk=False)
    return np.asarray(logits)[0, len(tokens) - 1].astype(np.float64)


def _apply_rules(logits, tokens, tok, options, sample_begin):
    """Published logit filters, naive per-row (mirrors test_decoding's oracle)."""
    use_ts = not options.without_timestamps
    suppress = decoding._get_suppress_tokens(tok, options)
    blank_ids = tok.encode(" ") + [tok.eot]
    ts_begin = tok.timestamp_begin
    logits = logits.copy()
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
            if options.max_initial_timestamp is not None:
                cap = round(options.max_initial_timestamp / 0.02)
                logits[ts_begin + cap + 1:] = -np.inf
        lp = _log_softmax(logits)
        if np.logaddexp.reduce(lp[ts_begin:]) > lp[:ts_begin].max():
            logits[:ts_begin] = -np.inf
    return logits


def naive_beam_decode(params, dims, tok, mel_1, options, sample_len):
    """Published BeamSearchDecoder + MaximumLikelihoodRanker, one audio."""
    g = options.beam_size
    patience = options.patience if options.patience is not None else 1.0
    max_candidates = max(1, round(g * patience))
    use_ts = not options.without_timestamps
    prompt = list(tok.sot_sequence if use_ts
                  else tok.sot_sequence_including_notimestamps)
    sample_begin = len(prompt)
    beams = [list(prompt) for _ in range(g)]
    sum_lp = [0.0] * g
    finished = {}
    for _ in range(sample_len):
        scores, sources = {}, {}
        for j in range(g):
            logits = _forward_last(params, dims, tok, mel_1, beams[j])
            logits = _apply_rules(logits, beams[j], tok, options, sample_begin)
            lp = _log_softmax(logits)
            topk = np.argsort(-lp, kind="stable")[:g + 1]
            for t in topk:
                seq = tuple(beams[j] + [int(t)])
                scores[seq] = sum_lp[j] + lp[t]
                sources[seq] = j
        next_beams, next_lps, newly = [], [], {}
        for seq in sorted(scores, key=scores.get, reverse=True):
            if seq[-1] == tok.eot:
                newly[seq] = scores[seq]
            else:
                next_beams.append(list(seq))
                next_lps.append(scores[seq])
                if len(next_beams) == g:
                    break
        for seq in sorted(newly, key=newly.get, reverse=True):
            if len(finished) >= max_candidates:
                break
            finished[seq] = newly[seq]
        beams, sum_lp = next_beams, next_lps
        if len(finished) >= max_candidates:
            break
    if len(finished) < g:  # published finalize: top up with unfinished beams
        for j in list(np.argsort(sum_lp))[::-1]:
            seq = tuple(beams[j] + [tok.eot])
            finished[seq] = sum_lp[j]
            if len(finished) >= g:
                break
    cands, lps = [], []
    for seq, lp in finished.items():
        s = list(seq)[sample_begin:]
        if tok.eot in s:
            s = s[:s.index(tok.eot)]
        cands.append(s)
        lps.append(lp)
    sel = beam.ml_rank(cands, lps, options.length_penalty)
    return cands[sel], lps[sel]


@pytest.mark.parametrize("beam_size,without_timestamps,patience,alpha", [
    (2, False, None, None),
    pytest.param(3, False, None, 0.5, marks=pytest.mark.slow),
    (2, True, None, None),
    pytest.param(3, False, 1.5, None, marks=pytest.mark.slow),
])
def test_beam_matches_naive_oracle(setup, beam_size, without_timestamps,
                                   patience, alpha):
    tok, dims, params, mel = setup
    sample_len = 8
    options = decoding.DecodingOptions(
        language="en", beam_size=beam_size, patience=patience,
        length_penalty=alpha, without_timestamps=without_timestamps,
        sample_len=sample_len)
    results = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    for k in range(mel.shape[0]):
        expect_tokens, expect_lp = naive_beam_decode(
            params, dims, tok, mel[k], options, sample_len)
        assert results[k].tokens == expect_tokens, (
            f"item {k}: {results[k].tokens} vs {expect_tokens}")
        np.testing.assert_allclose(
            results[k].avg_logprob, expect_lp / (len(expect_tokens) + 1),
            rtol=1e-4, atol=1e-4)


def test_beam_greedy_equivalence_at_beam1(setup):
    """beam_size=1 must reproduce greedy decoding token-for-token (a beam of
    one always extends with the argmax)."""
    tok, dims, params, mel = setup
    opts_b = decoding.DecodingOptions(language="en", beam_size=1, sample_len=8)
    opts_g = decoding.DecodingOptions(language="en", sample_len=8)
    rb = decoding.decode(params, dims, tok, jnp.asarray(mel), opts_b)
    rg = decoding.decode(params, dims, tok, jnp.asarray(mel), opts_g)
    for b_, g_ in zip(rb, rg):
        assert b_.tokens == g_.tokens


def test_sampling_rules_and_determinism(setup):
    tok, dims, params, mel = setup
    opts = decoding.DecodingOptions(language="en", temperature=0.8,
                                    sample_len=8)
    r1 = decoding.decode(params, dims, tok, jnp.asarray(mel), opts,
                         rng=jax.random.PRNGKey(5))
    r2 = decoding.decode(params, dims, tok, jnp.asarray(mel), opts,
                         rng=jax.random.PRNGKey(5))
    assert [r.tokens for r in r1] == [r.tokens for r in r2]
    suppress = set(decoding._get_suppress_tokens(tok, opts))
    for r in r1:
        assert not (set(r.tokens) & suppress)
        if r.tokens:  # first sampled token must obey the timestamp rule
            assert r.tokens[0] >= tok.timestamp_begin
        # sum_logprobs bookkeeping: recompute from the published definition.
        # The eot term only exists when the row actually sampled eot (shorter
        # than sample_len); a row that ran to sample_len was never charged it.
        prompt = list(tok.sot_sequence)
        seq = list(r.tokens)
        if len(seq) < 8:
            seq = seq + [tok.eot]
        total_lp = 0.0
        toks = list(prompt)
        for t in seq:
            logits = _forward_last(params, dims, tok, jnp.asarray(mel[0])
                                   if r is r1[0] else jnp.asarray(mel[1]),
                                   toks)
            logits = _apply_rules(logits, toks, tok, opts, len(prompt))
            total_lp += _log_softmax(logits)[t]
            toks.append(t)
        np.testing.assert_allclose(r.avg_logprob,
                                   total_lp / (len(r.tokens) + 1),
                                   rtol=1e-3, atol=1e-3)


def test_best_of_ranks_by_normalized_logprob(setup):
    tok, dims, params, mel = setup
    opts = decoding.DecodingOptions(language="en", temperature=1.0, best_of=4,
                                    sample_len=6)
    rng = jax.random.PRNGKey(11)
    res = decoding.decode(params, dims, tok, jnp.asarray(mel), opts, rng=rng)
    # re-run the raw loop to see all 4 rows and check the selected one wins
    prompt = jnp.asarray(list(tok.sot_sequence), jnp.int32)
    suppress = decoding._get_suppress_tokens(tok, opts)
    s_mask = np.zeros((dims.n_vocab,), np.float32)
    s_mask[list(suppress)] = -np.inf
    b_mask = np.zeros((dims.n_vocab,), np.float32)
    b_mask[tok.encode(" ") + [tok.eot]] = -np.inf
    tokens, sum_lp, _, _, _ = beam._sample_loop(
        params, dims, jnp.asarray(mel), prompt, jnp.asarray(s_mask),
        jnp.asarray(b_mask), rng, sample_begin=len(tok.sot_sequence),
        max_steps=6, ts_begin=tok.timestamp_begin, eot=tok.eot,
        no_timestamps=tok.no_timestamps, no_speech=tok.no_speech,
        max_initial_ts_index=50, use_timestamps=True, n_group=4,
        temperature=1.0)
    groups = beam.group_candidates(np.asarray(tokens), np.asarray(sum_lp),
                                   n_group=4, sample_begin=len(tok.sot_sequence),
                                   eot=tok.eot)
    for a, (cands, lps) in enumerate(groups):
        sel = beam.ml_rank(cands, lps, None)
        assert res[a].tokens == cands[sel]


def test_option_validation(setup):
    tok, dims, params, mel = setup
    m = jnp.asarray(mel)
    with pytest.raises(ValueError):
        decoding.decode(params, dims, tok, m, decoding.DecodingOptions(
            language="en", beam_size=2, best_of=2, temperature=1.0))
    with pytest.raises(ValueError):
        decoding.decode(params, dims, tok, m, decoding.DecodingOptions(
            language="en", best_of=2))  # temperature 0
    with pytest.raises(ValueError):
        decoding.decode(params, dims, tok, m, decoding.DecodingOptions(
            language="en", patience=2.0))  # patience without beam
    with pytest.raises(ValueError):
        decoding.decode(params, dims, tok, m, decoding.DecodingOptions(
            language="en", beam_size=2, length_penalty=2.0))


def naive_initial_tokens(tok, dims, options):
    """Published _get_initial_tokens: prefix after the sot sequence, 
    [sot_prev] + prompt before it (with the published trim quirks)."""
    sot_seq = list(tok.sot_sequence_including_notimestamps
                   if options.without_timestamps else tok.sot_sequence)
    sample_len = options.sample_len or dims.n_text_ctx // 2
    initial = list(sot_seq)
    if options.prefix is not None:
        p = (tok.encode(" " + options.prefix.strip())
             if isinstance(options.prefix, str) else list(options.prefix))
        initial = initial + p[-(dims.n_text_ctx // 2 - sample_len):]
    if options.prompt is not None:
        p = (tok.encode(" " + options.prompt.strip())
             if isinstance(options.prompt, str) else list(options.prompt))
        initial = [tok.sot_prev] + p[-(dims.n_text_ctx // 2 - 1):] + initial
    return initial


@pytest.mark.parametrize("use_prompt,use_prefix", [
    pytest.param(True, False, marks=pytest.mark.slow),
    pytest.param(False, True, marks=pytest.mark.slow),
    (True, True)])  # fast tier: the combined case exercises both paths
def test_prompt_and_prefix_conditioning(setup, use_prompt, use_prefix):
    """Greedy decode under prompt/prefix conditioning must equal the naive
    oracle running from the published initial-token construction, and the
    no-speech probe must follow the shifted sot position."""
    tok, dims, params, mel = setup
    sample_len = 6
    kw = {}
    if use_prompt:
        kw["prompt"] = "alpha beta"
    if use_prefix:
        kw["prefix"] = [5, 7]  # token-list form
    options = decoding.DecodingOptions(language="en", sample_len=sample_len,
                                       **kw)
    initial = naive_initial_tokens(tok, dims, options)
    sample_begin = len(initial)
    sot_index = initial.index(tok.sot)
    if use_prompt:
        assert initial[0] == tok.sot_prev and sot_index > 0
    if use_prefix:
        assert initial[sample_begin - 2:sample_begin] == [5, 7]

    results = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    for k in range(mel.shape[0]):
        toks = list(initial)
        expect = []
        for _ in range(min(sample_len, dims.n_text_ctx - sample_begin)):
            logits = _forward_last(params, dims, tok, mel[k], toks)
            logits = _apply_rules(logits, toks, tok, options, sample_begin)
            nxt = int(np.argmax(logits))
            toks.append(nxt)
            if nxt == tok.eot:
                break
        expect = toks[sample_begin:]
        if tok.eot in expect:
            expect = expect[:expect.index(tok.eot)]
        assert results[k].tokens == expect, f"item {k}"
        # no-speech probe at the shifted sot position
        buf = initial + [tok.eot] * (dims.n_text_ctx - len(initial))
        logits_full, _ = wmodel.forward(
            params, dims, jnp.asarray(mel[k])[None],
            jnp.asarray([buf], jnp.int32), return_qk=False)
        ns = jax.nn.softmax(jnp.asarray(logits_full)[0, sot_index],
                            axis=-1)[tok.no_speech]
        np.testing.assert_allclose(results[k].no_speech_prob, float(ns),
                                   rtol=2e-3, atol=2e-3)


def test_empty_prompt_and_prefix_are_skipped(setup):
    """Published _get_initial_tokens uses truthiness: an empty-string or
    empty-list prompt/prefix contributes nothing (no bare sot_prev token, no
    forced ' ' encoding) — the decode must equal the unconditioned one."""
    tok, dims, params, mel = setup
    base = decoding.decode(params, dims, tok, jnp.asarray(mel),
                           decoding.DecodingOptions(language="en",
                                                    sample_len=6))
    for kw in ({"prompt": ""}, {"prefix": ""}, {"prompt": [], "prefix": []}):
        res = decoding.decode(
            params, dims, tok, jnp.asarray(mel),
            decoding.DecodingOptions(language="en", sample_len=6, **kw))
        assert [r.tokens for r in res] == [r.tokens for r in base], kw


@pytest.mark.slow
def test_beam_with_kv_speedups_falls_back(setup):
    """kv_frames / kv_int8 are greedy-loop-only speedups: combined with beam
    or sampling options they must gracefully fall back to the full-window
    un-quantized beam path (identical results), not crash."""
    tok, dims, params, mel = setup
    options = decoding.DecodingOptions(language="en", sample_len=6,
                                       beam_size=2)
    base = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    for kw in ({"kv_frames": 16}, {"kv_int8": True},
               {"kv_frames": 16, "kv_int8": True}):
        res = decoding.decode(params, dims, tok, jnp.asarray(mel), options,
                              **kw)
        assert [r.tokens for r in res] == [r.tokens for r in base], kw


def test_prompt_conditioning_beam(setup):
    """The conditioning prompt threads through the beam loop too."""
    tok, dims, params, mel = setup
    options = decoding.DecodingOptions(language="en", sample_len=6,
                                       beam_size=2, prompt=[9, 11])
    res = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    base = decoding.decode(params, dims, tok, jnp.asarray(mel),
                           decoding.DecodingOptions(language="en",
                                                    sample_len=6, beam_size=2))
    assert all(isinstance(r.tokens, list) for r in res)
    # conditioning changes the search (random weights: overwhelmingly likely)
    assert ([r.tokens for r in res] != [r.tokens for r in base]
            or res[0].avg_logprob != base[0].avg_logprob)


def test_beam_without_timestamps_matches_oracle(setup):
    """Beam + without_timestamps (rules reduce to suppress sets) still matches
    the published algorithm oracle."""
    tok, dims, params, mel = setup
    options = decoding.DecodingOptions(language="en", beam_size=2,
                                       without_timestamps=True, sample_len=6)
    results = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    for k in range(2):
        expect_tokens, _ = naive_beam_decode(params, dims, tok, mel[k],
                                             options, 6)
        assert results[k].tokens == expect_tokens


def test_beam_sample_len_one(setup):
    """A one-step beam search terminates cleanly and returns one sampled
    token (or none) per audio."""
    tok, dims, params, mel = setup
    res = decoding.decode(params, dims, tok, jnp.asarray(mel),
                          decoding.DecodingOptions(language="en", beam_size=3,
                                                   sample_len=1))
    for r in res:
        assert len(r.tokens) <= 1
        assert np.isfinite(r.avg_logprob)


def test_sampling_step_accounting(setup):
    """The sampling loop's n_steps observability is bounded by prompt+samples."""
    tok, dims, params, mel = setup
    res = decoding.decode(
        params, dims, tok, jnp.asarray(mel),
        decoding.DecodingOptions(language="en", temperature=0.5, sample_len=8,
                                 without_timestamps=True),
        rng=jax.random.PRNGKey(0))
    for r in res:
        assert r.n_steps <= len(tok.sot_sequence) + 1 + 8


@pytest.mark.slow
def test_beam_stress_wide_and_long(setup):
    """Wider/longer beam search with patience banking across multiple steps
    and full length penalty still matches the published-algorithm oracle."""
    tok, dims, params, mel = setup
    options = decoding.DecodingOptions(
        language="en", beam_size=4, patience=2.0, length_penalty=1.0,
        sample_len=12)
    results = decoding.decode(params, dims, tok, jnp.asarray(mel), options)
    for k in range(mel.shape[0]):
        expect_tokens, expect_lp = naive_beam_decode(
            params, dims, tok, mel[k], options, 12)
        assert results[k].tokens == expect_tokens, f"item {k}"
        np.testing.assert_allclose(
            results[k].avg_logprob, expect_lp / (len(expect_tokens) + 1),
            rtol=1e-4, atol=1e-4)


def test_sampling_temperature_is_traced_not_static(setup):
    """Round-4 review: transcribe()'s fallback ladder walks up to five
    temperatures per window; a static temperature recompiled _sample_loop per
    rung (minutes per signature on the remote-compile backend). The scalar is
    only ever a divisor — it must be traced: same signature across rungs."""
    tok, dims, params, mel = setup

    def opts(t):
        return decoding.DecodingOptions(temperature=t, sample_len=3,
                                        without_timestamps=True)

    decoding.decode(params, dims, tok, jnp.asarray(mel), opts(0.3))
    n0 = beam._sample_loop._cache_size()
    decoding.decode(params, dims, tok, jnp.asarray(mel), opts(0.7))
    assert beam._sample_loop._cache_size() == n0


def test_beam_and_sampling_handle_no_speech_none(setup):
    """Round-4 review twin of the greedy-loop case: both beam and sampling
    loops must trace with a no_speech-less tokenizer and report NaN."""
    import copy

    tok, dims, params, mel = setup
    tok2 = copy.copy(tok)
    tok2.no_speech = None
    rs = decoding.decode(params, dims, tok2, jnp.asarray(mel),
                         decoding.DecodingOptions(temperature=0.5,
                                                  sample_len=3,
                                                  without_timestamps=True))
    assert all(np.isnan(x.no_speech_prob) for x in rs)
    rb = decoding.decode(params, dims, tok2, jnp.asarray(mel),
                         decoding.DecodingOptions(beam_size=2, sample_len=3,
                                                  without_timestamps=True))
    assert all(np.isnan(x.no_speech_prob) for x in rb)


def test_beam_and_sampling_report_normalized_language(setup):
    """Round-4 self-review: beam/sampling must report the same resolved
    language code as the greedy path ('English' -> 'en'; junk raises) — the
    result language must not depend on which decode mode ran."""
    tok, dims, params, mel = setup
    for opts in (decoding.DecodingOptions(language="English", beam_size=2,
                                          sample_len=3,
                                          without_timestamps=True),
                 decoding.DecodingOptions(language="English", temperature=0.5,
                                          sample_len=3,
                                          without_timestamps=True)):
        res = decoding.decode(params, dims, tok, jnp.asarray(mel), opts)
        assert all(r.language == "en" for r in res)
    with pytest.raises(ValueError, match="language"):
        decoding.decode(params, dims, tok, jnp.asarray(mel),
                        decoding.DecodingOptions(language="klingon",
                                                 beam_size=2, sample_len=3,
                                                 without_timestamps=True))


def test_prefill_matches_stepwise_beam_and_sampling(setup, monkeypatch):
    """The beam and sampling loops' prompt prefill (one teacher-forced pass
    over the un-repeated prompt, cache rows repeated per beam/group) must be
    transcript-identical to stepping every row through the prompt phase,
    with logprob/no-speech drift at reduction-reassociation level."""
    tok, dims, params, mel = setup
    mels = jnp.asarray(mel)
    for opts in [decoding.DecodingOptions(language="en", sample_len=6,
                                          beam_size=3),
                 decoding.DecodingOptions(language="en", sample_len=6,
                                          temperature=0.8, best_of=2)]:
        rng = jax.random.PRNGKey(11)
        monkeypatch.setenv("WCA_DECODE_PREFILL", "0")
        r0 = decoding.decode(params, dims, tok, mels, opts, rng=rng)
        monkeypatch.setenv("WCA_DECODE_PREFILL", "1")
        r1 = decoding.decode(params, dims, tok, mels, opts, rng=rng)
        for a, b in zip(r0, r1):
            assert a.tokens == b.tokens, opts
            assert a.avg_logprob == pytest.approx(b.avg_logprob, abs=5e-5)
            assert a.no_speech_prob == pytest.approx(b.no_speech_prob,
                                                     abs=1e-6)
