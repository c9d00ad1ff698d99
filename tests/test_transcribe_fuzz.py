"""Differential fuzz of the long-form transcribe() seek loop.

The oracle below is a direct, line-by-line transcription of the PUBLISHED
whisper transcribe() algorithm (openai-whisper transcribe.py: the seek loop,
timestamp-token segment parsing, decode_with_fallback ladder, no-speech skip,
and condition_on_previous_text prompt bookkeeping), written independently of
``whisper_char_alignment_tpu/transcribe.py`` and operating on scripted
DecodingResults — no model runs. Both sides consume the same script of
per-(window, temperature) decode outcomes, so every divergence in seek
arithmetic, segment slicing, gate logic, or prompt plumbing is a hard failure.

Same method as tests/test_fuzz.py's metric oracles: transcribe the published
loop, then fuzz across the config space (ladder length, gates on/off,
conditioning on/off, initial prompts, timestamp patterns incl. consecutive
pairs, single-timestamp endings, <|0.00|> finals, and empty outputs).

The one deliberate deviation is excluded by construction: a degenerate
<|0.00|><|0.00|> final pair would make the published loop advance 0 frames
(infinite loop); this framework consumes the window instead (transcribe.py
documents it), so generated consecutive-pair finals always use offset >= 1.
"""

import numpy as np
import pytest

from whisper_char_alignment_tpu import constants, transcribe as T
from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import decoding
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

FPS = constants.SAMPLE_RATE // constants.HOP_LENGTH  # 100 mel frames / s


@pytest.fixture(scope="module")
def tok_dims():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=32,
                          state=16, head=2, layers=2)
    return tok, dims


# ---------------------------------------------------------------------------
# Oracle: the published seek loop, transcribed
# ---------------------------------------------------------------------------

def published_transcribe(script, content_frames, window_frames, tok,
                         temperatures, compression_ratio_threshold,
                         logprob_threshold, no_speech_threshold,
                         condition_on_previous_text, initial_prompt_tokens):
    """openai-whisper transcribe.py's loop over scripted decode outcomes.

    ``script(window_idx, temperature)`` -> (tokens, avg_logprob,
    compression_ratio, no_speech_prob). Returns {text, segments, prompts,
    n_decode_calls}; ``prompts`` holds the conditioning prompt each window's
    decode received (None when empty, matching DecodingOptions semantics).
    """
    input_stride = 2
    time_precision = input_stride * constants.HOP_LENGTH / constants.SAMPLE_RATE
    ts_begin = tok.timestamp_begin
    all_tokens = list(initial_prompt_tokens)
    all_segments = []
    prompt_reset_since = 0
    seek = 0
    window_idx = -1
    prompts = []
    n_calls = 0
    while seek < content_frames:
        window_idx += 1
        time_offset = seek / FPS
        segment_size = min(window_frames, content_frames - seek)
        segment_duration = segment_size / FPS
        prompt = list(all_tokens[prompt_reset_since:])
        prompts.append(prompt or None)

        # decode_with_fallback, published gate semantics
        result = None
        for t in temperatures:
            n_calls += 1
            tokens, avg_lp, cr, nsp = script(window_idx, t)
            result = dict(tokens=list(tokens), avg_logprob=avg_lp,
                          compression_ratio=cr, no_speech_prob=nsp,
                          temperature=t)
            needs_fallback = False
            if (compression_ratio_threshold is not None
                    and cr > compression_ratio_threshold):
                needs_fallback = True
            if logprob_threshold is not None and avg_lp < logprob_threshold:
                needs_fallback = True
            if no_speech_threshold is not None and nsp > no_speech_threshold:
                needs_fallback = False
            if not needs_fallback:
                break
        tokens = result["tokens"]

        if no_speech_threshold is not None:
            should_skip = result["no_speech_prob"] > no_speech_threshold
            if (logprob_threshold is not None
                    and result["avg_logprob"] > logprob_threshold):
                should_skip = False
            if should_skip:
                seek += segment_size
                continue

        def new_segment(start, end, seg_tokens):
            return dict(
                seek=seek, start=start, end=end,
                text=tok.decode([t_ for t_ in seg_tokens if t_ < tok.eot]),
                tokens=list(seg_tokens), temperature=result["temperature"],
                avg_logprob=result["avg_logprob"],
                compression_ratio=result["compression_ratio"],
                no_speech_prob=result["no_speech_prob"])

        current_segments = []
        is_ts = [t_ >= ts_begin for t_ in tokens]
        single_timestamp_ending = is_ts[-2:] == [False, True]
        consecutive = [k + 1 for k in range(len(tokens) - 1)
                       if is_ts[k] and is_ts[k + 1]]
        if consecutive:
            slices = list(consecutive)
            if single_timestamp_ending:
                slices.append(len(tokens))
            last_slice = 0
            for cur in slices:
                seg_tokens = tokens[last_slice:cur]
                start_pos = seg_tokens[0] - ts_begin
                end_pos = seg_tokens[-1] - ts_begin
                current_segments.append(new_segment(
                    time_offset + start_pos * time_precision,
                    time_offset + end_pos * time_precision, seg_tokens))
                last_slice = cur
            if single_timestamp_ending:
                seek += segment_size
            else:
                last_ts_pos = tokens[last_slice - 1] - ts_begin
                seek += last_ts_pos * input_stride
        else:
            duration = segment_duration
            ts_toks = [t_ for t_ in tokens if t_ >= ts_begin]
            if ts_toks and ts_toks[-1] != ts_begin:
                duration = (ts_toks[-1] - ts_begin) * time_precision
            current_segments.append(new_segment(
                time_offset, time_offset + duration, tokens))
            seek += segment_size

        for seg in current_segments:
            seg["id"] = len(all_segments)
            all_segments.append(seg)
            all_tokens.extend(seg["tokens"])
        if not condition_on_previous_text or result["temperature"] > 0.5:
            prompt_reset_since = len(all_tokens)

    text = tok.decode([t_ for t_ in all_tokens[len(initial_prompt_tokens):]
                       if t_ < tok.eot])
    return dict(text=text, segments=all_segments, prompts=prompts,
                n_decode_calls=n_calls)


# ---------------------------------------------------------------------------
# Scripted token streams
# ---------------------------------------------------------------------------

def _gen_tokens(rng, tok, max_ts_offset):
    """A random decode output: text tokens (< eot) mixed with timestamp
    tokens. Shapes drawn to hit every parser branch: consecutive pairs,
    single-timestamp endings, timestamp-free streams, trailing <|0.00|>,
    and the empty output."""
    ts_begin = tok.timestamp_begin
    shape = rng.integers(0, 8)
    if shape == 0:
        return []  # empty decode
    n_words = int(rng.integers(1, 5))
    text = lambda: [int(rng.integers(0, tok.eot))
                    for _ in range(rng.integers(1, 4))]
    ts = lambda: ts_begin + int(rng.integers(1, max_ts_offset))
    out = []
    if shape == 1:  # no timestamps at all
        for _ in range(n_words):
            out += text()
    elif shape == 2:  # segment pairs: <|a|> text <|b|><|c|> text <|d|> ...
        for _ in range(n_words):
            out += [ts()] + text() + [ts()]
        # consecutive pairs arise from adjacent segment ends/starts above;
        # randomly also end single-timestamp (text <|t|>)
        if rng.random() < 0.5:
            out += text() + [ts()]
    elif shape == 3:  # guaranteed single-timestamp ending
        out += [ts()] + text() + [ts()]
        out += text() + [ts()]
    elif shape == 4:  # timestamp-free body with a trailing <|0.00|>
        for _ in range(n_words):
            out += text()
        out += [ts_begin]  # exercises the `!= timestamp_begin` duration check
    elif shape == 5:  # body ts then plain text tail (no trailing ts)
        out += [ts()] + text() + [ts()]
        out += text()
    elif shape == 6:
        # consecutive pair mid-stream, text tail, NO single-ts ending: the
        # published loop advances by the last pair's boundary timestamp and
        # re-decodes the tail in the next window
        out += [ts()] + text() + [ts(), ts()] + text()
    else:  # shape == 7: output ends exactly on a consecutive pair
        out += [ts()] + text() + [ts(), ts()]
    return out


def _make_script(rng, tok, temperatures, max_windows, max_ts_offset):
    """Precompute (window, temperature) -> scripted outcome, with gate
    values drawn to exercise fallback and no-speech paths."""
    table = {}
    for w in range(max_windows):
        for t in temperatures:
            table[(w, float(t))] = (
                _gen_tokens(rng, tok, max_ts_offset),
                float(rng.uniform(-2.0, 0.0)),   # avg_logprob
                float(rng.uniform(0.5, 3.0)),    # compression_ratio
                float(rng.uniform(0.0, 1.0)),    # no_speech_prob
            )
    return table


def _install_stub(monkeypatch, tok, script, temperatures, prompt_log):
    """decoding.decode stub: replays the script; counts windows by ladder
    restarts (decode_with_fallback always begins at temperatures[0])."""
    state = {"w": -1}

    def stub(params, dims, tokenizer, mel, options=None, **kw):
        t = float(options.temperature)
        if t == float(temperatures[0]):
            state["w"] += 1
            prompt_log.append(
                None if options.prompt is None else list(options.prompt))
        tokens, avg_lp, cr, nsp = script[(state["w"], t)]
        return decoding.DecodingResult(
            language="en", tokens=list(tokens),
            text=tok.decode([x for x in tokens if x < tok.eot]),
            avg_logprob=avg_lp, no_speech_prob=nsp, temperature=t,
            compression_ratio=cr)

    monkeypatch.setattr(decoding, "decode", stub)
    return state


def _compare(out, exp, tok):
    assert out["text"] == exp["text"]
    assert len(out["segments"]) == len(exp["segments"])
    for got, want in zip(out["segments"], exp["segments"]):
        for key in ("id", "seek", "tokens", "text", "temperature",
                    "avg_logprob", "compression_ratio", "no_speech_prob"):
            assert got[key] == want[key], (key, got, want)
        assert got["start"] == pytest.approx(want["start"], abs=1e-9)
        assert got["end"] == pytest.approx(want["end"], abs=1e-9)


LADDERS = [(0.0,), (0.0, 0.4), (0.0, 0.4, 0.8), (0.2, 0.6, 1.0)]


def test_seek_loop_matches_published_oracle(tok_dims, monkeypatch):
    """60 random configurations: ladder x gates x conditioning x initial
    prompt x timestamp patterns, all compared field-by-field to the oracle
    (prompt_bucket=1 = the published exact-length conditioning context)."""
    tok, dims = tok_dims
    window_frames = 2 * dims.n_audio_ctx
    master = np.random.default_rng(20260818)
    for draw in range(60):
        rng = np.random.default_rng(master.integers(2**63))
        temperatures = LADDERS[rng.integers(0, len(LADDERS))]
        crt = float(rng.uniform(1.0, 2.5)) if rng.random() < 0.7 else None
        lpt = float(rng.uniform(-1.5, -0.5)) if rng.random() < 0.7 else None
        nst = float(rng.uniform(0.3, 0.9)) if rng.random() < 0.7 else None
        cond = bool(rng.random() < 0.8)
        initial_prompt = "seed words" if rng.random() < 0.3 else None
        n_samples = int(rng.integers(
            int(0.4 * window_frames), int(3.6 * window_frames))
        ) * constants.HOP_LENGTH
        audio = rng.normal(0, 0.05, n_samples).astype(np.float32)
        content_frames = audio.size // constants.HOP_LENGTH
        # every advance is >= 2 frames, so window count is bounded by
        # content_frames/2 (+1 for the final partial window)
        max_windows = content_frames // 2 + 2
        # keep scripted timestamps small so consecutive-pair advances move
        # less than a window (multi-decode-per-region paths get exercised)
        max_ts_offset = max(2, window_frames // 4)
        script = _make_script(rng, tok, temperatures, max_windows,
                              max_ts_offset)

        prompt_log = []
        _install_stub(monkeypatch, tok, script, temperatures, prompt_log)
        out = T.transcribe(
            None, dims, tok, audio, temperature=temperatures,
            compression_ratio_threshold=crt, logprob_threshold=lpt,
            no_speech_threshold=nst, condition_on_previous_text=cond,
            initial_prompt=initial_prompt, prompt_bucket=1, language="en")

        initial_tokens = (tok.encode(" " + initial_prompt.strip())
                          if initial_prompt else [])
        exp = published_transcribe(
            lambda w, t: script[(w, float(t))], content_frames, window_frames,
            tok, temperatures, crt, lpt, nst, cond, initial_tokens)

        _compare(out, exp, tok)
        assert prompt_log == exp["prompts"], (draw, prompt_log, exp["prompts"])
        assert out["language"] == "en"


def test_prompt_bucketing_is_a_published_prompt_suffix(tok_dims, monkeypatch):
    """With the default prompt_bucket=32, every conditioning prompt must be a
    suffix of the published exact context, bucket-aligned (or the whole
    context when shorter than one bucket), capped at 192 tokens — and the
    segment output must be unchanged (the stub's outcomes depend only on the
    window index, so any segment drift would mean seek-arithmetic damage)."""
    tok, dims = tok_dims
    window_frames = 2 * dims.n_audio_ctx
    rng = np.random.default_rng(7)
    temperatures = (0.0,)
    n_samples = int(3.2 * window_frames) * constants.HOP_LENGTH
    audio = rng.normal(0, 0.05, n_samples).astype(np.float32)
    content_frames = audio.size // constants.HOP_LENGTH
    script = _make_script(rng, tok, temperatures, content_frames // 2 + 2,
                          max(2, window_frames // 4))

    prompt_log = []
    _install_stub(monkeypatch, tok, script, temperatures, prompt_log)
    out = T.transcribe(None, dims, tok, audio, temperature=temperatures,
                       compression_ratio_threshold=None,
                       logprob_threshold=None, no_speech_threshold=None,
                       prompt_bucket=32, language="en")

    exp = published_transcribe(
        lambda w, t: script[(w, float(t))], content_frames, window_frames,
        tok, temperatures, None, None, None, True, [])
    _compare(out, exp, tok)
    assert len(prompt_log) == len(exp["prompts"])
    for got, full in zip(prompt_log, exp["prompts"]):
        full = full or []
        got = got or []
        assert got == full[len(full) - len(got):]  # suffix
        assert len(got) <= 192
        if len(full) >= 32:
            assert len(got) % 32 == 0
        else:
            assert got == full
