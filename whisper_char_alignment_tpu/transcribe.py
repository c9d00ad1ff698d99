"""Long-form transcription: the ``whisper.transcribe`` equivalent.

The reference repo never calls ``whisper.transcribe`` (it drives
``whisper.decode`` per <=30 s utterance — infer_ali.py:60), but the dependency
ships it and long-form users rely on it. This module implements the published
algorithm over this framework's decoder:

- one log-mel of the whole audio with 30 s of zero padding appended (the
  dynamic-range clip is global, as published);
- a seek loop over 30 s windows: decode, then advance ``seek`` by the parsed
  timestamp tokens (consecutive-timestamp pairs split the window into
  segments; a single trailing timestamp or no timestamps consumes the window);
- temperature fallback: retry at increasing temperatures when the result's
  compression ratio or average logprob crosses the thresholds (beam options
  dropped at t > 0, best_of dropped at t == 0, exactly like the published
  ``decode_with_fallback``);
- no-speech skipping: windows with ``no_speech_prob`` above the threshold are
  skipped unless the logprob says the decoder was confident anyway;
- ``condition_on_previous_text``: prior output tokens ride into the next
  window via DecodingOptions.prompt, reset after a high-temperature fallback.

Returns the published schema: ``{"text", "segments": [{id, seek, start, end,
text, tokens, temperature, avg_logprob, compression_ratio, no_speech_prob}],
"language"}``.

TPU notes: the seek loop is host-side by nature (each window's decode length
and seek advance depend on the previous window's output). The mel shape is
fixed per window, and jit signature growth from the rolling conditioning
prompt is bounded by rounding the kept context down to ``prompt_bucket``-token
steps (~7 signatures per run; ``prompt_bucket=1`` restores the published
exact-length trim at a compile per distinct length); word-timing token arrays
are eot-padded to 32-token buckets under a token_len mask for the same
reason. The full-audio mel is one device launch, padded up to a 30 s multiple
so its signature count is bounded too; the sliced window values are
bit-identical to per-call whisper windows (zero padding beyond the published
30 s tail only touches frames past every window this loop reads).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import constants
from .audio.mel import log_mel_spectrogram, pad_or_trim
from .models import decoding

# published merge_punctuations defaults
_PREPEND_PUNCT = "\"'“¿([{-"
_APPEND_PUNCT = "\"'.。,，!！?？:：”)]}、"


def _merge_punctuations(words: List[dict], prepended: str, appended: str):
    """Published merge_punctuations: a leading-punctuation word is folded into
    the word after it, a trailing-punctuation word into the word before it
    (the punctuation word's own interval is dropped, as published)."""
    i, j = len(words) - 2, len(words) - 1
    while i >= 0:
        prev, follow = words[i], words[j]
        if prev["word"].startswith(" ") and prev["word"].strip() in prepended:
            follow["word"] = prev["word"] + follow["word"]
            follow["tokens"] = prev["tokens"] + follow["tokens"]
            prev["word"] = ""
            prev["tokens"] = []
        else:
            j = i
        i -= 1
    i, j = 0, 1
    while j < len(words):
        prev, follow = words[i], words[j]
        if not prev["word"].endswith(" ") and follow["word"] in appended:
            prev["word"] = prev["word"] + follow["word"]
            prev["tokens"] = prev["tokens"] + follow["tokens"]
            follow["word"] = ""
            follow["tokens"] = []
        else:
            i = j
        j += 1
    return [w for w in words if w["word"]]


def _resolved_sot_sequence(tokenizer, language: Optional[str],
                           task: str) -> List[int]:
    """The sot sequence with the RESOLVED language/task tokens patched in —
    the published find_alignment builds its tokenizer per the transcription
    language and task; the raw ``tokenizer.sot_sequence`` may carry a
    different construction-time default. The token values come from the SAME
    helper decode() patches its prompt with (decoding.resolved_special_tokens)
    so the capture pass and the decode pass can never drift apart."""
    sot_seq = list(tokenizer.sot_sequence)
    lang_tok, task_tok = decoding.resolved_special_tokens(tokenizer, language,
                                                          task)
    if lang_tok is not None and len(sot_seq) >= 2:
        sot_seq[1] = lang_tok
    if task_tok is not None and len(sot_seq) >= 3:
        sot_seq[2] = task_tok
    return sot_seq


def _window_word_timings(params, dims, tokenizer, mel_segment, text_tokens,
                         n_frames: int, alignment_heads, word_aggr: str,
                         compute_dtype, sot_seq: List[int]) -> Optional[List[dict]]:
    """Word timings for one window's concatenated text tokens.

    ``word_aggr='default'`` replicates the published find_alignment recipe
    (hand-picked alignment heads, z-norm, medfilt 7) — the same path as the
    reference's ``--default_whisper_timing``; ``word_aggr='topk'`` uses the
    paper's unsupervised top-k saliency head selection instead (this
    framework's native aligner). ``sot_seq`` carries the resolved
    language/task tokens. Returns [{word, tokens, start, end, probability}]
    with window-relative times, or None when unalignable."""
    from .align import timing
    from .parallel.mesh import pad_to_multiple

    sot_len = len(sot_seq)
    tokens = [*sot_seq, tokenizer.no_timestamps, *text_tokens, tokenizer.eot]
    if len(tokens) > dims.n_text_ctx or not text_tokens:
        return None
    # eot-pad to a 32-multiple token bucket (masked by token_len, proven
    # equal to exact shapes) so jit signatures stay bounded across windows
    t_bucket = min(dims.n_text_ctx, pad_to_multiple(len(tokens), 32))
    arr = np.full((1, t_bucket), tokenizer.eot, np.int32)
    arr[0, :len(tokens)] = tokens
    arr = jnp.asarray(arr)
    tl = jnp.asarray([len(tokens)], jnp.int32)
    fl = jnp.asarray([max(1, min(n_frames, dims.n_audio_ctx))], jnp.int32)
    mel1 = jnp.asarray(mel_segment)[None]
    token_probs = None
    if word_aggr == "topk":
        attn, _ = timing.get_attentions(params, dims, mel1, arr, tl, fl,
                                        medfilt_width=7, qk_scale=1.0,
                                        compute_dtype=compute_dtype,
                                        return_logits=False)
        jf, _, _ = timing.force_align_batch(attn, tl, fl, sot_len, "topk", 10)
    else:
        jf, probs, _ = timing.default_find_alignment_batch(
            params, dims, mel1, arr, tl, fl, alignment_heads,
            eot=tokenizer.eot, medfilt_width=7, qk_scale=1.0,
            sot_len=sot_len, compute_dtype=compute_dtype)
        token_probs = np.asarray(probs)[0][:len(text_tokens)]
    words, word_tokens = tokenizer.split_to_word_tokens(
        list(text_tokens) + [tokenizer.eot])
    if len(word_tokens) <= 1:
        return None
    wb = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))
    jf1 = np.asarray(jf)[0][:len(text_tokens) + 1]
    starts, ends = timing.jump_frames_to_times(jf1, wb)
    out = []
    for k, (w, wt) in enumerate(zip(words[:-1], word_tokens[:-1])):
        prob = (float(np.mean(token_probs[wb[k]:wb[k + 1]]))
                if token_probs is not None else None)
        out.append({"word": w, "tokens": list(wt),
                    "start": float(starts[k]), "end": float(ends[k]),
                    "probability": prob})
    return _merge_punctuations(out, _PREPEND_PUNCT, _APPEND_PUNCT)


def _window_frames(dims) -> int:
    # test models may use a shorter audio context
    return 2 * dims.n_audio_ctx


def decode_with_fallback(params, dims, tokenizer, mel_segment,
                         options: decoding.DecodingOptions,
                         temperatures: Sequence[float],
                         compression_ratio_threshold: Optional[float],
                         logprob_threshold: Optional[float],
                         no_speech_threshold: Optional[float],
                         compute_dtype=jnp.float32, rng=None):
    """Published fallback ladder: first temperature whose result passes the
    compression-ratio and logprob gates wins; a no-speech window never
    triggers a retry.

    Library-facing helper (the ``whisper.transcribe.decode_with_fallback``
    equivalent). The seek loop itself inlines the SAME ladder inside
    :func:`_seek_machine` (each decode yielded to the driver so batched
    serving can group them) — change the gate semantics in BOTH places, with
    tests/test_transcribe.py and the transcribe fuzz as the lock."""
    result = None
    for t in temperatures:
        if t > 0:
            opts = dataclasses.replace(options, temperature=t,
                                       beam_size=None, patience=None)
        else:
            opts = dataclasses.replace(options, temperature=t, best_of=None)
        result = decoding.decode(params, dims, tokenizer,
                                 jnp.asarray(mel_segment), opts,
                                 compute_dtype=compute_dtype, rng=rng)
        needs_fallback = False
        if (compression_ratio_threshold is not None
                and result.compression_ratio > compression_ratio_threshold):
            needs_fallback = True  # too repetitive
        if (logprob_threshold is not None
                and result.avg_logprob < logprob_threshold):
            needs_fallback = True  # average log probability too low
        if (no_speech_threshold is not None
                and result.no_speech_prob > no_speech_threshold):
            needs_fallback = False  # silence: skip, don't retry
        if not needs_fallback:
            break
    return result


def _seek_machine(params, dims, tokenizer,
                  audio: Union[np.ndarray, jnp.ndarray],
                  *,
                  temperature: Union[float, Sequence[float]] = (
                      0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                  compression_ratio_threshold: Optional[float] = 2.4,
                  logprob_threshold: Optional[float] = -1.0,
                  no_speech_threshold: Optional[float] = 0.6,
                  condition_on_previous_text: bool = True,
                  initial_prompt: Optional[str] = None,
                  prompt_bucket: int = 32,
                  word_timestamps: bool = False,
                  word_aggr: str = "default",
                  model_name: Optional[str] = None,
                  compute_dtype=jnp.float32,
                  rng=None,
                  verbose: Optional[bool] = None,
                  **decode_options):
    """The seek loop as a resumable GENERATOR: it yields device-work requests
    ({"kind": "decode"|"detect", "mel_segment", "options", "rng",
    "batchable"}) and receives their results via ``send``; the final
    transcribe dict arrives as the generator's return value.

    This inversion is what makes cross-request batching possible
    (VERDICT r04 #7): the per-window decode is the only device work in the
    loop, so a driver holding N machines can group their pending windows into
    one batched decode launch (:func:`transcribe_batched`) while the solo
    driver (:func:`transcribe`) executes each request directly — both run the
    IDENTICAL seek-loop/host logic. ``batchable`` marks deterministic greedy
    requests (t == 0, no beam): temperature-fallback retries carry a per-seek
    rng and run solo."""
    if isinstance(temperature, (int, float)):
        temperatures = [float(temperature)]
    else:
        temperatures = [float(t) for t in temperature]
    # the published loop overwrites any caller-supplied prompt with the
    # rolling context every window; drop it rather than crash on the
    # duplicate keyword below
    decode_options.pop("prompt", None)

    audio = np.asarray(audio, np.float32).reshape(-1)
    window_frames = _window_frames(dims)
    window_samples = window_frames * constants.HOP_LENGTH
    # published padding: a full window of zeros after the content; round the
    # total up to a window multiple so the mel jit signature count is bounded
    total = audio.size + window_samples
    total = ((total + window_samples - 1) // window_samples) * window_samples
    padded = np.zeros((total,), np.float32)
    padded[:audio.size] = audio
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(padded),
                                         n_mels=dims.n_mels))
    content_frames = min(mel.shape[-1] - window_frames,
                         audio.size // constants.HOP_LENGTH)
    # resolve full names up front ("English" -> "en", ValueError on junk) so
    # the result dict, the per-window DecodingOptions, and the word-timing
    # capture all see the same code (published transcribe does the same via
    # its tokenizer construction) — including on the zero-content early
    # return, which must not report a different language value than the
    # same call with longer audio
    from .text.tokenizer import normalize_language

    language = normalize_language(decode_options.pop("language", None))
    if content_frames <= 0:
        # published behavior: with no content frames the seek loop runs zero
        # windows — empty / sub-hop audio yields an empty result rather than
        # one all-zero window (which could hallucinate a segment)
        return {"text": "", "segments": [],
                "language": language or tokenizer.language or "en"}

    if language is None:
        if tokenizer.is_multilingual and len(tokenizer.sot_sequence) >= 2:
            seg0 = pad_or_trim(jnp.asarray(mel), window_frames, axis=-1)
            language = yield {"kind": "detect", "mel_segment": seg0}
        else:
            language = tokenizer.language or "en"

    input_stride = window_frames // dims.n_audio_ctx  # 2: mel frames / token
    time_precision = (input_stride * constants.HOP_LENGTH
                      / constants.SAMPLE_RATE)  # 0.02 s
    frames_per_second = constants.SAMPLE_RATE // constants.HOP_LENGTH

    all_tokens: List[int] = []
    all_segments: List[dict] = []
    prompt_reset_since = 0
    if initial_prompt is not None:
        initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
    else:
        initial_prompt_tokens = []

    ts_begin = tokenizer.timestamp_begin
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)
    seek = 0
    while seek < content_frames:
        time_offset = seek / frames_per_second
        segment_size = min(window_frames, content_frames - seek)
        segment_duration = segment_size / frames_per_second
        mel_segment = pad_or_trim(mel[..., seek:seek + window_frames],
                                  window_frames, axis=-1)

        # round the rolling conditioning prompt DOWN to a 32-token bucket of
        # its most recent tokens (cap 192 < the published 223-token trim):
        # each distinct prompt length is a distinct decode jit signature, and
        # remote TPU compiles cost minutes — dropping the oldest few context
        # tokens bounds the signature count at ~7 per run. prompt_bucket=1
        # restores the published exact-length behavior.
        ctx = all_tokens[prompt_reset_since:]
        if prompt_bucket > 1 and len(ctx) >= prompt_bucket:
            # floor to a bucket multiple, capped below the published 223 trim
            keep = min((len(ctx) // prompt_bucket) * prompt_bucket,
                       (192 // prompt_bucket) * prompt_bucket)
        else:
            keep = len(ctx)  # sub-bucket contexts (and prompt_bucket=1) exact
        opts = decoding.DecodingOptions(
            language=language,
            prompt=ctx[len(ctx) - keep:] or None,
            **decode_options)
        # published fallback ladder (decode_with_fallback), with each decode
        # yielded to the driver: first temperature whose result passes the
        # compression-ratio and logprob gates wins; a no-speech window never
        # triggers a retry
        result = None
        for t in temperatures:
            if t > 0:
                opts_t = dataclasses.replace(opts, temperature=t,
                                             beam_size=None, patience=None)
            else:
                opts_t = dataclasses.replace(opts, temperature=t, best_of=None)
            result = yield {
                "kind": "decode", "mel_segment": mel_segment,
                "options": opts_t, "rng": jax.random.fold_in(base_rng, seek),
                "batchable": (t == 0 and opts_t.beam_size is None)}
            needs_fallback = False
            if (compression_ratio_threshold is not None
                    and result.compression_ratio
                    > compression_ratio_threshold):
                needs_fallback = True  # too repetitive
            if (logprob_threshold is not None
                    and result.avg_logprob < logprob_threshold):
                needs_fallback = True  # average log probability too low
            if (no_speech_threshold is not None
                    and result.no_speech_prob > no_speech_threshold):
                needs_fallback = False  # silence: skip, don't retry
            if not needs_fallback:
                break
        tokens = list(result.tokens)

        if no_speech_threshold is not None:
            should_skip = result.no_speech_prob > no_speech_threshold
            if (logprob_threshold is not None
                    and result.avg_logprob > logprob_threshold):
                should_skip = False  # confident despite the no-speech signal
            if should_skip:
                seek += segment_size
                continue

        def new_segment(start, end, seg_tokens):
            return {
                "seek": seek,
                "start": start,
                "end": end,
                "text": tokenizer.decode(
                    [t for t in seg_tokens if t < tokenizer.eot]),
                "tokens": list(seg_tokens),
                "temperature": result.temperature,
                "avg_logprob": result.avg_logprob,
                "compression_ratio": result.compression_ratio,
                "no_speech_prob": result.no_speech_prob,
            }

        current_segments: List[dict] = []
        is_ts = [t >= ts_begin for t in tokens]
        single_timestamp_ending = is_ts[-2:] == [False, True]
        consecutive = [k + 1 for k in range(len(tokens) - 1)
                       if is_ts[k] and is_ts[k + 1]]
        if consecutive:
            # pairs of consecutive timestamps delimit segments
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
                seek += segment_size  # no final pair: consume the window
            else:
                last_ts_pos = tokens[last_slice - 1] - ts_begin
                advance = last_ts_pos * input_stride
                # robustness deviation: a degenerate <|0.00|><|0.00|> pair
                # would advance 0 frames and loop forever (the published loop
                # shares this hazard); consume the window instead
                seek += advance if advance > 0 else segment_size
        else:
            duration = segment_duration
            ts_tokens = [t for t in tokens if t >= ts_begin]
            if ts_tokens and ts_tokens[-1] != ts_begin:
                duration = (ts_tokens[-1] - ts_begin) * time_precision
            current_segments.append(new_segment(
                time_offset, time_offset + duration, tokens))
            seek += segment_size

        if word_timestamps and current_segments:
            from .config import get_alignment_heads

            text_tokens = [t for seg in current_segments
                           for t in seg["tokens"] if t < tokenizer.eot]
            timings = _window_word_timings(
                params, dims, tokenizer, mel_segment, text_tokens,
                segment_size // input_stride,
                get_alignment_heads(model_name or "", dims), word_aggr,
                compute_dtype,
                _resolved_sot_sequence(tokenizer, language,
                                       decode_options.get("task",
                                                          "transcribe")))
            if timings:
                for w in timings:
                    w["start"] += time_offset
                    w["end"] += time_offset
                idx = 0
                for seg in current_segments:
                    n_text = sum(1 for t in seg["tokens"]
                                 if t < tokenizer.eot)
                    seg_words, consumed = [], 0
                    while idx < len(timings) and consumed < n_text:
                        seg_words.append(timings[idx])
                        consumed += len(timings[idx]["tokens"])
                        idx += 1
                    seg["words"] = seg_words
                    if seg_words:  # tighten to the aligned word span
                        seg["start"] = seg_words[0]["start"]
                        seg["end"] = seg_words[-1]["end"]

        if verbose:
            for seg in current_segments:
                print(f"[{seg['start']:.2f} --> {seg['end']:.2f}] "
                      f"{seg['text']}")

        for seg in current_segments:
            seg["id"] = len(all_segments)
            all_segments.append(seg)
            all_tokens.extend(seg["tokens"])
        if not condition_on_previous_text or result.temperature > 0.5:
            # high-temperature fallback output is unreliable context
            prompt_reset_since = len(all_tokens)

    text = tokenizer.decode(
        [t for t in all_tokens[len(initial_prompt_tokens):]
         if t < tokenizer.eot])
    return {"text": text, "segments": all_segments, "language": language}


def _execute_request(params, dims, tokenizer, req, compute_dtype):
    """Run one machine request directly (the solo driver's executor, and the
    batched driver's path for non-batchable requests)."""
    if req["kind"] == "detect":
        code, _ = decoding.detect_language(params, dims, tokenizer,
                                           jnp.asarray(req["mel_segment"]),
                                           compute_dtype=compute_dtype)
        return code
    return decoding.decode(params, dims, tokenizer,
                           jnp.asarray(req["mel_segment"]), req["options"],
                           compute_dtype=compute_dtype, rng=req["rng"])


def transcribe(params, dims, tokenizer,
               audio: Union[np.ndarray, jnp.ndarray],
               *, compute_dtype=jnp.float32, **kwargs) -> dict:
    """Transcribe 16 kHz mono ``audio`` of any length.

    ``kwargs`` are the seek-loop knobs plus DecodingOptions fields (language,
    beam_size, best_of, patience, length_penalty, prefix, suppress_tokens,
    ...); a caller-supplied ``prompt`` is dropped (the loop owns it, as
    published). ``prompt_bucket`` bounds decode jit signatures by keeping the
    rolling conditioning context in 32-token steps (1 = published exact
    lengths).

    ``word_timestamps=True`` attaches per-word ``{word, start, end,
    probability}`` lists to every segment by teacher-forced cross-attention
    alignment of each window's tokens: ``word_aggr='default'`` uses the
    published alignment-heads recipe (``model_name`` selects the head table),
    ``word_aggr='topk'`` uses the paper's unsupervised top-k saliency heads.
    Segment start/end are tightened to their words' span. Deviations from the
    published add_word_timestamps: no word-based seek refinement and no
    hallucination heuristics (both are opt-in refinements there).
    """
    gen = _seek_machine(params, dims, tokenizer, audio,
                        compute_dtype=compute_dtype, **kwargs)
    resp = None
    while True:
        try:
            req = gen.send(resp)
        except StopIteration as e:
            return e.value
        resp = _execute_request(params, dims, tokenizer, req, compute_dtype)


def _pad_pow2(n: int, cap: int) -> int:
    """Next power of two >= n (capped): bounds batched-decode jit signatures
    to ~log2(cap) distinct batch shapes."""
    b = 1
    while b < min(n, cap):
        b *= 2
    return min(b, cap)


def transcribe_batched(params, dims, tokenizer, audios,
                       *, compute_dtype=jnp.float32, max_batch: int = 8,
                       **kwargs) -> List[dict]:
    """Transcribe N audios with their seek-loop windows decoded in SHARED
    device launches (the serving-side answer to /transcribe serializing per
    request — VERDICT r04 #7).

    Each audio runs its own :func:`_seek_machine` (identical host logic to
    solo :func:`transcribe`); each round, every machine's pending window
    decode is grouped by (options minus prompt, prompt length, window shape)
    and executed as ONE batched ``decoding.decode`` with per-row conditioning
    prompts. Groupability in practice: window 1 of every request shares an
    empty prompt; later windows group whenever their prompt BUCKETS coincide
    (the 32-token prompt_bucket quantizes lengths, deliberately), and always
    under ``condition_on_previous_text=False``. Temperature-fallback retries
    (t > 0) and beam decodes run solo — they are rare and carry per-seek rngs.
    Language detection requests batch the same way.

    Batches are padded to a power of two (<= ``max_batch``) by repeating row
    0 so jit signatures stay bounded; padded rows' results are discarded.
    Per-request results are identical to solo ``transcribe`` (locked by
    tests/test_transcribe_batched.py).
    """
    gens = [_seek_machine(params, dims, tokenizer, a,
                          compute_dtype=compute_dtype, **kwargs)
            for a in audios]
    results: List[Optional[dict]] = [None] * len(gens)
    pending = {}
    for i, g in enumerate(gens):
        try:
            pending[i] = g.send(None)
        except StopIteration as e:
            results[i] = e.value

    def run_group(idxs):
        reqs = [pending[i] for i in idxs]
        kind = reqs[0]["kind"]
        b_pad = _pad_pow2(len(idxs), max_batch)
        rows = [np.asarray(r["mel_segment"]) for r in reqs]
        rows += [rows[0]] * (b_pad - len(rows))
        mels = jnp.asarray(np.stack(rows))
        if kind == "detect":
            det = decoding.detect_language(params, dims, tokenizer, mels,
                                           compute_dtype=compute_dtype)
            return {i: det[k][0] for k, i in enumerate(idxs)}
        base = dataclasses.replace(reqs[0]["options"], prompt=None)
        prompts = [r["options"].prompt or None for r in reqs]
        if prompts[0]:
            prows = [list(p) for p in prompts]
            prows += [prows[0]] * (b_pad - len(prompts))
            opts = dataclasses.replace(base, prompt=prows)
        else:
            opts = base
        out = decoding.decode(params, dims, tokenizer, mels, opts,
                              compute_dtype=compute_dtype)
        return {i: out[k] for k, i in enumerate(idxs)}

    while pending:
        groups: dict = {}
        solos = []
        for i, req in pending.items():
            opts = req.get("options")
            if req["kind"] == "detect":
                groups.setdefault(("detect", np.shape(req["mel_segment"])),
                                  []).append(i)
            elif req.get("batchable"):
                plen = len(opts.prompt) if opts.prompt else 0
                key = ("decode",
                       repr(dataclasses.replace(opts, prompt=None)), plen,
                       np.shape(req["mel_segment"]))
                groups.setdefault(key, []).append(i)
            else:
                solos.append(i)
        resps = {}
        for key, idxs in groups.items():
            # chunk oversized groups to max_batch-row launches
            for k0 in range(0, len(idxs), max_batch):
                resps.update(run_group(idxs[k0:k0 + max_batch]))
        for i in solos:
            resps[i] = _execute_request(params, dims, tokenizer, pending[i],
                                        compute_dtype)
        nxt = {}
        for i, resp in resps.items():
            try:
                nxt[i] = gens[i].send(resp)
            except StopIteration as e:
                results[i] = e.value
        pending = nxt
    return results
