"""Greedy autoregressive transcription with Whisper's decoding rules.

Replaces ``whisper.decode`` + ``DecodingOptions(language="en")`` (reference call
sites: infer_ali.py:40,50,60; probe_oracle.py:37,48,59; README.md:95,107). The
decode loop is a jitted ``lax.while_loop`` over a KV cache with the published logit
filters applied as vectorized masks each step:

1. SuppressBlank — " " and eot suppressed at the first sampled position;
2. SuppressTokens — non-speech symbols + [transcribe, translate, sot, sot_prev,
   sot_lm, no_speech] (the "-1" default suppress set);
3. ApplyTimestampRules — no_timestamps always suppressed; timestamps come in
   pairs (after a lone timestamp only another timestamp or eot; after a pair only
   text); timestamps are monotonic; the first sampled token must be a timestamp
   (capped by max_initial_timestamp); and when the summed timestamp probability
   exceeds the best text token, text is suppressed.

The prompt (sot sequence) is folded into the same loop as forced steps, so prefill
and sampling share one compiled program. Batched over utterances.
"""

from __future__ import annotations

import dataclasses
import functools
import zlib
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelDims
from . import whisper as wmodel

# plain Python float (weak-typed): a jnp scalar here would initialize the
# JAX backend at import time, before callers can force a platform
_NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class DecodingOptions:
    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0  # 0.0 = deterministic (greedy/beam); >0 samples
    sample_len: Optional[int] = None
    best_of: Optional[int] = None  # independent samples when temperature > 0
    beam_size: Optional[int] = None  # beam search (temperature must be 0)
    patience: Optional[float] = None  # beam search: collect round(beam*patience)
    length_penalty: Optional[float] = None  # None = simple length normalization
    # context conditioning (published _get_initial_tokens): `prompt` becomes a
    # [sot_prev] + tokens block BEFORE the sot sequence; `prefix` is forced
    # text AFTER it. Both accept a string (encoded with a leading space) or a
    # token list; both are forced tokens, not sampled.
    prompt: Optional[object] = None  # str | List[int]
    prefix: Optional[object] = None  # str | List[int]
    suppress_tokens: Optional[str] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0


@dataclasses.dataclass
class DecodingResult:
    language: str
    tokens: List[int]
    text: str
    avg_logprob: float
    no_speech_prob: float
    temperature: float
    compression_ratio: float
    # observability (no reference analog): sequence positions the loop reached
    # for the whole batch (prompt positions count whether prefilled or stepped)
    # — early exit on all-finished is visible here
    n_steps: int = 0
    # smallest sampled-step top1-top2 filtered-logit gap over the utterance,
    # populated only when margin tracking ran (kv_int8_guard and/or
    # kv_frames_guard set); NaN otherwise. Feeds
    # scripts/calibrate_kv_guard.py's bound selection.
    min_margin: float = float("nan")


def resolved_special_tokens(tokenizer, language: Optional[str],
                            task: Optional[str]):
    """(language_token, task_token) to patch into a sot sequence, or None
    where no patch applies. ONE home for the sot-patching index arithmetic —
    decode() and transcribe's word-timing capture must key the teacher-forced
    sequence identically (the published code rebuilds its tokenizer per
    options instead). Accepts full language names ('English') like the
    published API and raises on unknown/unsupported languages rather than
    silently decoding in the tokenizer's construction-time default."""
    from ..text.tokenizer import normalize_language

    lang_tok = task_tok = None
    if language is not None and tokenizer.is_multilingual:
        code = normalize_language(language)
        codes = tokenizer.all_language_codes
        if code not in codes:
            raise ValueError(
                f"language {language!r} is not supported by this tokenizer "
                f"({len(codes)} languages)")
        lang_tok = tokenizer.sot + 1 + codes.index(code)
    if task == "translate" and tokenizer.is_multilingual:
        task_tok = tokenizer.translate
    return lang_tok, task_tok


def _get_suppress_tokens(tokenizer, options: DecodingOptions) -> Tuple[int, ...]:
    """The published _get_suppress_tokens semantics: a comma string or an int
    iterable; a -1 ANYWHERE in the set expands to the non-speech symbols (and
    the -1 itself is dropped — it must never reach the mask build, where
    numpy would negative-index the LAST vocab entry, the highest timestamp
    token); the task/sot specials are always added."""
    opt = options.suppress_tokens
    if isinstance(opt, str):
        suppress = [int(t) for t in opt.split(",") if t.strip()]
    elif opt:
        suppress = [int(t) for t in opt]
    else:
        suppress = []
    if -1 in suppress:
        suppress = [t for t in suppress if t >= 0]
        suppress.extend(tokenizer.non_speech_tokens)
    suppress.extend([tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
                     tokenizer.sot_prev, tokenizer.sot_lm])
    if tokenizer.no_speech is not None:
        suppress.append(tokenizer.no_speech)
    return tuple(sorted(set(suppress)))


def apply_logit_filters(logits, cur_len, tokens, has_ts, last_ts_tok,
                        suppress_mask, blank_mask, vocab_ids, *,
                        sample_begin: int, ts_begin: int, eot: int,
                        no_timestamps: int,
                        max_initial_ts_index: Optional[int],
                        use_timestamps: bool):
    """The published per-step logit filters (SuppressBlank, SuppressTokens,
    ApplyTimestampRules) over a (B, V) batch of rows. ``cur_len`` is the
    position being predicted; ``tokens`` (B, total) holds the consumed prefix.
    Shared by the greedy loop and the beam/sampling loops (models/beam.py) so
    every decode mode applies bit-identical rules.

    All rule masks are OR-combined into ONE boolean select over the logits
    (plus the unavoidable second pass after the timestamp-probability
    reductions): the decode loop runs this every step, so each extra
    full-vocab elementwise pass costs HBM traffic."""
    sampled = cur_len - sample_begin  # how many sampled tokens exist
    first = sampled == 0
    add_mask = suppress_mask + jnp.where(first, blank_mask, 0.0)
    logits = logits + add_mask[None]
    if not use_timestamps:
        return logits
    # --- ApplyTimestampRules (one fused kill mask) ---
    last_tok = tokens[:, jnp.maximum(cur_len - 1, 0)]
    penult_tok = tokens[:, jnp.maximum(cur_len - 2, 0)]
    last_was = (sampled >= 1) & (last_tok >= ts_begin)
    penult_was = (sampled < 2) | (penult_tok >= ts_begin)
    is_ts_col = (vocab_ids >= ts_begin)[None]
    is_text_col = (vocab_ids < eot)[None]
    kill = (vocab_ids == no_timestamps)[None]
    kill = kill | ((last_was & penult_was)[:, None] & is_ts_col)
    kill = kill | ((last_was & ~penult_was)[:, None] & is_text_col)
    # monotonic timestamps: forbid [ts_begin, ts_last)
    ts_last = jnp.where(last_was & ~penult_was, last_ts_tok, last_ts_tok + 1)
    kill = kill | (has_ts[:, None] & is_ts_col
                   & (vocab_ids[None] < ts_last[:, None]))
    # first sampled token must be a timestamp, capped at max_initial_timestamp
    kill_first = ~is_ts_col
    if max_initial_ts_index is not None:
        kill_first = kill_first | (
            vocab_ids > ts_begin + max_initial_ts_index)[None]
    kill = kill | (first & kill_first)
    logits = jnp.where(kill, _NEG_INF, logits)
    # prefer timestamps when their total probability dominates any text
    # token. The published rule compares log_softmax values, but the shared
    # normalizer cancels in the comparison, so raw-logit reductions give the
    # same decision without materializing a (B, V) log_softmax each step.
    ts_lp = jax.scipy.special.logsumexp(logits[:, ts_begin:], axis=-1)
    max_text_lp = logits[:, :ts_begin].max(axis=-1)
    kill_text_all = (ts_lp > max_text_lp)[:, None] & (vocab_ids < ts_begin)[None]
    return jnp.where(kill_text_all, _NEG_INF, logits)


def _prefill_enabled() -> bool:
    """WCA_DECODE_PREFILL: 1 (default) consumes the decode prompt in one
    teacher-forced pass (the published decoder's first-forward shape — see
    :func:`whisper.decode_prefill`); 0 steps through prompt tokens one loop
    iteration each (the pre-round-4 behavior, kept as an A/B lever)."""
    import os

    v = os.environ.get("WCA_DECODE_PREFILL", "1")
    if v not in ("0", "1"):
        raise ValueError(f"WCA_DECODE_PREFILL={v!r}: expected 0 or 1")
    return v == "1"


@functools.partial(jax.jit, static_argnames=(
    "dims", "sample_begin", "max_steps", "ts_begin", "eot", "no_timestamps",
    "no_speech", "max_initial_ts_index", "use_timestamps", "compute_dtype",
    "kv_frames", "kv_int8", "sot_index", "attn_mode", "cross_mode",
    "track_margin", "prefill"))
def _decode_loop(params, dims: ModelDims, mel, prompt, suppress_mask, blank_mask,
                 *, sample_begin: int, max_steps: int, ts_begin: int, eot: int,
                 no_timestamps: int, no_speech: int,
                 max_initial_ts_index: Optional[int],
                 use_timestamps: bool, compute_dtype=jnp.float32,
                 kv_frames: Optional[int] = None, kv_int8: bool = False,
                 sot_index: int = 0, attn_mode: str = "xla",
                 cross_mode: str = "xla", track_margin: bool = False,
                 prefill: bool = True, xa_in=None):
    """Returns (tokens (B, total), sum_logprobs (B,), no_speech_probs (B,),
    n_steps (scalar: sequence positions reached — prompt positions count
    whether prefilled or stepped), xa (B, n_audio_ctx, d),
    cross_kv, min_margin (B,)). xa is the UNSLICED encoder states even when
    kv_frames trims the K/V; cross_kv is the per-layer cross K/V exactly as
    the loop used it (sliced/quantized under kv_frames/kv_int8 — reusable by
    the teacher-forced capture pass only in the parity-true full-frame
    f32/bf16 configuration). With ``track_margin`` each sampled step's
    top1-top2 filtered-logit gap is tracked and min_margin is the smallest
    over the utterance's sampled steps (+inf otherwise) — the guarded-int8
    re-decode trigger. ``xa_in`` supplies precomputed encoder states so a
    guarded re-decode skips the encoder pass."""
    b = mel.shape[0]
    n_vocab = dims.n_vocab
    total = sample_begin + max_steps
    vocab_ids = jnp.arange(n_vocab)

    xa = (xa_in if xa_in is not None
          else wmodel.encode_audio(params, dims, mel,
                                   compute_dtype=compute_dtype,
                                   attn_mode=attn_mode))
    xa_kv = xa
    if kv_frames is not None and kv_frames < xa.shape[1]:
        # opt-in: attend only to the first kv_frames encoder positions. The
        # decode loop re-reads all cross K/V every step (~295 MB/utt at medium,
        # the decode bottleneck); short utterances fit in a small bucket. NOT
        # bit-identical to the reference, which attends over the padded silence.
        xa_kv = xa[:, :kv_frames]
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa_kv,
                                          compute_dtype=compute_dtype,
                                          quantize=kv_int8)
    cache = wmodel.init_kv_cache(dims, b, total, dtype=compute_dtype)

    tokens0 = jnp.full((b, total), eot, jnp.int32)
    prompt2d = prompt if prompt.ndim == 2 else jnp.broadcast_to(
        prompt[None], (b, sample_begin))  # per-item prompts (detected language)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt2d, (0, 0))

    def apply_filters(logits, i, tokens, has_ts, last_ts_tok):
        """i = current position being *predicted* (the new token's index)."""
        return apply_logit_filters(
            logits, i, tokens, has_ts, last_ts_tok, suppress_mask, blank_mask,
            vocab_ids, sample_begin=sample_begin, ts_begin=ts_begin, eot=eot,
            no_timestamps=no_timestamps,
            max_initial_ts_index=max_initial_ts_index,
            use_timestamps=use_timestamps)

    def cond(state):
        return (state[0] < total) & ~jnp.all(state[3])

    def body(state):
        (i, tokens, cache, finished, sum_lp, has_ts, last_ts_tok, ns_prob,
         min_margin) = state
        tok_in = jax.lax.dynamic_slice(tokens, (0, i - 1), (b, 1))
        logits, cache = wmodel.decode_step(params, dims, tok_in, i - 1, cache,
                                           cross_kv, compute_dtype=compute_dtype,
                                           cross_mode=cross_mode)
        # no-speech probability: softmax at the position right after sot
        # (consumed at i == sot_index + 1; sot_index > 0 under a conditioning
        # prompt). lax.cond so the full-vocab softmax pass only executes on
        # that one step, not every iteration
        if no_speech is not None:  # a no_speech-less tokenizer: stays NaN
            ns_prob = jax.lax.cond(
                i == sot_index + 1,
                lambda lg: jax.nn.softmax(lg, axis=-1)[:, no_speech],
                lambda lg: ns_prob, logits)
        is_prompt = i < sample_begin
        filtered = apply_filters(logits, i, tokens, has_ts, last_ts_tok)
        next_sampled = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
        if track_margin:
            # top1-top2 gap of the row the argmax decided on: the distance a
            # logit perturbation must exceed to flip this step's token.
            # Computed as a masked second max (mask exactly the argmax INDEX,
            # reduce again) — lax.top_k's sort measurably costs more than the
            # int8 win itself at medium (489->511 ms for 32 steps at B=16);
            # two (B, V) max reductions are HBM-cheap. An exact tie at the
            # top yields margin 0 -> flagged, the conservative direction.
            f32 = filtered.astype(jnp.float32)
            top1 = f32.max(axis=-1)
            second = jnp.where(vocab_ids[None, :] == next_sampled[:, None],
                               -jnp.inf, f32).max(axis=-1)
            margin = top1 - second
            active = ~is_prompt & ~finished
            min_margin = jnp.where(active,
                                   jnp.minimum(min_margin, margin), min_margin)
        # greedy picks the max, so its log-softmax value is max - logsumexp:
        # two row reductions instead of materializing (B, V) logprobs + gather
        max_lp = filtered.max(axis=-1)
        chosen_lp = max_lp - jax.scipy.special.logsumexp(filtered, axis=-1)
        prompt_tok = tokens[:, jnp.minimum(i, total - 1)]
        next_tok = jnp.where(is_prompt, prompt_tok,
                             jnp.where(finished, eot, next_sampled))
        sum_lp = jnp.where(is_prompt | finished, sum_lp, sum_lp + chosen_lp)
        new_finished = finished | (~is_prompt & (next_tok == eot))
        sampled_ts = ~is_prompt & ~finished & (next_tok >= ts_begin)
        has_ts = has_ts | sampled_ts
        last_ts_tok = jnp.where(sampled_ts, next_tok, last_ts_tok)
        tokens = jax.lax.dynamic_update_slice(
            tokens, next_tok[:, None], (0, jnp.minimum(i, total - 1)))
        return (i + 1, tokens, cache, new_finished, sum_lp, has_ts, last_ts_tok,
                ns_prob, min_margin)

    # no-speech prob is NaN when the tokenizer has no no_speech token (the
    # published result value for that tokenizer shape)
    ns_prob0 = (jnp.zeros((b,), jnp.float32) if no_speech is not None
                else jnp.full((b,), jnp.nan, jnp.float32))
    start = 1
    if prefill and sample_begin >= 2:
        # consume prompt positions 0..sample_begin-2 in one teacher-forced
        # pass instead of sample_begin-1 sequential loop iterations — the
        # published decoder's own first-forward shape (decode_prefill
        # docstring). The first loop iteration below (i = sample_begin)
        # consumes the last prompt token and predicts the first sampled one.
        # The no-speech probe position sot_index lands inside the prefill
        # whenever the sot sequence carries tokens after sot (multilingual);
        # otherwise (sot_index == sample_begin - 1) the in-loop probe at
        # i == sot_index + 1 still fires.
        ns_at = (sot_index if (no_speech is not None
                               and sot_index < sample_begin - 1) else None)
        pf_logits, cache = wmodel.decode_prefill(
            params, dims, tokens0[:, :sample_begin - 1], cache, cross_kv,
            compute_dtype=compute_dtype, cross_mode=cross_mode,
            logits_at=ns_at)
        if ns_at is not None:
            ns_prob0 = jax.nn.softmax(pf_logits, axis=-1)[:, no_speech]
        start = sample_begin
    state = (jnp.int32(start), tokens0, cache, jnp.zeros((b,), bool),
             jnp.zeros((b,), jnp.float32), jnp.zeros((b,), bool),
             jnp.zeros((b,), jnp.int32), ns_prob0,
             jnp.full((b,), jnp.inf, jnp.float32))
    # start = sample_begin when the prompt was prefilled above, else 1 (each
    # iteration i consumes tokens[i-1] and fills cache column i-1)
    (i, tokens, cache, finished, sum_lp, has_ts, last_ts_tok, ns_prob,
     min_margin) = jax.lax.while_loop(cond, body, state)
    # xa (unsliced) and cross_kv ride along so callers can reuse the encoder
    # states AND the per-layer cross K/V projections for the teacher-forced QK
    # capture without recomputing either
    return tokens, sum_lp, ns_prob, i - 1, xa, cross_kv, min_margin


class DecodeFuture:
    """Deferred decode results: device arrays with async host copies in flight.

    Lets the caller dispatch the next batch's device work before paying the
    host sync for this batch's transcripts (the runner's software pipeline).
    """

    def __init__(self, arrays, finalize):
        self._arrays = arrays
        for a in arrays:
            try:
                a.copy_to_host_async()
            except Exception:
                pass  # backends without async copy still work via np.asarray
        self._finalize = finalize
        self._results = None

    def result(self):
        if self._results is None:
            self._results = self._finalize(*[np.asarray(a)
                                             for a in self._arrays])
            self._arrays = None
        return self._results


# Default min-margin threshold for the guarded int8 K/V mode (logit units).
# An utterance re-decodes exactly unless EVERY sampled step's top1-top2
# filtered-logit gap exceeds this. tests/test_kv_int8.py calibrates the actual
# teacher-forced logit perturbation of int8 K/V and asserts guarded decode is
# transcript-identical to the exact path; override via
# WCA_KV_INT8_GUARD_MARGIN when a deployment has measured its own bound.
DEFAULT_KV_INT8_GUARD_MARGIN = 2.0


def default_guard_margin() -> float:
    import os

    return float(os.environ.get("WCA_KV_INT8_GUARD_MARGIN",
                                DEFAULT_KV_INT8_GUARD_MARGIN))


# Default min-margin threshold for the guarded frame-bucket mode (logit
# units). Bucketing removes the softmax mass the decode would have spent on
# pad-silence frames, so unlike int8's half-step bound the perturbation is
# not bounded a priori — the default is calibrated the same way
# (scripts/calibrate_kv_guard.py --mode bucket measures the teacher-forced
# logit perturbation on a deployment's own data); override via
# WCA_BUCKET_GUARD_MARGIN.
DEFAULT_BUCKET_GUARD_MARGIN = 2.0


def default_bucket_guard_margin() -> float:
    import os

    return float(os.environ.get("WCA_BUCKET_GUARD_MARGIN",
                                DEFAULT_BUCKET_GUARD_MARGIN))


def _decode_plan(params, dims: ModelDims, tokenizer, mel: jax.Array,
                 options: Optional[DecodingOptions], compute_dtype):
    """Host-side decode setup shared by :func:`decode` and
    :func:`decode_speculative`: language detection, the published initial
    token sequence (sot/prefix/prompt trimming quirks), sample_len clamping,
    suppress/blank masks, and DecodingTask._verify_options validation.

    Returns (options, single, mel(B,...), detected_langs, sample_begin,
    sample_len, sot_index, prompt_arr, suppress_mask, blank_mask,
    max_initial_ts_index)."""
    options = options or DecodingOptions()
    single = mel.ndim == 2
    if single:
        mel = mel[None]

    detected_langs = None
    if (options.language is None and tokenizer.is_multilingual
            and len(tokenizer.sot_sequence) >= 2):
        # published behavior: detect the language first, then decode with the
        # detected token in each item's sot sequence
        det = detect_language(params, dims, tokenizer, mel,
                              compute_dtype=compute_dtype)
        detected_langs = [c for c, _ in det]

    if options.without_timestamps:
        sot_seq = list(tokenizer.sot_sequence_including_notimestamps)
    else:
        sot_seq = list(tokenizer.sot_sequence)
    sample_len = options.sample_len or dims.n_text_ctx // 2
    # published _get_initial_tokens: forced prefix text after the sot sequence,
    # [sot_prev] + prompt tokens before it. Truthiness guards (not `is not
    # None`) match the published code: an empty-string/empty-list prompt or
    # prefix is skipped entirely (no bare sot_prev, no forced " " encoding).
    initial = list(sot_seq)
    if options.prefix:
        prefix_tokens = (tokenizer.encode(" " + options.prefix.strip())
                         if isinstance(options.prefix, str)
                         else list(options.prefix))
        # NB published quirk kept: with the default sample_len the slice is
        # [-0:], i.e. NO trimming (Python slicing semantics)
        max_prefix_len = dims.n_text_ctx // 2 - sample_len
        prefix_tokens = prefix_tokens[-max_prefix_len:]
        initial = initial + prefix_tokens
    prompt_rows = None  # per-row conditioning prompts (batched transcribe)
    if options.prompt:
        pr = options.prompt
        if isinstance(pr, str):
            prompt_tokens = tokenizer.encode(" " + pr.strip())
        elif (isinstance(pr, (list, tuple))
              and pr and isinstance(pr[0], (list, tuple, np.ndarray))):
            # a list of per-row token lists: every row carries its OWN
            # conditioning context (transcribe_batched groups windows by
            # prompt length, so equal lengths are an interface contract —
            # ragged rows would need per-row sample_begin, which the
            # fixed-shape loop deliberately does not have)
            prompt_rows = [list(map(int, r)) for r in pr]
            if not all(prompt_rows):
                raise ValueError("per-row prompts must be non-empty; pass "
                                 "prompt=None for promptless rows")
            lens = {len(r) for r in prompt_rows}
            if len(lens) != 1:
                raise ValueError(
                    f"per-row prompts must share one length, got {sorted(lens)}"
                    " — bucket by prompt length upstream")
            if len(prompt_rows) != mel.shape[0]:
                raise ValueError(
                    f"{len(prompt_rows)} per-row prompts for a batch of "
                    f"{mel.shape[0]}")
            prompt_tokens = prompt_rows[0]
        else:
            prompt_tokens = list(pr)
        # published trim: keep the most recent n_text_ctx // 2 - 1 tokens
        prompt_keep = len(prompt_tokens[-(dims.n_text_ctx // 2 - 1):])
        initial = ([tokenizer.sot_prev]
                   + prompt_tokens[-(dims.n_text_ctx // 2 - 1):] + initial)
    sample_begin = len(initial)
    sot_index = initial.index(tokenizer.sot)
    prompt_arr = np.asarray(initial, np.int32)
    codes = tokenizer.all_language_codes
    lang_pos = sot_index + 1  # ..., sot, language, task[, notimestamps]
    # decode in the requested language/task even if the tokenizer was built
    # with a different default (published decode builds its tokenizer per
    # options); full names resolve, junk raises (resolved_special_tokens)
    lang_tok, task_tok = resolved_special_tokens(tokenizer, options.language,
                                                 options.task)
    if lang_tok is not None and len(sot_seq) >= 2:
        prompt_arr = prompt_arr.copy()
        prompt_arr[lang_pos] = lang_tok
    if task_tok is not None and len(sot_seq) >= 3:
        # the task token follows the language token in the sot sequence
        prompt_arr = prompt_arr.copy()
        prompt_arr[lang_pos + 1] = task_tok
    if detected_langs is not None:
        prompt_arr = np.tile(prompt_arr[None], (mel.shape[0], 1))
        for i, code in enumerate(detected_langs):
            prompt_arr[i, lang_pos] = tokenizer.sot + 1 + codes.index(code)
    if prompt_rows is not None:
        # fill each row's own conditioning tokens into the [sot_prev]+prompt
        # block (positions 1 .. 1+prompt_keep); the sot sequence after it is
        # shared. Composes with detected_langs (both paths tile first).
        if prompt_arr.ndim == 1:
            prompt_arr = np.tile(prompt_arr[None], (mel.shape[0], 1))
        else:
            prompt_arr = prompt_arr.copy()
        for i, r in enumerate(prompt_rows):
            prompt_arr[i, 1:1 + prompt_keep] = r[-prompt_keep:]
    # the decoder's learned positions end at n_text_ctx (the published loop
    # breaks when the sequence outgrows the context)
    sample_len = max(0, min(sample_len, dims.n_text_ctx - sample_begin))

    suppress = _get_suppress_tokens(tokenizer, options)
    suppress_mask = np.zeros((dims.n_vocab,), np.float32)
    suppress_mask[list(suppress)] = -np.inf
    blank_mask = np.zeros((dims.n_vocab,), np.float32)
    if options.suppress_blank:
        blank_ids = tokenizer.encode(" ") + [tokenizer.eot]
        blank_mask[blank_ids] = -np.inf

    max_initial_ts_index = None
    if options.max_initial_timestamp is not None and not options.without_timestamps:
        max_initial_ts_index = round(options.max_initial_timestamp / 0.02)

    # published option validation (whisper DecodingTask._verify_options)
    if options.beam_size is not None and options.best_of is not None:
        raise ValueError("beam_size and best_of can't be given together")
    if options.temperature == 0 and options.best_of is not None:
        raise ValueError(
            "best_of with greedy sampling (temperature=0) is not compatible")
    if options.patience is not None and options.beam_size is None:
        raise ValueError("patience requires beam_size to be given")
    if (options.beam_size is not None and options.patience is not None
            and round(options.beam_size * options.patience) < 1):
        raise ValueError(
            f"invalid beam size ({options.beam_size}) or patience "
            f"({options.patience}): less than one finished candidate")
    if options.length_penalty is not None and not (
            0 <= options.length_penalty <= 1):
        raise ValueError(
            "length_penalty (alpha) should be a value between 0 and 1")

    return (options, single, mel, detected_langs, sample_begin, sample_len,
            sot_index, prompt_arr, suppress_mask, blank_mask,
            max_initial_ts_index)


def decode(params, dims: ModelDims, tokenizer, mel: jax.Array,
           options: Optional[DecodingOptions] = None,
           compute_dtype=jnp.float32,
           kv_frames: Optional[int] = None,
           kv_int8: bool = False,
           kv_int8_guard: Optional[float] = None,
           kv_frames_guard: Optional[float] = None,
           return_xa: bool = False,
           return_cross_kv: bool = False,
           async_results: bool = False,
           rng: Optional[jax.Array] = None):
    """Transcribe a batch of mels. mel: (B, n_mels, 2*n_audio_ctx) or single
    (n_mels, frames). Returns one DecodingResult per utterance (a single result
    for unbatched input, like the published API). With ``return_xa=True``
    returns ``(results, xa)`` where xa are the (device) encoder states, for
    reuse by the alignment capture pass; ``return_cross_kv=True`` additionally
    appends the loop's cross-attention K/V stacks (``(results, xa, cross_kv)``)
    so the capture pass can skip the K/V projections too — only reusable in the
    parity-true configuration (no kv_frames slicing, no int8). With
    ``async_results=True`` the results slot holds a :class:`DecodeFuture`
    (call ``.result()``) and no host sync happens in this call.

    Guards: ``kv_int8_guard`` / ``kv_frames_guard`` (logit-margin thresholds)
    turn the corresponding speedup into a transcript-parity mode — each
    sampled step's top1-top2 filtered-logit margin is tracked, and utterances
    whose minimum margin falls below the sum of the active guards are
    re-decoded with the guarded perturbations turned OFF (int8 → exact K/V,
    bucketed frames → the full padded window), reusing their encoder states.
    ``kv_int8_guard`` implies ``kv_int8``; ``kv_frames_guard`` requires
    ``kv_frames``. An unguarded mode passed alongside a guarded one is kept
    as-is in the re-decode (it was opted into without parity claims)."""
    (options, single, mel, detected_langs, sample_begin, sample_len,
     sot_index, prompt_arr, suppress_mask, blank_mask,
     max_initial_ts_index) = _decode_plan(params, dims, tokenizer, mel,
                                          options, compute_dtype)

    if options.beam_size is not None or options.temperature > 0:
        # beam search / temperature sampling live in models/beam.py; the greedy
        # while_loop below stays the lean production path. kv_frames / kv_int8
        # are greedy-loop-only speedups: fall back to the full-window,
        # un-quantized path here (same graceful-degrade pattern as the runner's
        # cross-K/V reuse gate) instead of crashing a pipeline that combines
        # decode_frame_bucket/kv_int8 with beam/sampling options. Loud so a
        # perf A/B doesn't silently measure the wrong path.
        if (kv_frames is not None or kv_int8 or kv_int8_guard is not None
                or kv_frames_guard is not None):
            import warnings

            warnings.warn(
                "kv_frames / kv_int8 are greedy-decode-only speedups; "
                "falling back to the full-window un-quantized path for "
                "beam/sampling decoding", stacklevel=2)
        kv_frames, kv_int8 = None, False
        kv_int8_guard, kv_frames_guard = None, None
        from . import beam as beam_mod

        from ..text.tokenizer import normalize_language

        # same resolution as the greedy finalize: report the CODE, raise on
        # junk — beam/sampling must not return a different language value
        # than greedy for identical options (round-4 self-review)
        norm_lang = normalize_language(options.language)
        langs = (detected_langs if detected_langs is not None
                 else [norm_lang or (tokenizer.language or "en")]
                 * mel.shape[0])
        return beam_mod.run(
            params, dims, tokenizer, mel, options, prompt_arr, suppress_mask,
            blank_mask, sample_begin=sample_begin, sample_len=sample_len,
            sot_index=sot_index,
            max_initial_ts_index=max_initial_ts_index, langs=langs,
            compute_dtype=compute_dtype,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
            single=single, return_xa=return_xa,
            return_cross_kv=return_cross_kv, async_results=async_results)

    if kv_int8_guard is not None:
        kv_int8 = True  # the guard is a mode of the int8 path
    if kv_frames_guard is not None and kv_frames is None:
        raise ValueError(
            "kv_frames_guard guards the frame-bucketed decode: pass kv_frames "
            "(decode_frame_bucket > 0) alongside it")
    # utterances are re-decoded when their min margin falls below the SUM of
    # the active guards: the two perturbations (quantization error, missing
    # pad-frame softmax mass) compose additively in the worst case
    guard = ((kv_int8_guard or 0.0) + (kv_frames_guard or 0.0)
             if (kv_int8_guard is not None or kv_frames_guard is not None)
             else None)
    loop_kwargs = dict(
        sample_begin=sample_begin, max_steps=sample_len,
        ts_begin=tokenizer.timestamp_begin, eot=tokenizer.eot,
        no_timestamps=tokenizer.no_timestamps, no_speech=tokenizer.no_speech,
        max_initial_ts_index=max_initial_ts_index,
        use_timestamps=not options.without_timestamps,
        compute_dtype=compute_dtype, sot_index=sot_index,
        # kernel-mode env flags resolve here, outside the jit, and key the trace
        attn_mode=wmodel._encoder_attn_mode(), prefill=_prefill_enabled())
    mel_j = jnp.asarray(mel)
    prompt_j = jnp.asarray(prompt_arr)
    suppress_j = jnp.asarray(suppress_mask)
    blank_j = jnp.asarray(blank_mask)
    tokens_d, sum_lp_d, ns_prob_d, n_steps_d, xa, cross_kv, margin_d = \
        _decode_loop(
            params, dims, mel_j, prompt_j, suppress_j, blank_j,
            kv_frames=kv_frames, kv_int8=kv_int8,
            track_margin=guard is not None,
            # cross_mode only matters for quantized K/V — keep it a constant
            # otherwise so flipping WCA_CROSS_ATTN cannot force a spurious
            # recompile of the un-quantized loop
            cross_mode=wmodel._cross_attn_mode() if kv_int8 else "xla",
            **loop_kwargs)

    def redecode_exact(flagged):
        """Guarded re-decode (skipping the encoder via the saved xa) for the
        whole batch; callers merge only the flagged rows. Only the GUARDED
        perturbations are turned off: an unguarded kv_frames/kv_int8 passed
        alongside a guarded one was opted into without parity claims and is
        kept as-is."""
        re_frames = None if kv_frames_guard is not None else kv_frames
        re_int8 = False if kv_int8_guard is not None else kv_int8
        et, es, en, _, _, _, _ = _decode_loop(
            params, dims, mel_j, prompt_j, suppress_j, blank_j,
            kv_frames=re_frames, kv_int8=re_int8, xa_in=xa,
            cross_mode=wmodel._cross_attn_mode() if re_int8 else "xla",
            **loop_kwargs)
        return np.asarray(et), np.asarray(es), np.asarray(en)

    def finalize(tokens, sum_lp, ns_prob, n_steps, margin=None):
        if margin is not None and guard is not None:
            # any utterance whose smallest sampled-step top1-top2 margin is
            # below the guard could have had a token flipped by the K/V
            # quantization error / the bucketed-away pad-frame softmax mass:
            # re-decode those rows with the guarded perturbations off. Rows
            # above the guard keep their transcript (their every step's
            # decision had more headroom than the calibrated bound).
            flagged = margin < guard
            if flagged.any():
                et, es, en = redecode_exact(flagged)
                tokens = np.where(flagged[:, None], et, tokens)
                sum_lp = np.where(flagged, es, sum_lp)
                ns_prob = np.where(flagged, en, ns_prob)
        n_steps = int(n_steps)
        from ..text.tokenizer import normalize_language

        norm_lang = normalize_language(options.language)
        results = []
        for k in range(tokens.shape[0]):
            # report the resolved CODE ("English" -> "en"), as published
            lang = (detected_langs[k] if detected_langs is not None
                    else norm_lang or (tokenizer.language or "en"))
            seq = tokens[k, sample_begin:].tolist()
            if tokenizer.eot in seq:
                seq = seq[:seq.index(tokenizer.eot)]
            text = tokenizer.decode(seq).strip()
            avg_lp = sum_lp[k] / (len(seq) + 1)
            try:
                ratio = len(text.encode()) / max(
                    len(zlib.compress(text.encode())), 1)
            except Exception:
                ratio = np.nan
            results.append(DecodingResult(
                language=lang, tokens=seq, text=text, avg_logprob=float(avg_lp),
                no_speech_prob=float(ns_prob[k]), temperature=options.temperature,
                compression_ratio=ratio, n_steps=n_steps,
                min_margin=(float(margin[k]) if margin is not None
                            else float("nan"))))
        return results[0] if single else results

    arrays = (tokens_d, sum_lp_d, ns_prob_d, n_steps_d)
    if guard is not None:
        arrays = arrays + (margin_d,)
    if async_results:
        # in guarded mode a triggered re-decode runs at .result() time — the
        # pipeline's dispatch stays sync-free either way
        out = DecodeFuture(arrays, finalize)
    else:
        out = finalize(*[np.asarray(a) for a in arrays])
    if return_cross_kv:
        return out, xa, cross_kv
    return (out, xa) if return_xa else out


def detect_language(params, dims: ModelDims, tokenizer, mel: jax.Array,
                    compute_dtype=jnp.float32):
    """Single-step language id: feed sot, take the argmax over language tokens
    (published detect_language semantics)."""
    single = mel.ndim == 2
    if single:
        mel = mel[None]
    xa = wmodel.encode_audio(params, dims, jnp.asarray(mel),
                             compute_dtype=compute_dtype)
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa,
                                          compute_dtype=compute_dtype)
    cache = wmodel.init_kv_cache(dims, mel.shape[0], 1, dtype=compute_dtype)
    sot = jnp.full((mel.shape[0], 1), tokenizer.sot, jnp.int32)
    logits, _ = wmodel.decode_step(params, dims, sot, jnp.int32(0), cache,
                                   cross_kv, compute_dtype=compute_dtype)
    lang_tokens = jnp.asarray(tokenizer.all_language_tokens)
    lang_logits = logits[:, lang_tokens]
    probs = jax.nn.softmax(lang_logits, axis=-1)
    idx = np.asarray(jnp.argmax(lang_logits, axis=-1))
    codes = [tokenizer.all_language_codes[i] for i in idx]
    probs_np = np.asarray(probs)
    out = [(c, {tokenizer.all_language_codes[j]: float(probs_np[i, j])
                for j in range(len(tokenizer.all_language_codes))})
           for i, c in enumerate(codes)]
    return out[0] if single else out


# ---------------------------------------------------------------------------
# Speculative greedy decoding (draft model + windowed verification)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "dims", "draft_dims", "k", "sample_begin", "max_steps", "ts_begin", "eot",
    "no_timestamps", "no_speech", "max_initial_ts_index", "use_timestamps",
    "compute_dtype", "sot_index", "attn_mode"))
def _speculative_loop(params, draft_params, dims: ModelDims,
                      draft_dims: ModelDims, mel, prompt, suppress_mask,
                      blank_mask, *, k: int, sample_begin: int, max_steps: int,
                      ts_begin: int, eot: int, no_timestamps: int,
                      no_speech: Optional[int],
                      max_initial_ts_index: Optional[int],
                      use_timestamps: bool, compute_dtype=jnp.float32,
                      sot_index: int = 0, attn_mode: str = "xla"):
    """Greedy decode with a DRAFT model proposing k tokens per round and the
    target model verifying them in ONE teacher-forced window pass
    (wmodel.decode_window). Exact by construction: a draft token is committed
    only when it equals the target's own filtered argmax at that position, and
    the first disagreeing position commits the target's choice instead — so
    the emitted sequence is bit-identical to the sequential greedy loop
    (tests/test_speculative.py locks transcripts, logprobs, and no-speech
    probabilities against :func:`_decode_loop` for arbitrary drafts).

    The sequential-step count drops from max_steps target steps to
    ~max_steps/(accepted+1) rounds of (k cheap draft steps + one target
    window); with a tiny draft against a medium target the round costs about
    one target step, so the speedup ≈ mean accepted prefix length + 1 —
    acceptance is checkpoint/data dependent, measured on real weights
    (scripts/profile_speculative.py gives the machine envelope).

    B == 1 only (enforced by the caller): rows would accept different prefix
    lengths and the shared-position loop deliberately has no per-row position
    machinery. Returns (tokens (1, total), sum_lp (1,), ns_prob (1,),
    n_steps, n_rounds, xa)."""
    b = mel.shape[0]
    n_vocab = dims.n_vocab
    total = sample_begin + max_steps
    buf = total + k + 1  # window/draft writes may run past the budget
    vocab_ids = jnp.arange(n_vocab)

    xa = wmodel.encode_audio(params, dims, mel, compute_dtype=compute_dtype,
                             attn_mode=attn_mode)
    cross_t = wmodel.precompute_cross_kv(params, dims, xa,
                                         compute_dtype=compute_dtype)
    xa_d = wmodel.encode_audio(draft_params, draft_dims, mel,
                               compute_dtype=compute_dtype,
                               attn_mode=attn_mode)
    cross_d = wmodel.precompute_cross_kv(draft_params, draft_dims, xa_d,
                                         compute_dtype=compute_dtype)
    cache_t = wmodel.init_kv_cache(dims, b, buf, dtype=compute_dtype)
    cache_d = wmodel.init_kv_cache(draft_dims, b, buf, dtype=compute_dtype)

    # positions >= n_text_ctx have no learned embedding; windows near the
    # budget edge may reach them (their logits are discarded by the commit
    # clamp, but the lookup must stay in bounds). Zero-pad the tables.
    def _pad_pos(p, need):
        dp = dict(p["decoder"])
        pe = dp["pos_emb"]
        if pe.shape[0] < need:
            dp["pos_emb"] = jnp.concatenate(
                [pe, jnp.zeros((need - pe.shape[0], pe.shape[1]), pe.dtype)])
        return {**p, "decoder": dp}

    params_w = _pad_pos(params, buf)
    draft_params_w = _pad_pos(draft_params, buf)

    tokens0 = jnp.full((b, buf), eot, jnp.int32)
    prompt2d = prompt if prompt.ndim == 2 else jnp.broadcast_to(
        prompt[None], (b, sample_begin))
    tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt2d, (0, 0))

    def apply_filters(logits, pos, tokens, has_ts, last_ts_tok):
        return apply_logit_filters(
            logits, pos, tokens, has_ts, last_ts_tok, suppress_mask,
            blank_mask, vocab_ids, sample_begin=sample_begin,
            ts_begin=ts_begin, eot=eot, no_timestamps=no_timestamps,
            max_initial_ts_index=max_initial_ts_index,
            use_timestamps=use_timestamps)

    ns_prob0 = (jnp.zeros((b,), jnp.float32) if no_speech is not None
                else jnp.full((b,), jnp.nan, jnp.float32))
    if sample_begin >= 2:
        # same one-pass prompt consumption as the exact loop's prefill
        ns_at = (sot_index if (no_speech is not None
                               and sot_index < sample_begin - 1) else None)
        pf_logits, cache_t = wmodel.decode_prefill(
            params_w, dims, tokens0[:, :sample_begin - 1], cache_t, cross_t,
            compute_dtype=compute_dtype, logits_at=ns_at)
        _, cache_d = wmodel.decode_prefill(
            draft_params_w, draft_dims, tokens0[:, :sample_begin - 1], cache_d,
            cross_d, compute_dtype=compute_dtype, logits_at=None)
        if ns_at is not None:
            ns_prob0 = jax.nn.softmax(pf_logits, axis=-1)[:, no_speech]

    def cond(state):
        return (state[0] < total) & ~jnp.all(state[4])

    def body(state):
        (L, tokens, cache_t, cache_d, finished, sum_lp, has_ts, last_ts_tok,
         ns_prob, n_rounds) = state

        # --- draft phase: k cheap autoregressive steps, filters applied so
        # the draft plays the same game the verifier scores ---
        def draft_step(j, carry):
            tokens, cache_d, d_has, d_last = carry
            pos = L - 1 + j
            tok_in = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))
            lg, cache_d = wmodel.decode_step(
                draft_params_w, draft_dims, tok_in, pos, cache_d, cross_d,
                compute_dtype=compute_dtype, cross_mode="xla")
            f = apply_filters(lg, pos + 1, tokens, d_has, d_last)
            d_tok = jnp.argmax(f, axis=-1).astype(jnp.int32)
            is_ts = d_tok >= ts_begin
            d_has = d_has | is_ts
            d_last = jnp.where(is_ts, d_tok, d_last)
            tokens = jax.lax.dynamic_update_slice(tokens, d_tok[:, None],
                                                  (0, pos + 1))
            return tokens, cache_d, d_has, d_last

        tokens, cache_d, _, _ = jax.lax.fori_loop(
            0, k, draft_step, (tokens, cache_d, has_ts, last_ts_tok))

        # --- verify phase: ONE target pass over [t_{L-1}, d_0 .. d_{k-1}] ---
        window = jax.lax.dynamic_slice(tokens, (0, L - 1), (b, k + 1))
        logits_w, cache_t = wmodel.decode_window(
            params_w, dims, window, L - 1, cache_t, cross_t,
            compute_dtype=compute_dtype, cross_mode="xla")

        if no_speech is not None:
            # the in-loop probe fires only when the prompt is too short for
            # the prefill to cover sot_index (mirrors the exact loop)
            ns_prob = jax.lax.cond(
                L == sot_index + 1,
                lambda lg: jax.nn.softmax(lg, axis=-1)[:, no_speech],
                lambda lg: ns_prob, logits_w[:, 0])

        # --- filter scan: the target's own greedy choice at each window
        # position, teacher-forced along the drafted prefix ---
        def verify_step(carry, lg_j):
            jj, s_has, s_last = carry
            pos = L + jj
            f = apply_filters(lg_j, pos, tokens, s_has, s_last)
            g = jnp.argmax(f, axis=-1).astype(jnp.int32)
            lp = f.max(axis=-1) - jax.scipy.special.logsumexp(f, axis=-1)
            d_tok = tokens[:, jnp.minimum(pos, buf - 1)]
            # evolve with g: below the first mismatch g == draft, and later
            # positions are discarded, so this walks the committed sequence
            is_ts = g >= ts_begin
            s_has2 = s_has | is_ts
            s_last2 = jnp.where(is_ts, g, s_last)
            return ((jj + 1, s_has2, s_last2),
                    (g, g == d_tok, lp, s_has2, s_last2))

        _, (g, match, lp, hs, ls) = jax.lax.scan(
            verify_step, (jnp.int32(0), has_ts, last_ts_tok),
            logits_w.transpose(1, 0, 2))
        g = g[:, 0]           # (k+1,) — b == 1
        match = match[:, 0]
        lp = lp[:, 0]

        # --- acceptance: longest matching draft prefix + the target's own
        # token at the first mismatch (or the bonus token when all k match) ---
        no_match = ~match.at[k].set(False)  # row k always commits the target
        m = jnp.argmax(no_match).astype(jnp.int32)  # first mismatch index
        is_eot = (g == eot) & (jnp.arange(k + 1) <= m)
        any_eot = jnp.any(is_eot)
        e = jnp.where(any_eot, jnp.argmax(is_eot), m).astype(jnp.int32)
        c = jnp.minimum(e + 1, total - L)  # committed count this round
        finished2 = finished | (any_eot & (e + 1 <= total - L))

        # write the corrected/bonus token at its position (safe even when the
        # commit clamp cut earlier: positions >= L+c are masked to eot at the
        # end and never read as committed state)
        tokens = jax.lax.dynamic_update_slice(
            tokens, g[e][None, None], (0, L + e))
        commit = jnp.arange(k + 1) < c
        sum_lp = sum_lp + jnp.sum(jnp.where(commit, lp, 0.0))[None]
        has_ts = hs[c - 1]
        last_ts_tok = ls[c - 1]
        return (L + c, tokens, cache_t, cache_d, finished2, sum_lp, has_ts,
                last_ts_tok, ns_prob, n_rounds + 1)

    state = (jnp.int32(sample_begin), tokens0, cache_t, cache_d,
             jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32),
             jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32), ns_prob0,
             jnp.int32(0))
    (L, tokens, _, _, finished, sum_lp, _, _, ns_prob,
     n_rounds) = jax.lax.while_loop(cond, body, state)
    # uncommitted draft/window residue past the final position -> eot
    tokens = jnp.where(jnp.arange(buf)[None, :] < L, tokens, eot)[:, :total]
    return tokens, sum_lp, ns_prob, L - 1, n_rounds, xa


def decode_speculative(params, dims: ModelDims, draft_params,
                       draft_dims: ModelDims, tokenizer, mel: jax.Array,
                       options: Optional[DecodingOptions] = None,
                       draft_k: int = 4, compute_dtype=jnp.float32,
                       return_info: bool = False):
    """Greedy :func:`decode` accelerated by a draft model — exact transcripts.

    The draft (a smaller Whisper sharing the tokenizer, e.g. tiny drafting
    for medium) proposes ``draft_k`` tokens per round; the target verifies
    them in one teacher-forced window pass and commits the longest prefix
    that matches its own greedy choices, plus one target token. Output is
    bit-identical to ``decode(...)`` with the same options — speculation
    changes only how many sequential target steps the transcript costs.

    Single-utterance only (mel (n_mels, F) or (1, n_mels, F)): speculative
    rows accept different prefix lengths, and the batch loop's shared
    position counter deliberately has no per-row machinery (batched
    alignment keeps the exact loop, where cross-utterance batching already
    amortizes the weight stream). Greedy only (no beam/best_of/temperature).

    ``return_info=True`` appends {"n_rounds", "n_steps"} for
    acceptance-rate telemetry (rounds ≈ steps/(accepted+1))."""
    if dims.n_vocab != draft_dims.n_vocab:
        raise ValueError(
            f"draft vocab {draft_dims.n_vocab} != target {dims.n_vocab}: the "
            "draft must share the target's tokenizer")
    if dims.n_mels != draft_dims.n_mels:
        raise ValueError(
            f"draft n_mels {draft_dims.n_mels} != target {dims.n_mels}: pick "
            "a draft with the target's mel frontend")
    if draft_k < 1:
        raise ValueError(f"draft_k must be >= 1, got {draft_k}")
    (options, single, mel, detected_langs, sample_begin, sample_len,
     sot_index, prompt_arr, suppress_mask, blank_mask,
     max_initial_ts_index) = _decode_plan(params, dims, tokenizer, mel,
                                          options, compute_dtype)
    if mel.shape[0] != 1:
        raise ValueError(
            f"decode_speculative is single-utterance (got batch "
            f"{mel.shape[0]}); batched alignment uses the exact loop")
    if options.beam_size is not None or options.best_of is not None \
            or options.temperature > 0:
        raise ValueError("decode_speculative is greedy-only: beam/best_of/"
                         "temperature>0 use decode()")

    tokens_d, sum_lp_d, ns_prob_d, n_steps_d, n_rounds_d, _xa = \
        _speculative_loop(
            params, draft_params, dims, draft_dims, jnp.asarray(mel),
            jnp.asarray(prompt_arr), jnp.asarray(suppress_mask),
            jnp.asarray(blank_mask), k=int(draft_k),
            sample_begin=sample_begin, max_steps=sample_len,
            ts_begin=tokenizer.timestamp_begin, eot=tokenizer.eot,
            no_timestamps=tokenizer.no_timestamps,
            no_speech=tokenizer.no_speech,
            max_initial_ts_index=max_initial_ts_index,
            use_timestamps=not options.without_timestamps,
            compute_dtype=compute_dtype, sot_index=sot_index,
            attn_mode=wmodel._encoder_attn_mode())

    from ..text.tokenizer import normalize_language

    tokens = np.asarray(tokens_d)
    sum_lp = np.asarray(sum_lp_d)
    ns_prob = np.asarray(ns_prob_d)
    norm_lang = normalize_language(options.language)
    lang = (detected_langs[0] if detected_langs is not None
            else norm_lang or (tokenizer.language or "en"))
    seq = tokens[0, sample_begin:].tolist()
    if tokenizer.eot in seq:
        seq = seq[:seq.index(tokenizer.eot)]
    text = tokenizer.decode(seq).strip()
    avg_lp = sum_lp[0] / (len(seq) + 1)
    try:
        ratio = len(text.encode()) / max(len(zlib.compress(text.encode())), 1)
    except Exception:
        ratio = np.nan
    result = DecodingResult(
        language=lang, tokens=seq, text=text, avg_logprob=float(avg_lp),
        no_speech_prob=float(ns_prob[0]), temperature=options.temperature,
        compression_ratio=ratio, n_steps=int(n_steps_d),
        min_margin=float("nan"))
    if not single:
        result = [result]
    if return_info:
        return result, {"n_rounds": int(n_rounds_d),
                        "n_steps": int(n_steps_d)}
    return result
