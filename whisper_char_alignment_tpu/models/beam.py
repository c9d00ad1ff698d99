"""Beam-search and temperature-sampling decode loops.

Completes the ``whisper.decode`` option surface beyond the greedy path
(reference call sites pass only ``language`` — infer_ali.py:40 — but the
dependency the reference drives supports ``beam_size`` / ``best_of`` /
``patience`` / ``length_penalty`` / ``temperature``; a user switching from
``whisper.decode`` finds the same semantics here):

- **Beam search** (``beam_size``, deterministic): per step, every beam proposes
  its top (beam+1) continuations; candidates are merged per audio in published
  dict-insertion order, sorted by cumulative logprob (stable), the best
  ``beam`` non-eot candidates become the next beams (the KV cache rows are
  gathered to follow them), and eot candidates encountered before the beam is
  refilled are banked — up to ``round(beam * patience)`` of them, insertion
  capped exactly like the published merge loop.
- **Sampling** (``temperature > 0``, optionally ``best_of`` independent rows
  per audio): categorical over ``logits / temperature``; cumulative logprob
  taken from the UN-scaled distribution (published GreedyDecoder.update).
- Both finalize with the published maximum-likelihood ranker
  (``logprob / length`` or the ((5+L)/6)^alpha length penalty).

The published implementation de-duplicates beam candidates through a dict
keyed by token sequence. With this decoder, duplicate sequences only exist
while all beams are still identical (before the first beam divergence), so the
dict semantics are reproduced exactly by masking the candidates of rows > 0 on
the first sampled step; afterwards beams are distinct sequences by
construction and no duplicates can arise.

TPU notes: both loops are single jitted ``lax.while_loop`` programs over a KV
cache; the beam reorder is a batch-axis gather of the cache driven by the
merged top-k (one ``jnp.take`` per step). The greedy production path
(models/decoding.py) is untouched — these loops trade a little per-step
overhead for the richer search.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelDims
from . import whisper as wmodel

_NEG_INF = float("-inf")


def _length_penalty(length: int, alpha: Optional[float]) -> float:
    """Published MaximumLikelihoodRanker penalty: the plain length when alpha
    is None, else the GNMT ((5 + L) / 6) ** alpha. Guarded against an empty
    candidate (immediate eot with timestamps off), which the published code
    would divide by zero on."""
    if alpha is None:
        return float(max(length, 1))
    return ((5.0 + max(length, 1)) / 6.0) ** alpha


def ml_rank(cand_tokens: List[List[int]], cand_lp: List[float],
            alpha: Optional[float]) -> int:
    """Index of the best candidate by length-normalized cumulative logprob."""
    scores = [lp / _length_penalty(len(t), alpha)
              for t, lp in zip(cand_tokens, cand_lp)]
    return int(np.argmax(scores))


# ---------------------------------------------------------------------------
# Beam search loop
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "dims", "sample_begin", "max_steps", "ts_begin", "eot", "no_timestamps",
    "no_speech", "max_initial_ts_index", "use_timestamps", "compute_dtype",
    "beam_size", "max_candidates", "sot_index", "attn_mode",
    "cross_mode", "prefill"))
def _beam_loop(params, dims: ModelDims, mel, prompt, suppress_mask, blank_mask,
               *, sample_begin: int, max_steps: int, ts_begin: int, eot: int,
               no_timestamps: int, no_speech: int,
               max_initial_ts_index: Optional[int], use_timestamps: bool,
               compute_dtype=jnp.float32, beam_size: int = 5,
               max_candidates: int = 5, sot_index: int = 0,
               attn_mode: str = "xla", cross_mode: str = "xla",
               prefill: bool = True):
    """Returns (tokens (rows, total), sum_lp (rows,), fin_tok (B, MC, total),
    fin_lp (B, MC), fin_cnt (B,), ns_prob (rows,), n_steps, xa).
    rows = B * beam_size; beams of one audio are consecutive rows."""
    from .decoding import apply_logit_filters

    b_audio = mel.shape[0]
    g = beam_size
    rows = b_audio * g
    c = g * (g + 1)  # merged candidates per audio per step
    total = sample_begin + max_steps
    vocab_ids = jnp.arange(dims.n_vocab)

    xa = wmodel.encode_audio(params, dims, mel, compute_dtype=compute_dtype,
                             attn_mode=attn_mode)
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa,
                                          compute_dtype=compute_dtype)

    prompt2d = prompt if prompt.ndim == 2 else jnp.broadcast_to(
        prompt[None], (b_audio, sample_begin))
    # prompt prefill (the published decoder's first-forward shape — see
    # whisper.decode_prefill): all beams of an audio are identical during the
    # prompt phase, so prefill the UN-repeated (B, P) prompt against the
    # un-repeated cross K/V and repeat the filled cache rows — 1/g-th the
    # prompt compute of stepping every beam row through the loop
    start = 1
    ns_seed = None
    if prefill and sample_begin >= 2:
        ns_at = (sot_index if (no_speech is not None
                               and sot_index < sample_begin - 1) else None)
        cache1 = wmodel.init_kv_cache(dims, b_audio, total,
                                      dtype=compute_dtype)
        pf_logits, cache1 = wmodel.decode_prefill(
            params, dims, prompt2d[:, :sample_begin - 1], cache1, cross_kv,
            compute_dtype=compute_dtype, cross_mode=cross_mode,
            logits_at=ns_at)
        cache = jax.tree.map(lambda x: jnp.repeat(x, g, axis=1), cache1)
        if ns_at is not None:
            ns_seed = jnp.repeat(
                jax.nn.softmax(pf_logits, axis=-1)[:, no_speech], g, axis=0)
        start = sample_begin
    else:
        cache = wmodel.init_kv_cache(dims, rows, total, dtype=compute_dtype)
    # repeat_interleave on the batch axis: beams of an audio are adjacent rows
    cross_kv = jax.tree.map(lambda x: jnp.repeat(x, g, axis=1), cross_kv)

    prompt_rows = jnp.repeat(prompt2d, g, axis=0)  # (rows, sample_begin)
    tokens0 = jnp.full((rows, total), eot, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt_rows, (0, 0))

    row_in_audio = jnp.repeat(jnp.arange(g), g + 1)  # (C,) candidate -> beam j
    audio_base = (jnp.arange(b_audio) * g)[:, None]  # (B, 1)
    ks = jnp.arange(1, g + 1)

    def cond(state):
        (i, _, _, _, _, _, _, _, fin_cnt, _) = state
        return (i < total) & ~jnp.all(fin_cnt >= max_candidates)

    def body(state):
        (i, tokens, cache, sum_lp, has_ts, last_ts_tok, fin_tok, fin_lp,
         fin_cnt, ns_prob) = state
        tok_in = jax.lax.dynamic_slice(tokens, (0, i - 1), (rows, 1))
        logits, cache = wmodel.decode_step(params, dims, tok_in, i - 1, cache,
                                           cross_kv,
                                           compute_dtype=compute_dtype,
                                           cross_mode=cross_mode)
        if no_speech is not None:  # a no_speech-less tokenizer: stays NaN
            ns_prob = jax.lax.cond(
                i == sot_index + 1,
                lambda lg: jax.nn.softmax(lg, axis=-1)[:, no_speech],
                lambda lg: ns_prob, logits)
        is_prompt = i < sample_begin
        sampled = i - sample_begin

        filtered = apply_logit_filters(
            logits, i, tokens, has_ts, last_ts_tok, suppress_mask, blank_mask,
            vocab_ids, sample_begin=sample_begin, ts_begin=ts_begin, eot=eot,
            no_timestamps=no_timestamps,
            max_initial_ts_index=max_initial_ts_index,
            use_timestamps=use_timestamps)
        logprobs = jax.nn.log_softmax(filtered.astype(jnp.float32), axis=-1)
        lp_k, tok_k = jax.lax.top_k(logprobs, g + 1)  # (rows, g+1)
        cand_lp = (sum_lp[:, None] + lp_k).reshape(b_audio, c)
        cand_tok = tok_k.reshape(b_audio, c)
        # dict-dedup emulation: before the first divergence all beams are
        # identical, so only beam 0's candidates are distinct sequences
        cand_lp = jnp.where((sampled == 0) & (row_in_audio > 0)[None],
                            _NEG_INF, cand_lp)
        # published order: stable sort by score over dict insertion order
        order = jnp.argsort(-cand_lp, axis=-1, stable=True)  # (B, C)
        s_lp = jnp.take_along_axis(cand_lp, order, axis=-1)
        s_tok = jnp.take_along_axis(cand_tok, order, axis=-1)
        s_src = row_in_audio[order]  # (B, C) source beam j
        noneot = s_tok != eot
        k_noneot = jnp.cumsum(noneot.astype(jnp.int32), axis=-1)
        # position of the k-th non-eot candidate, k = 1..g
        pos_k = jax.vmap(lambda kn: jnp.searchsorted(kn, ks))(k_noneot)
        new_src = jnp.take_along_axis(s_src, pos_k, axis=-1)  # (B, g)
        new_tok = jnp.take_along_axis(s_tok, pos_k, axis=-1)
        new_lp = jnp.take_along_axis(s_lp, pos_k, axis=-1)
        # eot candidates scanned before the beam was refilled are banked
        cut = pos_k[:, -1:]  # position of the g-th non-eot
        newly_fin = (~noneot) & (jnp.arange(c)[None] < cut) & ~is_prompt
        fin_rank = jnp.cumsum(newly_fin.astype(jnp.int32), axis=-1)
        pos_f = jax.vmap(lambda fr: jnp.searchsorted(fr, ks))(fin_rank)
        n_new = fin_rank[:, -1]  # (B,)
        valid_f = jnp.arange(g)[None] < n_new[:, None]
        slot = fin_cnt[:, None] + jnp.arange(g)[None]
        ins = valid_f & (slot < max_candidates)
        pos_f = jnp.minimum(pos_f, c - 1)
        fin_src_rows = (audio_base + jnp.take_along_axis(s_src, pos_f, axis=-1)
                        ).reshape(-1)  # (B*g,) global source row
        fin_seqs = tokens[fin_src_rows].reshape(b_audio, g, total)
        fin_seqs = fin_seqs.at[:, :, jnp.minimum(i, total - 1)].set(eot)
        slot_oob = jnp.where(ins, slot, max_candidates)  # dropped when OOB
        b_idx = jnp.broadcast_to(jnp.arange(b_audio)[:, None], (b_audio, g))
        fin_tok = fin_tok.at[b_idx, slot_oob].set(fin_seqs, mode="drop")
        fin_lp = fin_lp.at[b_idx, slot_oob].set(
            jnp.take_along_axis(s_lp, pos_f, axis=-1), mode="drop")
        fin_cnt = fin_cnt + ins.sum(axis=-1)

        # advance the beams (identity during the prompt phase)
        src = jnp.where(is_prompt, jnp.arange(rows),
                        (audio_base + new_src).reshape(-1))
        prompt_tok = tokens[:, jnp.minimum(i, total - 1)]
        nxt = jnp.where(is_prompt, prompt_tok, new_tok.reshape(-1))
        tokens = tokens[src]
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, jnp.minimum(i, total - 1)))
        sum_lp = jnp.where(is_prompt, sum_lp, new_lp.reshape(-1))
        cache = jax.tree.map(lambda x: jnp.take(x, src, axis=1), cache)
        has_ts, last_ts_tok = has_ts[src], last_ts_tok[src]
        sampled_ts = ~is_prompt & (nxt >= ts_begin)
        has_ts = has_ts | sampled_ts
        last_ts_tok = jnp.where(sampled_ts, nxt, last_ts_tok)
        ns_prob = ns_prob[src]
        return (i + 1, tokens, cache, sum_lp, has_ts, last_ts_tok, fin_tok,
                fin_lp, fin_cnt, ns_prob)

    ns_prob0 = (jnp.zeros((rows,), jnp.float32) if no_speech is not None
                else jnp.full((rows,), jnp.nan, jnp.float32))
    if ns_seed is not None:
        ns_prob0 = ns_seed
    state = (jnp.int32(start), tokens0, cache,
             jnp.zeros((rows,), jnp.float32),
             jnp.zeros((rows,), bool), jnp.zeros((rows,), jnp.int32),
             jnp.full((b_audio, max_candidates, total), eot, jnp.int32),
             jnp.full((b_audio, max_candidates), _NEG_INF, jnp.float32),
             jnp.zeros((b_audio,), jnp.int32),
             ns_prob0)
    (i, tokens, _, sum_lp, _, _, fin_tok, fin_lp, fin_cnt, ns_prob) = (
        jax.lax.while_loop(cond, body, state))
    return tokens, sum_lp, fin_tok, fin_lp, fin_cnt, ns_prob, i - 1, xa


# ---------------------------------------------------------------------------
# Temperature sampling loop (optionally best_of rows per audio)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "dims", "sample_begin", "max_steps", "ts_begin", "eot", "no_timestamps",
    "no_speech", "max_initial_ts_index", "use_timestamps", "compute_dtype",
    "n_group", "sot_index", "attn_mode", "cross_mode", "prefill"))
def _sample_loop(params, dims: ModelDims, mel, prompt, suppress_mask,
                 blank_mask, rng, *, sample_begin: int, max_steps: int,
                 ts_begin: int, eot: int, no_timestamps: int, no_speech: int,
                 max_initial_ts_index: Optional[int], use_timestamps: bool,
                 compute_dtype=jnp.float32, n_group: int = 1,
                 temperature=1.0, sot_index: int = 0,
                 attn_mode: str = "xla", cross_mode: str = "xla",
                 prefill: bool = True):
    """Categorical sampling at ``temperature`` with ``n_group`` independent
    rows per audio. Returns (tokens (rows, total), sum_lp, ns_prob, n_steps,
    xa). Cumulative logprobs come from the un-scaled distribution (published
    GreedyDecoder.update).

    ``temperature`` is a TRACED scalar (only ever a divisor): transcribe()'s
    fallback ladder walks up to five temperatures per window, and a static
    temperature meant five multi-minute remote recompiles of the same loop."""
    from .decoding import apply_logit_filters

    b_audio = mel.shape[0]
    rows = b_audio * n_group
    total = sample_begin + max_steps
    vocab_ids = jnp.arange(dims.n_vocab)

    xa = wmodel.encode_audio(params, dims, mel, compute_dtype=compute_dtype,
                             attn_mode=attn_mode)
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa,
                                          compute_dtype=compute_dtype)

    prompt2d = prompt if prompt.ndim == 2 else jnp.broadcast_to(
        prompt[None], (b_audio, sample_begin))
    # prompt prefill over the un-repeated (B, P) prompt, filled cache rows
    # repeated per sample group (identical rows; see _beam_loop's twin block)
    start = 1
    ns_seed = None
    if prefill and sample_begin >= 2:
        ns_at = (sot_index if (no_speech is not None
                               and sot_index < sample_begin - 1) else None)
        cache1 = wmodel.init_kv_cache(dims, b_audio, total,
                                      dtype=compute_dtype)
        pf_logits, cache1 = wmodel.decode_prefill(
            params, dims, prompt2d[:, :sample_begin - 1], cache1, cross_kv,
            compute_dtype=compute_dtype, cross_mode=cross_mode,
            logits_at=ns_at)
        cache = jax.tree.map(lambda x: jnp.repeat(x, n_group, axis=1), cache1)
        if ns_at is not None:
            ns_seed = jnp.repeat(
                jax.nn.softmax(pf_logits, axis=-1)[:, no_speech],
                n_group, axis=0)
        start = sample_begin
    else:
        cache = wmodel.init_kv_cache(dims, rows, total, dtype=compute_dtype)
    cross_kv = jax.tree.map(lambda x: jnp.repeat(x, n_group, axis=1), cross_kv)

    prompt_rows = jnp.repeat(prompt2d, n_group, axis=0)
    tokens0 = jnp.full((rows, total), eot, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt_rows, (0, 0))

    def cond(state):
        i, _, _, finished, _, _, _, _ = state
        return (i < total) & ~jnp.all(finished)

    def body(state):
        i, tokens, cache, finished, sum_lp, has_ts, last_ts_tok, ns_prob = state
        tok_in = jax.lax.dynamic_slice(tokens, (0, i - 1), (rows, 1))
        logits, cache = wmodel.decode_step(params, dims, tok_in, i - 1, cache,
                                           cross_kv,
                                           compute_dtype=compute_dtype,
                                           cross_mode=cross_mode)
        if no_speech is not None:  # a no_speech-less tokenizer: stays NaN
            ns_prob = jax.lax.cond(
                i == sot_index + 1,
                lambda lg: jax.nn.softmax(lg, axis=-1)[:, no_speech],
                lambda lg: ns_prob, logits)
        is_prompt = i < sample_begin
        filtered = apply_logit_filters(
            logits, i, tokens, has_ts, last_ts_tok, suppress_mask, blank_mask,
            vocab_ids, sample_begin=sample_begin, ts_begin=ts_begin, eot=eot,
            no_timestamps=no_timestamps,
            max_initial_ts_index=max_initial_ts_index,
            use_timestamps=use_timestamps).astype(jnp.float32)
        next_sampled = jax.random.categorical(
            jax.random.fold_in(rng, i), filtered / temperature,
            axis=-1).astype(jnp.int32)
        chosen = jnp.take_along_axis(filtered, next_sampled[:, None],
                                     axis=-1)[:, 0]
        chosen_lp = chosen - jax.scipy.special.logsumexp(filtered, axis=-1)
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
        return (i + 1, tokens, cache, new_finished, sum_lp, has_ts,
                last_ts_tok, ns_prob)

    ns_prob0 = (jnp.zeros((rows,), jnp.float32) if no_speech is not None
                else jnp.full((rows,), jnp.nan, jnp.float32))
    if ns_seed is not None:
        ns_prob0 = ns_seed
    state = (jnp.int32(start), tokens0, cache, jnp.zeros((rows,), bool),
             jnp.zeros((rows,), jnp.float32), jnp.zeros((rows,), bool),
             jnp.zeros((rows,), jnp.int32), ns_prob0)
    i, tokens, _, _, sum_lp, _, _, ns_prob = jax.lax.while_loop(
        cond, body, state)
    return tokens, sum_lp, ns_prob, i - 1, xa


# ---------------------------------------------------------------------------
# Host-side candidate collection + ranking
# ---------------------------------------------------------------------------

def _trim(seq: np.ndarray, sample_begin: int, eot: int) -> List[int]:
    out = list(seq[sample_begin:])
    if eot in out:
        out = out[:out.index(eot)]
    return [int(t) for t in out]


def beam_candidates(tokens, sum_lp, fin_tok, fin_lp, fin_cnt, *,
                    beam_size: int, sample_begin: int, eot: int):
    """Published BeamSearchDecoder.finalize: the banked finished sequences,
    topped up (when fewer than beam_size finished) with the best unfinished
    beams by cumulative logprob, an eot appended. Returns per audio
    (cand_tokens: list of sampled-token lists, cand_lp: list of float)."""
    b_audio = fin_cnt.shape[0]
    out = []
    for a in range(b_audio):
        cands = [_trim(fin_tok[a, j], sample_begin, eot)
                 for j in range(int(fin_cnt[a]))]
        lps = [float(fin_lp[a, j]) for j in range(int(fin_cnt[a]))]
        if len(cands) < beam_size:
            # published finalize: `np.argsort(sum_logprobs[i])[::-1]` — an
            # ascending sort reversed, so on bit-equal sum_logprobs the
            # higher beam row wins (the opposite tie order of a stable
            # descending sort). Reproduce the exact expression.
            rows = np.argsort(sum_lp[a * beam_size:(a + 1) * beam_size])[::-1]
            for j in rows:
                cands.append(_trim(tokens[a * beam_size + int(j)],
                                   sample_begin, eot))
                lps.append(float(sum_lp[a * beam_size + int(j)]))
                if len(cands) >= beam_size:
                    break
        out.append((cands, lps))
    return out


def group_candidates(tokens, sum_lp, *, n_group: int, sample_begin: int,
                     eot: int):
    """Sampling finalize: each audio's n_group rows are its candidates."""
    b_audio = tokens.shape[0] // n_group
    out = []
    for a in range(b_audio):
        rows = range(a * n_group, (a + 1) * n_group)
        out.append(([_trim(tokens[r], sample_begin, eot) for r in rows],
                    [float(sum_lp[r]) for r in rows]))
    return out


def run(params, dims: ModelDims, tokenizer, mel, options, prompt_arr,
        suppress_mask, blank_mask, *, sample_begin: int, sample_len: int,
        sot_index: int = 0,
        max_initial_ts_index: Optional[int], langs: List[str],
        compute_dtype, rng, single: bool, return_xa: bool,
        return_cross_kv: bool, async_results: bool):
    """Dispatcher called by :func:`decoding.decode` when beam search or
    temperature sampling is requested; mirrors decode()'s return contract.
    ``return_cross_kv`` yields ``cross_kv=None`` (the capture pass recomputes
    from ``xa`` — the beam loop's repeated rows are not reusable)."""
    from .decoding import DecodeFuture, DecodingResult, _prefill_enabled

    common = dict(sample_begin=sample_begin, max_steps=sample_len,
                  sot_index=sot_index,
                  ts_begin=tokenizer.timestamp_begin, eot=tokenizer.eot,
                  no_timestamps=tokenizer.no_timestamps,
                  no_speech=tokenizer.no_speech,
                  max_initial_ts_index=max_initial_ts_index,
                  use_timestamps=not options.without_timestamps,
                  compute_dtype=compute_dtype,
                  # kernel-mode env flags resolve here, outside the jitted
                  # loops, and key their cached traces
                  attn_mode=wmodel._encoder_attn_mode(),
                  # the beam/sampling loops never quantize their K/V, so the
                  # cross-attention mode is inert: a constant keeps
                  # WCA_CROSS_ATTN flips from recompiling these loops
                  cross_mode="xla", prefill=_prefill_enabled())
    eot = tokenizer.eot

    def build_results(groups, ns_probs, n_steps):
        import zlib

        results = []
        for a, (cands, lps) in enumerate(groups):
            sel = ml_rank(cands, lps, options.length_penalty)
            seq, lp = cands[sel], lps[sel]
            text = tokenizer.decode(seq).strip()
            try:
                ratio = len(text.encode()) / max(
                    len(zlib.compress(text.encode())), 1)
            except Exception:
                ratio = np.nan
            results.append(DecodingResult(
                language=langs[a], tokens=seq, text=text,
                avg_logprob=lp / (len(seq) + 1),
                no_speech_prob=float(ns_probs[a]),
                temperature=options.temperature,
                compression_ratio=ratio, n_steps=n_steps))
        return results[0] if single else results

    if options.beam_size is not None:
        g = options.beam_size
        mc = max(1, round(g * (options.patience if options.patience is not None
                               else 1.0)))
        tokens, sum_lp, fin_tok, fin_lp, fin_cnt, ns_prob, n_steps, xa = (
            _beam_loop(params, dims, jnp.asarray(mel),
                       jnp.asarray(prompt_arr), jnp.asarray(suppress_mask),
                       jnp.asarray(blank_mask), beam_size=g,
                       max_candidates=mc, **common))
        arrays = (tokens, sum_lp, fin_tok, fin_lp, fin_cnt, ns_prob, n_steps)

        def finalize(tokens, sum_lp, fin_tok, fin_lp, fin_cnt, ns_prob,
                     n_steps):
            groups = beam_candidates(
                tokens, sum_lp, fin_tok, fin_lp, fin_cnt, beam_size=g,
                sample_begin=sample_begin, eot=eot)
            return build_results(groups, ns_prob[::g], int(n_steps))
    else:
        g = options.best_of or 1
        tokens, sum_lp, ns_prob, n_steps, xa = _sample_loop(
            params, dims, jnp.asarray(mel), jnp.asarray(prompt_arr),
            jnp.asarray(suppress_mask), jnp.asarray(blank_mask), rng,
            n_group=g, temperature=float(options.temperature), **common)
        arrays = (tokens, sum_lp, ns_prob, n_steps)

        def finalize(tokens, sum_lp, ns_prob, n_steps):
            groups = group_candidates(tokens, sum_lp, n_group=g,
                                      sample_begin=sample_begin, eot=eot)
            return build_results(groups, ns_prob[::g], int(n_steps))

    if async_results:
        out = DecodeFuture(arrays, finalize)
    else:
        out = finalize(*[np.asarray(a) for a in arrays])
    if return_cross_kv:
        return out, xa, None
    return (out, xa) if return_xa else out
