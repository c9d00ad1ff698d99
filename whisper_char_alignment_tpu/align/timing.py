"""Alignment core: attention capture, head scoring/selection, aggregation, DTW.

Re-implements the reference's timing module (reference: timing.py) as one batched,
jitted device program: the teacher-forced forward post-processes each layer's QK
in-scan (mask -> medfilt -> softmax), head scoring and top-k selection are vectorized
reductions + ``lax.top_k``-style lexsort (preserving the reference's ascending-sort
tie-break, timing.py:36), aggregation is a masked mean of column-normalized maps,
and the DTW cost/trace/backtrace runs on device (ops.dtw). Only the final word
bookkeeping (token group splitting, boundary cumsum) is host NumPy — it is O(words).

Fixed shapes everywhere: tokens are padded to a bucket, frames to 1500; per-item
``token_len``/``frame_len`` masks make the padded computation exactly equal to the
reference's physical slicing (see ops.dtw docstring for the DTW argument).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..config import ModelDims
from ..models import whisper as wmodel
from ..ops import dtw as dtw_ops


# ---------------------------------------------------------------------------
# Attention capture (reference: get_attentions, timing.py:45-67)
# ---------------------------------------------------------------------------

def get_attentions(params, dims: ModelDims, mel: jax.Array, tokens: jax.Array,
                   token_len: jax.Array, frame_len: jax.Array,
                   medfilt_width: int = 7, qk_scale=1.0,
                   compute_dtype=jnp.float32, attn_dtype=jnp.float32,
                   return_logits: bool = True, xa: jax.Array = None,
                   cross_kv=None, attn_mode=None, qkpost=None):
    """Teacher-forced forward returning processed cross-attention maps.

    mel (B, n_mels, 2*n_audio_ctx); tokens (B, T) padded with eot;
    token_len (B,) true token counts; frame_len (B,) true encoder frames
    (duration // 320, reference infer_ali.py:78).
    Returns (attn (L, B, H, T, F) post-softmax/masked, logits (B, T, vocab)).

    Pass ``xa`` (B, n_audio_ctx, d) to reuse encoder states computed by the
    transcription pass instead of re-running the 24-layer encoder (``mel`` is
    then ignored and may be None); additionally pass ``cross_kv`` (the decode
    loop's un-quantized full-frame K/V stacks) to also skip the per-layer
    cross K/V projections.

    The Pallas kernel-mode flags (WCA_ENC_ATTN / WCA_QKPOST) resolve here,
    outside the jit, and key the cached trace as static arguments.
    """
    if attn_mode is None:
        attn_mode = wmodel._encoder_attn_mode()
    if qkpost is None:
        qkpost = wmodel._use_fused_qkpost()
    return _get_attentions_jit(
        params, dims, mel, tokens, token_len, frame_len,
        medfilt_width=medfilt_width, qk_scale=qk_scale,
        compute_dtype=compute_dtype, attn_dtype=attn_dtype,
        return_logits=return_logits, xa=xa, cross_kv=cross_kv,
        attn_mode=attn_mode, qkpost=qkpost)


@functools.partial(jax.jit, static_argnames=("dims", "medfilt_width",
                                             "compute_dtype", "attn_dtype",
                                             "return_logits", "attn_mode",
                                             "qkpost"))
def _get_attentions_jit(params, dims: ModelDims, mel: jax.Array,
                        tokens: jax.Array, token_len: jax.Array,
                        frame_len: jax.Array, medfilt_width: int = 7,
                        qk_scale=1.0, compute_dtype=jnp.float32,
                        attn_dtype=jnp.float32, return_logits: bool = True,
                        xa: jax.Array = None, cross_kv=None,
                        attn_mode: str = "xla", qkpost: bool = False):
    if xa is None and cross_kv is None:
        xa = wmodel.encode_audio(params, dims, mel,
                                 compute_dtype=compute_dtype,
                                 attn_mode=attn_mode)
    logits, attn = wmodel.decode_text(
        params, dims, tokens, xa, return_qk=True, compute_dtype=compute_dtype,
        medfilt_width=medfilt_width, frame_len=frame_len, token_len=token_len,
        qk_scale=qk_scale, attn_dtype=attn_dtype, return_logits=return_logits,
        cross_kv=cross_kv, qkpost=qkpost)
    return attn, logits


# ---------------------------------------------------------------------------
# Head scoring + selection (reference: filter_attention, timing.py:13-43)
# ---------------------------------------------------------------------------

def _coverage_penalty(attn, frame_ok, threshold=0.5):
    """Masked twin of metrics.coverage_penalty (reference metrics.py:99-111):
    attn (..., T, F); frame_ok (..., F) bool; padded frames contribute nothing and
    the baseline subtracts only the true frame count."""
    coverage = attn.sum(axis=-2)  # (..., F)
    per_frame = jnp.where(frame_ok, jnp.maximum(coverage, threshold), 0.0)
    n_frames = frame_ok.sum(axis=-1).astype(attn.dtype)
    return per_frame.sum(axis=-1) - n_frames * threshold


def head_scores(attn: jax.Array, frame_len: jax.Array,
                w_colnorm=1.0, w_rownorm=1.0, w_coverage=0.0) -> jax.Array:
    """Saliency score for every (layer, head): sum of column L2 norms + sum of row
    L2 norms - coverage penalty (reference timing.py:20-31). attn (L, B, H, T, F)
    already has padded rows zeroed and padded frames zeroed, so plain reductions
    equal the reference's sliced ones. Returns (B, L, H) f32."""
    a = attn.astype(jnp.float32)
    score = 0.0
    if w_colnorm > 0:
        col = jnp.sqrt((a * a).sum(axis=-2))  # (L, B, H, F) over tokens
        score = score + w_colnorm * col.sum(axis=-1)
    if w_rownorm > 0:
        row = jnp.sqrt((a * a).sum(axis=-1))  # (L, B, H, T) over frames
        score = score + w_rownorm * row.sum(axis=-1)
    if w_coverage > 0:
        f = attn.shape[-1]
        frame_ok = (jnp.arange(f)[None, :] < frame_len[:, None])[None, :, None, :]
        score = score - w_coverage * _coverage_penalty(a, frame_ok)
    return jnp.transpose(score, (1, 0, 2))  # (B, L, H)


def topk_heads(scores_blh: jax.Array, topk: int):
    """Select the top-k (layer, head) pairs per batch item, replicating the
    reference's ``sorted(scores)[-topk:]`` semantics (ascending score with
    (layer, head) tie-break; returned in ascending order). Returns
    (layer_idx (B, k), head_idx (B, k))."""
    b, l, h = scores_blh.shape
    flat = scores_blh.reshape(b, l * h)
    l_idx = jnp.repeat(jnp.arange(l), h)
    h_idx = jnp.tile(jnp.arange(h), l)

    def one(s):
        order = jnp.lexsort((h_idx, l_idx, s))  # ascending, ties by (l, h)
        sel = order[-topk:]
        return l_idx[sel], h_idx[sel]

    return jax.vmap(one)(flat)


# ---------------------------------------------------------------------------
# Aggregation + DTW (reference: force_align, timing.py:69-114)
# ---------------------------------------------------------------------------

def _safe_col_normalize(m: jax.Array) -> jax.Array:
    """Divide by per-frame column L2 norm over tokens; zero columns (padded
    frames/rows) stay zero instead of NaN."""
    norm = jnp.sqrt((m * m).sum(axis=-2, keepdims=True))
    return m / jnp.where(norm == 0, 1.0, norm)


def aggregate_matrix(attn: jax.Array, aggregation: str, topk: int,
                     frame_len: jax.Array, w_colnorm=1.0, w_rownorm=1.0,
                     w_coverage=0.0):
    """Aggregate (L, B, H, T, F) maps into one (B, T, F) matrix.

    'mean': column-normalize every map, keep the last half of the layers, average
    (reference timing.py:84-89). 'topk': score all heads, keep the k best,
    column-normalize, average (timing.py:91-97). Returns (matrix, scores or None).
    """
    a = attn.astype(jnp.float32)
    if aggregation == "mean":
        a = _safe_col_normalize(a)
        n_layers = a.shape[0]
        matrix = a[n_layers // 2:].mean(axis=(0, 2))  # over layers, heads
        return matrix, None
    if aggregation == "grad_norm":
        # passthrough: the caller supplies an already-aggregated matrix
        # (reference timing.py:99-100); attn is (B, T, F) here
        return a, None
    if aggregation == "topk":
        assert topk > 0
        scores = head_scores(a, frame_len, w_colnorm, w_rownorm, w_coverage)
        l_sel, h_sel = topk_heads(scores, topk)  # (B, k) each

        def gather_one(a_bhtf_all, ls, hs):
            # a_bhtf_all: (L, H, T, F) for one item
            return a_bhtf_all[ls, hs]  # (k, T, F)

        per_item = jnp.transpose(a, (1, 0, 2, 3, 4))  # (B, L, H, T, F)
        sel = jax.vmap(gather_one)(per_item, l_sel, h_sel)  # (B, k, T, F)
        matrix = _safe_col_normalize(sel).mean(axis=1)
        return matrix, (scores, l_sel, h_sel)
    raise ValueError(f"unknown aggregation: {aggregation}")


def _dtw_impl() -> str:
    import os

    impl = os.environ.get("WCA_DTW_IMPL", "auto")
    if impl == "auto":
        return "pallas" if jax.default_backend() not in ("cpu",) else "scan"
    return impl


def matrix_to_jump_frames(matrix: jax.Array, token_len: jax.Array,
                          frame_len: jax.Array, sot_len: int, dtw_impl=None):
    """Slice the text rows and run DTW -> first-visit frame per text row.

    matrix (B, T, F); rows used are [sot_len : token_len-1] (the reference's
    ``matrix[len(sot_sequence):-1]``, timing.py:102). Returns (B, T - sot_len + 1)
    jump frames (padded rows -1). The cost/trace recurrence runs in the Pallas
    wavefront kernel on accelerators (ops/dtw_pallas.py) and as the lax.scan
    reference on CPU; override with WCA_DTW_IMPL=pallas|scan (resolved here,
    outside the jit — the choice is a static argument of the cached trace).
    """
    if dtw_impl is None:
        dtw_impl = _dtw_impl()
    return _matrix_to_jump_frames_jit(matrix, token_len, frame_len,
                                      sot_len=sot_len, dtw_impl=dtw_impl)


@functools.partial(jax.jit, static_argnames=("sot_len", "dtw_impl"))
def _matrix_to_jump_frames_jit(matrix: jax.Array, token_len: jax.Array,
                               frame_len: jax.Array, sot_len: int,
                               dtw_impl: str = "scan"):
    text_matrix = matrix[:, sot_len:, :]
    n_rows = (token_len - sot_len - 1).astype(jnp.int32)  # drop the eot row
    costs = -text_matrix
    frame_len = frame_len.astype(jnp.int32)

    if dtw_impl == "pallas":
        from ..ops.dtw_pallas import dtw_jump_frames_pallas

        # fused wavefront + in-VMEM backtrace kernels: the trace never leaves
        # the wavefront's native layout and is read exactly once (bit-equal
        # to the scan path below — DESIGN.md round-4 probe roofline revision)
        return dtw_jump_frames_pallas(costs, n_rows, frame_len)
    traces = jax.vmap(
        lambda x, n, m: dtw_ops.dtw_trace(x, n, m))(
            costs, n_rows, frame_len)
    # diagonal-synchronized batched backtrace: bit-equal to the per-row walk
    # with the trace streamed as scan input instead of per-step gathers
    return dtw_ops.dtw_jump_frames_batch(traces, n_rows, frame_len)


def force_align_batch(attn: jax.Array, token_len: jax.Array,
                      frame_len: jax.Array, sot_len: int,
                      aggregation: str = "mean", topk: int = -1,
                      w_colnorm=1.0, w_rownorm=1.0, w_coverage=0.0,
                      dtw_impl=None):
    """Device path of force_align over a batch: aggregation + DTW, one jitted
    program (the f32 casts/squares fuse into the reductions — never materialize
    a full f32 copy of a bf16 attention stack).

    Returns (jump_frames (B, N+1), matrix (B, T, F), scores-or-None).
    WCA_DTW_IMPL resolves here, outside the jit (static cache-key argument).
    """
    if dtw_impl is None:
        dtw_impl = _dtw_impl()
    return _force_align_batch_jit(attn, token_len, frame_len, sot_len=sot_len,
                                  aggregation=aggregation, topk=topk,
                                  w_colnorm=w_colnorm, w_rownorm=w_rownorm,
                                  w_coverage=w_coverage, dtw_impl=dtw_impl)


@functools.partial(jax.jit, static_argnames=(
    "sot_len", "aggregation", "topk", "w_colnorm", "w_rownorm", "w_coverage",
    "dtw_impl"))
def _force_align_batch_jit(attn: jax.Array, token_len: jax.Array,
                           frame_len: jax.Array, sot_len: int,
                           aggregation: str = "mean", topk: int = -1,
                           w_colnorm=1.0, w_rownorm=1.0, w_coverage=0.0,
                           dtw_impl: str = "scan"):
    matrix, scores = aggregate_matrix(attn, aggregation, topk, frame_len,
                                      w_colnorm, w_rownorm, w_coverage)
    jump_frames = matrix_to_jump_frames(matrix, token_len, frame_len, sot_len,
                                        dtw_impl=dtw_impl)
    return jump_frames, matrix, scores


# ---------------------------------------------------------------------------
# Host-side word bookkeeping + single-utterance convenience API
# ---------------------------------------------------------------------------

def words_and_boundaries(text_tokens, tokenizer, aligned_unit_type: str):
    """words, word_tokens, word_boundaries for force_align's output mapping
    (reference timing.py:105-108)."""
    from ..text.retokenize import split_tokens_on_spaces

    words, word_tokens = split_tokens_on_spaces(
        list(text_tokens) + [tokenizer.eot], tokenizer, aligned_unit_type)
    if len(word_tokens) <= 1:
        return words, word_tokens, None
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))
    return words, word_tokens, word_boundaries


def jump_frames_to_times(jump_frames: np.ndarray, word_boundaries: np.ndarray):
    """start/end times in seconds from per-row first-visit frames
    (reference timing.py:110-113)."""
    jump_times = np.asarray(jump_frames, dtype=np.float64) / constants.TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    return start_times, end_times


def force_align(ws, text_tokens, tokenizer, aligned_unit_type="subword",
                aggregation="mean", topk=-1, w_colnorm=1.0, w_rownorm=1.0,
                w_coverage=0.0, frame_len: Optional[int] = None):
    """Single-utterance convenience mirroring the reference signature/return
    (timing.py:69-114): ``ws`` (layers, heads, tokens, frames) processed attention
    for ONE utterance (sot rows included, frames already masked/sliced).

    Returns (words, start_times, end_times, matrix, scores).

    ``aggregation='grad_norm'`` takes ``ws`` as an already-aggregated (T, F)
    matrix and passes it straight to DTW (reference timing.py:99-100).
    """
    ws = jnp.asarray(ws)
    if aggregation == "grad_norm":
        assert ws.ndim == 2, "grad_norm expects an aggregated (tokens, frames) matrix"
        t, f = ws.shape
        attn = ws[None]  # (1, T, F): aggregate_matrix passes it through
    else:
        l, h, t, f = ws.shape
        attn = ws[:, None]  # (L, 1, H, T, F)
    if frame_len is None:
        frame_len = f
    sot_len = len(tokenizer.sot_sequence)
    token_len = jnp.asarray([t], jnp.int32)
    frame_len_a = jnp.asarray([frame_len], jnp.int32)

    words, word_tokens, word_boundaries = words_and_boundaries(
        text_tokens, tokenizer, aligned_unit_type)
    if word_boundaries is None:
        return [[], [], [], [], None]

    jump_frames, matrix, scores = force_align_batch(
        attn, token_len, frame_len_a, sot_len, aggregation, topk,
        w_colnorm, w_rownorm, w_coverage)
    n_rows = t - sot_len - 1
    jf = np.asarray(jump_frames)[0][:n_rows]
    start_times, end_times = jump_frames_to_times(jf, word_boundaries)
    matrix_np = np.asarray(matrix[0, sot_len:token_len[0] - 1, :frame_len])
    scores_list = None
    if scores is not None:
        s, l_sel, h_sel = scores
        s = np.asarray(s)[0]
        scores_list = [
            (float(s[li, hi]), (int(li), int(hi)), f"sample_layer{li}_head{hi}")
            for li, hi in zip(np.asarray(l_sel)[0], np.asarray(h_sel)[0])
        ]
    return words, start_times, end_times, matrix_np, scores_list


def filter_attention(attns, topk=20, w_colnorm=1, w_rownorm=1, w_coverage=0):
    """Reference-compatible head filter (timing.py:13-43) for one utterance:
    attns (layers, heads, tokens, frames) -> (selected maps list, scores list
    ascending)."""
    a = jnp.asarray(attns)[:, None]  # (L, 1, H, T, F)
    f = a.shape[-1]
    frame_len = jnp.asarray([f], jnp.int32)
    scores = np.asarray(head_scores(a, frame_len, w_colnorm, w_rownorm,
                                    w_coverage))[0]
    entries = []
    for l in range(scores.shape[0]):
        for h in range(scores.shape[1]):
            entries.append((float(scores[l, h]), (l, h), f"sample_layer{l}_head{h}"))
    scores_sorted = sorted(entries)[-topk:]
    attns_np = np.asarray(attns)
    selected = [attns_np[l, h][None] for _, (l, h), _ in scores_sorted]
    return selected, scores_sorted


# ---------------------------------------------------------------------------
# Baseline path (reference: default_find_alignment, timing.py:116-186)
# ---------------------------------------------------------------------------

@jax.jit
def _znorm_mean_heads(sel_attn: jax.Array, token_len: jax.Array):
    """Z-normalize each selected head's map over the token axis (masked,
    biased std — reference timing.py:160-161), then average heads."""
    t = sel_attn.shape[-2]
    token_ok = (jnp.arange(t)[None, None, :, None]
                < token_len[:, None, None, None])  # (B,1,T,1)
    n = token_len.astype(jnp.float32)[:, None, None, None]
    s = jnp.where(token_ok, sel_attn, 0.0)
    mean = s.sum(axis=-2, keepdims=True) / n
    var = (jnp.where(token_ok, (sel_attn - mean) ** 2, 0.0).sum(axis=-2,
                                                                keepdims=True) / n)
    z = (sel_attn - mean) / jnp.sqrt(var + 0.0)
    z = jnp.where(token_ok, z, 0.0)
    return z.mean(axis=1)  # over heads -> (B, T, F)


def default_find_alignment_batch(params, dims: ModelDims, mel, tokens,
                                 token_len, frame_len, alignment_heads, eot: int,
                                 medfilt_width=7, qk_scale=1.0, sot_len=3,
                                 compute_dtype=jnp.float32, xa=None,
                                 cross_kv=None):
    """Whisper's built-in timing path, batched: only the hand-picked alignment
    heads, z-normalized per token, averaged, DTW'd; also returns per-token text
    probabilities from the teacher-forced logits (reference timing.py:116-186).

    Returns (jump_frames (B, N+1), text_token_probs (B, T), matrix (B, T, F)).
    """
    attn, logits = get_attentions(params, dims, mel, tokens, token_len, frame_len,
                                  medfilt_width=medfilt_width, qk_scale=qk_scale,
                                  compute_dtype=compute_dtype, xa=xa,
                                  cross_kv=cross_kv)
    heads = jnp.asarray(alignment_heads, jnp.int32)  # (n_sel, 2)
    sel = attn[heads[:, 0], :, heads[:, 1]]  # (n_sel, B, T, F)
    sel = jnp.transpose(sel, (1, 0, 2, 3)).astype(jnp.float32)  # (B, n_sel, T, F)
    matrix = _znorm_mean_heads(sel, token_len)
    jump_frames = matrix_to_jump_frames(matrix, token_len, frame_len, sot_len)

    # per-token probabilities: softmax over the non-special vocab slice [:eot]
    # (reference timing.py:147-150: ``logits[len(sot):, :eot].softmax(-1)``);
    # row sot_len+i predicts text token i (the token at position sot_len+1+i)
    probs = jax.nn.softmax(logits[..., :eot], axis=-1)
    pred_rows = probs[:, sot_len:, :]
    next_tokens = tokens[:, sot_len + 1:]
    pad = pred_rows.shape[1] - next_tokens.shape[1]
    next_tokens = jnp.pad(next_tokens, ((0, 0), (0, pad)))
    next_tokens = jnp.clip(next_tokens, 0, eot - 1)  # pad/eot rows are unused
    token_probs = jnp.take_along_axis(pred_rows, next_tokens[..., None],
                                      axis=-1)[..., 0]
    return jump_frames, token_probs, matrix
