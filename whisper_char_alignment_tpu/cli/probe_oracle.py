"""Oracle-head probe CLI (reference: probe_oracle.py).

For each utterance with >= 18 ground-truth words: rank every (layer, head) map by
saliency, align with each of the top-360 saliency heads individually
(``ORACLE_TOPK`` — the reference's ``filter_attention(w, topk=360)`` cut,
probe_oracle.py:83), keep the candidate with the best strict F1 vs ground truth,
and measure how often that oracle head falls within the top ``--hit_within``
saliency-ranked heads.

TPU-first: the reference runs one force_align (and one CPU DTW) per candidate
head in a serial batch-1 Python loop — 360 DTWs per utterance for medium
(probe_oracle.py:88-106). Here:

- ALL heads of a whole BATCH of utterances align in one device launch (the
  per-head column-normalized maps are rows of the batched DTW kernel; the
  <= 6% of rows outside the top-360 are computed but not scored — a
  data-dependent device gather would cost more than it saves);
- token arrays are padded to the runner's 32-token buckets, so jit signatures
  are bounded (remote compiles cost minutes per signature) instead of one per
  distinct transcript length;
- transcribe (mel + greedy decode) for the next batches is kept in flight to
  ``pipeline_depth`` while the current batch's capture + scoring runs — the
  same software pipeline as runner.run_dataset.

The per-head scoring loop in the reference crashes as committed (it scores
``best_ends_hat`` instead of the current head's boundaries and reads an unassigned
variable — SURVEY.md §2a); this implements the intended semantics: score each
head's own boundaries, keep the best F1.
"""

from __future__ import annotations

import argparse
import functools
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ..align import timing
from ..align.metrics import (eval_n1, eval_n1_strict, eval_n1_strict_many,
                             get_seg_metrics)

# the reference restricts the oracle search to the top-360 saliency heads
# (``filter_attention(w, topk=360)``, probe_oracle.py:83) — for medium
# (384 heads) the 24 lowest-saliency heads are NOT oracle candidates even if
# one of them would score the best F1. Smaller models have < 360 heads, so
# the cut only bites at medium and above (``sorted(...)[-360:]`` of a shorter
# list keeps everything).
ORACLE_TOPK = 360
from ..constants import AUDIO_SAMPLES_PER_TOKEN, MAX_FRAMES, MAX_LENGTH
from ..data.dataset import DATASETS
from ..parallel import distributed, mesh as mesh_lib
from ..runner import AlignmentPipeline, pack_fixed_batch
from . import common


def _per_head_jump_frames(attn, token_len, frame_len, sot_len: int,
                          frame_slice: int = 0):
    """attn (L, B, H, T, F) -> jump frames per head (B, L*H, N+1): every
    utterance x head 'mean'-aggregated (column-normalized) map through the
    batched DTW. WCA_DTW_IMPL resolves here, outside the jit.

    Chunked over layer groups so one launch's working set (f32 maps + the
    wavefront trace) stays a few GB: at medium B=8 the full 384-head launch
    is ~3072 (T, 1500) maps plus an int32 trace — measured RESOURCE_EXHAUSTED
    on the 16 GB chip. Chunks of <=1024 (utterance, head) rows fit with the
    attention stack; signatures stay bounded (all chunks share one shape).
    Override rows-per-chunk sizing with WCA_PROBE_LAYER_CHUNK (layers).

    ``frame_slice`` (host int, a static shape) drops the frame axis to the
    batch's bucketed max frame_len before the column-normalize + DTW: frames
    >= frame_len are ZERO in the capture output (masked — the r1 slicing
    proof), the column normalizer treats columns independently, and the DTW
    recurrence never reads past frame_len, so the sliced result is exactly
    the full-width one while the wavefront runs T+frame_slice rather than
    T+1500 sequential steps (the probe roofline's dominant term)."""
    import os

    if frame_slice and frame_slice < attn.shape[-1]:
        attn = attn[..., :frame_slice]
    l, b, h = attn.shape[:3]
    dtw_impl = timing._dtw_impl()
    chunk = int(os.environ.get("WCA_PROBE_LAYER_CHUNK", "0"))
    if chunk <= 0:
        chunk = max(1, 1024 // max(b * h, 1))
    if chunk >= l:
        return _per_head_jump_frames_jit(attn, token_len, frame_len,
                                         sot_len=sot_len, dtw_impl=dtw_impl)
    parts = [
        _per_head_jump_frames_jit(attn[lo:lo + chunk], token_len, frame_len,
                                  sot_len=sot_len, dtw_impl=dtw_impl)
        for lo in range(0, l - l % chunk, chunk)
    ]
    if l % chunk:  # remainder group at its own (bounded) signature
        parts.append(_per_head_jump_frames_jit(
            attn[l - l % chunk:], token_len, frame_len, sot_len=sot_len,
            dtw_impl=dtw_impl))
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("sot_len", "dtw_impl"))
def _per_head_jump_frames_jit(attn, token_len, frame_len, sot_len: int,
                              dtw_impl: str = "scan"):
    l, b, h, t, f = attn.shape
    maps = jnp.transpose(attn, (1, 0, 2, 3, 4)).reshape(b * l * h, t, f)
    maps = timing._safe_col_normalize(maps.astype(jnp.float32))
    tl = jnp.repeat(token_len, l * h)
    fl = jnp.repeat(frame_len, l * h)
    jf = timing.matrix_to_jump_frames(maps, tl, fl, sot_len, dtw_impl=dtw_impl)
    return jf.reshape(b, l * h, jf.shape[-1])


def infer_dataset(args) -> dict:
    multihost = getattr(args, "multihost", False)
    if multihost:
        # must run before any other JAX device use in this process
        distributed.initialize(args.coordinator_address, args.num_processes,
                               args.process_id)

    params, dims, tok = common.load_model_and_tokenizer(args)
    cfg = common.config_from_args(args)
    # the probe's capture never consumes the decode loop's cross-K/V stacks
    # (it re-projects from xa), so keeping them alive through the pending
    # transcribe queue would be pure HBM dead weight — multi-GB at medium
    # right when the 384-head DTW sweep needs the headroom
    cfg.reuse_cross_kv = False
    # honor the advertised --data_parallel/--tensor_parallel flags exactly
    # like infer_ali (previously they were silently ignored here)
    tp_axis = max(1, getattr(args, "tensor_parallel", 0))
    dp = args.data_parallel if args.data_parallel > 0 else None
    mesh = (mesh_lib.make_mesh(dp, n_model=tp_axis)
            if args.data_parallel >= 0 or tp_axis > 1 else None)
    pipe = AlignmentPipeline(params, dims, tok, cfg, mesh=mesh, compute_dtype=(
        jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32))
    dataset = DATASETS[args.dataset](args.scp, n_mels=args.n_mels)
    # the reference-faithful hit_rate denominator is the FULL corpus size (see
    # below), so record it before sharding
    global_len = len(dataset)
    if multihost:
        dataset.entries = distributed.shard_entries(dataset.entries)

    from ..text import retokenize

    state = dict(corrects=0, total_preds=0, total_gts=0, if_include_best=0,
                 n_seen=0)
    sot_len = len(tok.sot_sequence)

    def dispatch_batch(tp):
        """Sync one batch's transcripts, then DISPATCH the capture + saliency
        + per-head DTW launches and return without a device sync — the host
        scoring of the previous batch overlaps this batch's device work
        (reference semantics, probe_oracle.py:59-122, with the committed
        scoring bug fixed)."""
        utts = tp["utts"]
        xa = tp["xa"]
        if cfg.use_gt_transcript:
            transcripts = [u.text for u in utts]
        else:
            with pipe.timers.stage("transcripts sync", units=len(utts)):
                results = tp["future"].result()
            transcripts = [r.text for r in results[:len(utts)]]

        prepared = []
        for u, raw in zip(utts, transcripts):
            transcription = retokenize.remove_punctuation(raw)
            if len(transcription) == 0:
                transcription = " "
            text_tokens = retokenize.encode(transcription, tok,
                                            args.aligned_unit_type)
            tokens = [*tok.sot_sequence, tok.no_timestamps, *text_tokens,
                      tok.eot]
            max_frames = u.duration // AUDIO_SAMPLES_PER_TOKEN
            if (max_frames > MAX_FRAMES
                    or len(tokens) > min(MAX_LENGTH, dims.n_text_ctx)):
                print(u.fid)
                continue
            prepared.append((u, text_tokens, tokens, int(max_frames)))
        if not prepared:
            return None
        state["n_seen"] += len(prepared)

        # fixed shapes: batch padded to the pipeline's batch size, tokens to
        # the 32-token bucket — bounded jit signatures across the sweep
        # (shared packing with the runner: runner.pack_fixed_batch)
        b_pad = pipe._pad_batch(len(prepared))
        t_max = max(len(p[2]) for p in prepared)
        t_bucket = min(dims.n_text_ctx,
                       mesh_lib.pad_to_multiple(t_max, pipe.token_bucket))
        tokens_arr, token_len, frame_len, xa_idx = pack_fixed_batch(
            [(p[0], p[2], p[3]) for p in prepared], utts, b_pad, t_bucket,
            tok.eot, dims.n_audio_ctx)
        # reuse the transcription pass's encoder states (skip-guards may have
        # dropped rows; gather the live ones in order)
        xa_live = jnp.take(xa, jnp.asarray(xa_idx), axis=0)
        tl = jnp.asarray(token_len)
        fl = jnp.asarray(frame_len)
        # stage attribution: jnp calls only DISPATCH; device time surfaces at
        # the np.asarray syncs, so "capture+saliency sync" covers the
        # teacher-forced QK capture + head_scores, "head-DTW sync" the
        # chunked per-head DTW launches (dispatched before the first sync so
        # they queue behind the capture), "host scoring" the pure-Python
        # per-head F1 loop
        with pipe.timers.stage("capture dispatch", units=len(prepared)):
            # pipe.params, not the raw load-time tree: the pipeline's tree is
            # compute-dtype cast and mesh-sharded
            attn, _ = timing.get_attentions(
                pipe.params, dims, None, jnp.asarray(tokens_arr), tl, fl,
                medfilt_width=args.medfilt_width, qk_scale=1.0, xa=xa_live,
                return_logits=False, compute_dtype=pipe.compute_dtype)

        # saliency ranking of ALL heads (reference probe_oracle.py:83) and one
        # batched launch of every (utterance, head) DTW, frame-sliced to the
        # batch's bucketed max frame_len (exactness argument in
        # _per_head_jump_frames; the bucket bounds jit signatures to <= 6)
        f_slice = min(dims.n_audio_ctx,
                      mesh_lib.pad_to_multiple(
                          int(frame_len[:len(prepared)].max()), 256))
        with pipe.timers.stage("dtw dispatch", units=len(prepared)):
            scores_dev = timing.head_scores(attn, fl)  # (B, L, H)
            jf_dev = _per_head_jump_frames(attn, tl, fl, sot_len,
                                           frame_slice=f_slice)
        for arr in (scores_dev, jf_dev):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
        return dict(prepared=prepared, scores_dev=scores_dev, jf_dev=jf_dev)

    def collect_batch(cp):
        """Sync one dispatched batch's device outputs and score on host."""
        if cp is None:
            return
        prepared = cp["prepared"]
        with pipe.timers.stage("capture+saliency sync", units=len(prepared)):
            scores_all = np.asarray(cp["scores_dev"])
        with pipe.timers.stage("head-DTW sync", units=len(prepared)):
            jf_all = np.asarray(cp["jf_dev"])
        with pipe.timers.stage("host scoring", units=len(prepared)):
            _score_batch(prepared, scores_all, jf_all)

    def _score_batch(prepared, scores_all, jf_all):
        from ..constants import TOKENS_PER_SECOND

        for bi, (u, text_tokens, tokens, max_frames) in enumerate(prepared):
            scores_blh = scores_all[bi]
            n_layers, n_heads = scores_blh.shape
            words, word_tokens, wb = timing.words_and_boundaries(
                text_tokens, tok, args.aligned_unit_type)
            if wb is None:
                continue
            words_flat = " ".join(words[:-1]).split()

            # ascending saliency with (l, h) tie-break — np.lexsort is the
            # vectorized twin of the reference's sorted((score, (l, h)))
            flat = scores_blh.reshape(-1).astype(np.float64)
            l_idx = np.repeat(np.arange(n_layers), n_heads)
            h_idx = np.tile(np.arange(n_heads), n_layers)
            order = np.lexsort((h_idx, l_idx, flat))
            # oracle candidates: only the top-ORACLE_TOPK saliency heads,
            # ascending (the reference's filter_attention(w, topk=360) cut)
            cand = order[-ORACLE_TOPK:]
            # every candidate head's end boundaries at once
            # (jump_frames_to_times over a leading head axis), then one
            # vectorized strict-F1 sweep
            jf = jf_all[bi][:, :len(text_tokens) + 1]
            jt = jf.astype(np.float64) / TOKENS_PER_SECOND
            ends_hat_all = jt[:, wb[1:]][cand]  # (n_cand, n_words) rank order
            tp_v, _, _ = eval_n1_strict_many(
                u.ends, ends_hat_all, u.text.split(), words_flat,
                args.tolerance)
            # identical float ops to get_seg_metrics(tp, tp, n_pred, n_gt)
            eps = 1e-7
            prec = tp_v / (ends_hat_all.shape[1] + eps)
            rec = tp_v / (len(u.ends) + eps)
            f1_v = 2 * (prec * rec) / (prec + rec + eps)
            # the scalar loop keeps f1 >= best over ascending rank, so the
            # winner is the LAST occurrence of the max
            bi_best = len(f1_v) - 1 - int(np.argmax(f1_v[::-1]))
            best_ends_hat = ends_hat_all[bi_best]
            best_saliency = flat[cand][bi_best]

            # the hit threshold indexes the FULL ascending order: the
            # reference's scores[-hit_within] is the hit_within-th highest
            # overall (its 360-entry list shares that tail with the full
            # one). Clamped to the head count: hit_within >= all heads means
            # "within the top-everything" (always a hit) instead of an
            # IndexError on models with < hit_within total heads
            if best_saliency > flat[order][max(-args.hit_within, -flat.size)]:
                state["if_include_best"] += 1

            if not args.strict:
                correct_pred, _ = eval_n1(u.ends, best_ends_hat,
                                          args.tolerance)
                state["total_gts"] += len(u.ends)
                state["total_preds"] += len(best_ends_hat)
                state["corrects"] += correct_pred
            else:
                tp_, fp_, fn_ = eval_n1_strict(u.ends, best_ends_hat,
                                               u.text.split(), words_flat,
                                               args.tolerance)
                state["corrects"] += tp_
                state["total_gts"] += tp_ + fn_
                state["total_preds"] += tp_ + fp_

    try:
        from tqdm import tqdm
        indices = tqdm(range(len(dataset)))
    except Exception:
        indices = range(len(dataset))

    # software pipeline: fill batches with eligible utterances; keep up to
    # pipeline_depth batches' decodes in flight while capture+scoring runs,
    # and one dispatched capture+DTW batch in flight while the previous
    # batch's host scoring runs (its device work executes under the sync)
    depth = max(1, cfg.pipeline_depth)
    buf = []
    pending = deque()
    captured = deque()
    for i in indices:
        utt = dataset[i]
        if len(utt.text.split()) < 18:
            continue
        buf.append(utt)
        if len(buf) == cfg.batch_size:
            pending.append(pipe._dispatch_transcribe(buf))
            buf = []
            if len(pending) > depth:
                captured.append(dispatch_batch(pending.popleft()))
            while len(captured) > 1:
                collect_batch(captured.popleft())
    if buf:
        pending.append(pipe._dispatch_transcribe(buf))
    while pending:
        captured.append(dispatch_batch(pending.popleft()))
        while len(captured) > 1:
            collect_batch(captured.popleft())
    while captured:
        collect_batch(captured.popleft())

    corrects = state["corrects"]
    total_preds = state["total_preds"]
    total_gts = state["total_gts"]
    if_include_best = state["if_include_best"]

    if multihost:
        summed = distributed.allreduce_counters(dict(
            corrects=corrects, total_preds=total_preds, total_gts=total_gts,
            if_include_best=if_include_best))
        corrects = summed["corrects"]
        total_preds = summed["total_preds"]
        total_gts = summed["total_gts"]
        if_include_best = summed["if_include_best"]

    precision, recall, f1, r_value, _ = get_seg_metrics(
        corrects, corrects, total_preds, total_gts)
    # hit_rate divides by the FULL dataset size, including the <18-word and
    # over-long utterances skipped above — this looks like a bug but is the
    # reference's exact behavior (`if_include_best/len(loader)`,
    # probe_oracle.py:129 divides by the loader length, not n_seen)
    results = dict(precision=precision, recall=recall, f1=f1, r_value=r_value,
                   hit_rate=if_include_best / max(global_len, 1))
    if getattr(args, "profile", False):
        import sys as _sys
        for stage, s in pipe.timers.summary().items():
            print(f"stage {stage:>22s}: {s['total_s']:.3f}s total, "
                  f"{s['units_per_s']:.1f} utts/s", file=_sys.stderr)
    print(results)
    import jax as _jax
    if not multihost or _jax.process_index() == 0:
        common.dump_results(args, results)
    return results


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Arguments for whisper-based forced alignments")
    common.add_reference_flags(parser)
    parser.add_argument("--hit_within", type=int, default=10,
                        help="compute how often the oracle head is included in "
                             "the selected heads using the proposed approach.")
    common.add_tpu_flags(parser)
    common.add_pipeline_flags(parser)
    return parser.parse_args(argv)


def main(argv=None):
    common.apply_platform_env()
    args = parse_args(argv)
    print(args)
    return infer_dataset(args)


if __name__ == "__main__":
    main()
