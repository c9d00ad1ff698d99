"""Headline benchmark: end-to-end corpus alignment throughput, utts/sec/chip.

Drives the REAL production path (`AlignmentPipeline`, the same code behind
cli/infer_ali) over a synthetic TIMIT-style corpus generated on the fly: host
WAV decode -> batched log-mel -> batched greedy decode -> host punctuation
normalization + char re-tokenization -> teacher-forced QK capture with in-scan
medfilt/softmax -> top-10 head selection -> batched device DTW -> boundary
times + word bookkeeping. Whisper-medium shapes, random weights (runtime is
weight-independent), README-recommended recipe (char units, topk=10, medfilt 3).

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Everything else goes to stderr (stage split, correctness checks, both ratios).

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
denominator is a MEASURED torch-CPU reference-equivalent at identical shapes
(scripts/measure_cpu_baseline.py): 0.0250 utts/sec on this image's single CPU
core. The reference on a typical multi-core CPU box would run faster; this host
has one core, so a default-thread re-measurement is impossible here. To avoid
an inflated ratio, the reported vs_baseline divides by a conservative model of
a 16-core reference with PERFECT linear scaling (16 x 0.0250 = 0.40 utts/sec);
the measured single-core ratio is also printed to stderr. Override with
WCA_BENCH_BASELINE=<utts/sec>.

Knobs (env): WCA_BENCH_UTTS (96), WCA_BENCH_BATCH (16), WCA_BENCH_DECODE_LEN
(32 — a real-transcript-length proxy: with random weights eot never fires, so
the published sample_len=224 default would measure 7x the decode steps a real
checkpoint pays; set 224 to measure the full-length decode cost),
WCA_BENCH_TINY=1 (tiny dims smoke mode, CPU-friendly).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores the env var; honor it explicitly
    jax.config.update("jax_platforms", "cpu")
    # CPU-identity-keyed cache dir (same rule as tests/conftest.py; rationale
    # in utils/compile_cache.py): XLA:CPU AOT executables from a different
    # host can SIGILL/SIGABRT on load, and CPU artifacts must not pollute
    # ~/.cache/jax_wca, which the multi-minute TPU compiles depend on
    from whisper_char_alignment_tpu.utils.compile_cache import cpu_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from whisper_char_alignment_tpu import constants
from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.config import (AlignConfig, MODEL_DIMS,
                                               tiny_test_dims)
from whisper_char_alignment_tpu.data.dataset import TIMIT, batch_iter
from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.ops.dtw import dtw_np
from whisper_char_alignment_tpu.runner import AlignmentPipeline
from whisper_char_alignment_tpu.text import retokenize
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

TINY = os.environ.get("WCA_BENCH_TINY") == "1"
N_UTTS = int(os.environ.get("WCA_BENCH_UTTS", "16" if TINY else "96"))
# B=16 measured fastest (33.1 utts/s vs 28.1 at B=32, 31.1 at B=8, 28.5 at
# B=48): per-utt device work is batch-linear in the dominant stages, so finer
# batches overlap better in the 3-stage software pipeline
BATCH = int(os.environ.get("WCA_BENCH_BATCH", "4" if TINY else "16"))
DECODE_LEN = int(os.environ.get("WCA_BENCH_DECODE_LEN", "8" if TINY else "32"))
# opt-in decode frame bucketing (NOT reference-exact: attends over the true
# audio length rounded up, not the padded 30 s window) — secondary perf mode
BUCKET = int(os.environ.get("WCA_BENCH_BUCKET", "0"))
# opt-in guard on the bucketed decode (--decode_frame_bucket_guarded): margin
# tracking + full-window re-decode of flagged rows. With random weights the
# flag rate is an artifact of the margin bound, so sweep the envelope via
# WCA_BUCKET_GUARD_MARGIN: 0 = track-only best case, 1e9 = 100%-re-decode
# worst case (real checkpoints land near the best case — DESIGN.md envelope)
BUCKET_GUARDED = os.environ.get("WCA_BENCH_BUCKET_GUARDED", "0") == "1"
# measured single-core torch reference (scripts/measure_cpu_baseline.py) and
# the conservative 16-core perfect-scaling model of a multi-core reference box
BASELINE_1CORE = 0.0250
BASELINE = float(os.environ.get("WCA_BENCH_BASELINE", str(BASELINE_1CORE * 16)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def check_alignments(alignments, max_seconds):
    """Loud correctness gates on the benched outputs (a perf run must not
    silently produce garbage): per-word interval sanity + monotonicity."""
    n_checked = 0
    for a in alignments:
        if a.skipped or len(a.end_times) == 0:
            continue
        starts, ends = np.asarray(a.start_times), np.asarray(a.end_times)
        # reference contract: words includes the trailing eot group, so there is
        # one interval per words[:-1] (ref README.md prints zip(words[:-1], ...))
        assert len(starts) == len(ends) == len(a.words) - 1, a.fid
        assert np.all(starts <= ends + 1e-9), (a.fid, starts, ends)
        assert np.all(np.diff(ends) >= -1e-9), (a.fid, ends)
        # each word starts where the previous one ends (jump-time contract)
        assert np.allclose(starts[1:], ends[:-1]), a.fid
        assert ends[-1] <= max_seconds + 0.02 and starts[0] >= 0.0, a.fid
        n_checked += 1
    assert n_checked > 0, "no live alignments to check"
    return n_checked


def recompute_one_on_cpu(pipeline, batch, cfg, tok):
    """Recompute one utterance's boundaries with the NumPy DTW oracle from the
    aggregated matrix and assert exact equality with the device pipeline."""
    outs = pipeline.align_batch(batch, return_matrix=True)
    for a in outs:
        if a.skipped or a.matrix is None or len(a.words) < 2:
            continue
        text_tokens = retokenize.encode(a.transcription, tok,
                                        cfg.aligned_unit_type)
        _, _, wb = timing.words_and_boundaries(text_tokens, tok,
                                               cfg.aligned_unit_type)
        if wb is None:
            continue
        ti, tj = dtw_np(-np.asarray(a.matrix, np.float64))
        first_visit = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
        jump_times = tj[first_visit] / constants.TOKENS_PER_SECOND
        np.testing.assert_allclose(a.start_times, jump_times[wb[:-1]], atol=1e-9)
        np.testing.assert_allclose(a.end_times, jump_times[wb[1:]], atol=1e-9)
        return a.fid
    raise AssertionError("no utterance eligible for the CPU DTW recompute")


def _devices_with_retry():
    """First device touch, with a bounded RELAUNCH retry on backend-init
    failure: the axon tunnel has been observed transiently UNAVAILABLE
    (round 4: backend init RuntimeError after a heavy session), and a failed
    plugin init is cached for the process's lifetime — so the retry must
    re-exec, not loop. Bounded by WCA_BENCH_INIT_RETRIES (default 2),
    WCA_BENCH_INIT_RETRY_S apart (default 180)."""
    try:
        return jax.devices()
    except RuntimeError as e:
        left = int(os.environ.get("WCA_BENCH_INIT_RETRIES", "2"))
        if left <= 0:
            raise
        wait = float(os.environ.get("WCA_BENCH_INIT_RETRY_S", "180"))
        log(f"backend init failed ({e}); retrying in {wait:.0f}s "
            f"({left} retries left)")
        time.sleep(wait)
        env = dict(os.environ)
        env["WCA_BENCH_INIT_RETRIES"] = str(left - 1)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    tok = get_test_tokenizer()
    if TINY:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=128,
                              n_text_ctx=96, state=32, head=4, layers=2)
        model_name = "tiny-test"
    else:
        # WCA_BENCH_MODEL selects any published size (medium is the headline
        # workload; vs_baseline is only reported for it — the measured CPU
        # baseline is medium-shaped). The toy tokenizer's vocab is smaller
        # than the published 51865; decode runs over the model's full vocab
        # with the toy specials in range
        model_name = os.environ.get("WCA_BENCH_MODEL", "medium")
        if model_name not in MODEL_DIMS:
            raise SystemExit(f"unknown WCA_BENCH_MODEL={model_name!r}; "
                             f"choose from {sorted(MODEL_DIMS)}")
        dims = MODEL_DIMS[model_name]

    log(f"devices: {_devices_with_retry()}")
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    corpus_dir = tempfile.mkdtemp(prefix="wca_bench_corpus_")
    seconds = (1.0, 2.0) if TINY else (2.0, 7.0)
    scp = make_timit_corpus(corpus_dir, n_utts=N_UTTS, seconds=seconds,
                            words_per_utt=(6, 10), seed=0)
    dataset = TIMIT(scp)
    max_seconds = seconds[1]

    # use_gt_transcript: with random weights the decoded transcript is one
    # garbage word (degenerate alignment); aligning the GT text instead gives
    # the alignment stage a realistic char-token workload while the decode
    # stage still runs (and is timed) at full cost
    cfg = AlignConfig.recommended(model=model_name, batch_size=BATCH,
                                  use_gt_transcript=True,
                                  decode_frame_bucket=BUCKET,
                                  decode_frame_bucket_guarded=BUCKET_GUARDED,
                                  # BASELINE config #3 variant: subword units
                                  # with 'mean' aggregation
                                  aligned_unit_type=os.environ.get(
                                      "WCA_BENCH_UNIT", "char"),
                                  aggr=os.environ.get("WCA_BENCH_AGGR",
                                                      "topk"),
                                  # default ON: duration-homogeneous batches
                                  # (identical per-utterance results, only
                                  # output order changes — tested) measured
                                  # 35.5 vs 35.2 utts/s and the lowest
                                  # pass-to-pass variance (2.70-2.71 s)
                                  sort_by_duration=os.environ.get(
                                      "WCA_BENCH_SORT", "1") == "1",
                                  pipeline_depth=int(os.environ.get(
                                      "WCA_BENCH_DEPTH", "2")),
                                  encoder_int8=os.environ.get(
                                      "WCA_BENCH_ENC_INT8", "0") == "1",
                                  reuse_cross_kv=os.environ.get(
                                      "WCA_BENCH_REUSE_KV", "1") == "1")
    pipeline = AlignmentPipeline(params, dims, tok, cfg,
                                 compute_dtype=jnp.bfloat16)
    pipeline.options = decoding.DecodingOptions(language="en",
                                                sample_len=DECODE_LEN)

    log(f"corpus: {N_UTTS} utts x {seconds}s, batch={BATCH}, "
        f"decode_len={DECODE_LEN}, dims={model_name}")
    log("warmup pass (compiles all batch signatures)...")
    t0 = time.monotonic()
    warm = list(pipeline.run_dataset(dataset, progress=False))
    log(f"warmup: {time.monotonic() - t0:.1f}s")
    n_ok = check_alignments(warm, max_seconds)
    log(f"correctness: {n_ok}/{len(warm)} alignments pass interval checks")
    # the recompute path uses a different jit signature (return_matrix=True);
    # run it before the timed pass so its compile stays out of the timing
    first_batch = next(iter(batch_iter(dataset, BATCH, prefetch=0)))
    fid = recompute_one_on_cpu(pipeline, first_batch, cfg, tok)
    log(f"correctness: device DTW == NumPy oracle recompute for {fid}")

    best_wall = None
    best_timers = None
    # 3 passes by default: the axon tunnel's upload throughput fluctuates by
    # >2x between identical runs; min-wall over 3 is a steadier estimator.
    # Clamped to >= 1: zero passes would leave the results undefined AFTER
    # the multi-minute warmup was paid and break the one-JSON-line contract
    n_passes = max(1, int(os.environ.get("WCA_BENCH_PASSES", "3")))
    for _ in range(n_passes):
        pipeline.timers = type(pipeline.timers)()  # reset stage timers
        # monotonic, not time.time(): min-over-passes selection would pick
        # exactly the pass an NTP step corrupted and publish an inflated
        # headline with no sign anything went wrong
        t0 = time.monotonic()
        results = list(pipeline.run_dataset(dataset, progress=False))
        wall = time.monotonic() - t0
        check_alignments(results, max_seconds)
        log(f"pass: {wall:.2f}s")
        if best_wall is None or wall < best_wall:
            best_wall = wall
            best_timers = pipeline.timers  # stage split of the REPORTED pass
    wall = best_wall
    pipeline.timers = best_timers

    n_aligned = sum(1 for a in results if not a.skipped)
    throughput = n_aligned / wall
    for stage, s in pipeline.timers.summary().items():
        log(f"stage {stage:>14s}: {s['total_s']:.2f}s total, "
            f"{s['units_per_s']:.1f} utts/s")
    log(f"{n_aligned} utts in {wall:.2f}s -> {throughput:.2f} utts/sec "
        f"(vs 1-core measured ref: {throughput / BASELINE_1CORE:.0f}x; "
        f"vs 16-core linear-scaling model: {throughput / BASELINE:.0f}x)")

    # self-describing artifact (VERDICT r03 #6): the one line carries its own
    # run configuration, the best-pass stage split, and the known worst-case
    # caveat so BENCH_r{N}.json needs no stderr context to interpret
    stage_split = {stage: round(s["total_s"], 3)
                   for stage, s in pipeline.timers.summary().items()}
    print(json.dumps({
        "metric": f"e2e_pipeline_utts_per_sec_per_chip_whisper_{model_name}",
        "value": round(throughput, 3),
        "unit": "utts/sec",
        # the measured baseline is Whisper-medium-shaped; other dims would
        # compare different workloads
        "vs_baseline": (round(throughput / BASELINE, 1)
                        if model_name == "medium" else None),
        "n_utts": n_aligned,
        "batch": BATCH,
        "passes": n_passes,
        "pipeline_depth": cfg.pipeline_depth,
        "sort_by_duration": cfg.sort_by_duration,
        "reuse_cross_kv": cfg.reuse_cross_kv,
        # decode_len=32 is a real-transcript-length proxy (random weights
        # never emit eot; real checkpoints early-exit near transcript length).
        # The published sample_len=224 with no early exit measures 9.0 utts/s
        # (re-measured round 4 session 6 after the decode prompt prefill —
        # it saves only 2 of 227 sequential steps at this length; 9.1 after
        # the background wire prep, 8.4 in round 3) — re-measure via
        # WCA_BENCH_DECODE_LEN=224 whenever the decode path changes.
        "decode_len": DECODE_LEN,
        # 0 = reference-exact full-window decode (the headline config);
        # nonzero = the opt-in bucketed variant (guarded: margin-tracked
        # with full-window re-decode of flagged utterances)
        "decode_frame_bucket": BUCKET,
        "decode_frame_bucket_guarded": BUCKET_GUARDED,
        "decode_len224_worst_case_utts_per_sec": 9.0,
        "stage_split_s": stage_split,
        "best_pass_wall_s": round(wall, 3),
    }))


if __name__ == "__main__":
    main()
