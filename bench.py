"""Headline benchmark: end-to-end corpus alignment throughput, utts/sec/chip.

Drives the REAL production path (`AlignmentPipeline`, the same code behind
cli/infer_ali) over a synthetic TIMIT-style corpus generated on the fly: host
WAV decode -> batched log-mel -> batched greedy decode -> host punctuation
normalization + char re-tokenization -> teacher-forced QK capture with in-scan
medfilt/softmax -> top-10 head selection -> batched device DTW -> boundary
times + word bookkeeping. Whisper-medium shapes, random weights (runtime is
weight-independent), README-recommended recipe (char units, topk=10, medfilt 3).

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline", ...}.
Everything else goes to stderr (stage split, correctness checks, both ratios).

The one line additionally carries:
- ``mfu``: the device-utilization roll-up — analytic matmul FLOPs per
  utterance (utils/flops.py, computed at the padded shapes each launch
  actually ran) x measured throughput / the chip's bf16 peak.
- ``decode_sweep``: MEASURED exact-vs-guarded decode numbers at transcript
  lengths 32 and 224 (the guarded envelope replaces round 4's hand-maintained
  decode_len224 constant). ``guarded_track`` is the guards' best case (margin
  0: tracking overhead only, nothing flagged); ``guarded_redecode`` the worst
  (margin inf: every utterance re-decoded exactly); a deployment lands at
  track + flag_rate x (redecode - track), with flag_rate calibrated on real
  weights (scripts/calibrate_kv_guard.py).

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
checkpoint pays; the decode_sweep measures 224 explicitly), WCA_BENCH_SWEEP=0
(skip the sweep), WCA_BENCH_TINY=1 (tiny dims smoke mode, CPU-friendly).
"""

import contextlib
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
from whisper_char_alignment_tpu.utils import flops as flops_mod

TINY = os.environ.get("WCA_BENCH_TINY") == "1"
N_UTTS = int(os.environ.get("WCA_BENCH_UTTS", "16" if TINY else "96"))
# B=16 measured fastest (33.1 utts/s vs 28.1 at B=32, 31.1 at B=8, 28.5 at
# B=48): per-utt device work is batch-linear in the dominant stages, so finer
# batches overlap better in the 3-stage software pipeline
BATCH = int(os.environ.get("WCA_BENCH_BATCH", "4" if TINY else "16"))
DECODE_LEN = int(os.environ.get("WCA_BENCH_DECODE_LEN", "8" if TINY else "32"))
# opt-in decode frame bucketing for the HEADLINE config (NOT reference-exact:
# attends over the true audio length rounded up, not the padded 30 s window).
# The guarded variants are measured by the decode_sweep regardless.
BUCKET = int(os.environ.get("WCA_BENCH_BUCKET", "0"))
# opt-in guard on the headline's bucketed decode: margin tracking + full-window
# re-decode of flagged rows. Parsed with int() like WCA_BENCH_BUCKET so a
# malformed value raises instead of silently leaving the guard off
# (ADVICE r04); requires WCA_BENCH_BUCKET > 0, validated in main()
BUCKET_GUARDED = bool(int(os.environ.get("WCA_BENCH_BUCKET_GUARDED", "0")))
# exact-vs-guarded sweep at decode lengths 32 and 224 (VERDICT r04 #2)
SWEEP = bool(int(os.environ.get("WCA_BENCH_SWEEP", "1")))
SWEEP_PASSES = max(1, int(os.environ.get("WCA_BENCH_SWEEP_PASSES",
                                         "1" if TINY else "2")))
SWEEP_LENS = tuple(int(x) for x in os.environ.get(
    "WCA_BENCH_SWEEP_LENS", "8" if TINY else "32,224").split(","))
SWEEP_BUCKET = int(os.environ.get("WCA_BENCH_SWEEP_BUCKET",
                                  "64" if TINY else "128"))
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


def make_cfg(model_name: str, *, bucket: int = 0, bucket_guarded: bool = False,
             kv_int8_guarded: bool = False) -> AlignConfig:
    """The README-recommended recipe with the bench's env-tunable knobs; the
    decode mode (exact / bucketed / guarded) varies per measurement."""
    return AlignConfig.recommended(
        model=model_name, batch_size=BATCH,
        # use_gt_transcript: with random weights the decoded transcript is one
        # garbage word (degenerate alignment); aligning the GT text instead
        # gives the alignment stage a realistic char-token workload while the
        # decode stage still runs (and is timed) at full cost
        use_gt_transcript=True,
        decode_frame_bucket=bucket,
        decode_frame_bucket_guarded=bucket_guarded,
        decode_kv_int8_guarded=kv_int8_guarded,
        # BASELINE config #3 variant: subword units with 'mean' aggregation
        aligned_unit_type=os.environ.get("WCA_BENCH_UNIT", "char"),
        aggr=os.environ.get("WCA_BENCH_AGGR", "topk"),
        # default ON: duration-homogeneous batches (identical per-utterance
        # results, only output order changes — tested) measured 35.5 vs 35.2
        # utts/s and the lowest pass-to-pass variance (2.70-2.71 s)
        sort_by_duration=os.environ.get("WCA_BENCH_SORT", "1") == "1",
        pipeline_depth=int(os.environ.get("WCA_BENCH_DEPTH", "2")),
        encoder_int8=os.environ.get("WCA_BENCH_ENC_INT8", "0") == "1",
        reuse_cross_kv=os.environ.get("WCA_BENCH_REUSE_KV", "1") == "1")


def run_passes(pipeline, dataset, max_seconds, n_passes, label=""):
    """Warmup + n timed passes; returns (best_wall, results, n_aligned).
    min-wall over passes: the axon tunnel's upload throughput fluctuates by
    >2x between identical runs. The pipeline's timers end holding the
    REPORTED (best) pass's stage split."""
    t0 = time.monotonic()
    warm = list(pipeline.run_dataset(dataset, progress=False))
    log(f"{label}warmup: {time.monotonic() - t0:.1f}s")
    n_ok = check_alignments(warm, max_seconds)
    log(f"{label}correctness: {n_ok}/{len(warm)} alignments pass interval "
        "checks")
    best_wall = None
    best_timers = None
    results = warm
    for _ in range(n_passes):
        pipeline.timers = type(pipeline.timers)()  # reset stage timers
        # monotonic, not time.time(): min-over-passes selection would pick
        # exactly the pass an NTP step corrupted and publish an inflated
        # headline with no sign anything went wrong
        t0 = time.monotonic()
        results = list(pipeline.run_dataset(dataset, progress=False))
        wall = time.monotonic() - t0
        check_alignments(results, max_seconds)
        log(f"{label}pass: {wall:.2f}s")
        if best_wall is None or wall < best_wall:
            best_wall = wall
            best_timers = pipeline.timers  # stage split of the REPORTED pass
    pipeline.timers = best_timers
    n_aligned = sum(1 for a in results if not a.skipped)
    return best_wall, results, n_aligned


@contextlib.contextmanager
def guard_margins(value: str):
    """Pin both guard thresholds (logit units) for an envelope measurement:
    '0' = track-only best case (nothing flags), 'inf' = 100%-re-decode worst
    case. Deployments calibrate the real threshold on their own data."""
    keys = ("WCA_KV_INT8_GUARD_MARGIN", "WCA_BUCKET_GUARD_MARGIN")
    old = {k: os.environ.get(k) for k in keys}
    for k in keys:
        os.environ[k] = value
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def measure_decode_sweep(params, dims, tok, model_name, dataset, max_seconds,
                         headline):
    """MEASURED {exact, guarded-best, guarded-worst} x {32, 224} grid
    (VERDICT r04 #2). 'guarded' composes BOTH shipped guards
    (--decode_kv_int8_guarded + --decode_frame_bucket_guarded at bucket
    multiple SWEEP_BUCKET) — the deployable quantized+bucketed mode. With
    random weights the flag rate is an artifact of the margin bound, so the
    sweep pins the two envelope ends instead of a fake middle: margin 0
    (nothing flags — pure tracking+bucket+int8 cost) and margin inf (every
    utterance re-decoded exactly)."""
    cells = []
    for dlen in SWEEP_LENS:
        for mode in ("exact", "guarded_track", "guarded_redecode"):
            if (mode == "exact" and dlen == DECODE_LEN and BUCKET == 0
                    and headline is not None):
                cells.append({"decode_len": dlen, "mode": mode,
                              "utts_per_sec": headline, "flag_rate": None,
                              "source": "headline"})
                continue
            guarded = mode != "exact"
            cfg = make_cfg(model_name, bucket=SWEEP_BUCKET if guarded else 0,
                           bucket_guarded=guarded, kv_int8_guarded=guarded)
            margin = "0" if mode == "guarded_track" else "inf"
            with guard_margins(margin) if guarded else contextlib.nullcontext():
                pipeline = AlignmentPipeline(params, dims, tok, cfg,
                                             compute_dtype=jnp.bfloat16)
                pipeline.options = decoding.DecodingOptions(
                    language="en", sample_len=dlen)
                wall, _, n_aligned = run_passes(
                    pipeline, dataset, max_seconds, SWEEP_PASSES,
                    label=f"sweep[{mode}@{dlen}] ")
                rate = pipeline.flag_rate()
            cells.append({
                "decode_len": dlen, "mode": mode,
                "utts_per_sec": round(n_aligned / wall, 3),
                "flag_rate": (None if rate is None else round(rate, 3)),
                # a string: float('inf') would serialize as the non-standard
                # JSON literal Infinity and break strict parsers
                "guard_margin": (margin if guarded else None),
            })
            log(f"sweep[{mode}@{dlen}]: {cells[-1]['utts_per_sec']} utts/s "
                f"flag_rate={cells[-1]['flag_rate']}")
    return {
        "config": {"bucket": SWEEP_BUCKET,
                   "guards": ["decode_kv_int8_guarded",
                              "decode_frame_bucket_guarded"],
                   "n_utts": N_UTTS, "batch": BATCH, "passes": SWEEP_PASSES},
        "note": ("deployable guarded rate = track + flag_rate x (redecode "
                 "- track); flag_rate is checkpoint/data dependent — "
                 "calibrate with scripts/calibrate_kv_guard.py"),
        "cells": cells,
    }


def mfu_rollup(pipeline, dims, tok, throughput, n_utts_counted):
    """Analytic matmul FLOPs at the padded shapes each launch actually ran
    (runner telemetry), rolled into TFLOP/s and % of the chip's bf16 peak
    (VERDICT r04 #3). Elementwise work (QK postprocess, DTW, softmax) is
    excluded — counting it would overstate MFU."""
    prompt_len = len(tok.sot_sequence)
    total = {"mel": 0, "encoder": 0, "decode": 0, "capture": 0}
    n_utts = 0
    for b_pad, n_live, kv_frames in pipeline.decode_shapes:
        n_utts += n_live
        total["mel"] += flops_mod.mel_flops(dims) * b_pad
        total["encoder"] += flops_mod.encoder_flops(dims) * b_pad
        total["decode"] += flops_mod.decode_flops(
            dims, prompt_len=prompt_len,
            steps=pipeline.options.sample_len or DECODE_LEN,
            kv_frames=kv_frames) * b_pad
    for t_bucket, b_pad, n_live, reused in pipeline.capture_shapes:
        total["capture"] += flops_mod.capture_flops(
            dims, t_tokens=t_bucket, reuse_cross_kv=reused) * b_pad
    if n_utts == 0:
        return None
    per_utt = {k: v / n_utts for k, v in total.items()}
    per_utt_total = sum(per_utt.values())
    peak = flops_mod.device_peak_tflops()
    out = flops_mod.mfu_summary(per_utt_total, throughput, peak)
    out["stage_flops_per_utt_g"] = {k: round(v / 1e9, 2)
                                    for k, v in per_utt.items()}
    for k, v in per_utt.items():
        log(f"mfu stage {k:>8s}: {v / 1e9:8.2f} GFLOP/utt -> "
            f"{v * throughput / 1e12:6.2f} TFLOP/s")
    log(f"mfu e2e: {out['tflops_per_sec']} TFLOP/s "
        f"{'(' + str(out['mfu_pct']) + '% of ' + str(out['peak_bf16_tflops']) + ' bf16 peak)' if out['mfu_pct'] is not None else '(peak unknown)'}")
    return out


def main():
    if BUCKET_GUARDED and BUCKET <= 0:
        # fail BEFORE the multi-minute warmup, naming the bench env vars (the
        # runner's ValueError names the CLI flags instead — ADVICE r04)
        raise SystemExit(
            "WCA_BENCH_BUCKET_GUARDED=1 guards the frame-bucketed decode: "
            "set WCA_BENCH_BUCKET to the bucket multiple (e.g. 128) too")
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

    cfg = make_cfg(model_name, bucket=BUCKET, bucket_guarded=BUCKET_GUARDED)
    pipeline = AlignmentPipeline(params, dims, tok, cfg,
                                 compute_dtype=jnp.bfloat16)
    pipeline.options = decoding.DecodingOptions(language="en",
                                                sample_len=DECODE_LEN)

    log(f"corpus: {N_UTTS} utts x {seconds}s, batch={BATCH}, "
        f"decode_len={DECODE_LEN}, dims={model_name}")
    log("warmup pass (compiles all batch signatures)...")
    n_passes = max(1, int(os.environ.get("WCA_BENCH_PASSES", "3")))
    wall, results, n_aligned = run_passes(pipeline, dataset, max_seconds,
                                          n_passes)
    # the recompute path uses a different jit signature (return_matrix=True)
    first_batch = next(iter(batch_iter(dataset, BATCH, prefetch=0)))
    fid = recompute_one_on_cpu(pipeline, first_batch, cfg, tok)
    log(f"correctness: device DTW == NumPy oracle recompute for {fid}")

    throughput = n_aligned / wall
    for stage, s in pipeline.timers.summary().items():
        log(f"stage {stage:>14s}: {s['total_s']:.2f}s total, "
            f"{s['units_per_s']:.1f} utts/s")
    log(f"{n_aligned} utts in {wall:.2f}s -> {throughput:.2f} utts/sec "
        f"(vs 1-core measured ref: {throughput / BASELINE_1CORE:.0f}x; "
        f"vs 16-core linear-scaling model: {throughput / BASELINE:.0f}x)")

    stage_split = {stage: round(s["total_s"], 3)
                   for stage, s in pipeline.timers.summary().items()}
    mfu = mfu_rollup(pipeline, dims, tok, throughput, n_aligned)
    sweep = None
    if SWEEP:
        sweep = measure_decode_sweep(params, dims, tok, model_name, dataset,
                                     max_seconds, round(throughput, 3))

    # self-describing artifact (VERDICT r03 #6): the one line carries its own
    # run configuration, the best-pass stage split, the MFU roll-up, and the
    # measured decode sweep so BENCH_r{N}.json needs no stderr context
    payload = {
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
        # The 224-step published-sample_len cost is MEASURED by decode_sweep.
        "decode_len": DECODE_LEN,
        # 0 = reference-exact full-window decode (the headline config);
        # nonzero = the opt-in bucketed variant (guarded: margin-tracked
        # with full-window re-decode of flagged utterances)
        "decode_frame_bucket": BUCKET,
        "decode_frame_bucket_guarded": BUCKET_GUARDED,
        "mfu": mfu,
        "decode_sweep": sweep,
        "stage_split_s": stage_split,
        "best_pass_wall_s": round(wall, 3),
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
