"""Shared CLI plumbing: model/tokenizer loading, argparse base, result dumping."""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp

# persistent compile cache: medium-scale programs take minutes to compile on the
# first run; cached reruns start in seconds (override dir via JAX's own env vars)
if not os.environ.get("WCA_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_wca"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ..config import AlignConfig, ModelDims, tiny_test_dims
from ..models import convert, whisper as wmodel
from ..text.tokenizer import WhisperTokenizer, get_test_tokenizer, get_tokenizer


def apply_platform_env() -> None:
    """Honor WCA_PLATFORM=cpu|tpu before first device use. Needed because the
    axon TPU plugin ignores the JAX_PLATFORMS env var, so subprocess-driven
    tests (e.g. the 2-process multihost test) cannot force CPU via env alone."""
    platform = os.environ.get("WCA_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu" and not os.environ.get("WCA_NO_COMPILE_CACHE"):
        # XLA:CPU AOT artifacts are host-specific (utils/compile_cache.py):
        # keep them out of the TPU-shared dir and key them by host identity
        from ..utils.compile_cache import cpu_cache_dir

        jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())


def add_reference_flags(parser: argparse.ArgumentParser) -> None:
    """Every flag of the reference CLIs with identical defaults
    (reference infer_ali.py:151-173)."""
    parser.add_argument("--model", type=str, default="medium")
    parser.add_argument("--dataset", type=str, default="TIMIT",
                        choices=["TIMIT", "LibriSpeech"])
    parser.add_argument("--scp", type=str, default="scp/test.wav.scp")
    parser.add_argument("--output_dir", type=str, required=True,
                        help="Path to the output directory")
    parser.add_argument("--n_mels", type=int, default=80)
    parser.add_argument("--medfilt_width", type=int, default=7)
    parser.add_argument("--aggr", type=str, default="mean",
                        choices=["mean", "topk"])
    parser.add_argument("--topk", type=int, default=15)
    parser.add_argument("--aligned_unit_type", type=str, default="subword",
                        choices=["subword", "char"])
    parser.add_argument("--tolerance", type=float, default=0.02)
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--strict", action="store_true")


def add_tpu_flags(parser: argparse.ArgumentParser) -> None:
    """Flags honored by EVERY CLI (model source / dtype / quantization).
    Batch-pipeline-only flags live in :func:`add_pipeline_flags` so serve and
    the long-form transcribe CLI don't advertise knobs they ignore."""
    parser.add_argument("--checkpoint", type=str, default=None,
                        help=".pt/.npz weights (env WCA_CHECKPOINT)")
    parser.add_argument("--tokenizer_dir", type=str, default=None,
                        help="dir with *.tiktoken or vocab.json "
                             "(env WCA_TOKENIZER_DIR)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--test_model", action="store_true",
                        help="random tiny model + toy tokenizer (offline smoke)")
    parser.add_argument("--encoder_int8", action="store_true",
                        help="int8 encoder projections/MLP (applied at model "
                             "load, so every CLI honors it; measured neutral "
                             "on v5e — see docs/DESIGN.md; not parity-true)")


def add_pipeline_flags(parser: argparse.ArgumentParser) -> None:
    """Batched-pipeline flags (infer_ali / probe_oracle only)."""
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="devices on the batch mesh axis (0 = all)")
    parser.add_argument("--tensor_parallel", type=int, default=0,
                        help="devices on the 'model' mesh axis: shards "
                             "q/k/v + fc1 weight columns and out/fc2 rows "
                             "(the multichip-dryrun layout, parity-exact). "
                             "Use when per-chip HBM is the constraint "
                             "(large-v3); 0/1 = off")
    parser.add_argument("--decode_frame_bucket", type=int, default=0,
                        help="bucket decode cross-attention K/V to the batch's "
                             "true frames rounded up to this multiple (0 = full "
                             "30s window, reference-exact)")
    parser.add_argument("--sort_by_duration", action="store_true",
                        help="batch length-sorted utterances (file-size proxy) "
                             "so short utterances don't pay the longest "
                             "transcript's decode steps; changes output order")
    parser.add_argument("--decode_kv_int8", action="store_true",
                        help="int8-quantize decode cross-attention K/V (halves "
                             "the decode HBM stream; small accuracy risk). On "
                             "single-chip TPU this defaults to the int8-MXU "
                             "attention (WCA_CROSS_ATTN=auto->mxu), which also "
                             "row-quantizes q and the softmax probabilities: "
                             "up to ~2.4%% relative error vs the dequant "
                             "numerics in the diffuse-softmax worst case "
                             "(scripts/verify_kernels_on_device.py); set "
                             "WCA_CROSS_ATTN=xla for the round-2 dequant path")
    parser.add_argument("--decode_kv_int8_guarded", action="store_true",
                        help="int8 K/V decode with a transcript-parity guard: "
                             "each step's top1-top2 logit margin is tracked "
                             "and any utterance whose min margin falls below "
                             "the bound (WCA_KV_INT8_GUARD_MARGIN) is "
                             "re-decoded exactly, reusing its encoder states")
    parser.add_argument("--decode_frame_bucket_guarded", action="store_true",
                        help="frame-bucketed decode with a transcript-parity "
                             "guard (requires --decode_frame_bucket N): "
                             "margin-tracked like --decode_kv_int8_guarded; "
                             "utterances whose min margin falls below "
                             "WCA_BUCKET_GUARD_MARGIN re-decode over the full "
                             "30s window (calibrate the bound on your own "
                             "data: scripts/calibrate_kv_guard.py "
                             "--mode bucket)")
    parser.add_argument("--decode_sample_len", type=int, default=0,
                        help="cap sampled decode steps per utterance (0 = "
                             "published default, n_text_ctx // 2)")
    parser.add_argument("--use_gt_transcript", action="store_true",
                        help="align the ground-truth transcript instead of "
                             "the decoded one (isolation mode, SURVEY.md §7 "
                             "step 4; decode still runs and is timed)")
    parser.add_argument("--profile", action="store_true",
                        help="print per-stage wall-time summary at the end")
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="write a jax.profiler device trace here")
    # multi-host dataset sweep (SURVEY.md §2c): each process aligns its
    # round-robin shard of the scp; metric counters are all-reduced at the end
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed and shard the scp "
                             "across processes")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (jax.distributed)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def load_model_and_tokenizer(args) -> Tuple[dict, ModelDims, WhisperTokenizer]:
    """Resolve weights + tokenizer from flags/env; ``--test_model`` gives a
    deterministic random tiny model for offline runs."""
    if getattr(args, "test_model", False):
        tok = get_test_tokenizer()
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=1500,
                              n_text_ctx=448, state=32, head=2, layers=2,
                              n_mels=args.n_mels)
        params = wmodel.init_params(jax.random.PRNGKey(0), dims)
        return _maybe_quantize(params, args), dims, tok

    ckpt = args.checkpoint or os.environ.get("WCA_CHECKPOINT")
    if not ckpt:
        raise SystemExit(
            "no weights available: pass --checkpoint / set WCA_CHECKPOINT "
            "(or use --test_model for an offline smoke run)")
    params, dims = convert.load_checkpoint(ckpt)
    params = jax.tree.map(jnp.asarray, params)
    multilingual = not args.model.endswith(".en")
    tok = get_tokenizer(multilingual, language="English",
                        tokenizer_dir=args.tokenizer_dir)
    return _maybe_quantize(params, args), dims, tok


def cast_params(params, dtype):
    """Compute-dtype cast preserving int8 quantized encoder leaves — the CLI
    alias of :func:`models.whisper.cast_params` (which AlignmentPipeline also
    applies at construction, so every pipeline consumer honors
    --compute_dtype; standalone CLIs that never build a pipeline — serve,
    long-form transcribe — call this directly)."""
    return wmodel.cast_params(params, dtype)


def _maybe_quantize(params, args):
    """--encoder_int8 is applied HERE, at model load, so every CLI (including
    serve and the long-form transcribe CLI, which don't build an AlignConfig)
    honors the flag it advertises. quantize_encoder_int8 is idempotent, so
    the runner's cfg-driven quantization composes."""
    if getattr(args, "encoder_int8", False):
        params = wmodel.quantize_encoder_int8(params)
    return params


def config_from_args(args) -> AlignConfig:
    keys = [f.name for f in AlignConfig.__dataclass_fields__.values()]
    kwargs = {k: getattr(args, k) for k in keys if hasattr(args, k)}
    return AlignConfig(**kwargs)


def results_basename(args, ts: float = None) -> str:
    """Timestamped output path stem under ``args.output_dir`` (no extension).
    Pass ``ts`` to pin the stem (multihost runs broadcast process 0's time so
    every process's files share one stem)."""
    filename = datetime.datetime.fromtimestamp(
        time.time() if ts is None else ts).strftime("%Y-%m-%d-%H:%M:%S")
    os.makedirs(args.output_dir, exist_ok=True)
    return os.path.join(args.output_dir, filename)


def dump_results(args, results: dict, stem: str = None) -> str:
    """Timestamped provenance JSON: config union metrics
    (reference infer_ali.py:139-146)."""
    merged = {**{k: v for k, v in vars(args).items()}, **results}
    out = (stem or results_basename(args)) + ".json"
    with open(out, "w") as f:
        json.dump(merged, f)
    return out
