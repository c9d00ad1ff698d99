"""Probe-oracle throughput bench — BASELINE.json config #5 (the oracle-head
sweep the reference runs as 384 serial CPU DTWs per utterance,
/root/reference/probe_oracle.py:88-106).

Drives the REAL probe CLI path (cli/probe_oracle.infer_dataset): batched
transcribe (mel + greedy decode, pipelined to depth 2), one capture launch per
batch, one batched DTW launch covering every (utterance, head) pair, host
scoring. Whisper-medium shapes, random weights, >= 18-word synthetic
utterances, --use_gt_transcript so the char-token workload is realistic with
random weights (decode still runs and is timed).

Prints one JSON line: {"metric": "probe_oracle_utts_per_sec_per_chip", ...}.
Knobs: WCA_PROBE_UTTS (24), WCA_PROBE_BATCH (8), WCA_PROBE_DECODE_LEN (32),
WCA_PROBE_TINY=1 (CPU smoke).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from whisper_char_alignment_tpu.config import MODEL_DIMS, tiny_test_dims
from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer
from whisper_char_alignment_tpu.cli import common, probe_oracle

TINY = os.environ.get("WCA_PROBE_TINY") == "1"
N_UTTS = int(os.environ.get("WCA_PROBE_UTTS", "4" if TINY else "24"))
BATCH = int(os.environ.get("WCA_PROBE_BATCH", "2" if TINY else "8"))
DECODE_LEN = int(os.environ.get("WCA_PROBE_DECODE_LEN", "8" if TINY else "32"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    tok = get_test_tokenizer()
    if TINY:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=128,
                              n_text_ctx=160, state=32, head=4, layers=2)
    else:
        dims = MODEL_DIMS["medium"]
    log(f"devices: {jax.devices()}")
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    root = tempfile.mkdtemp(prefix="wca_probe_corpus_")
    # >= 18 words per utterance (the probe's eligibility filter); 3-7 s audio
    scp = make_timit_corpus(root, n_utts=N_UTTS,
                            seconds=(1.0, 2.0) if TINY else (3.0, 7.0),
                            words_per_utt=(18, 22), seed=0)

    common.load_model_and_tokenizer = lambda args: (params, dims, tok)
    argv = ["--dataset", "TIMIT", "--scp", scp,
            "--output_dir", os.path.join(root, "results"),
            "--aligned_unit_type", "char", "--strict", "--tolerance", "0.05",
            "--medfilt_width", "3",
            "--hit_within", str(min(10, dims.n_text_layer * dims.n_text_head)),
            "--batch_size", str(BATCH), "--use_gt_transcript",
            "--decode_sample_len", str(DECODE_LEN),
            "--compute_dtype", "bfloat16", "--profile"]
    args = probe_oracle.parse_args(argv)

    # the probe CLI prints its per-run results dict to stdout; this script's
    # stdout carries exactly ONE JSON line (driver contract), so route the
    # CLI's prints to stderr
    from contextlib import redirect_stdout

    log("warmup sweep (compiles)...")
    t0 = time.time()
    with redirect_stdout(sys.stderr):
        probe_oracle.infer_dataset(args)
    log(f"warmup: {time.time() - t0:.1f}s")

    best = None
    for _ in range(int(os.environ.get("WCA_PROBE_PASSES", "3"))):
        t0 = time.time()
        with redirect_stdout(sys.stderr):
            results = probe_oracle.infer_dataset(args)
        wall = time.time() - t0
        log(f"pass: {wall:.2f}s")
        best = wall if best is None else min(best, wall)
    throughput = N_UTTS / best
    n_heads = dims.n_text_layer * dims.n_text_head
    log(f"{N_UTTS} utts x {n_heads} heads in {best:.2f}s -> "
        f"{throughput:.2f} utts/sec ({throughput * n_heads:.0f} head-DTWs/sec)")
    print(json.dumps({
        "metric": "probe_oracle_utts_per_sec_per_chip",
        "value": round(throughput, 3),
        "unit": "utts/sec",
        "hit_rate": results["hit_rate"],
    }))


if __name__ == "__main__":
    main()
