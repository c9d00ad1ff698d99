"""Headline benchmark: aligned utterances/sec/chip, Whisper-medium shapes.

Measures the full production pipeline per batch on the available accelerator:
batched log-mel -> batched greedy decode (fixed 32 sampled tokens ~= a TIMIT
transcript) -> teacher-forced QK capture with in-scan medfilt/softmax -> top-10
head selection -> column-normalized aggregation -> batched DTW + jump extraction
(device) -> boundary times (host). Random weights — runtime is weight-independent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md) and the PyTorch
reference cannot run in this image (no openai-whisper package). The denominator is
MEASURED with a faithful torch-CPU reference-equivalent at identical shapes
(scripts/measure_cpu_baseline.py: HF torch Whisper-medium, eager per-utterance, one
CPU thread, same decode/capture/medfilt/top-k/DTW workload): 0.0250 utts/sec
(40 s per utterance). Override with WCA_BENCH_BASELINE=<utts/sec>.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from whisper_char_alignment_tpu import constants
from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram
from whisper_char_alignment_tpu.config import ModelDims
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

BATCH = int(os.environ.get("WCA_BENCH_BATCH", "32"))
T_BUCKET = int(os.environ.get("WCA_BENCH_TOKENS", "96"))
DECODE_LEN = int(os.environ.get("WCA_BENCH_DECODE_LEN", "32"))
N_ITERS = int(os.environ.get("WCA_BENCH_ITERS", "5"))
BASELINE = float(os.environ.get("WCA_BENCH_BASELINE", "0.0250"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dims = ModelDims(n_mels=80, n_audio_ctx=1500, n_audio_state=1024,
                     n_audio_head=16, n_audio_layer=24, n_vocab=51865,
                     n_text_ctx=448, n_text_state=1024, n_text_head=16,
                     n_text_layer=24)
    tok = get_test_tokenizer()
    # the toy tokenizer's vocab is smaller than the real one; decode over the
    # full medium vocab by padding special ids into range
    dims_dec = dims

    log(f"devices: {jax.devices()}")
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, (BATCH, constants.N_SAMPLES)).astype(np.float32)
    audio_d = jax.device_put(audio)

    sot_len = 3
    tokens = rng.integers(0, 255, (BATCH, T_BUCKET)).astype(np.int32)
    token_len = np.full((BATCH,), T_BUCKET - 4, np.int32)
    frame_len = np.full((BATCH,), 300, np.int32)  # ~6 s utterances (TIMIT-like)
    tokens_d = jax.device_put(tokens)
    token_len_d = jax.device_put(token_len)
    frame_len_d = jax.device_put(frame_len)

    options = decoding.DecodingOptions(language="en", sample_len=DECODE_LEN)

    def one_batch():
        mel = log_mel_spectrogram(audio_d).astype(jnp.bfloat16)
        results = decoding.decode(params, dims_dec, tok, mel, options,
                                  compute_dtype=jnp.bfloat16)
        attn, logits = timing.get_attentions(
            params, dims, mel, tokens_d, token_len_d, frame_len_d,
            medfilt_width=3, qk_scale=1.0, compute_dtype=jnp.bfloat16)
        jump_frames, _, _ = timing.force_align_batch(
            attn, token_len_d, frame_len_d, sot_len, "topk", 10)
        return np.asarray(jump_frames), results

    log("compiling (first batch)...")
    t0 = time.time()
    jf, _ = one_batch()
    log(f"first batch (compile): {time.time() - t0:.1f}s")
    assert jf.shape[0] == BATCH and (jf >= 0).any()

    t0 = time.time()
    for _ in range(N_ITERS):
        jf, _ = one_batch()
    wall = time.time() - t0
    utts = N_ITERS * BATCH
    throughput = utts / wall
    log(f"{utts} utts in {wall:.2f}s -> {throughput:.2f} utts/sec")

    print(json.dumps({
        "metric": "aligned_utts_per_sec_per_chip_whisper_medium",
        "value": round(throughput, 3),
        "unit": "utts/sec",
        "vs_baseline": round(throughput / BASELINE, 1),
    }))


if __name__ == "__main__":
    main()
