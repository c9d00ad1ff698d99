#!/usr/bin/env python
"""Measure the guarded int8 K/V decode's cost envelope on the REAL decode path.

Times decoding.decode (encoder + 32-step greedy loop, Whisper-medium shapes,
random bf16 weights) in four modes:

  exact        — un-quantized baseline
  int8         — plain --decode_kv_int8 (the -29% decode-loop win)
  guard=0      — int8 + margin tracking, no re-decode (the guarded mode's
                 BEST case: its only overhead is the per-step top-2)
  guard=inf    — every utterance re-decoded exactly (WORST case: int8 pass +
                 a full exact pass, minus the shared encoder)

The deployable guarded cost is guard0 + flag_rate * (guardinf - guard0);
flag_rate is checkpoint/data dependent (random weights have near-zero margins,
so no rate is claimed here — the calibration lives in tests/test_kv_int8.py).

MODE=bucket measures the same envelope for the guarded frame-bucket mode
(--decode_frame_bucket_guarded): exact / plain bucket / guard=0 / guard=inf,
at KV_FRAMES (default 512 of medium's 1500 — a ~10 s batch bucket).

Knobs (env): B (16), STEPS (32), MODE (int8|bucket), KV_FRAMES (512),
WCA_PROFILE_TINY=1 (CPU smoke).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from whisper_char_alignment_tpu.config import MODEL_DIMS, tiny_test_dims
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

TINY = os.environ.get("WCA_PROFILE_TINY") == "1"
B = int(os.environ.get("B", "4" if TINY else "16"))
STEPS = int(os.environ.get("STEPS", "8" if TINY else "32"))


def main():
    tok = get_test_tokenizer()
    dims = (tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=128,
                           n_text_ctx=96, state=32, head=4, layers=2)
            if TINY else MODEL_DIMS["medium"])
    print(f"devices: {jax.devices()}  B={B} steps={STEPS}", file=sys.stderr)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    mel = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (B, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32))
    opts = decoding.DecodingOptions(language="en", sample_len=STEPS)

    if os.environ.get("MODE", "int8") == "bucket":
        kv_frames = int(os.environ.get(
            "KV_FRAMES", "32" if TINY else "512"))
        print(f"mode=bucket kv_frames={kv_frames}/{dims.n_audio_ctx}",
              file=sys.stderr)
        modes = [
            ("exact", dict()),
            ("bucket", dict(kv_frames=kv_frames)),
            ("guard=0 (track only)",
             dict(kv_frames=kv_frames, kv_frames_guard=0.0)),
            ("guard=inf (full re-decode)",
             dict(kv_frames=kv_frames, kv_frames_guard=1e9)),
        ]
    else:
        modes = [
            ("exact", dict()),
            ("int8", dict(kv_int8=True)),
            ("guard=0 (track only)", dict(kv_int8_guard=0.0)),
            ("guard=inf (full re-decode)", dict(kv_int8_guard=1e9)),
        ]
    results = {}
    for name, kw in modes:
        decoding.decode(params, dims, tok, mel, opts,
                        compute_dtype=jnp.bfloat16, **kw)  # compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            decoding.decode(params, dims, tok, mel, opts,
                            compute_dtype=jnp.bfloat16, **kw)
            ts.append(time.time() - t0)
        results[name] = min(ts)
        print(f"{name:>28}: min {min(ts) * 1000:8.1f} ms", flush=True)

    base = results["exact"]
    for name in results:
        print(f"{name:>28}: {results[name] / base:6.2f}x exact", flush=True)


if __name__ == "__main__":
    main()
