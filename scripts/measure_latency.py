#!/usr/bin/env python
"""Single-utterance serving latency at Whisper-medium shapes: the api.align
path (mel -> greedy decode -> capture -> head-select -> DTW -> boundaries) at
batch 1, warm, on the real chip — the number an operator of cli/serve cares
about. Also times api.transcribe's single window.

Knobs: LAT_DECODE_LEN (32), LAT_SECONDS (5), LAT_ITERS (10), LAT_TINY=1."""

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

from whisper_char_alignment_tpu import api, constants
from whisper_char_alignment_tpu.config import MODEL_DIMS, tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

TINY = os.environ.get("LAT_TINY") == "1"
DECODE_LEN = int(os.environ.get("LAT_DECODE_LEN", "4" if TINY else "32"))
SECONDS = float(os.environ.get("LAT_SECONDS", "0.5" if TINY else "5"))
ITERS = int(os.environ.get("LAT_ITERS", "3" if TINY else "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    tok = get_test_tokenizer()
    if TINY:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=128,
                              n_text_ctx=96, state=32, head=4, layers=2)
    else:
        dims = MODEL_DIMS["medium"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          wmodel.init_params(jax.random.PRNGKey(0), dims))
    model = api.Model(params=params, dims=dims, tokenizer=tok, name="bench")
    audio = (np.random.default_rng(0)
             .normal(0, 0.05, int(constants.SAMPLE_RATE * SECONDS))
             .astype(np.float32))

    log(f"devices: {jax.devices()}  decode_len={DECODE_LEN} "
        f"audio={SECONDS:.1f}s")

    def one_align():
        return api.align(model, audio, aligned_unit_type="char",
                         aggregation="topk", topk=10, medfilt_width=3,
                         compute_dtype=jnp.bfloat16,
                         decode_sample_len=DECODE_LEN)

    t0 = time.time()
    one_align()
    log(f"align cold (compile): {time.time() - t0:.1f}s")
    lats = []
    for _ in range(ITERS):
        t0 = time.time()
        one_align()
        lats.append(time.time() - t0)
    lats.sort()
    log(f"align warm: min {lats[0]*1000:.0f} ms  "
        f"median {lats[len(lats)//2]*1000:.0f} ms  max {lats[-1]*1000:.0f} ms")

    def one_transcribe():
        return api.transcribe(model, audio, language="en",
                              sample_len=DECODE_LEN,
                              compute_dtype=jnp.bfloat16,
                              temperature=0.0,
                              compression_ratio_threshold=None,
                              logprob_threshold=None,
                              no_speech_threshold=None)

    t0 = time.time()
    one_transcribe()
    log(f"transcribe cold (compile): {time.time() - t0:.1f}s")
    lats_t = []
    for _ in range(ITERS):
        t0 = time.time()
        one_transcribe()
        lats_t.append(time.time() - t0)
    lats_t.sort()
    log(f"transcribe warm: min {lats_t[0]*1000:.0f} ms  "
        f"median {lats_t[len(lats_t)//2]*1000:.0f} ms")
    import json
    print(json.dumps({
        "metric": "single_utterance_align_latency_ms",
        "value": round(lats[len(lats)//2] * 1000, 1),
        "unit": "ms",
        "transcribe_median_ms": round(lats_t[len(lats_t)//2] * 1000, 1),
    }))


if __name__ == "__main__":
    main()
