#!/usr/bin/env python
"""Measure the FULL decode-option surface on the chip (VERDICT r04 #6):
greedy vs beam_size=5 vs best_of=5 sampling through the production
``decoding.decode`` (encoder + loop + finalize), Whisper-medium shapes.

The decode-option surface is oracle-tested (tests/test_beam_decoding.py) but
had no TPU perf numbers — if beam's per-step cache reorder is a cliff, the
transcribe story has a hidden cost this records. Greedy runs the lean
while_loop; beam/sampling route to models/beam.py (per-step cache gather on
the beam axis).

Env: B (default 8), STEPS (32), MODEL (medium), WCA_BEAM_TINY=1 smoke.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TINY = os.environ.get("WCA_BEAM_TINY") == "1"
if TINY or os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    from whisper_char_alignment_tpu.utils.compile_cache import cpu_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from whisper_char_alignment_tpu.config import MODEL_DIMS, tiny_test_dims
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

B = int(os.environ.get("B", "2" if TINY else "8"))
STEPS = int(os.environ.get("STEPS", "4" if TINY else "32"))


def main():
    tok = get_test_tokenizer()
    if TINY:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=64,
                              n_text_ctx=48, state=32, head=4, layers=2)
    else:
        dims = MODEL_DIMS[os.environ.get("MODEL", "medium")]
    print(f"devices: {jax.devices()} B={B} steps={STEPS}", flush=True)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          wmodel.init_params(jax.random.PRNGKey(0), dims))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(
        0, 1, (B, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32))

    variants = [
        ("greedy", dict()),
        ("beam_size=5", dict(beam_size=5)),
        ("beam_size=5 patience=2", dict(beam_size=5, patience=2.0)),
        ("best_of=5 t=1.0", dict(best_of=5, temperature=1.0)),
        ("sampling t=1.0", dict(temperature=1.0)),
    ]
    base = None
    for name, kw in variants:
        opts = decoding.DecodingOptions(language="en", sample_len=STEPS, **kw)

        def run():
            out = decoding.decode(params, dims, tok, mel, opts,
                                  compute_dtype=jnp.bfloat16,
                                  rng=jax.random.PRNGKey(1))
            return out

        run()  # compile
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            run()
            ts.append(time.monotonic() - t0)
        best = min(ts)
        if base is None:
            base = best
        print(f"{name:>24}: min {best * 1000:8.1f} ms  "
              f"({best / base:4.2f}x greedy; {B / best:6.2f} utts/s decode)",
              flush=True)


if __name__ == "__main__":
    main()
