#!/usr/bin/env python
"""A/B the decode prompt prefill (WCA_DECODE_PREFILL) on the real chip.

Two shapes:
  1. bare sot prompt (the alignment pipeline's decode): prefill replaces
     sample_begin-1 = 3 sequential loop steps with one tiny pass;
  2. a long conditioning prompt (transcribe's condition_on_previous_text,
     trimmed to <=192 tokens by the prompt bucketing): prefill replaces ~190
     sequential steps — the shape the feature exists for.

Usage: python scripts/profile_prefill.py  (B, STEPS, PROMPT via env)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "8"))
STEPS = int(os.environ.get("STEPS", "16"))
PROMPT = int(os.environ.get("PROMPT", "160"))
ITERS = int(os.environ.get("ITERS", "3"))


def main():
    from whisper_char_alignment_tpu.config import MODEL_DIMS, tiny_test_dims
    from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    print(f"devices: {jax.devices()}  B={B} steps={STEPS} prompt={PROMPT}",
          flush=True)
    tok = get_test_tokenizer()
    tiny = os.environ.get("WCA_PREFILL_TINY") == "1"
    if tiny:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24,
                              n_text_ctx=448, state=16, head=2, layers=2)
    else:
        import dataclasses

        dims = dataclasses.replace(MODEL_DIMS["medium"], n_vocab=tok.n_vocab)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(
        0, 1, (B, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32))
    cond = [int(x) for x in rng.integers(5, tok.eot, PROMPT)]

    for name, opts in [
            ("bare sot prompt", decoding.DecodingOptions(
                language="en", sample_len=STEPS)),
            (f"{PROMPT}-token conditioning prompt", decoding.DecodingOptions(
                language="en", sample_len=STEPS, prompt=cond))]:
        for flag in ("1", "0"):
            os.environ["WCA_DECODE_PREFILL"] = flag
            # warm (compile)
            decoding.decode(params, dims, tok, mel, opts,
                            compute_dtype=jnp.bfloat16)
            ts = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                decoding.decode(params, dims, tok, mel, opts,
                                compute_dtype=jnp.bfloat16)
                ts.append(time.perf_counter() - t0)
            label = "prefill" if flag == "1" else "stepwise"
            print(f"{name:36s} {label:9s} min {min(ts)*1e3:8.1f} ms  "
                  f"med {sorted(ts)[len(ts)//2]*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
