#!/usr/bin/env python
"""Long-form transcribe e2e A/B on the real chip: prompt prefill on vs off.

The seek loop (transcribe.py, the published algorithm) conditions each 30 s
window on the rolling transcript (`condition_on_previous_text`), so every
window after the first decodes behind an up-to-192-token prompt — the shape
`whisper.decode_prefill` exists for. Caveat on comparability: the two arms
are transcript-identical in exact arithmetic (oracle-locked at f32 on CPU,
tests/test_decoding.py), but at bf16 on RANDOM weights the prefill's
different reduction tree can flip near-tie argmaxes, so segment counts may
drift by a few between arms (assert replaced by a report). Treat the delta
as approximate; scripts/profile_prefill.py measures the prompt-consumption
stage exactly.

Usage: python scripts/bench_transcribe_longform.py
Env: SECONDS_AUDIO (default 90), ITERS (2), WCA_XFER_TINY=1 for a CPU smoke.
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

SECONDS_AUDIO = float(os.environ.get("SECONDS_AUDIO", "90"))
ITERS = int(os.environ.get("ITERS", "2"))


def main():
    from whisper_char_alignment_tpu import transcribe as T
    from whisper_char_alignment_tpu.config import MODEL_DIMS, tiny_test_dims
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    tok = get_test_tokenizer()
    tiny = os.environ.get("WCA_XFER_TINY") == "1"
    if tiny:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24,
                              n_text_ctx=448, state=16, head=2, layers=2)
    else:
        import dataclasses

        dims = dataclasses.replace(MODEL_DIMS["medium"], n_vocab=tok.n_vocab)
    print(f"devices: {jax.devices()}  audio={SECONDS_AUDIO:.0f}s  "
          f"iters={ITERS}", flush=True)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # speech-ish synthetic audio: band-limited noise with an amplitude
    # envelope, deterministic across both arms
    rng = np.random.default_rng(7)
    n = int(16000 * SECONDS_AUDIO)
    audio = (rng.normal(0, 0.1, n)
             * (0.5 + 0.5 * np.sin(np.linspace(0, 40 * np.pi, n)))
             ).astype(np.float32)

    for flag in ("1", "0"):
        os.environ["WCA_DECODE_PREFILL"] = flag
        label = "prefill" if flag == "1" else "stepwise"
        kw = dict(compute_dtype=jnp.bfloat16, language="en",
                  condition_on_previous_text=True,
                  temperature=0.0, sample_len=48,
                  logprob_threshold=None, no_speech_threshold=None)
        res = T.transcribe(params, dims, tok, audio, **kw)  # warm (compiles)
        n_seg = len(res["segments"])
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            r = T.transcribe(params, dims, tok, audio, **kw)
            ts.append(time.perf_counter() - t0)
            # same arm, same inputs: deterministic
            assert len(r["segments"]) == n_seg
        rt = SECONDS_AUDIO / min(ts)
        print(f"{label:9s} min {min(ts):6.2f} s  med "
              f"{sorted(ts)[len(ts)//2]:6.2f} s  ({rt:5.1f}x realtime, "
              f"{n_seg} segments)", flush=True)


if __name__ == "__main__":
    main()
