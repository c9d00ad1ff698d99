#!/usr/bin/env python
"""A/B micro-benchmarks of the swappable kernels on the current backend:
mel (XLA DFT-matmul vs fused Pallas) and the encoder self-attention kernel's
q-block size. Sync discipline per docs/DESIGN.md (host transfer of a scalar).

Usage: python scripts/profile_kernels.py [--batch 32] [--iters 5] [--which mel,enc]
"""

import argparse
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

from whisper_char_alignment_tpu import constants
from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram


def timed(name, fn, iters):
    np.asarray(fn())
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    print(f"{name:>36}: min {min(ts) * 1000:7.1f} ms   "
          f"med {sorted(ts)[len(ts) // 2] * 1000:7.1f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--which", default="mel,enc")
    args = ap.parse_args()
    b = args.batch
    which = set(args.which.split(","))
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  batch={b}", file=sys.stderr)

    if "mel" in which:
        audio = jax.device_put(
            rng.normal(0, .1, (b, constants.N_SAMPLES)).astype(np.float32))
        timed("mel XLA (DFT matmul)",
              lambda: log_mel_spectrogram(audio).sum(), args.iters)
        from whisper_char_alignment_tpu.ops.mel_pallas import log_mel_pallas
        timed("mel Pallas fused",
              lambda: log_mel_pallas(audio).sum(), args.iters)

    if "enc" in which:
        from whisper_char_alignment_tpu.ops.encoder_attn_pallas import (
            encoder_self_attention)
        h, t, hd = 16, 1500, 64
        q = jax.device_put(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32)
                           .astype(np.dtype("bfloat16")))
        k = jax.device_put(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32)
                           .astype(np.dtype("bfloat16")))
        v = jax.device_put(rng.normal(0, 1, (b, h, t, hd)).astype(np.float32)
                           .astype(np.dtype("bfloat16")))
        for bq in (256, 512, 768):
            timed(f"enc attn kernel block_q={bq}",
                  lambda bq=bq: encoder_self_attention(
                      q, k, v, n_valid=t, block_q=bq)[..., 0].sum(),
                  args.iters)
        from whisper_char_alignment_tpu.ops.encoder_attn_pallas import (
            encoder_self_attention_kt)
        for bq in (256, 512, 1536):
            timed(f"enc attn kernel KT block_q={bq}",
                  lambda bq=bq: encoder_self_attention_kt(
                      q, k, v, n_valid=t, block_q=bq)[..., 0].sum(),
                  args.iters)

        @jax.jit
        def xla_attn(q, k, v):
            s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                           preferred_element_type=jnp.float32)
            w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            return jnp.einsum("bhts,bhsd->bhtd", w, v,
                              preferred_element_type=jnp.float32)
        timed("enc attn XLA einsum",
              lambda: xla_attn(q, k, v)[..., 0].sum(), args.iters)


if __name__ == "__main__":
    main()
