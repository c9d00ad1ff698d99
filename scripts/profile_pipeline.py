#!/usr/bin/env python
"""Reproducible per-stage pipeline profile at Whisper-medium shapes.

Careful sync discipline for the axon backend: ``block_until_ready()`` does not
synchronize there, and a host sync round-trip costs ~30 ms — every measurement
forces a host transfer of a scalar reduction, and sub-50 ms readings should be
treated as latency-floor-dominated (docs/DESIGN.md).

Usage:  python scripts/profile_pipeline.py [--batch 32] [--tokens 96] [--iters 5]
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
from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram
from whisper_char_alignment_tpu.config import MODEL_DIMS
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


def timed(name, fn, iters):
    np.asarray(fn())  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    print(f"{name:>28}: min {min(ts) * 1000:7.1f} ms   "
          f"med {sorted(ts)[len(ts) // 2] * 1000:7.1f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--decode_len", type=int, default=32)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reuse", action="store_true",
                    help="also time the xa / cross-KV reuse capture "
                         "variants (adds the K/V stacks to HBM; use "
                         "--batch 16)")
    args = ap.parse_args()
    b, t = args.batch, args.tokens

    print(f"devices: {jax.devices()}  batch={b} tokens={t}", file=sys.stderr)
    dims = MODEL_DIMS["medium"]  # the sizes table is the single source
    tok = get_test_tokenizer()
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          wmodel.init_params(jax.random.PRNGKey(0), dims))
    rng = np.random.default_rng(0)
    audio = jax.device_put(rng.normal(0, .1, (b, constants.N_SAMPLES))
                           .astype(np.float32))
    tokens = jax.device_put(rng.integers(0, 255, (b, t)).astype(np.int32))
    tl = jax.device_put(np.full((b,), t - 4, np.int32))
    fl = jax.device_put(np.full((b,), args.frames, np.int32))
    opts = decoding.DecodingOptions(language="en", sample_len=args.decode_len)

    mel = log_mel_spectrogram(audio).astype(jnp.bfloat16)
    timed("mel", lambda: log_mel_spectrogram(audio).sum(), args.iters)
    timed("encoder", lambda: wmodel.encode_audio(
        params, dims, mel, compute_dtype=jnp.bfloat16).sum(), args.iters)

    def dec():
        decoding.decode(params, dims, tok, mel, opts,
                        compute_dtype=jnp.bfloat16)
        return jnp.zeros(())
    timed(f"greedy decode ({args.decode_len})", dec, args.iters)

    if os.environ.get("PROF_INT8") == "1":
        def dec_i8():
            decoding.decode(params, dims, tok, mel, opts,
                            compute_dtype=jnp.bfloat16, kv_int8=True)
            return jnp.zeros(())
        timed(f"greedy decode int8 ({args.decode_len})", dec_i8, args.iters)

    def cap():
        # return_logits=False like the production _align_step (and the reuse
        # variants below) — else this baseline alone pays the (B, T, vocab)
        # logits head and the A/B misattributes that cost to encoder reuse
        a, _ = timing.get_attentions(params, dims, mel, tokens, tl, fl,
                                     medfilt_width=3, qk_scale=1.0,
                                     compute_dtype=jnp.bfloat16,
                                     return_logits=False)
        return a[..., 0, 0].sum()
    timed("capture (enc+dec+qkpost)", cap, args.iters)

    # production-path variants: encoder states (and optionally the decode
    # loop's cross K/V) are reused, so the capture pass pays only the decoder
    if args.reuse:
        xa = wmodel.encode_audio(params, dims, mel, compute_dtype=jnp.bfloat16)
        ckv = wmodel.precompute_cross_kv(params, dims, xa,
                                         compute_dtype=jnp.bfloat16)

        def cap_xa():
            a, _ = timing.get_attentions(params, dims, None, tokens, tl, fl,
                                         medfilt_width=3, qk_scale=1.0,
                                         compute_dtype=jnp.bfloat16,
                                         return_logits=False, xa=xa)
            return a[..., 0, 0].sum()
        timed("capture (xa reuse)", cap_xa, args.iters)

        def cap_kv():
            a, _ = timing.get_attentions(params, dims, None, tokens, tl, fl,
                                         medfilt_width=3, qk_scale=1.0,
                                         compute_dtype=jnp.bfloat16,
                                         return_logits=False, xa=None,
                                         cross_kv=ckv)
            return a[..., 0, 0].sum()
        timed("capture (xa + cross-KV reuse)", cap_kv, args.iters)
        del xa, ckv

    attn, _ = timing.get_attentions(params, dims, mel, tokens, tl, fl,
                                    medfilt_width=3, qk_scale=1.0,
                                    return_logits=False,
                                    compute_dtype=jnp.bfloat16)

    def fa():
        jf, _, _ = timing.force_align_batch(attn, tl, fl, 3, "topk", 10)
        return jf.sum()
    timed("head-select + DTW", fa, args.iters)
    del attn  # the f32 stack (~7 GB at B=32) must not stay live across full()

    def full():
        m = log_mel_spectrogram(audio).astype(jnp.bfloat16)
        decoding.decode(params, dims, tok, m, opts, compute_dtype=jnp.bfloat16)
        # return_logits=False matches the production _align_step
        # (runner.py) — the default would add a (B, T, 51865) f32 logits
        # head production never pays, under-reporting throughput
        a, _ = timing.get_attentions(params, dims, m, tokens, tl, fl,
                                     medfilt_width=3, qk_scale=1.0,
                                     return_logits=False,
                                     compute_dtype=jnp.bfloat16)
        jf, _, _ = timing.force_align_batch(a, tl, fl, 3, "topk", 10)
        return jf
    np.asarray(full())
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        np.asarray(full())
        ts.append(time.time() - t0)
    w = min(ts)
    print(f"{'FULL PIPELINE':>28}: min {w * 1000:7.1f} ms   "
          f"-> {b / w:6.2f} utts/sec/chip")


if __name__ == "__main__":
    main()
