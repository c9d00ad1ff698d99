#!/usr/bin/env python
"""Decompose the probe sweep's head-DTW stage on the current backend.

The probe's per-pass `head-DTW sync` (0.39-0.51 s at B=8, medium — DESIGN.md
round-4 probe roofline) covers, per 1024-row chunk launch:

  col-normalize (f32 maps) -> skew -> Pallas wavefront trace -> vmapped
  backtrace (lax.scan) -> jump-frame extraction

This script times each component at the probe's real chunk shape so the next
lever is picked by measurement, not guess. Sync discipline per docs/DESIGN.md
(np.asarray of a reduction; block_until_ready does not sync on axon).

Usage: python scripts/profile_probe_dtw.py [--rows 1024] [--tokens 128]
           [--frames 512] [--iters 5]
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

from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.ops import dtw as dtw_ops
from whisper_char_alignment_tpu.ops import dtw_pallas


def timed(name, fn, iters):
    np.asarray(fn())
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    print(f"{name:>44}: min {min(ts) * 1000:7.1f} ms   "
          f"med {sorted(ts)[len(ts) // 2] * 1000:7.1f} ms")
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--tokens", type=int, default=128,
                    help="text rows per map (token bucket minus sot/eot)")
    ap.add_argument("--frames", type=int, default=512,
                    help="frame-sliced width (probe f_slice)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    b, t, f = args.rows, args.tokens, args.frames
    print(f"devices: {jax.devices()}  rows={b} tokens={t} frames={f}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    # probe-shaped inputs: bf16 capture maps (attn comes out of qkpost bf16;
    # the jit casts to f32 in the normalize), plus per-row lengths
    maps = jax.device_put(rng.random((b, t, f)).astype(np.float32))
    n_rows = jax.device_put(np.full((b,), t - 2, np.int32))
    m_cols = jax.device_put(np.full((b,), f - 8, np.int32))

    @jax.jit
    def colnorm_only(x):
        return timing._safe_col_normalize(x).sum()

    @jax.jit
    def skew_only(x):
        return dtw_pallas._skew_batch(-x).sum()

    @jax.jit
    def trace_only(x):
        return dtw_pallas.dtw_trace_batch(-x).astype(jnp.int32).sum()

    @jax.jit
    def trace_and_backtrace(x, n, m):
        tr = dtw_pallas.dtw_trace_batch(-x)
        return jax.vmap(dtw_ops.dtw_jump_frames)(tr, n, m)

    @jax.jit
    def trace_and_backtrace_diag(x, n, m):
        tr = dtw_pallas.dtw_trace_batch(-x)
        return dtw_ops.dtw_jump_frames_batch(tr, n, m)

    @jax.jit
    def trace_and_backtrace_fused(x, n, m):
        return dtw_pallas.dtw_jump_frames_pallas(-x, n, m)

    @jax.jit
    def full_chunk(x, n, m):
        xn = timing._safe_col_normalize(x)
        return dtw_pallas.dtw_jump_frames_pallas(-xn, n, m)

    # bf16 stream variant (VERDICT r04 #5's named lever): the capture maps are
    # ALREADY bf16 — skip the f32 upcast, column-normalize with an f32 norm
    # accumulator but a bf16 quotient, and feed the wavefront a bf16 skewed
    # stream (the kernel upcasts per diagonal; cost carries stay f32). Halves
    # the HBM bytes of the normalize read/write and the skew/kernel diagonal
    # stream. Numerics change (bf16-rounded costs) — the mismatch count below
    # says whether the jump frames move on random maps.
    maps_bf = maps.astype(jnp.bfloat16)

    @jax.jit
    def full_chunk_bf16(x, n, m):
        norm = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(-2, keepdims=True))
        xn = x / jnp.where(norm == 0, 1.0, norm).astype(jnp.bfloat16)
        return dtw_pallas.dtw_jump_frames_pallas(-xn, n, m)

    timed("col-normalize only", lambda: colnorm_only(maps), args.iters)
    timed("skew only", lambda: skew_only(maps), args.iters)
    timed("wavefront trace (skew+kernel)", lambda: trace_only(maps),
          args.iters)
    timed("trace + per-row backtrace (old)", lambda: trace_and_backtrace(
        maps, n_rows, m_cols), args.iters)
    timed("trace + diag-sync scan backtrace", lambda: trace_and_backtrace_diag(
        maps, n_rows, m_cols), args.iters)
    timed("fused wavefront+backtrace kernels",
          lambda: trace_and_backtrace_fused(maps, n_rows, m_cols), args.iters)
    timed("full chunk (norm+fused kernels)", lambda: full_chunk(
        maps, n_rows, m_cols), args.iters)
    timed("full chunk bf16 stream", lambda: full_chunk_bf16(
        maps_bf, n_rows, m_cols), args.iters)
    jf32 = np.asarray(full_chunk(maps, n_rows, m_cols))
    jf16 = np.asarray(full_chunk_bf16(maps_bf, n_rows, m_cols))
    bad = int((jf32 != jf16).any(axis=-1).sum())
    print(f"bf16-stream jump-frame mismatches: {bad}/{jf32.shape[0]} rows")

    # sublane-width sweep (the chunk is ISSUE-bound on its groups x diagonals
    # sequential walk — see the bf16 refutation above — so the rows-per-step
    # width divides the step count directly). Each width is a separate compile
    # (max_sub is a static arg); results must be bit-equal to the 32-wide ones.
    for ms in (32, 64, 128, 256):
        if b % ms:
            continue

        @jax.jit
        def full_chunk_w(x, n, m, _ms=ms):
            xn = timing._safe_col_normalize(x)
            return dtw_pallas.dtw_jump_frames_pallas(-xn, n, m, max_sub=_ms)

        timed(f"full chunk, max_sub={ms}",
              lambda: full_chunk_w(maps, n_rows, m_cols), args.iters)
        jw = np.asarray(full_chunk_w(maps, n_rows, m_cols))
        assert (jw == jf32).all(), f"max_sub={ms} diverged from 32-wide"
    print("width sweep: all widths bit-equal to max_sub=32")


if __name__ == "__main__":
    main()
