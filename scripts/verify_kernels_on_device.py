#!/usr/bin/env python
"""On-device parity suite for every Pallas kernel vs its XLA reference.

The unit tests pin each kernel in interpret mode (logical semantics); this
script verifies the COMPILED Mosaic kernels on the real accelerator, where
layout/padding-lane behavior could in principle diverge. Run after any kernel
or jax/libtpu change:   python scripts/verify_kernels_on_device.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        raise SystemExit(f"on-device parity failure: {name}")


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # 1. fused capture postprocess vs qk_to_attention (f32: expect ~1e-7)
    from whisper_char_alignment_tpu.models.whisper import qk_to_attention
    from whisper_char_alignment_tpu.ops.qkpost_pallas import qk_postprocess_fused
    from whisper_char_alignment_tpu.ops.dtw import dtw_np

    b, h, t, f = 8, 4, 96, 1500
    qk = jnp.asarray(rng.normal(0, 2, (b, h, t, f)).astype(np.float32))
    fl = jnp.asarray(rng.integers(40, f + 1, (b,)).astype(np.int32))
    tl = jnp.asarray(rng.integers(10, t + 1, (b,)).astype(np.int32))
    for width in (3, 7):
        want = np.asarray(qk_to_attention(qk, fl, tl, width, qk_scale=1.0))
        got = np.asarray(qk_postprocess_fused(qk, fl, tl, width, qk_scale=1.0))
        d = float(np.abs(got - want).max())
        jumps_equal = all(
            np.array_equal(
                dtw_np(-want[i].mean(0)[:int(tl[i]), :int(fl[i])].astype(
                    np.float64))[1],
                dtw_np(-got[i].mean(0)[:int(tl[i]), :int(fl[i])].astype(
                    np.float64))[1]) for i in range(b))
        check(f"qkpost width={width}", d < 1e-6 and jumps_equal,
              f"max|diff|={d:.1e} dtw_jumps_equal={jumps_equal}")

    # 2. fused encoder attention vs XLA (bf16 compute: reduction-order noise)
    from whisper_char_alignment_tpu.config import MODEL_DIMS
    from whisper_char_alignment_tpu.models import whisper as wmodel

    dims = MODEL_DIMS["medium"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          wmodel.init_params(jax.random.PRNGKey(0), dims))
    mel = jnp.asarray(rng.normal(0, 1, (2, dims.n_mels, 2 * dims.n_audio_ctx)
                                 ).astype(np.float32)).astype(jnp.bfloat16)
    a = np.asarray(wmodel.encode_audio(params, dims, mel,
                                       compute_dtype=jnp.bfloat16,
                                       attn_mode="xla"), np.float32)
    c = np.asarray(wmodel.encode_audio(params, dims, mel,
                                       compute_dtype=jnp.bfloat16,
                                       attn_mode="fused"), np.float32)
    rel = float(np.abs(a - c).max() / (np.abs(a).max() + 1e-9))
    check("encoder fused attention (24 layers, bf16)", rel < 0.05,
          f"rel_max_diff={rel:.3f} (bf16 reduction-order level)")

    # 3. int8 cross-attention kernel vs XLA dequant math (f32)
    from whisper_char_alignment_tpu.ops.cross_attn_pallas import (
        cross_attn_step_int8)

    bh, hd, fr = 4, 64, 1500
    q = jnp.asarray(rng.normal(0, 1, (bh, 16, 1, hd)).astype(np.float32))
    k = rng.normal(0, 1, (bh, 16, hd, fr)).astype(np.float32)
    v = rng.normal(0, 1, (bh, 16, hd, fr)).astype(np.float32)

    def quant(x):
        # per-frame-column scale over hd: (B, H, 1, F), the kernel's layout
        amax = np.abs(x).max(axis=2, keepdims=True)
        s = np.where(amax == 0, 1.0, amax / 127.0)
        return (np.clip(np.round(x / s), -127, 127).astype(np.int8),
                s.astype(np.float32))

    k8, ks = quant(k)
    v8, vs = quant(v)
    scale = hd ** -0.25
    k_dq = k8.astype(np.float32) * ks
    v_dq = v8.astype(np.float32) * vs
    qkc = np.einsum("bhtd,bhdf->bhtf", np.asarray(q), k_dq * scale)
    w = jax.nn.softmax(jnp.asarray(qkc), axis=-1)
    want = np.einsum("bhtf,bhdf->bhtd", np.asarray(w), v_dq)
    got = np.asarray(cross_attn_step_int8(
        q, jnp.asarray(k8), jnp.asarray(ks), jnp.asarray(v8), jnp.asarray(vs),
        k_scale=float(scale)))
    d = float(np.abs(got - want).max())
    check("int8 cross-attention decode kernel", d < 1e-4, f"max|diff|={d:.1e}")

    # 3b. int8-MXU cross-attention step vs the same dequant oracle. Random
    # N(0,1) scores give near-UNIFORM softmax over 1500 frames — the worst
    # case for the probability row-quantization (1500 independent rounding
    # errors against a tiny sum; measured ~2.4%). Real attention is peaked,
    # so also check a peaked case at a ~1% budget.
    got_mxu = np.asarray(wmodel._cross_attn_step_int8_mxu(
        q, (jnp.asarray(k8), jnp.asarray(ks)),
        (jnp.asarray(v8), jnp.asarray(vs)), float(scale), jnp.float32))
    rel = float(np.abs(got_mxu - want).max() / (np.abs(want).max() + 1e-9))
    check("int8-MXU cross-attn (uniform worst case)", rel < 0.05,
          f"rel_max_diff={rel:.4f}")
    # q aligned with K column 123, scaled so its post-scale score (~+45)
    # dwarfs the N(0, 2.3) background — a genuinely peaked softmax
    q_peak = jnp.asarray(k_dq[:, :, :, 123][:, :, None, :]) * 20.0
    qkp = np.einsum("bhtd,bhdf->bhtf", np.asarray(q_peak), k_dq * scale)
    wp = jax.nn.softmax(jnp.asarray(qkp), axis=-1)
    want_p = np.einsum("bhtf,bhdf->bhtd", np.asarray(wp), v_dq)
    got_p = np.asarray(wmodel._cross_attn_step_int8_mxu(
        q_peak, (jnp.asarray(k8), jnp.asarray(ks)),
        (jnp.asarray(v8), jnp.asarray(vs)), float(scale), jnp.float32))
    rel_p = float(np.abs(got_p - want_p).max() / (np.abs(want_p).max() + 1e-9))
    check("int8-MXU cross-attn (peaked, realistic)", rel_p < 0.01,
          f"rel_max_diff={rel_p:.4f}")

    # 4. Pallas DTW trace vs NumPy oracle (exact integer paths)
    from whisper_char_alignment_tpu.align import timing

    x = jnp.asarray(rng.normal(0, 1, (9, 40, 300)).astype(np.float32))
    n_rows = 38  # matrix_to_jump_frames uses rows [sot_len : token_len-1]
    token_len = jnp.full((9,), n_rows + 1, jnp.int32)
    m = jnp.full((9,), 280, jnp.int32)
    jf = np.asarray(timing.matrix_to_jump_frames(-x, token_len, m, 0))
    ok = True
    for i in range(9):
        ti, tj = dtw_np(np.asarray(x)[i, :n_rows, :280].astype(np.float64))
        first = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
        ok &= np.array_equal(jf[i][:n_rows], tj[first])
    check("Pallas wavefront DTW vs NumPy oracle", bool(ok))

    # 5. Pallas mel vs XLA mel (bit-level)
    from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram
    from whisper_char_alignment_tpu.ops.mel_pallas import log_mel_pallas

    audio = jnp.asarray(rng.normal(0, 0.1, (2, 480000)).astype(np.float32))
    a = np.asarray(log_mel_spectrogram(audio))
    p = np.asarray(log_mel_pallas(audio))
    d = float(np.abs(a - p).max())
    check("Pallas mel vs XLA mel", d < 2e-4, f"max|diff|={d:.1e}")

    # 6. prompt prefill vs sequential decode_step (bf16 medium decoder):
    # cache columns and the continued step's logits must agree to
    # reduction-reassociation noise (the two paths span identical masked
    # ctx-wide reductions; only the tree shape may differ)
    cross_kv = wmodel.precompute_cross_kv(
        params, dims,
        jnp.asarray(rng.normal(0, 1, (4, dims.n_audio_ctx, dims.n_audio_state)
                               ).astype(np.float32)),
        compute_dtype=jnp.bfloat16)
    prompt = jnp.asarray(rng.integers(0, dims.n_vocab, (4, 4)).astype(np.int32))
    cache_a = wmodel.init_kv_cache(dims, 4, 40, dtype=jnp.bfloat16)
    for i in range(4):
        _, cache_a = wmodel.decode_step(params, dims, prompt[:, i:i + 1],
                                        jnp.int32(i), cache_a, cross_kv,
                                        compute_dtype=jnp.bfloat16)
    cache_b = wmodel.init_kv_cache(dims, 4, 40, dtype=jnp.bfloat16)
    _, cache_b = wmodel.decode_prefill(params, dims, prompt, cache_b, cross_kv,
                                       compute_dtype=jnp.bfloat16)
    nxt = jnp.full((4, 1), 7, jnp.int32)
    lg_a, _ = wmodel.decode_step(params, dims, nxt, jnp.int32(4), cache_a,
                                 cross_kv, compute_dtype=jnp.bfloat16)
    lg_b, _ = wmodel.decode_step(params, dims, nxt, jnp.int32(4), cache_b,
                                 cross_kv, compute_dtype=jnp.bfloat16)
    cd = max(float(jnp.abs(cache_a[k].astype(jnp.float32)
                           - cache_b[k].astype(jnp.float32)).max())
             for k in ("k", "v"))
    ld = float(jnp.abs(lg_a - lg_b).max())
    scale_l = float(jnp.abs(lg_a).max())
    check("decode prefill vs stepwise", cd < 1e-1 and ld < 0.02 * scale_l,
          f"max|cache_diff|={cd:.1e} max|logit_diff|={ld:.2e} "
          f"(|logits|max={scale_l:.1f})")

    print("ALL KERNELS PASS ON DEVICE", flush=True)


if __name__ == "__main__":
    main()
