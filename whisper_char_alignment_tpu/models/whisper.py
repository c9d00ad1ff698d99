"""Whisper encoder/decoder as pure JAX functions over a parameter pytree.

Re-designs the model slice of ``openai-whisper`` that the reference drives
(reference call sites: infer_ali.py:36 ``load_model``, timing.py:57-58 teacher-forced
``model(mel, tokens)`` under forward hooks + ``disable_sdpa``). TPU-first choices:

- layers are *stacked* along a leading axis and executed with ``lax.scan`` —
  constant-size XLA program regardless of depth, natural sharding axis, and the
  per-layer cross-attention QK stack falls out as the scan's stacked output
  (no hooks: ``forward(params, mel, tokens) -> (logits, qk[L, B, H, T, F])``);
- all matmuls carry ``preferred_element_type=float32`` so bf16 params/activations
  still accumulate in f32 on the MXU;
- everything is shape-static: mel is always (B, n_mels, 2 * n_audio_ctx), tokens
  always (B, T) — padding + masks instead of dynamic shapes.

Math parity notes (vs whisper.model):
- attention scales q and k each by ``head_dim ** -0.25``; the captured QK equals the
  pre-softmax product *after* this scaling (and after the causal mask for self-attn),
  which is exactly what the reference's hook captures (timing.py:52-54, requires
  ``disable_sdpa`` so the module returns qk);
- GELU is the exact erf form; LayerNorm eps 1e-5; key projection has no bias;
- logits are tied to the token embedding.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelDims

Params = Dict[str, Any]


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Fixed sinusoidal position embedding (whisper.model.sinusoids semantics)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _dense(rng, d_in, d_out, bias=True):
    k1, _ = jax.random.split(rng)
    w = jax.random.normal(k1, (d_in, d_out), jnp.float32) * (d_in ** -0.5)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _attn_block(rng, d, cross: bool):
    ks = jax.random.split(rng, 8)
    block = {
        "attn_ln": _ln(d),
        "attn": {
            "q": _dense(ks[0], d, d),
            "k": _dense(ks[1], d, d, bias=False),
            "v": _dense(ks[2], d, d),
            "out": _dense(ks[3], d, d),
        },
        "mlp_ln": _ln(d),
        "mlp": {"fc1": _dense(ks[4], d, 4 * d), "fc2": _dense(ks[5], 4 * d, d)},
    }
    if cross:
        block["cross_attn_ln"] = _ln(d)
        block["cross_attn"] = {
            "q": _dense(ks[6], d, d),
            "k": _dense(ks[7], d, d, bias=False),
            "v": _dense(jax.random.fold_in(rng, 101), d, d),
            "out": _dense(jax.random.fold_in(rng, 102), d, d),
        }
    return block


def _stack_blocks(blocks):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(rng: jax.Array, dims: ModelDims) -> Params:
    """Random-init parameter pytree (layers stacked on axis 0)."""
    d = dims.n_audio_state
    ks = jax.random.split(rng, 8)
    enc_blocks = _stack_blocks(
        [_attn_block(jax.random.fold_in(ks[0], i), d, cross=False)
         for i in range(dims.n_audio_layer)])
    dec_blocks = _stack_blocks(
        [_attn_block(jax.random.fold_in(ks[1], i), dims.n_text_state, cross=True)
         for i in range(dims.n_text_layer)])
    return {
        "encoder": {
            "conv1": {
                "w": jax.random.normal(ks[2], (d, dims.n_mels, 3)) * 0.05,
                "b": jnp.zeros((d,)),
            },
            "conv2": {
                "w": jax.random.normal(ks[3], (d, d, 3)) * 0.05,
                "b": jnp.zeros((d,)),
            },
            "pos_emb": jnp.asarray(sinusoids(dims.n_audio_ctx, d)),
            "blocks": enc_blocks,
            "ln_post": _ln(d),
        },
        "decoder": {
            "tok_emb": jax.random.normal(ks[4], (dims.n_vocab, dims.n_text_state)) * 0.02,
            "pos_emb": jax.random.normal(ks[5], (dims.n_text_ctx, dims.n_text_state)) * 0.01,
            "blocks": dec_blocks,
            "ln": _ln(dims.n_text_state),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(p, x):
    if "w8" in p:
        return _linear_int8(p, x)
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _linear_int8(p, x):
    """int8-MXU dense layer: weights are per-output-channel int8 (``w8`` with
    f32 scale ``s``); activations are quantized per row here so the dot is
    int8 x int8 -> int32 on the MXU (2x the bf16 matmul throughput on v5e).
    Opt-in via :func:`quantize_encoder_int8` — the quantized pytree itself
    selects this path, so every consumer (decode, capture, runner) follows
    without signature changes."""
    x8, xs = _int8_rowwise(x.astype(jnp.float32))
    y = jax.lax.dot_general(x8, p["w8"], (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * xs * p["s"]).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def quantize_encoder_int8(params: Params) -> Params:
    """Opt-in encoder weight quantization: replace the q/k/v/out projections
    and both MLP matmuls of every encoder block with per-output-channel int8
    weights (+ f32 scales). Convs, layer norms, and the whole decoder stay
    bf16/f32 — the encoder's big dense matmuls are MXU-throughput-bound
    (docs/DESIGN.md encoder ablation), and int8 doubles MXU throughput.
    NOT parity-true (quantization perturbs the encoder states); the exact
    bf16 path remains the default."""

    blocks = params["encoder"]["blocks"]
    if "w8" in blocks["attn"]["q"]:
        return params  # idempotent: already quantized

    def quant_stacked(dense):
        # stacked (L, din, dout) weights: per (layer, out-channel) scale
        w = np.asarray(dense["w"], np.float32)
        amax = np.abs(w).max(axis=1, keepdims=True)
        s = np.where(amax == 0, 1.0, amax / 127.0).astype(np.float32)
        w8 = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        out = {"w8": jnp.asarray(w8), "s": jnp.asarray(s)}
        if "b" in dense:
            out["b"] = dense["b"]
        return out

    new_blocks = dict(blocks)
    new_blocks["attn"] = {k: (quant_stacked(v) if k in ("q", "k", "v", "out")
                              else v)
                          for k, v in blocks["attn"].items()}
    new_blocks["mlp"] = {k: quant_stacked(v)
                         for k, v in blocks["mlp"].items()}
    new_params = dict(params)
    new_params["encoder"] = dict(params["encoder"])
    new_params["encoder"]["blocks"] = new_blocks
    return new_params


def cast_params(params: Params, dtype) -> Params:
    """Compute-dtype cast that PRESERVES the int8 quantized encoder leaves.

    A blanket ``astype(dtype)`` silently destroys ``quantize_encoder_int8``'s
    pytree: the int8 ``w8`` codes become float (the dense layer still routes
    via the 'w8' key, so the dot runs a degraded float path instead of the
    advertised int8-MXU one) and the f32 ``s`` scales pick up bf16 rounding
    drift (ADVICE r03, medium). Integer leaves keep their dtype; 's' scale
    leaves stay f32; everything else casts to ``dtype``.
    """
    import jax.tree_util as jtu

    def cast(path, x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x
        if path and isinstance(path[-1], jtu.DictKey) and path[-1].key == "s":
            return x  # quantization scales: keep f32
        return x.astype(dtype)

    return jtu.tree_map_with_path(cast, params)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def _qkv_attention(p, x, xa, n_head, mask=None, return_qk=False):
    """Scaled-dot attention; returns (out, qk_f32 or None).

    ``qk`` is the pre-softmax logit tensor *including* the additive mask — the
    quantity the reference's hook captures (whisper qkv_attention returns
    ``qk.detach()`` after mask addition).
    """
    d_head = x.shape[-1] // n_head
    scale = d_head ** -0.25
    q = _split_heads(_linear(p["q"], x), n_head) * scale
    src = x if xa is None else xa  # self-attention vs cross-attention source
    k = _split_heads(_linear(p["k"], src), n_head)
    v = _split_heads(_linear(p["v"], src), n_head)
    qk = jnp.einsum("bhtd,bhsd->bhts", q, k * scale,
                    preferred_element_type=jnp.float32)
    if mask is not None:
        qk = qk + mask
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = _merge_heads(jnp.einsum("bhts,bhsd->bhtd", w, v,
                                  preferred_element_type=jnp.float32).astype(x.dtype))
    out = _linear(p["out"], out)
    return out, (qk if return_qk else None)


def _cross_attention_kv(p, x, ck, cv, n_head, return_qk):
    """Cross-attention against PRECOMPUTED K/V in the (B, H, hd, F) decode-loop
    layout (:func:`precompute_cross_kv`) — same math as :func:`_qkv_attention`
    with ``xa``, minus the two K/V projections. Both contractions run over the
    head_dim axis directly in the stored layout, so no transpose of the ~GB-scale
    K/V tensors is materialized."""
    d_head = x.shape[-1] // n_head
    scale = d_head ** -0.25
    q = _split_heads(_linear(p["q"], x), n_head) * scale
    qk = jnp.einsum("bhtd,bhdf->bhtf", q, ck.astype(x.dtype) * scale,
                    preferred_element_type=jnp.float32)
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = _merge_heads(jnp.einsum("bhtf,bhdf->bhtd", w, cv.astype(x.dtype),
                                  preferred_element_type=jnp.float32
                                  ).astype(x.dtype))
    out = _linear(p["out"], out)
    return out, (qk if return_qk else None)


def _residual_block(bp, x, xa, n_head, mask, return_qk, cross_kv=None):
    """One decoder/encoder block. Returns (x, cross_qk or None)."""
    a, _ = _qkv_attention(bp["attn"], _layer_norm(bp["attn_ln"], x), None,
                          n_head, mask=mask)
    x = x + a
    qk = None
    if "cross_attn" in bp:
        if cross_kv is not None:
            c, qk = _cross_attention_kv(
                bp["cross_attn"], _layer_norm(bp["cross_attn_ln"], x),
                cross_kv[0], cross_kv[1], n_head, return_qk=return_qk)
        else:
            c, qk = _qkv_attention(
                bp["cross_attn"], _layer_norm(bp["cross_attn_ln"], x), xa,
                n_head, return_qk=return_qk)
        x = x + c
    h = _layer_norm(bp["mlp_ln"], x)
    h = _linear(bp["mlp"]["fc2"], jax.nn.gelu(_linear(bp["mlp"]["fc1"], h),
                                              approximate=False))
    return x + h, qk


def _conv1d(p, x, stride):
    # x: (B, C_in, T); torch Conv1d weight layout (C_out, C_in, K), padding=1
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p["b"].astype(x.dtype)[None, :, None]


def _cross_attn_mode() -> str:
    """Decode cross-attention implementation for int8 K/V (WCA_CROSS_ATTN).
    Only consulted when the K/V are quantized (cfg.decode_kv_int8).

    NOTE (ADVICE r03): "auto" resolves to "mxu" on single-chip TPU, which
    adds q- and probability-row quantization ON TOP of the K/V quantization —
    up to ~2.4% relative error vs the "xla" dequant numerics in the
    diffuse-softmax worst case (scripts/verify_kernels_on_device.py). This is
    a deliberate perf default for an already-not-parity-true opt-in flag; it
    is documented in the --decode_kv_int8 CLI help, and WCA_CROSS_ATTN=xla
    restores the round-2 dequant numerics exactly.

    - "mxu": int8 MXU matmuls — q and the v-scaled probabilities are
      quantized per-row so BOTH dots consume the int8 tensors directly from
      HBM (the 2x byte reduction survives; no dequantized copy, no extra
      kernel launches).
    - "pallas": fused VMEM-dequant kernel (ops/cross_attn_pallas.py),
      vectorized over heads.
    - "xla": dequantize-then-einsum (materializes a full-precision copy —
      the round-2 measurement that lost the 2x).
    """
    import os

    mode = os.environ.get("WCA_CROSS_ATTN", "auto")
    if mode == "auto":
        return ("mxu" if jax.default_backend() != "cpu"
                and jax.device_count() == 1 else "xla")
    if mode in ("0", "off", "false", "xla"):
        return "xla"
    if mode in ("mxu", "int8mxu"):
        return "mxu"
    if mode in ("1", "on", "true", "pallas"):
        return "pallas"
    # a typo must not silently select the slowest implementation
    raise ValueError(
        f"WCA_CROSS_ATTN={mode!r} is not a known mode; use one of "
        "auto / mxu / pallas / xla (off)")


def _pallas_kernel_enabled(env_var: str) -> bool:
    """Shared guard for the opt-in/auto Pallas kernel flags (WCA_QKPOST,
    WCA_CROSS_ATTN, and the 'fused' arm of WCA_ENC_ATTN).

    auto = on only for a SINGLE accelerator: pallas_call has no GSPMD
    partitioning rule, so multi-chip data-parallel runs keep the XLA paths
    (which partition cleanly) unless a kernel is forced on.

    Resolution happens in the un-jitted public wrappers (encode_audio,
    decode_text, decode_step, forward, and their counterparts in align.timing
    / models.decoding / runner), which pass the resolved mode into the jitted
    inner function as a static argument — so the flag IS part of the jit
    cache key and flipping it mid-process switches kernels instead of
    silently reusing a stale trace."""
    import os

    mode = os.environ.get(env_var, "auto")
    if mode == "auto":
        return jax.default_backend() != "cpu" and jax.device_count() == 1
    return mode not in ("0", "off", "false", "xla")


def _use_fused_qkpost() -> bool:
    return _pallas_kernel_enabled("WCA_QKPOST")


def _encoder_attn_mode() -> str:
    """Encoder attention implementation (env WCA_ENC_ATTN):
    - "fused": shape-tuned Pallas kernel (ops/encoder_attn_pallas.py) — scores
      stay in VMEM; default on accelerators.
    - "xla": plain einsum + f32 softmax (materializes the (T, T) logits in
      HBM); default on CPU, and the parity oracle.
    - "stock": jax's generic flash kernel; measured SLOWER than XLA at these
      shapes on v5e (kept for comparison; legacy WCA_FLASH_ATTN=1)."""
    import os

    mode = os.environ.get("WCA_ENC_ATTN", "auto")
    if mode == "auto" and os.environ.get("WCA_FLASH_ATTN", "off") not in (
            "0", "off", "false", "auto"):
        return "stock"
    if mode == "auto":
        return "fused" if _pallas_kernel_enabled("WCA_ENC_ATTN") else "xla"
    if mode in ("1", "on", "true", "fused"):
        return "fused"
    if mode in ("0", "off", "false", "xla"):
        return "xla"
    if mode == "stock":
        return "stock"
    # same rule as _cross_attn_mode: a typo must not silently select the
    # slowest implementation (an unknown value fell through to the XLA path
    # and kernel A/Bs measured the wrong arm — round-4 review finding)
    raise ValueError(f"WCA_ENC_ATTN={mode!r} is not a known mode; use one of "
                     "auto / fused (on) / stock / xla (off)")


def _fused_self_attention(p, x, n_head, n_valid):
    """Encoder self-attention via the shape-tuned Pallas kernel."""
    from ..ops.encoder_attn_pallas import encoder_self_attention

    d_head = x.shape[-1] // n_head
    scale = d_head ** -0.25
    q = _split_heads(_linear(p["q"], x), n_head) * scale
    k = _split_heads(_linear(p["k"], x), n_head) * scale
    v = _split_heads(_linear(p["v"], x), n_head)
    o = encoder_self_attention(q, k, v, n_valid=n_valid)
    return _linear(p["out"], _merge_heads(o.astype(x.dtype)))


def _flash_self_attention(p, x, n_head, seg_ids):
    """Unmasked self-attention via the stock Pallas TPU flash kernel: the
    (T, T) probability matrix never touches HBM (the XLA path materializes
    24 x (1500, 1500) f32 matrices per batch item — the encoder's bottleneck)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    d_head = x.shape[-1] // n_head
    q = _split_heads(_linear(p["q"], x), n_head)
    k = _split_heads(_linear(p["k"], x), n_head)
    v = _split_heads(_linear(p["v"], x), n_head)
    o = fa.flash_attention(q, k, v, segment_ids=fa.SegmentIds(seg_ids, seg_ids),
                           causal=False, sm_scale=d_head ** -0.5)
    return _linear(p["out"], _merge_heads(o.astype(x.dtype)))


def encode_audio(params: Params, dims: ModelDims, mel: jax.Array,
                 compute_dtype=jnp.float32,
                 attn_mode: Optional[str] = None) -> jax.Array:
    """AudioEncoder: mel (B, n_mels, 2 * n_audio_ctx) -> (B, n_audio_ctx, d).

    ``attn_mode=None`` resolves WCA_ENC_ATTN here, OUTSIDE the jit, so the
    chosen implementation is a static argument of the cached trace."""
    if attn_mode is None:
        attn_mode = _encoder_attn_mode()
    return _encode_audio_jit(params, dims, mel, compute_dtype=compute_dtype,
                             attn_mode=attn_mode)


@functools.partial(jax.jit, static_argnames=("dims", "compute_dtype", "attn_mode"))
def _encode_audio_jit(params: Params, dims: ModelDims, mel: jax.Array,
                      compute_dtype=jnp.float32,
                      attn_mode: str = "xla") -> jax.Array:
    ep = params["encoder"]
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(_conv1d(ep["conv1"], x, 1), approximate=False)
    x = jax.nn.gelu(_conv1d(ep["conv2"], x, 2), approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T, d)
    x = x + ep["pos_emb"].astype(compute_dtype)

    t = x.shape[1]
    t_pad = ((t + 511) // 512) * 512 if attn_mode == "stock" else t
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    seg_ids = (jnp.arange(t_pad)[None, :] >= t).astype(jnp.int32)
    seg_ids = jnp.broadcast_to(seg_ids, (x.shape[0], t_pad))

    def step(x, bp):
        if attn_mode in ("stock", "fused"):
            h_in = _layer_norm(bp["attn_ln"], x)
            if attn_mode == "stock":
                a = _flash_self_attention(bp["attn"], h_in,
                                          dims.n_audio_head, seg_ids)
            else:
                a = _fused_self_attention(bp["attn"], h_in,
                                          dims.n_audio_head, n_valid=t)
            x = x + a
            h = _layer_norm(bp["mlp_ln"], x)
            h = _linear(bp["mlp"]["fc2"],
                        jax.nn.gelu(_linear(bp["mlp"]["fc1"], h),
                                    approximate=False))
            return x + h, None
        y, _ = _residual_block(bp, x, None, dims.n_audio_head, None, False)
        return y, None

    x, _ = jax.lax.scan(step, x, ep["blocks"])
    if t_pad != t:
        x = x[:, :t]
    return _layer_norm(ep["ln_post"], x)


def _causal_mask(t: int) -> jax.Array:
    return jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)


def qk_to_attention(qk: jax.Array, frame_len: jax.Array, token_len: jax.Array,
                    medfilt_width: int, qk_scale, attn_dtype=jnp.float32):
    """Post-process raw cross-attention QK logits into alignment attention maps.

    Mirrors the reference's per-utterance pipeline (timing.py:63-66): frame
    truncation (as masking), median filter *on logits*, scaled softmax — plus
    zeroing of padded token rows so fixed-shape batching is exactly equivalent to
    the reference's physical slicing. qk: (B, H, T, F) f32.
    """
    from ..ops.medfilt import median_filter_masked  # local import avoids a cycle

    b, _, t, f = qk.shape
    qk = median_filter_masked(qk, medfilt_width, frame_len)
    frame_ok = jnp.arange(f)[None, :] < frame_len[:, None]  # (B, F)
    qk = jnp.where(frame_ok[:, None, None, :], qk * qk_scale, -jnp.inf)
    attn = jax.nn.softmax(qk, axis=-1)
    token_ok = jnp.arange(t)[None, :] < token_len[:, None]  # (B, T)
    return jnp.where(token_ok[:, None, :, None], attn, 0.0).astype(attn_dtype)


def decode_text(params: Params, dims: ModelDims, tokens: jax.Array, xa: jax.Array,
                return_qk: bool = True, compute_dtype=jnp.float32,
                medfilt_width: Optional[int] = None,
                frame_len: Optional[jax.Array] = None,
                token_len: Optional[jax.Array] = None,
                qk_scale=1.0, attn_dtype=jnp.float32,
                return_logits: bool = True, cross_kv=None,
                qkpost: Optional[bool] = None):
    """TextDecoder teacher-forced over the full token sequence.

    tokens (B, T) int32, xa (B, F, d) encoder output.
    Returns (logits (B, T, vocab) f32, qk (L, B, H, T, F) f32 or None).

    When ``medfilt_width`` is given, each layer's QK is post-processed *inside the
    layer scan* (mask -> median filter -> scaled softmax -> pad-row zeroing via
    :func:`qk_to_attention`), so the raw f32 QK stack is never materialized across
    layers — the scan output is the alignment-ready attention stack.

    ``cross_kv``: optional precomputed per-layer cross K/V stacks
    ``((L, B, H, hd, F), (L, B, H, hd, F))`` from :func:`precompute_cross_kv`
    (un-quantized). The transcription pass already paid the 2x24 K/V projections
    over the 1500 encoder frames (~4.8 TFLOP at medium B=32); reusing them here
    skips that work, and ``xa`` is then only used as a fallback (may be None).

    ``qkpost=None`` resolves WCA_QKPOST here, OUTSIDE the jit, so the fused
    QK-postprocess kernel choice is a static argument of the cached trace.
    """
    if qkpost is None:
        qkpost = _use_fused_qkpost()
    return _decode_text_jit(params, dims, tokens, xa, return_qk=return_qk,
                            compute_dtype=compute_dtype,
                            medfilt_width=medfilt_width, frame_len=frame_len,
                            token_len=token_len, qk_scale=qk_scale,
                            attn_dtype=attn_dtype, return_logits=return_logits,
                            cross_kv=cross_kv, qkpost=qkpost)


@functools.partial(jax.jit, static_argnames=(
    "dims", "return_qk", "compute_dtype", "medfilt_width", "attn_dtype",
    "return_logits", "qkpost"))
def _decode_text_jit(params: Params, dims: ModelDims, tokens: jax.Array,
                     xa: jax.Array, return_qk: bool = True,
                     compute_dtype=jnp.float32,
                     medfilt_width: Optional[int] = None,
                     frame_len: Optional[jax.Array] = None,
                     token_len: Optional[jax.Array] = None,
                     qk_scale=1.0, attn_dtype=jnp.float32,
                     return_logits: bool = True, cross_kv=None,
                     qkpost: bool = False):
    dp = params["decoder"]
    t = tokens.shape[-1]
    x = (dp["tok_emb"][tokens] + dp["pos_emb"][:t]).astype(compute_dtype)
    mask = _causal_mask(t)
    if xa is not None:
        xa = xa.astype(compute_dtype)

    use_fused_post = qkpost

    def step(x, inp):
        if cross_kv is None:
            bp, layer_kv = inp, None
        else:
            bp, ck, cv = inp
            layer_kv = (ck, cv)
        y, qk = _residual_block(bp, x, xa, dims.n_text_head, mask, return_qk,
                                cross_kv=layer_kv)
        if qk is not None and medfilt_width is not None:
            if use_fused_post:
                from ..ops.qkpost_pallas import qk_postprocess_fused

                qk = qk_postprocess_fused(qk, frame_len, token_len,
                                          medfilt_width, qk_scale,
                                          attn_dtype=attn_dtype)
            else:
                qk = qk_to_attention(qk, frame_len, token_len, medfilt_width,
                                     qk_scale, attn_dtype)
        return y, qk

    xs = (dp["blocks"] if cross_kv is None
          else (dp["blocks"], cross_kv[0], cross_kv[1]))
    x, qks = jax.lax.scan(step, x, xs)
    x = _layer_norm(dp["ln"], x)
    if not return_logits:
        # alignment-only callers skip the (B, T, vocab) projection entirely
        return None, qks
    logits = jnp.dot(x.astype(jnp.float32), dp["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return logits, qks


def forward(params: Params, dims: ModelDims, mel: jax.Array, tokens: jax.Array,
            return_qk: bool = True, compute_dtype=jnp.float32):
    """Teacher-forced full forward: the hook-free equivalent of the reference's
    ``model(mel, tokens)`` + cross-attn QK capture (timing.py:45-58)."""
    return _forward_jit(params, dims, mel, tokens, return_qk=return_qk,
                        compute_dtype=compute_dtype,
                        attn_mode=_encoder_attn_mode())


@functools.partial(jax.jit, static_argnames=("dims", "return_qk",
                                             "compute_dtype", "attn_mode"))
def _forward_jit(params: Params, dims: ModelDims, mel: jax.Array,
                 tokens: jax.Array, return_qk: bool = True,
                 compute_dtype=jnp.float32, attn_mode: str = "xla"):
    xa = _encode_audio_jit(params, dims, mel, compute_dtype=compute_dtype,
                           attn_mode=attn_mode)
    # no medfilt here, so the QK postprocess kernel never runs: qkpost is inert
    return _decode_text_jit(params, dims, tokens, xa, return_qk=return_qk,
                            compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# Incremental decoding support (KV cache)
# ---------------------------------------------------------------------------

def init_kv_cache(dims: ModelDims, batch: int, max_len: int,
                  dtype=jnp.float32) -> Params:
    """Self-attention K/V cache, stored transposed as (L, B, H, hd, ctx) — the
    64-wide head_dim on the last axis would tile-pad to 128 lanes (2x HBM read
    per decode step); with ctx last nothing is padded."""
    hd = dims.n_text_head_dim
    shape = (dims.n_text_layer, batch, dims.n_text_head, hd, max_len)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


@functools.partial(jax.jit, static_argnames=("dims", "compute_dtype", "quantize"))
def precompute_cross_kv(params: Params, dims: ModelDims, xa: jax.Array,
                        compute_dtype=jnp.float32, quantize: bool = False):
    """Cross-attention K/V for every decoder layer, stored transposed as
    (L, B, H, hd, F) each.

    Layout note: head_dim (64) on the last axis would be padded to the 128-lane
    tile — a 2x HBM cost on the tensor the decode loop re-reads every step. With
    (hd, F) as the trailing dims both matmuls of the step contract over F and
    nothing is padded.

    ``quantize=True`` stores K/V as int8 with a per-(layer, item, head, frame)
    f32 scale — the decode loop is bound by streaming these tensors from HBM
    every step, so int8 halves its floor; opt-in (small transcript-accuracy
    risk; the alignment capture path is unaffected)."""
    xa = xa.astype(compute_dtype)

    def step(_, bp):
        cp = bp["cross_attn"]
        k = _split_heads(_linear(cp["k"], xa), dims.n_text_head)
        v = _split_heads(_linear(cp["v"], xa), dims.n_text_head)
        return None, (k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2))

    _, (ks, vs) = jax.lax.scan(step, None, params["decoder"]["blocks"])
    if not quantize:
        return ks, vs

    def quant(x):
        # scale over the 64-wide head_dim axis, per frame column
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=3, keepdims=True)
        scale = jnp.where(amax == 0, 1.0, amax / 127.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                     ).astype(jnp.int8)
        return q, scale

    kq, k_s = quant(ks)
    vq, v_s = quant(vs)
    return (kq, k_s), (vq, v_s)


def decode_step(params: Params, dims: ModelDims, tokens: jax.Array, pos: jax.Array,
                cache: Params, cross_kv, compute_dtype=jnp.float32,
                cross_mode: Optional[str] = None):
    """One autoregressive decoder step.

    tokens (B, 1) int32 at position ``pos`` (scalar int32); cache holds self-attn
    K/V for all layers at positions < pos. Returns (logits (B, vocab), new_cache).

    ``cross_mode=None`` resolves WCA_CROSS_ATTN here, OUTSIDE the jit, so the
    int8 cross-attention implementation choice is a static argument of the
    trace (only consulted when cross_kv is quantized)."""
    if cross_mode is None:
        cross_mode = _cross_attn_mode()
    return _decode_step_jit(params, dims, tokens, pos, cache, cross_kv,
                            compute_dtype=compute_dtype,
                            cross_mode=cross_mode)


def _int8_rowwise(x):
    """Quantize the trailing axis per row: returns (int8, f32 scale)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _cross_attn_step_int8_mxu(qc, ck, cv, k_scale, compute_dtype):
    """int8-MXU decode cross-attention: both dots consume the stored int8
    K/V directly (half the HBM stream of bf16 — the decode loop's bound).

    qc (B, H, 1, hd) f32/bf16 already scaled by hd**-0.25; ck/cv are
    (int8 (B, H, hd, F), f32 scale (B, H, 1, F)) from precompute_cross_kv.

    Math: qk_f = sum_hd(q_hd * k8_hd_f) * qs * ks_f — the per-frame K scale
    factors out of the hd-reduction, so quantizing q per (b, h) row makes the
    first dot int8 x int8 -> int32 on the MXU. For the value dot the
    per-frame V scale folds INTO the softmax probabilities before their own
    row quantization: out_hd = sum_f (w_f * vs_f) * v8_hd_f * ws.
    """
    k8, k_s = ck
    v8, v_s = cv
    q8, q_s = _int8_rowwise(qc.astype(jnp.float32) * k_scale)
    qk_i = jax.lax.dot_general(q8, k8, (((3,), (2,)), ((0, 1), (0, 1))),
                               preferred_element_type=jnp.int32)  # (B,H,1,F)
    qk = qk_i.astype(jnp.float32) * q_s * k_s
    w = jax.nn.softmax(qk, axis=-1)
    w8, w_s = _int8_rowwise(w * v_s)
    o_i = jax.lax.dot_general(w8, v8, (((3,), (3,)), ((0, 1), (0, 1))),
                              preferred_element_type=jnp.int32)  # (B,H,1,hd)
    return (o_i.astype(jnp.float32) * w_s).astype(compute_dtype)


@functools.partial(jax.jit, static_argnames=("dims", "compute_dtype",
                                             "cross_mode"))
def _decode_step_jit(params: Params, dims: ModelDims, tokens: jax.Array,
                     pos: jax.Array, cache: Params, cross_kv,
                     compute_dtype=jnp.float32, cross_mode: str = "xla"):
    dp = params["decoder"]
    b = tokens.shape[0]
    max_len = cache["k"].shape[-1]
    x = (dp["tok_emb"][tokens[:, 0]] + dp["pos_emb"][pos]).astype(compute_dtype)
    x = x[:, None, :]  # (B, 1, d)

    # positions >= pos+1 are zeros in the cache; mask them out of the softmax
    pos_mask = jnp.where(jnp.arange(max_len)[None, None, None, :] <= pos,
                         0.0, -jnp.inf).astype(jnp.float32)
    cross_ks, cross_vs = cross_kv

    def step(carry, inp):
        x, layer = carry
        bp, ck, cv = inp
        h = _layer_norm(bp["attn_ln"], x)
        hd = dims.n_text_head_dim
        scale = hd ** -0.25
        q = _split_heads(_linear(bp["attn"]["q"], h), dims.n_text_head) * scale
        k_new = _split_heads(_linear(bp["attn"]["k"], h), dims.n_text_head)
        v_new = _split_heads(_linear(bp["attn"]["v"], h), dims.n_text_head)
        # cache layout (B, H, hd, ctx): write the new column at `pos`
        k_all = jax.lax.dynamic_update_slice_in_dim(
            cache["k"][layer], k_new.transpose(0, 1, 3, 2).astype(cache["k"].dtype),
            pos, axis=3)
        v_all = jax.lax.dynamic_update_slice_in_dim(
            cache["v"][layer], v_new.transpose(0, 1, 3, 2).astype(cache["v"].dtype),
            pos, axis=3)
        qk = jnp.einsum("bhtd,bhds->bhts", q, k_all.astype(compute_dtype) * scale,
                        preferred_element_type=jnp.float32) + pos_mask
        w = jax.nn.softmax(qk, axis=-1).astype(compute_dtype)
        a = _merge_heads(jnp.einsum("bhts,bhds->bhtd", w,
                                    v_all.astype(compute_dtype),
                                    preferred_element_type=jnp.float32
                                    ).astype(compute_dtype))
        x = x + _linear(bp["attn"]["out"], a)

        hc = _layer_norm(bp["cross_attn_ln"], x)
        qc = _split_heads(_linear(bp["cross_attn"]["q"], hc),
                          dims.n_text_head) * scale  # (B, H, 1, hd)
        if isinstance(ck, tuple) and cross_mode == "mxu":
            oc = _cross_attn_step_int8_mxu(qc, ck, cv, float(scale),
                                           compute_dtype)
        elif isinstance(ck, tuple) and cross_mode == "pallas":
            # int8 K/V: fused Pallas kernel reads the int8 tensors directly
            # (half the HBM stream) and dequantizes in VMEM — the XLA dequant
            # below materializes a full-precision copy instead
            from ..ops.cross_attn_pallas import cross_attn_step_int8

            k8, k_s = ck
            v8, v_s = cv
            oc = cross_attn_step_int8(qc, k8, k_s, v8, v_s,
                                      k_scale=float(scale)
                                      ).astype(compute_dtype)
        else:
            def dequant(c):
                if isinstance(c, tuple):
                    q8, s = c
                    return q8.astype(compute_dtype) * s.astype(compute_dtype)
                return c.astype(compute_dtype)

            ck_d = dequant(ck)
            cv_d = dequant(cv)
            qkc = jnp.einsum("bhtd,bhdf->bhtf", qc, ck_d * scale,
                             preferred_element_type=jnp.float32)
            wc = jax.nn.softmax(qkc, axis=-1).astype(compute_dtype)
            oc = jnp.einsum("bhtf,bhdf->bhtd", wc, cv_d,
                            preferred_element_type=jnp.float32
                            ).astype(compute_dtype)
        x = x + _linear(bp["cross_attn"]["out"], _merge_heads(oc))
        h2 = _layer_norm(bp["mlp_ln"], x)
        h2 = _linear(bp["mlp"]["fc2"],
                     jax.nn.gelu(_linear(bp["mlp"]["fc1"], h2), approximate=False))
        return (x + h2, layer + 1), (k_new, v_new)

    (x, _), (k_news, v_news) = jax.lax.scan(
        step, (x, 0), (dp["blocks"], cross_ks, cross_vs))
    new_cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], k_news.transpose(0, 1, 2, 4, 3).astype(cache["k"].dtype),
            (0, 0, 0, 0, pos)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], v_news.transpose(0, 1, 2, 4, 3).astype(cache["v"].dtype),
            (0, 0, 0, 0, pos)),
    }
    x = _layer_norm(dp["ln"], x)
    logits = jnp.dot(x[:, 0].astype(jnp.float32), dp["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return logits, new_cache


def decode_prefill(params: Params, dims: ModelDims, tokens: jax.Array,
                   cache: Params, cross_kv, compute_dtype=jnp.float32,
                   cross_mode: Optional[str] = None,
                   logits_at: Optional[int] = None):
    """Consume the decode prompt in ONE teacher-forced pass.

    The published decoder's first forward runs over the ENTIRE initial token
    sequence (whisper decoding.py PyTorchInference.logits: ``if
    tokens.shape[-1] > self.initial_token_length`` only trims AFTER the first
    call), so prompt positions are prefilled in parallel there — consuming
    them one sequential decode_step each (sample_begin-1 extra loop
    iterations, up to ~192 under transcribe's conditioning context) is this
    port's deviation, not the other way round. This restores the published
    compute shape.

    tokens (B, P) int32 = the prompt tokens at positions 0..P-1; cache as from
    :func:`init_kv_cache`. Writes the P cache columns and returns
    ``(logits_at_position, new_cache)`` where the logits row (B, vocab) f32 is
    taken at static position ``logits_at`` (the no-speech probe's sot_index) —
    or None when ``logits_at`` is None, skipping the lm-head projection
    entirely.

    Numerics: per-position attention reductions span the same cache-wide ctx
    axis with the same -inf masking as :func:`decode_step`, so each prompt
    position sees a bit-identical computation shape to its sequential twin
    (tests/test_decoding.py locks prefill==step-by-step transcripts and
    logprobs on CPU; scripts/verify_kernels_on_device.py checks on-device).
    """
    if cross_mode is None:
        cross_mode = _cross_attn_mode()
    return _decode_prefill_jit(params, dims, tokens, cache, cross_kv,
                               compute_dtype=compute_dtype,
                               cross_mode=cross_mode, logits_at=logits_at)


@functools.partial(jax.jit, static_argnames=("dims", "compute_dtype",
                                             "cross_mode", "logits_at"))
def _decode_prefill_jit(params: Params, dims: ModelDims, tokens: jax.Array,
                        cache: Params, cross_kv, compute_dtype=jnp.float32,
                        cross_mode: str = "xla",
                        logits_at: Optional[int] = None):
    dp = params["decoder"]
    b, p = tokens.shape
    max_len = cache["k"].shape[-1]
    x = (dp["tok_emb"][tokens] + dp["pos_emb"][:p]).astype(compute_dtype)

    # same mask semantics as the step path's pos_mask, one row per prompt
    # position: row t attends to cache columns <= t, -inf elsewhere
    pos_mask = jnp.where(
        jnp.arange(max_len)[None, None, None, :]
        <= jnp.arange(p)[None, None, :, None],
        0.0, -jnp.inf).astype(jnp.float32)
    cross_ks, cross_vs = cross_kv

    def step(carry, inp):
        x, layer = carry
        bp, ck, cv = inp
        h = _layer_norm(bp["attn_ln"], x)
        hd = dims.n_text_head_dim
        scale = hd ** -0.25
        q = _split_heads(_linear(bp["attn"]["q"], h), dims.n_text_head) * scale
        k_new = _split_heads(_linear(bp["attn"]["k"], h), dims.n_text_head)
        v_new = _split_heads(_linear(bp["attn"]["v"], h), dims.n_text_head)
        # write the P new columns at position 0 of this layer's cache view so
        # the attention reduction spans the identical (hd, ctx)-wide tensor a
        # sequential decode_step at pos=t would read
        k_all = jax.lax.dynamic_update_slice_in_dim(
            cache["k"][layer],
            k_new.transpose(0, 1, 3, 2).astype(cache["k"].dtype), 0, axis=3)
        v_all = jax.lax.dynamic_update_slice_in_dim(
            cache["v"][layer],
            v_new.transpose(0, 1, 3, 2).astype(cache["v"].dtype), 0, axis=3)
        qk = jnp.einsum("bhtd,bhds->bhts", q, k_all.astype(compute_dtype) * scale,
                        preferred_element_type=jnp.float32) + pos_mask
        w = jax.nn.softmax(qk, axis=-1).astype(compute_dtype)
        a = _merge_heads(jnp.einsum("bhts,bhds->bhtd", w,
                                    v_all.astype(compute_dtype),
                                    preferred_element_type=jnp.float32
                                    ).astype(compute_dtype))
        x = x + _linear(bp["attn"]["out"], a)

        hc = _layer_norm(bp["cross_attn_ln"], x)
        qc = _split_heads(_linear(bp["cross_attn"]["q"], hc),
                          dims.n_text_head) * scale  # (B, H, P, hd)
        if isinstance(ck, tuple) and cross_mode == "mxu":
            # the int8-MXU step math is row-shaped: it extends to P rows as-is
            oc = _cross_attn_step_int8_mxu(qc, ck, cv, float(scale),
                                           compute_dtype)
        else:
            # "pallas" mode's fused kernel is (B, H, 1, hd)-shaped; the
            # prefill happens once per decode, so int8 K/V dequantizes via
            # XLA here rather than growing a second kernel variant
            def dequant(c):
                if isinstance(c, tuple):
                    q8, s = c
                    return q8.astype(compute_dtype) * s.astype(compute_dtype)
                return c.astype(compute_dtype)

            ck_d = dequant(ck)
            cv_d = dequant(cv)
            qkc = jnp.einsum("bhtd,bhdf->bhtf", qc, ck_d * scale,
                             preferred_element_type=jnp.float32)
            wc = jax.nn.softmax(qkc, axis=-1).astype(compute_dtype)
            oc = jnp.einsum("bhtf,bhdf->bhtd", wc, cv_d,
                            preferred_element_type=jnp.float32
                            ).astype(compute_dtype)
        x = x + _linear(bp["cross_attn"]["out"], _merge_heads(oc))
        h2 = _layer_norm(bp["mlp_ln"], x)
        h2 = _linear(bp["mlp"]["fc2"],
                     jax.nn.gelu(_linear(bp["mlp"]["fc1"], h2),
                                 approximate=False))
        return (x + h2, layer + 1), (k_new, v_new)

    (x, _), (k_news, v_news) = jax.lax.scan(
        step, (x, 0), (dp["blocks"], cross_ks, cross_vs))
    new_cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], k_news.transpose(0, 1, 2, 4, 3).astype(cache["k"].dtype),
            (0, 0, 0, 0, 0)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], v_news.transpose(0, 1, 2, 4, 3).astype(cache["v"].dtype),
            (0, 0, 0, 0, 0)),
    }
    if logits_at is None:
        return None, new_cache
    x_at = _layer_norm(dp["ln"], x[:, logits_at])
    logits = jnp.dot(x_at.astype(jnp.float32),
                     dp["tok_emb"].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return logits, new_cache


def decode_window(params: Params, dims: ModelDims, tokens: jax.Array,
                  start: jax.Array, cache: Params, cross_kv,
                  compute_dtype=jnp.float32,
                  cross_mode: Optional[str] = None):
    """Teacher-forced pass over a WINDOW of P tokens at a dynamic offset.

    The speculative-decode verifier (``decoding.decode_speculative``): one
    target-model forward consumes the draft's P candidate tokens at positions
    ``start .. start+P-1``, writes their cache columns, and returns the logits
    of EVERY window position (B, P, vocab) so the caller can check which
    drafts match the target's own greedy choices. :func:`decode_prefill` is
    the ``start == 0`` special case of this shape (it keeps its own lm-head
    slicing); the masking is position-exact to sequential
    :func:`decode_step` calls, so accepted tokens are bit-identical to the
    stepped greedy decode (tests/test_speculative.py locks this).

    ``start`` is a traced scalar — one compiled program serves every window
    offset of the speculative while_loop."""
    if cross_mode is None:
        cross_mode = _cross_attn_mode()
    return _decode_window_jit(params, dims, tokens, start, cache, cross_kv,
                              compute_dtype=compute_dtype,
                              cross_mode=cross_mode)


@functools.partial(jax.jit, static_argnames=("dims", "compute_dtype",
                                             "cross_mode"))
def _decode_window_jit(params: Params, dims: ModelDims, tokens: jax.Array,
                       start: jax.Array, cache: Params, cross_kv,
                       compute_dtype=jnp.float32, cross_mode: str = "xla"):
    dp = params["decoder"]
    b, p = tokens.shape
    d = dp["tok_emb"].shape[1]
    max_len = cache["k"].shape[-1]
    pos_emb = jax.lax.dynamic_slice(dp["pos_emb"], (start, 0), (p, d))
    x = (dp["tok_emb"][tokens] + pos_emb[None]).astype(compute_dtype)

    # row t (window position start+t) attends to cache columns <= start+t —
    # the same -inf mask a sequential decode_step at pos=start+t applies
    pos_mask = jnp.where(
        jnp.arange(max_len)[None, None, None, :]
        <= (start + jnp.arange(p))[None, None, :, None],
        0.0, -jnp.inf).astype(jnp.float32)
    cross_ks, cross_vs = cross_kv

    def step(carry, inp):
        x, layer = carry
        bp, ck, cv = inp
        h = _layer_norm(bp["attn_ln"], x)
        hd = dims.n_text_head_dim
        scale = hd ** -0.25
        q = _split_heads(_linear(bp["attn"]["q"], h), dims.n_text_head) * scale
        k_new = _split_heads(_linear(bp["attn"]["k"], h), dims.n_text_head)
        v_new = _split_heads(_linear(bp["attn"]["v"], h), dims.n_text_head)
        k_all = jax.lax.dynamic_update_slice_in_dim(
            cache["k"][layer],
            k_new.transpose(0, 1, 3, 2).astype(cache["k"].dtype), start, axis=3)
        v_all = jax.lax.dynamic_update_slice_in_dim(
            cache["v"][layer],
            v_new.transpose(0, 1, 3, 2).astype(cache["v"].dtype), start, axis=3)
        qk = jnp.einsum("bhtd,bhds->bhts", q, k_all.astype(compute_dtype) * scale,
                        preferred_element_type=jnp.float32) + pos_mask
        w = jax.nn.softmax(qk, axis=-1).astype(compute_dtype)
        a = _merge_heads(jnp.einsum("bhts,bhds->bhtd", w,
                                    v_all.astype(compute_dtype),
                                    preferred_element_type=jnp.float32
                                    ).astype(compute_dtype))
        x = x + _linear(bp["attn"]["out"], a)

        hc = _layer_norm(bp["cross_attn_ln"], x)
        qc = _split_heads(_linear(bp["cross_attn"]["q"], hc),
                          dims.n_text_head) * scale  # (B, H, P, hd)
        if isinstance(ck, tuple) and cross_mode == "mxu":
            oc = _cross_attn_step_int8_mxu(qc, ck, cv, float(scale),
                                           compute_dtype)
        else:
            def dequant(c):
                if isinstance(c, tuple):
                    q8, s = c
                    return q8.astype(compute_dtype) * s.astype(compute_dtype)
                return c.astype(compute_dtype)

            ck_d = dequant(ck)
            cv_d = dequant(cv)
            qkc = jnp.einsum("bhtd,bhdf->bhtf", qc, ck_d * scale,
                             preferred_element_type=jnp.float32)
            wc = jax.nn.softmax(qkc, axis=-1).astype(compute_dtype)
            oc = jnp.einsum("bhtf,bhdf->bhtd", wc, cv_d,
                            preferred_element_type=jnp.float32
                            ).astype(compute_dtype)
        x = x + _linear(bp["cross_attn"]["out"], _merge_heads(oc))
        h2 = _layer_norm(bp["mlp_ln"], x)
        h2 = _linear(bp["mlp"]["fc2"],
                     jax.nn.gelu(_linear(bp["mlp"]["fc1"], h2),
                                 approximate=False))
        return (x + h2, layer + 1), (k_new, v_new)

    (x, _), (k_news, v_news) = jax.lax.scan(
        step, (x, 0), (dp["blocks"], cross_ks, cross_vs))
    new_cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], k_news.transpose(0, 1, 2, 4, 3).astype(cache["k"].dtype),
            (0, 0, 0, 0, start)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], v_news.transpose(0, 1, 2, 4, 3).astype(cache["v"].dtype),
            (0, 0, 0, 0, start)),
    }
    x = _layer_norm(dp["ln"], x)
    logits = jnp.einsum("bpd,vd->bpv", x.astype(jnp.float32),
                        dp["tok_emb"].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    return logits, new_cache
