#!/usr/bin/env python
"""Where do the encoder's ~437 ms/B=32 go? Sub-stage ablation at medium
shapes: convs only, blocks with attention disabled, MLP disabled, both, and
per-implementation attention modes. Run on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np

from whisper_char_alignment_tpu.config import MODEL_DIMS
from whisper_char_alignment_tpu.models import whisper as wmodel

B = int(os.environ.get("B", "32"))
dims = MODEL_DIMS[os.environ.get("MODEL", "medium")]


def timed(name, fn, iters=5):
    np.asarray(jnp.sum(fn()))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(jnp.sum(fn()))
        ts.append(time.time() - t0)
    print(f"{name:>34}: min {min(ts)*1000:8.1f} ms", flush=True)


def make_encoder(convs=True, attn="fused", mlp=True, n_layers=None,
                 dtype=jnp.bfloat16):
    nl = dims.n_audio_layer if n_layers is None else n_layers

    @jax.jit
    def run(params, mel):
        ep = params["encoder"]
        x = mel.astype(dtype)
        if convs:
            x = jax.nn.gelu(wmodel._conv1d(ep["conv1"], x, 1),
                            approximate=False)
            x = jax.nn.gelu(wmodel._conv1d(ep["conv2"], x, 2),
                            approximate=False)
            x = x.transpose(0, 2, 1)
        else:
            x = jnp.zeros((mel.shape[0], dims.n_audio_ctx,
                           dims.n_audio_state), dtype)
        x = x + ep["pos_emb"].astype(dtype)
        t = x.shape[1]

        def step(x, bp):
            if attn != "none":
                h_in = wmodel._layer_norm(bp["attn_ln"], x)
                if attn == "fused":
                    a = wmodel._fused_self_attention(bp["attn"], h_in,
                                                     dims.n_audio_head,
                                                     n_valid=t)
                elif attn == "xla":
                    a, _ = wmodel._qkv_attention(bp["attn"], h_in, None,
                                                 dims.n_audio_head)
                elif attn == "proj_only":
                    # q/k/v/out projections without the attention math:
                    # isolates the 4 d^2 matmuls from the (T, T) part
                    q = wmodel._linear(bp["attn"]["q"], h_in)
                    k = wmodel._linear(bp["attn"]["k"], h_in)
                    v = wmodel._linear(bp["attn"]["v"], h_in)
                    a = wmodel._linear(bp["attn"]["out"], q + k + v)
                x = x + a
            if mlp == "flat":
                # A/B (VERDICT r04 #4): one (B*T, d) GEMM per fc instead of a
                # (B, T, d) batched GEMM — tests whether XLA's 65%-of-MXU MLP
                # schedule is an artifact of the batch dimension
                h = wmodel._layer_norm(bp["mlp_ln"], x)
                hf = h.reshape(-1, h.shape[-1])
                hf = wmodel._linear(bp["mlp"]["fc2"],
                                    jax.nn.gelu(wmodel._linear(bp["mlp"]["fc1"],
                                                               hf),
                                                approximate=False))
                x = x + hf.reshape(x.shape)
            elif mlp:
                h = wmodel._layer_norm(bp["mlp_ln"], x)
                h = wmodel._linear(bp["mlp"]["fc2"],
                                   jax.nn.gelu(wmodel._linear(bp["mlp"]["fc1"],
                                                              h),
                                               approximate=False))
                x = x + h
            return x, None

        blocks = jax.tree.map(lambda a: a[:nl], params["encoder"]["blocks"])
        x, _ = jax.lax.scan(step, x, blocks)
        return wmodel._layer_norm(ep["ln_post"], x)

    return run


def main():
    print(f"devices: {jax.devices()} B={B} dims={dims.n_audio_state}x"
          f"{dims.n_audio_layer}", flush=True)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          wmodel.init_params(jax.random.PRNGKey(0), dims))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(0, 1, (B, dims.n_mels, 2 * dims.n_audio_ctx))
                      .astype(np.float32)).astype(jnp.bfloat16)

    variants = [
        ("full (fused attn)", make_encoder()),
        ("full (xla attn)", make_encoder(attn="xla")),
        ("convs only (0 layers)", make_encoder(n_layers=0)),
        ("no convs", make_encoder(convs=False)),
        ("attn proj only (no T^2)", make_encoder(attn="proj_only")),
        ("no attn (mlp only)", make_encoder(attn="none")),
        ("no mlp", make_encoder(mlp=False)),
        ("full, mlp flattened (B*T)", make_encoder(mlp="flat")),
        ("mlp only, flattened", make_encoder(attn="none", mlp="flat")),
    ]
    for name, fn in variants:
        timed(name, lambda f=fn: f(params, mel))

    params_q = wmodel.quantize_encoder_int8(params)
    enc_full = make_encoder()
    enc_noattn_core = make_encoder(attn="proj_only")
    timed("full int8 (fused attn)", lambda: enc_full(params_q, mel))
    timed("int8 proj only (no T^2)", lambda: enc_noattn_core(params_q, mel))


if __name__ == "__main__":
    main()
