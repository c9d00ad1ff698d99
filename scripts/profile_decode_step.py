#!/usr/bin/env python
"""Localize decode-loop cost: time 32-step while_loops with parts of the layer
disabled (cross-attn / self-attn / MLP / logits), at Whisper-medium B=32.

The HBM floor says ~250 ms for 32 steps (151 GB cross-KV + 19 GB weights at
819 GB/s); measured is ~1070 ms — this finds the gap."""

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
STEPS = int(os.environ.get("STEPS", "32"))
dims = MODEL_DIMS["medium"]


def timed(name, fn, iters=3):
    np.asarray(jnp.sum(fn()))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(jnp.sum(fn()))
        ts.append(time.time() - t0)
    print(f"{name:>38}: min {min(ts)*1000:8.1f} ms", flush=True)


def make_loop(cross=True, self_attn=True, mlp=True, logits=True,
              dtype=jnp.bfloat16, cross_impl="bf16", filters=False):
    """A stripped copy of the decode loop with stages toggleable.

    cross_impl: "bf16" (plain einsum over float K/V), or the int8 K/V
    implementations "int8_xla" (dequant-then-einsum), "int8_mxu" (int8 MXU
    dots), "int8_pallas" (VMEM-dequant kernel) — pass quantized cross_kv."""

    @functools.partial(jax.jit, static_argnames=())
    def run(params, cross_kv, cache0):
        dp = params["decoder"]
        cross_ks, cross_vs = cross_kv
        hd = dims.n_text_head_dim
        scale = hd ** -0.25
        max_len = cache0["k"].shape[-1]

        def step_layers(x, cache, pos):
            pos_mask = jnp.where(
                jnp.arange(max_len)[None, None, None, :] <= pos, 0.0,
                -jnp.inf).astype(jnp.float32)

            def layer(carry, inp):
                x, li = carry
                bp, ck, cv = inp
                if self_attn:
                    h = wmodel._layer_norm(bp["attn_ln"], x)
                    q = wmodel._split_heads(
                        wmodel._linear(bp["attn"]["q"], h), dims.n_text_head) * scale
                    k_new = wmodel._split_heads(
                        wmodel._linear(bp["attn"]["k"], h), dims.n_text_head)
                    v_new = wmodel._split_heads(
                        wmodel._linear(bp["attn"]["v"], h), dims.n_text_head)
                    k_all = jax.lax.dynamic_update_slice_in_dim(
                        cache["k"][li], k_new.transpose(0, 1, 3, 2).astype(
                            cache["k"].dtype), pos, axis=3)
                    v_all = jax.lax.dynamic_update_slice_in_dim(
                        cache["v"][li], v_new.transpose(0, 1, 3, 2).astype(
                            cache["v"].dtype), pos, axis=3)
                    qk = jnp.einsum("bhtd,bhds->bhts", q,
                                    k_all.astype(dtype) * scale,
                                    preferred_element_type=jnp.float32) + pos_mask
                    w = jax.nn.softmax(qk, axis=-1).astype(dtype)
                    a = wmodel._merge_heads(jnp.einsum(
                        "bhts,bhds->bhtd", w, v_all.astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype))
                    x = x + wmodel._linear(bp["attn"]["out"], a)
                if cross:
                    hc = wmodel._layer_norm(bp["cross_attn_ln"], x)
                    qc = wmodel._split_heads(
                        wmodel._linear(bp["cross_attn"]["q"], hc),
                        dims.n_text_head) * scale
                    if cross_impl == "int8_mxu":
                        oc = wmodel._cross_attn_step_int8_mxu(
                            qc, ck, cv, float(scale), dtype)
                    elif cross_impl == "int8_pallas":
                        from whisper_char_alignment_tpu.ops.cross_attn_pallas \
                            import cross_attn_step_int8

                        oc = cross_attn_step_int8(
                            qc, ck[0], ck[1], cv[0], cv[1],
                            k_scale=float(scale)).astype(dtype)
                    else:
                        if cross_impl == "int8_xla":
                            ck_d = (ck[0].astype(dtype)
                                    * ck[1].astype(dtype))
                            cv_d = (cv[0].astype(dtype)
                                    * cv[1].astype(dtype))
                        else:
                            ck_d, cv_d = ck.astype(dtype), cv.astype(dtype)
                        qkc = jnp.einsum("bhtd,bhdf->bhtf", qc, ck_d * scale,
                                         preferred_element_type=jnp.float32)
                        wc = jax.nn.softmax(qkc, axis=-1).astype(dtype)
                        oc = jnp.einsum("bhtf,bhdf->bhtd", wc, cv_d,
                                        preferred_element_type=jnp.float32
                                        ).astype(dtype)
                    x = x + wmodel._linear(bp["cross_attn"]["out"],
                                           wmodel._merge_heads(oc))
                if mlp:
                    h2 = wmodel._layer_norm(bp["mlp_ln"], x)
                    h2 = wmodel._linear(
                        bp["mlp"]["fc2"],
                        jax.nn.gelu(wmodel._linear(bp["mlp"]["fc1"], h2),
                                    approximate=False))
                    x = x + h2
                return (x, li + 1), None

            (x, _), _ = jax.lax.scan(layer, (x, 0),
                                     (dp["blocks"], cross_ks, cross_vs))
            return x

        if filters:
            from whisper_char_alignment_tpu.models.decoding import (
                apply_logit_filters)

            vocab_ids = jnp.arange(dims.n_vocab)
            suppress_mask = jnp.zeros((dims.n_vocab,), jnp.float32)
            blank_mask = jnp.zeros((dims.n_vocab,), jnp.float32)
            tokens_buf = jnp.zeros((B, STEPS + 4), jnp.int32)

        def body(carry):
            i, tok, cache, acc = carry
            x = (dp["tok_emb"][tok] + dp["pos_emb"][i])[:, None, :].astype(dtype)
            x = step_layers(x, cache, i)
            x = wmodel._layer_norm(dp["ln"], x)
            if logits:
                lg = jnp.dot(x[:, 0].astype(jnp.float32),
                             dp["tok_emb"].T.astype(jnp.float32))
                if filters:
                    # the production per-step rule masks, at realistic state
                    lg = apply_logit_filters(
                        lg, i, tokens_buf, jnp.zeros((B,), bool),
                        jnp.zeros((B,), jnp.int32), suppress_mask, blank_mask,
                        vocab_ids, sample_begin=0,
                        ts_begin=dims.n_vocab - 1501, eot=dims.n_vocab - 1600,
                        no_timestamps=dims.n_vocab - 1602,
                        max_initial_ts_index=50, use_timestamps=True)
                tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                acc = acc + lg.mean()
            else:
                tok = (tok + 1) % 100
                acc = acc + x.mean().astype(jnp.float32)
            return i + 1, tok, cache, acc

        def cond(carry):
            return carry[0] < STEPS

        _, _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((B,), jnp.int32), cache0,
                         jnp.float32(0.0)))
        return acc

    return run


def main():
    print(f"devices: {jax.devices()} B={B} steps={STEPS}", flush=True)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          wmodel.init_params(jax.random.PRNGKey(0), dims))
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(0, 1, (B, dims.n_audio_ctx, dims.n_audio_state)
                                ).astype(np.float32)).astype(jnp.bfloat16)
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa,
                                          compute_dtype=jnp.bfloat16)
    cache = wmodel.init_kv_cache(dims, B, STEPS + 4, dtype=jnp.bfloat16)

    # build each jitted loop ONCE outside the timed lambda — constructing a
    # fresh jax.jit per call would re-trace the 24-layer loop inside the
    # timed region and inflate every number by a constant tracing cost
    variants = [
        ("full loop", make_loop()),
        ("full loop + logit filters", make_loop(filters=True)),
        ("no cross-attn", make_loop(cross=False)),
        ("no self-attn", make_loop(self_attn=False)),
        ("no mlp", make_loop(mlp=False)),
        ("no logits/argmax", make_loop(logits=False)),
        ("cross only", make_loop(self_attn=False, mlp=False, logits=False)),
        ("empty-ish (emb+ln only)", make_loop(cross=False, self_attn=False,
                                              mlp=False, logits=False)),
    ]
    for name, fn in variants:
        timed(name, lambda f=fn: f(params, cross_kv, cache))

    cross_kv_q = wmodel.precompute_cross_kv(params, dims, xa,
                                            compute_dtype=jnp.bfloat16,
                                            quantize=True)
    int8_variants = [
        ("full loop int8 mxu", make_loop(cross_impl="int8_mxu")),
        ("full loop int8 xla-dequant", make_loop(cross_impl="int8_xla")),
        ("cross only int8 mxu", make_loop(self_attn=False, mlp=False,
                                          logits=False,
                                          cross_impl="int8_mxu")),
        ("cross only int8 xla-dequant", make_loop(self_attn=False, mlp=False,
                                                  logits=False,
                                                  cross_impl="int8_xla")),
    ]
    if os.environ.get("INT8_PALLAS") == "1":  # opt-in: compile is slow
        int8_variants += [
            ("full loop int8 pallas", make_loop(cross_impl="int8_pallas")),
            ("cross only int8 pallas", make_loop(self_attn=False, mlp=False,
                                                 logits=False,
                                                 cross_impl="int8_pallas")),
        ]
    for name, fn in int8_variants:
        timed(name, lambda f=fn: f(params, cross_kv_q, cache))


if __name__ == "__main__":
    main()
