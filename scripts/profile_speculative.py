"""Speculative-decode machine envelope on the real chip (B=1, medium).

Acceptance is checkpoint/data dependent (asset day measures it on real
tiny-drafts-medium); what the hardware fixes TODAY is the cost shape:

    t_exact      — sequential greedy, ms per token
    t_round(k)   — one speculative round: k draft steps + one (k+1)-wide
                   target verify window + the filter scan
    speedup(c)   = t_exact * c / t_round, c = mean committed tokens/round
                   (1 <= c <= k+1; c-1 = mean accepted draft prefix)

Cells measured:
  exact       : production _decode_loop, B=1, DECODE_LEN steps
  spec k=K    : random tiny-shaped draft vs random medium target — drafts
                almost never match, so every round commits ~1 token: the
                measured floor IS t_round, and the acceptance-1 projection
                is t_round / (k+1) per token.
  self k=K    : draft == target (medium drafting medium) — near-full
                acceptance validates the projection formula with real
                acceptance, at draft cost equal to target cost.

Env: WCA_SPEC_DECODE_LEN (224), WCA_SPEC_KS ("2,4,8"), WCA_SPEC_TINY=1 for
a CPU smoke at toy dims.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import ModelDims, medium_dims, \
    tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.models.decoding import (
    DecodingOptions, decode, decode_speculative)
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

TINY = os.environ.get("WCA_SPEC_TINY") == "1"
DECODE_LEN = int(os.environ.get("WCA_SPEC_DECODE_LEN",
                                "8" if TINY else "224"))
KS = [int(x) for x in os.environ.get(
    "WCA_SPEC_KS", "2,4" if TINY else "2,4,8").split(",")]
REPS = int(os.environ.get("WCA_SPEC_REPS", "2" if TINY else "3"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def tiny_draft_dims(dims: ModelDims) -> ModelDims:
    """Whisper-tiny-shaped draft sharing the target's vocab/mel geometry."""
    if TINY:
        return ModelDims(
            n_mels=dims.n_mels, n_audio_ctx=dims.n_audio_ctx,
            n_audio_state=dims.n_audio_state // 2,
            n_audio_head=max(1, dims.n_audio_head // 2), n_audio_layer=1,
            n_vocab=dims.n_vocab, n_text_ctx=dims.n_text_ctx,
            n_text_state=dims.n_text_state // 2,
            n_text_head=max(1, dims.n_text_head // 2), n_text_layer=1)
    return ModelDims(n_mels=dims.n_mels, n_audio_ctx=dims.n_audio_ctx,
                     n_audio_state=384, n_audio_head=6, n_audio_layer=4,
                     n_vocab=dims.n_vocab, n_text_ctx=dims.n_text_ctx,
                     n_text_state=384, n_text_head=6, n_text_layer=4)


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    if TINY:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(os.environ.get("JAX_CACHE", "~/.cache/jax_wca")))
    log(f"devices: {jax.devices()}")
    tok = get_test_tokenizer()
    if TINY:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24,
                              n_text_ctx=24, state=16, head=2, layers=2)
    else:
        dims = medium_dims(n_vocab=tok.n_vocab)
    ddims = tiny_draft_dims(dims)
    log(f"target layers={dims.n_text_layer} d={dims.n_text_state}; "
        f"draft layers={ddims.n_text_layer} d={ddims.n_text_state}; "
        f"decode_len={DECODE_LEN} ks={KS}")
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    draft = wmodel.init_params(jax.random.PRNGKey(7), ddims)
    draft = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                         if x.dtype == jnp.float32 else x, draft)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(
        0, 1, (dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32))
    cdt = jnp.bfloat16
    opts = DecodingOptions(language="en", sample_len=DECODE_LEN)

    def run_exact():
        return decode(params, dims, tok, mel, opts, compute_dtype=cdt)

    def run_spec(dp, dd, k):
        return decode_speculative(params, dims, dp, dd, tok, mel, opts,
                                  draft_k=k, compute_dtype=cdt,
                                  return_info=True)

    def bench(fn):
        fn()  # compile + warm
        best = float("inf")
        out = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_exact, res = bench(run_exact)
    steps = res.n_steps - len(tok.sot_sequence) + 1
    ms_tok_exact = 1e3 * t_exact / max(steps, 1)
    log(f"exact: {t_exact * 1e3:.1f} ms for {steps} tokens "
        f"-> {ms_tok_exact:.2f} ms/token")

    rows = []
    for k in KS:
        t_spec, (sres, info) = bench(lambda k=k: run_spec(draft, ddims, k))
        n_r = info["n_rounds"]
        c_mean = steps / max(n_r, 1)
        t_round = 1e3 * t_spec / max(n_r, 1)
        proj_full = t_round / (k + 1)  # ms/token at acceptance 1
        rows.append(("spec", k, t_spec, n_r, c_mean, t_round, proj_full))
        assert sres.tokens == res.tokens, "speculative transcript diverged!"
        log(f"spec k={k}: {t_spec * 1e3:.1f} ms, rounds={n_r} "
            f"(committed/round {c_mean:.2f}), t_round={t_round:.2f} ms, "
            f"projected ms/token at full acceptance {proj_full:.2f} "
            f"({ms_tok_exact / proj_full:.2f}x exact)")
    for k in KS:
        t_self, (sres, info) = bench(lambda k=k: run_spec(params, dims, k))
        n_r = info["n_rounds"]
        c_mean = steps / max(n_r, 1)
        ms_tok = 1e3 * t_self / max(steps, 1)
        rows.append(("self", k, t_self, n_r, c_mean, None, ms_tok))
        assert sres.tokens == res.tokens, "self-draft transcript diverged!"
        log(f"self k={k}: {t_self * 1e3:.1f} ms ({ms_tok:.2f} ms/token, "
            f"{ms_tok_exact / ms_tok:.2f}x exact), rounds={n_r} "
            f"(committed/round {c_mean:.2f})")

    print({"ms_per_token_exact": round(ms_tok_exact, 3),
           "decode_len": DECODE_LEN,
           "cells": [{"mode": m, "k": k, "s": round(t, 4), "rounds": n,
                      "committed_per_round": round(c, 2),
                      "t_round_ms": (round(tr, 2) if tr else None),
                      "ms_per_token_proj_or_meas": round(p, 2)}
                     for m, k, t, n, c, tr, p in rows]})


if __name__ == "__main__":
    main()
