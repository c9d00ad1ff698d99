#!/usr/bin/env python
"""Profile the costs the corpus bench adds over raw stage calls: host->device
audio upload over the axon tunnel, host WAV decode, retokenize, and the
per-stage device times with forced-sync discipline (np.asarray of a scalar)."""

import os
import sys
import tempfile
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
from whisper_char_alignment_tpu.data.dataset import TIMIT, batch_iter
from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
from whisper_char_alignment_tpu.models import decoding, whisper as wmodel
from whisper_char_alignment_tpu.text import retokenize
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

B = int(os.environ.get("B", "32"))
ITERS = int(os.environ.get("ITERS", "5"))


def timed(name, fn, iters=ITERS, sync=True):
    out = fn()
    if sync:
        np.asarray(jnp.sum(out) if hasattr(out, "dtype") else out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        if sync:
            np.asarray(jnp.sum(out) if hasattr(out, "dtype") else out)
        ts.append(time.time() - t0)
    print(f"{name:>34}: min {min(ts)*1000:8.1f} ms  "
          f"med {sorted(ts)[len(ts)//2]*1000:8.1f} ms", flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}  B={B}", flush=True)
    dims = MODEL_DIMS["medium"]
    tok = get_test_tokenizer()
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          wmodel.init_params(jax.random.PRNGKey(0), dims))

    corpus = tempfile.mkdtemp(prefix="wca_prof_")
    scp = make_timit_corpus(corpus, n_utts=B, seconds=(2.0, 7.0),
                            words_per_utt=(6, 10), seed=0)
    ds = TIMIT(scp)

    # host: WAV decode for a batch
    def read_batch():
        return [ds[i] for i in range(B)]
    utts = timed("host WAV decode (batch)", read_batch, sync=False)

    n_samples = constants.N_SAMPLES
    audio_f32 = np.zeros((B, n_samples), np.float32)
    for i, u in enumerate(utts):
        audio_f32[i, :u.audio.size] = u.audio
    audio_i16 = (audio_f32 * 32768.0).astype(np.int16)

    timed("upload audio f32 (61 MB)", lambda: jax.device_put(audio_f32))
    timed("upload audio i16 (31 MB)", lambda: jax.device_put(audio_i16))
    mel_bytes = B * dims.n_mels * 3000 * 2
    mel_host = np.zeros((B, dims.n_mels, 3000), np.float16)
    timed(f"upload mel f16 ({mel_bytes>>20} MB)",
          lambda: jax.device_put(mel_host))

    audio_d = jax.device_put(audio_f32)

    @jax.jit
    def mel_fn(a):
        return log_mel_spectrogram(a).astype(jnp.bfloat16)

    mel = timed("mel (device)", lambda: mel_fn(audio_d))

    options = decoding.DecodingOptions(language="en", sample_len=32)
    timed("decode 32 steps", lambda: decoding.decode(
        params, dims, tok, mel, options, compute_dtype=jnp.bfloat16)[0]
          .avg_logprob, sync=False)

    # encoder alone and decode-loop alone. Params are ARGUMENTS, not closure
    # captures — closing a jit over the 1.5 GB pytree embeds it as HLO
    # literals and breaks the remote compiler (CLAUDE.md gotcha)
    enc = jax.jit(lambda p, m: wmodel.encode_audio(p, dims, m,
                                                   compute_dtype=jnp.bfloat16))
    xa = timed("encoder alone", lambda: enc(params, mel))

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 200, (B, 96)).astype(np.int32))
    token_len = jnp.full((B,), 92, jnp.int32)
    frame_len = jnp.full((B,), 300, jnp.int32)

    @jax.jit
    def cap_align(params, mel):
        attn, _ = timing.get_attentions(params, dims, mel, tokens, token_len,
                                        frame_len, medfilt_width=3,
                                        qk_scale=1.0,
                                        compute_dtype=jnp.bfloat16,
                                        return_logits=False)
        jf, _, _ = timing.force_align_batch(attn, token_len, frame_len, 3,
                                            "topk", 10)
        return jf
    timed("capture+align", lambda: cap_align(params, mel))

    # host: retokenize a batch of ~8-word texts
    texts = [u.text for u in utts]
    def retok():
        n = 0
        for t in texts:
            tn = retokenize.remove_punctuation(t)
            n += len(retokenize.encode(tn, tok, "char"))
        return n
    timed("host retokenize (batch)", retok, sync=False)


if __name__ == "__main__":
    main()
