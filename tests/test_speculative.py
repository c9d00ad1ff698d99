"""Speculative greedy decoding (models/decoding.py::decode_speculative).

The exactness contract: for ANY draft model (agreeing, disagreeing, or the
target itself) and any draft_k, the speculative decode must be bit-identical
to the sequential greedy loop — same tokens, same avg_logprob, same
no-speech probability, same n_steps. The draft changes only how many
sequential target steps the transcript costs (reported via n_rounds).

Reference anchor: the transcript this accelerates is the alignment input
(/root/reference/infer_ali.py:60); exactness keeps the whole downstream
chain (retokenize -> capture -> DTW) untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.config import ModelDims, tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.models.decoding import (
    DecodingOptions, decode, decode_speculative)
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


def _draft_dims(dims: ModelDims) -> ModelDims:
    """A strictly smaller draft sharing vocab/mels/audio geometry."""
    return ModelDims(
        n_mels=dims.n_mels, n_audio_ctx=dims.n_audio_ctx,
        n_audio_state=dims.n_audio_state // 2,
        n_audio_head=max(1, dims.n_audio_head // 2), n_audio_layer=1,
        n_vocab=dims.n_vocab, n_text_ctx=dims.n_text_ctx,
        n_text_state=dims.n_text_state // 2,
        n_text_head=max(1, dims.n_text_head // 2), n_text_layer=1)


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=24, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    ddims = _draft_dims(dims)
    draft = wmodel.init_params(jax.random.PRNGKey(7), ddims)
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(dims.n_mels, 2 * dims.n_audio_ctx)).astype(
        np.float32)
    return dims, tok, params, ddims, draft, jnp.asarray(mel)


def _assert_same(res_exact, res_spec):
    assert res_spec.tokens == res_exact.tokens
    assert res_spec.text == res_exact.text
    np.testing.assert_allclose(res_spec.avg_logprob, res_exact.avg_logprob,
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(res_spec.no_speech_prob,
                               res_exact.no_speech_prob, rtol=0, atol=1e-6)
    assert res_spec.n_steps == res_exact.n_steps
    assert res_spec.language == res_exact.language


@pytest.mark.parametrize("k", [1, 3, 5])
@pytest.mark.parametrize("without_ts", [False, True])
def test_disagreeing_draft_is_exact(setup, k, without_ts):
    """A random draft disagrees with a random target almost everywhere —
    the worst case for speed, which must still be bit-exact."""
    dims, tok, params, ddims, draft, mel = setup
    opts = DecodingOptions(language="en", sample_len=12,
                           without_timestamps=without_ts)
    res = decode(params, dims, tok, mel, opts)
    spec, info = decode_speculative(params, dims, draft, ddims, tok, mel,
                                    opts, draft_k=k, return_info=True)
    _assert_same(res, spec)
    assert info["n_rounds"] >= 1


def test_self_draft_commits_multiple_tokens_per_round(setup):
    """draft == target: proposals should mostly match, collapsing the round
    count well below one-token-per-round. NOT exactly ceil(steps/(k+1)):
    the draft steps through decode_step while the verifier runs
    decode_window — different XLA programs whose reduction orders differ in
    the last float bits, so near-tie argmaxes occasionally flip (measured ~2
    of 12 positions on this toy model). Exactness is unaffected (the target's
    own choice always wins); only the acceptance rate pays."""
    dims, tok, params, _, _, mel = setup
    opts = DecodingOptions(language="en", sample_len=12)
    res = decode(params, dims, tok, mel, opts)
    spec, info = decode_speculative(params, dims, params, dims, tok, mel,
                                    opts, draft_k=3, return_info=True)
    _assert_same(res, spec)
    sampled = res.n_steps - len(tok.sot_sequence) + 1
    committed_per_round = sampled / info["n_rounds"]
    assert committed_per_round >= 2.0, (info, sampled)


@pytest.mark.parametrize("seed", [1, 2, 11])
def test_exactness_across_target_seeds(setup, seed):
    """Different targets walk different transcripts (some hit eot early);
    every one must match its sequential twin exactly."""
    dims, tok, _, ddims, draft, mel = setup
    params = wmodel.init_params(jax.random.PRNGKey(seed), dims)
    opts = DecodingOptions(language="en", sample_len=10)
    res = decode(params, dims, tok, mel, opts)
    spec = decode_speculative(params, dims, draft, ddims, tok, mel, opts,
                              draft_k=4)
    _assert_same(res, spec)


def test_suppress_and_prompt_options_flow_through(setup):
    """The option surface (suppress lists, conditioning prompt, prefix) runs
    through the shared _decode_plan — spec and exact must agree under it."""
    dims, tok, params, ddims, draft, mel = setup
    opts = DecodingOptions(language="en", sample_len=8,
                           suppress_tokens="-1", prompt=[5, 6, 7],
                           prefix="ab")
    res = decode(params, dims, tok, mel, opts)
    spec = decode_speculative(params, dims, draft, ddims, tok, mel, opts,
                              draft_k=2)
    _assert_same(res, spec)


def test_full_budget_window_edge(setup):
    """sample_len filling the whole context: the last verify windows run past
    the token budget; commits must clamp and positions stay in bounds."""
    dims, tok, params, ddims, draft, mel = setup
    opts = DecodingOptions(language="en",
                           sample_len=dims.n_text_ctx)  # clamped internally
    res = decode(params, dims, tok, mel, opts)
    spec = decode_speculative(params, dims, draft, ddims, tok, mel, opts,
                              draft_k=5)
    _assert_same(res, spec)


def test_rejects_batches_and_nongreedy(setup):
    dims, tok, params, ddims, draft, mel = setup
    with pytest.raises(ValueError, match="single-utterance"):
        decode_speculative(params, dims, draft, ddims, tok,
                           jnp.stack([mel, mel]), DecodingOptions(
                               language="en", sample_len=4))
    with pytest.raises(ValueError, match="greedy-only"):
        decode_speculative(params, dims, draft, ddims, tok, mel,
                           DecodingOptions(language="en", temperature=0.5,
                                           sample_len=4))
    import dataclasses

    bad = dataclasses.replace(_draft_dims(dims), n_vocab=dims.n_vocab + 1)
    with pytest.raises(ValueError, match="vocab"):
        decode_speculative(params, dims, draft, bad, tok, mel,
                           DecodingOptions(language="en", sample_len=4))


def test_decode_window_matches_sequential_steps(setup):
    """The verifier primitive: one decode_window pass at offset s must equal
    P sequential decode_steps — logits allclose, argmax identical, caches
    bit-equal where written."""
    dims, tok, params, _, _, mel = setup
    b, p, s = 1, 4, 3
    xa = wmodel.encode_audio(params, dims, mel[None])
    ckv = wmodel.precompute_cross_kv(params, dims, xa)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, dims.n_vocab, (b, s + p)), jnp.int32)
    buf = s + p + 2
    cache0 = wmodel.init_kv_cache(dims, b, buf)
    # consume the first s tokens sequentially on both sides
    cache_seq = cache0
    for i in range(s):
        _, cache_seq = wmodel.decode_step(params, dims, toks[:, i:i + 1],
                                          jnp.int32(i), cache_seq, ckv)
    lg_seq = []
    cache_a = cache_seq
    for i in range(s, s + p):
        lg, cache_a = wmodel.decode_step(params, dims, toks[:, i:i + 1],
                                         jnp.int32(i), cache_a, ckv)
        lg_seq.append(lg)
    lg_w, cache_b = wmodel.decode_window(params, dims, toks[:, s:],
                                         jnp.int32(s), cache_seq, ckv)
    for j in range(p):
        np.testing.assert_allclose(np.asarray(lg_w[:, j]),
                                   np.asarray(lg_seq[j]), atol=2e-4, rtol=0)
        assert int(jnp.argmax(lg_w[:, j])) == int(jnp.argmax(lg_seq[j]))
    np.testing.assert_allclose(np.asarray(cache_b["k"])[..., :s + p],
                               np.asarray(cache_a["k"])[..., :s + p],
                               atol=1e-5, rtol=0)
