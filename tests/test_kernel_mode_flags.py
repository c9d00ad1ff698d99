"""Kernel-mode env flags (WCA_MEL_IMPL / WCA_QKPOST / WCA_CROSS_ATTN /
WCA_ENC_ATTN / WCA_DTW_IMPL) are resolved OUTSIDE the jitted functions and
passed in as static arguments — so flipping a flag between two calls in the
same process switches implementations (new cache entry) instead of silently
reusing the first call's trace (the round-2 foot-gun for long-lived processes
like cli/serve)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu import runner
from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

pytestmark = pytest.mark.slow  # heavy integration: excluded from the fast tier


def _cache_size(jitted):
    return jitted._cache_size()


@pytest.fixture(scope="module")
def setup():
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    return tok, dims, params


def test_mel_impl_flip_switches_between_calls(setup, monkeypatch):
    """Same shapes, WCA_MEL_IMPL flipped mid-process: the second call must NOT
    reuse the first trace (cache grows) and both impls must agree."""
    _, dims, _ = setup
    audio = np.random.default_rng(0).normal(
        0, 0.1, (2, 2 * dims.n_audio_ctx * 160)).astype(np.float32)
    monkeypatch.delenv("WCA_MEL_IMPL", raising=False)
    a = np.asarray(runner._mel_step(jnp.asarray(audio), dims))
    size_xla = _cache_size(runner._mel_step_jit)
    monkeypatch.setenv("WCA_MEL_IMPL", "pallas")  # interpret mode on CPU
    b = np.asarray(runner._mel_step(jnp.asarray(audio), dims))
    assert _cache_size(runner._mel_step_jit) == size_xla + 1
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_qkpost_flag_keys_decode_text_trace(setup, monkeypatch):
    """WCA_QKPOST participates in decode_text's jit cache key. Without a
    medfilt_width the flag is inert in the body (identical outputs), which
    isolates exactly the cache-key mechanism: the flip must still retrace."""
    _, dims, params = setup
    rng = np.random.default_rng(1)
    xa = jnp.asarray(rng.normal(0, 1, (1, dims.n_audio_ctx,
                                       dims.n_audio_state)), jnp.float32)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    monkeypatch.setenv("WCA_QKPOST", "off")
    lg_a, qk_a = wmodel.decode_text(params, dims, tokens, xa)
    size_off = _cache_size(wmodel._decode_text_jit)
    monkeypatch.setenv("WCA_QKPOST", "1")
    lg_b, qk_b = wmodel.decode_text(params, dims, tokens, xa)
    assert _cache_size(wmodel._decode_text_jit) == size_off + 1
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))
    np.testing.assert_array_equal(np.asarray(qk_a), np.asarray(qk_b))


def test_cross_attn_flag_keys_decode_step_trace(setup, monkeypatch):
    """WCA_CROSS_ATTN participates in decode_step's jit cache key (with
    un-quantized f32 K/V the fused branch is inert, isolating the key)."""
    _, dims, params = setup
    rng = np.random.default_rng(2)
    xa = jnp.asarray(rng.normal(0, 1, (1, dims.n_audio_ctx,
                                       dims.n_audio_state)), jnp.float32)
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa)
    cache = wmodel.init_kv_cache(dims, 1, 4)
    tok = jnp.asarray([[3]], jnp.int32)
    monkeypatch.setenv("WCA_CROSS_ATTN", "off")
    lg_a, _ = wmodel.decode_step(params, dims, tok, jnp.int32(0), cache,
                                 cross_kv)
    size_off = _cache_size(wmodel._decode_step_jit)
    monkeypatch.setenv("WCA_CROSS_ATTN", "1")
    lg_b, _ = wmodel.decode_step(params, dims, tok, jnp.int32(0), cache,
                                 cross_kv)
    assert _cache_size(wmodel._decode_step_jit) == size_off + 1
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))


def test_runner_kernel_modes_follow_env(monkeypatch):
    """The runner resolves one (qkpost, dtw_impl) static tuple per
    _align_step call; it must track the env between calls. WCA_ENC_ATTN is
    deliberately absent: the align step never runs the encoder, so that flag
    must NOT retrace the largest jit program."""
    monkeypatch.setenv("WCA_QKPOST", "off")
    monkeypatch.setenv("WCA_DTW_IMPL", "scan")
    assert runner._kernel_modes() == (False, "scan")
    monkeypatch.setenv("WCA_QKPOST", "1")
    monkeypatch.setenv("WCA_DTW_IMPL", "pallas")
    assert runner._kernel_modes() == (True, "pallas")
    # flipping the encoder flag must not change the align-step cache key
    monkeypatch.setenv("WCA_ENC_ATTN", "fused")
    assert runner._kernel_modes() == (True, "pallas")


def test_dtw_impl_flag_keys_force_align_trace(monkeypatch):
    """WCA_DTW_IMPL participates in force_align_batch's jit cache key: a flip
    retraces (asserted via cache growth with the CPU-safe 'scan' value plus an
    explicit dtw_impl override standing in for the TPU-only 'pallas')."""
    from whisper_char_alignment_tpu.align import timing

    attn = jnp.asarray(
        np.random.default_rng(3).random((2, 1, 2, 8, 16)), jnp.float32)
    token_len = jnp.asarray([8], jnp.int32)
    frame_len = jnp.asarray([16], jnp.int32)
    monkeypatch.setenv("WCA_DTW_IMPL", "scan")
    jf_a, _, _ = timing.force_align_batch(attn, token_len, frame_len, 3,
                                          "mean", -1)
    size_scan = _cache_size(timing._force_align_batch_jit)
    # same call again: cache must NOT grow (the resolution is stable)
    timing.force_align_batch(attn, token_len, frame_len, 3, "mean", -1)
    assert _cache_size(timing._force_align_batch_jit) == size_scan

    # the FLIP must reach the jitted function's static dtw_impl argument —
    # 'pallas' cannot execute on CPU, so a spy records what the wrapper
    # forwards (and downgrades to 'scan' so the call still runs); if the env
    # resolution or the static forwarding is ever dropped, this fails
    seen = []
    real_jit = timing._force_align_batch_jit

    def spy(attn_, token_len_, frame_len_, **kw):
        seen.append(kw.get("dtw_impl"))
        kw["dtw_impl"] = "scan"
        return real_jit(attn_, token_len_, frame_len_, **kw)

    monkeypatch.setattr(timing, "_force_align_batch_jit", spy)
    timing.force_align_batch(attn, token_len, frame_len, 3, "mean", -1)
    monkeypatch.setenv("WCA_DTW_IMPL", "pallas")
    jf_b, _, _ = timing.force_align_batch(attn, token_len, frame_len, 3,
                                          "mean", -1)
    assert seen == ["scan", "pallas"]
    np.testing.assert_array_equal(np.asarray(jf_a), np.asarray(jf_b))


def test_enc_attn_mode_rejects_unknown_values(monkeypatch):
    """Round-4 review: WCA_ENC_ATTN previously returned unknown explicit
    values verbatim, which the encoder silently treated as the slowest XLA
    path — the exact hazard WCA_CROSS_ATTN already raises for. Aliases
    resolve; junk raises."""
    cases = {"1": "fused", "on": "fused", "true": "fused", "fused": "fused",
             "0": "xla", "off": "xla", "false": "xla", "xla": "xla",
             "stock": "stock"}
    for raw, want in cases.items():
        monkeypatch.setenv("WCA_ENC_ATTN", raw)
        assert wmodel._encoder_attn_mode() == want, raw
    for bogus in ("fuesd", "2", "yes"):
        monkeypatch.setenv("WCA_ENC_ATTN", bogus)
        with pytest.raises(ValueError, match="WCA_ENC_ATTN"):
            wmodel._encoder_attn_mode()
