"""Fused QK-postprocess kernel vs the XLA reference path (qk_to_attention):
identical masked-medfilt medians (bit-level value selection), softmax within
float tolerance, and — the quantity that matters — identical DTW jump frames.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.models.whisper import qk_to_attention
from whisper_char_alignment_tpu.ops.dtw import dtw_np
from whisper_char_alignment_tpu.ops.qkpost_pallas import qk_postprocess_fused


def _rand_case(seed, b=3, h=2, t=16, f=160):
    rng = np.random.default_rng(seed)
    qk = rng.normal(0, 2, (b, h, t, f)).astype(np.float32)
    frame_len = rng.integers(5, f + 1, (b,)).astype(np.int32)
    token_len = rng.integers(3, t + 1, (b,)).astype(np.int32)
    return jnp.asarray(qk), jnp.asarray(frame_len), jnp.asarray(token_len)


@pytest.mark.parametrize("width", [3, pytest.param(7, marks=pytest.mark.slow)])
@pytest.mark.parametrize("seed", [0, pytest.param(1, marks=pytest.mark.slow)])
def test_fused_qkpost_matches_xla(width, seed):
    qk, fl, tl = _rand_case(seed)
    want = np.asarray(qk_to_attention(qk, fl, tl, width, qk_scale=1.0))
    got = np.asarray(qk_postprocess_fused(qk, fl, tl, width, qk_scale=1.0,
                                          interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_fused_qkpost_edge_lengths():
    """Per-item true-edge reflect + short-input passthrough + full-length item."""
    b, h, t, f = 4, 1, 8, 64
    rng = np.random.default_rng(3)
    qk = jnp.asarray(rng.normal(0, 1, (b, h, t, f)).astype(np.float32))
    width = 7
    # valid_len <= width//2 (passthrough), == width//2+1, mid, == F (full edge)
    fl = jnp.asarray(np.array([3, 4, 33, 64], np.int32))
    tl = jnp.asarray(np.array([8, 2, 5, 8], np.int32))
    want = np.asarray(qk_to_attention(qk, fl, tl, width, qk_scale=0.5))
    got = np.asarray(qk_postprocess_fused(qk, fl, tl, width, qk_scale=0.5,
                                          interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_fused_qkpost_dtw_jumps_identical():
    """End metric: DTW over the aggregated map must take the same path."""
    qk, fl, tl = _rand_case(7, b=2, h=3, t=12, f=96)
    for width in (3, 7):
        a = np.asarray(qk_to_attention(qk, fl, tl, width, qk_scale=1.0),
                       np.float64)
        b_ = np.asarray(qk_postprocess_fused(qk, fl, tl, width, qk_scale=1.0,
                                             interpret=True), np.float64)
        for i in range(qk.shape[0]):
            n, m = int(tl[i]), int(fl[i])
            ma = -a[i].mean(axis=0)[:n, :m]
            mb = -b_[i].mean(axis=0)[:n, :m]
            np.testing.assert_array_equal(dtw_np(ma)[1], dtw_np(mb)[1])


@pytest.mark.slow
def test_fused_qkpost_long_transcript_blocked_grid():
    """T=224 (the published sample_len bucket) exercises the T-gridded path
    (T_blk=112, 2 blocks) that keeps VMEM bounded for long transcripts."""
    qk, fl, tl = _rand_case(11, b=2, h=1, t=224, f=256)
    for width in (3, 7):
        want = np.asarray(qk_to_attention(qk, fl, tl, width, qk_scale=1.0))
        got = np.asarray(qk_postprocess_fused(qk, fl, tl, width, qk_scale=1.0,
                                              interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
