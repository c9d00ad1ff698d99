"""Fuzz sweeps: DTW vs the numpy oracle over many shapes/distributions, masked
medfilt vs slice-first, tokenizer round-trips over random unicode text."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_char_alignment_tpu.ops import dtw as dtw_mod
from whisper_char_alignment_tpu.ops.medfilt import median_filter_masked, \
    median_filter_np
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


@pytest.mark.parametrize("seed", [
    s if s < 4 else pytest.param(s, marks=pytest.mark.slow)
    for s in range(20)])
def test_dtw_fuzz(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(1, 40))
    m = int(rng.integers(1, 120))
    dist = rng.choice(["uniform", "ties", "peaky"])
    if dist == "uniform":
        x = rng.random((n, m)).astype(np.float32)
    elif dist == "ties":
        x = rng.integers(0, 3, (n, m)).astype(np.float32)  # many exact ties
    else:
        x = np.zeros((n, m), np.float32)
        for i in range(n):
            x[i, int(i / max(n, 1) * m)] = -5.0
    ti, tj = dtw_mod.dtw(-x)
    ti_np, tj_np = dtw_mod.dtw_np(-x)
    np.testing.assert_array_equal(ti, ti_np)
    np.testing.assert_array_equal(tj, tj_np)


@pytest.mark.parametrize("seed", [
    s if s < 3 else pytest.param(s, marks=pytest.mark.slow)
    for s in range(10)])
def test_masked_medfilt_fuzz(seed):
    rng = np.random.default_rng(2000 + seed)
    width = int(rng.choice([3, 5, 7, 9]))
    b = int(rng.integers(1, 5))
    f = int(rng.integers(width, 80))
    shape = (b, int(rng.integers(1, 4)), int(rng.integers(1, 6)), f)
    x = rng.normal(size=shape).astype(np.float32)
    valid = rng.integers(1, f + 1, (b,)).astype(np.int32)
    got = np.asarray(median_filter_masked(jnp.asarray(x), width,
                                          jnp.asarray(valid)))
    for i in range(b):
        m = int(valid[i])
        expect = (x[i][..., :m] if m <= width // 2
                  else median_filter_np(x[i][..., :m], width))
        np.testing.assert_array_equal(got[i][..., :m], expect)


@pytest.mark.parametrize("seed", [
    s if s < 3 else pytest.param(s, marks=pytest.mark.slow)
    for s in range(10)])
def test_tokenizer_roundtrip_fuzz(seed):
    tok = get_test_tokenizer()
    rng = np.random.default_rng(3000 + seed)
    pools = [
        "abcdefghijklmnopqrstuvwxyz ABCDEFGH ',.!?",
        "àéîõü ßñç 日本語中文 한글",
        "0123456789 -–—() []{}",
        "emoji 🙂🎉 mixed with text",
    ]
    pool = pools[seed % len(pools)]
    text = "".join(rng.choice(list(pool), size=rng.integers(1, 60)))
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # split/regroup must partition the token stream exactly
    words, word_tokens = tok.split_tokens_on_unicode(ids)
    assert sum(word_tokens, []) == ids
    assert "".join(words) == text
