"""Median filter parity: hand fixtures + torch oracle implementing the published
algorithm (reflect pad -> unfold -> sort -> middle; whisper.timing.median_filter)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from whisper_char_alignment_tpu.ops.medfilt import median_filter, median_filter_np


def _torch_median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Oracle: the published median_filter algorithm, written in torch."""
    t = torch.from_numpy(np.asarray(x, dtype=np.float32))
    pad = width // 2
    if t.shape[-1] <= pad:
        return t.numpy()
    ndim = t.ndim
    if ndim <= 2:
        t = t[None, None]
    t = F.pad(t, (pad, pad, 0, 0), mode="reflect")
    out = t.unfold(-1, width, 1).sort()[0][..., pad]
    if ndim <= 2:
        out = out[0, 0]
    return out.numpy()


def test_hand_fixture_width3():
    x = np.array([[3.0, 1.0, 2.0, 5.0, 4.0]])
    # reflect pad: [1, 3, 1, 2, 5, 4, 5]
    expect = np.array([[1.0, 2.0, 2.0, 4.0, 5.0]])
    got = np.asarray(median_filter(x, 3))
    np.testing.assert_allclose(got, expect)
    np.testing.assert_allclose(median_filter_np(x, 3), expect)


@pytest.mark.parametrize("width", [3, 5, 7, 9])
@pytest.mark.parametrize("shape", [(4, 3, 6, 40), (2, 31), (1, 1, 5, 7)])
def test_parity_vs_torch_oracle(width, shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    expect = _torch_median_filter(x, width)
    np.testing.assert_allclose(np.asarray(median_filter(x, width)), expect, atol=1e-6)
    np.testing.assert_allclose(median_filter_np(x, width), expect, atol=1e-6)


def test_short_input_returned_unchanged():
    x = np.random.default_rng(1).normal(size=(2, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(median_filter(x, 7)), x)


def test_rejects_even_width():
    with pytest.raises(AssertionError):
        median_filter(np.zeros((2, 8), np.float32), 4)


@pytest.mark.parametrize("width", [3, 5, 7, 9])
def test_masked_equals_slice_first(width):
    """median_filter_masked must equal slicing each item to its true length
    first (the reference's physical slice at timing.py:64-65), bit-exactly."""
    import jax.numpy as jnp
    from whisper_char_alignment_tpu.ops.medfilt import median_filter_masked

    rng = np.random.default_rng(width)
    b, h, t, f = 4, 3, 6, 50
    x = rng.normal(size=(b, h, t, f)).astype(np.float32)
    valid = rng.integers(1, f + 1, (b,)).astype(np.int32)
    got = np.asarray(median_filter_masked(jnp.asarray(x), width,
                                          jnp.asarray(valid)))
    for i in range(b):
        m = int(valid[i])
        if m <= width // 2:
            expect = x[i][..., :m]
        else:
            expect = median_filter_np(x[i][..., :m], width)
        np.testing.assert_array_equal(got[i][..., :m], expect)
