"""Pallas wavefront DTW kernel parity vs the lax.scan reference (interpret mode
on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.ops import dtw as dtw_ops
from whisper_char_alignment_tpu.ops import dtw_pallas


@pytest.mark.parametrize("shape", [
    pytest.param((3, 7, 23), marks=pytest.mark.slow),
    pytest.param((8, 12, 40), marks=pytest.mark.slow),
    (9, 30, 90)])  # fast tier keeps the largest (most wavefronts)
def test_trace_parity_vs_scan(shape):
    rng = np.random.default_rng(0)
    b, n, m = shape
    x = -rng.random((b, n, m)).astype(np.float32)
    tr_scan = np.asarray(dtw_pallas.dtw_trace_batch(jnp.asarray(x),
                                                    use_pallas=False))
    tr_pal = np.asarray(dtw_pallas.dtw_trace_batch(jnp.asarray(x),
                                                   use_pallas=True,
                                                   interpret=True))
    np.testing.assert_array_equal(tr_pal, tr_scan)


def test_full_path_parity_through_backtrace():
    rng = np.random.default_rng(1)
    b, n, m = 5, 14, 60
    x = -rng.random((b, n, m)).astype(np.float32)
    # per-item true sizes smaller than padded
    ns = np.array([14, 10, 7, 14, 3], np.int32)
    ms = np.array([60, 44, 60, 12, 60], np.int32)
    tr = dtw_pallas.dtw_trace_batch(jnp.asarray(x), use_pallas=True,
                                    interpret=True)
    for i in range(b):
        jf = np.asarray(dtw_ops.dtw_jump_frames(tr[i], jnp.int32(ns[i]),
                                                jnp.int32(ms[i])))
        ti, tj = dtw_ops.dtw_np(x[i, :ns[i], :ms[i]])
        jumps = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
        np.testing.assert_array_equal(jf[:ns[i]], tj[jumps])
