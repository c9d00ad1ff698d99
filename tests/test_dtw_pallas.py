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


@pytest.mark.parametrize("seed", range(4))
def test_fused_jump_frames_kernel_bit_equals_scan_path(seed):
    """dtw_jump_frames_pallas (wavefront + in-VMEM backtrace kernels — the
    production TPU align/probe path) must be BIT-equal to the scan trace +
    diagonal-synchronized scan backtrace across random shapes, true (n, m)
    inside the padding, plateau ties, and batch sizes spanning the kernel's
    sublane-width choices (8/16/32)."""
    rng = np.random.default_rng(900 + seed)
    b = int(rng.integers(1, 40))
    n_max = int(rng.integers(2, 24))
    m_max = int(rng.integers(2, 64))
    x = rng.normal(size=(b, n_max, m_max)).astype(np.float32)
    if seed % 2:
        x = np.round(x * 2) / 2  # plateau ties exercise the tie-break chain
    n = rng.integers(1, n_max + 1, size=(b,)).astype(np.int32)
    m = rng.integers(1, m_max + 1, size=(b,)).astype(np.int32)
    tr = jax.vmap(lambda xx, nn, mm: dtw_ops.dtw_trace(xx, nn, mm))(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m))
    ref = np.asarray(dtw_ops.dtw_jump_frames_batch(
        tr, jnp.asarray(n), jnp.asarray(m)))
    got = np.asarray(dtw_pallas.dtw_jump_frames_pallas(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m), interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_fused_jump_frames_row0_boundary_cell():
    """A path that runs down column j=0 emits row 0 at frame -1 (the
    reference's trace[:, 0] = 1 'up' rule) — the fused kernel's final
    d=1 boundary step must reproduce it."""
    # huge costs except column 0: the optimal path hugs (i, 0) then row n-1
    x = np.full((1, 4, 6), 5.0, np.float32)
    x[0, :, 0] = -1.0
    x[0, 3, :] = -1.0
    n = np.array([4], np.int32)
    m = np.array([6], np.int32)
    tr = jax.vmap(lambda xx, nn, mm: dtw_ops.dtw_trace(xx, nn, mm))(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m))
    ref = np.asarray(dtw_ops.dtw_jump_frames_batch(
        tr, jnp.asarray(n), jnp.asarray(m)))
    got = np.asarray(dtw_pallas.dtw_jump_frames_pallas(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m), interpret=True))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("max_sub", [8, 64, 128, 256])
def test_fused_jump_frames_wide_sublane_hook_bit_equal(max_sub):
    """The `max_sub` static arg (the width-sweep A/B hook — production stays
    at 32; docs/DESIGN.md round 5) must be bit-equal at every width,
    including widths that shrink the VMEM diagonal block (_k_for: sub=256 ->
    K=16 at n1=128) and batches the width doesn't divide (fall back to the
    widest power of two that does)."""
    rng = np.random.default_rng(31)
    b, n_max, m_max = 64, 17, 47
    x = rng.normal(size=(b, n_max, m_max)).astype(np.float32)
    n = rng.integers(1, n_max + 1, size=(b,)).astype(np.int32)
    m = rng.integers(1, m_max + 1, size=(b,)).astype(np.int32)
    ref = np.asarray(dtw_pallas.dtw_jump_frames_pallas(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m), interpret=True))
    got = np.asarray(dtw_pallas.dtw_jump_frames_pallas(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m), interpret=True,
        max_sub=max_sub))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.slow
def test_fused_jump_frames_kernel_probe_scale_shapes():
    """Probe-scale shape: token rows crossing the 128-lane tile boundary
    (N+1 = 131 -> n1 = 256) and frames spanning multiple 64-diagonal chunks —
    the exact regime the production probe sweep runs the kernel in."""
    rng = np.random.default_rng(77)
    b, n_max, m_max = 24, 130, 200
    x = rng.normal(size=(b, n_max, m_max)).astype(np.float32)
    n = rng.integers(100, n_max + 1, size=(b,)).astype(np.int32)
    m = rng.integers(150, m_max + 1, size=(b,)).astype(np.int32)
    tr = jax.vmap(lambda xx, nn, mm: dtw_ops.dtw_trace(xx, nn, mm))(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m))
    ref = np.asarray(dtw_ops.dtw_jump_frames_batch(
        tr, jnp.asarray(n), jnp.asarray(m)))
    got = np.asarray(dtw_pallas.dtw_jump_frames_pallas(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m), interpret=True))
    np.testing.assert_array_equal(ref, got)
