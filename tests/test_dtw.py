"""DTW parity: device scan-based kernel vs the NumPy reference semantics, including
tie-breaks, masked (padded) inputs, and jump-frame extraction."""

import numpy as np
import jax.numpy as jnp
import pytest

from whisper_char_alignment_tpu.ops import dtw as dtw_mod


def _random_cost(rng, n, m):
    # alignment-style input: negated softmax attention matrix
    a = rng.random((n, m)).astype(np.float32)
    a = a / a.sum(axis=-1, keepdims=True)
    return -a


def test_identity_path():
    # strict diagonal dominance (-1 on diag, +1 off) -> pure diagonal path;
    # note -eye alone ties off-diagonal costs, and reference tie-breaks go "left"
    x = (np.ones((4, 4)) - 2 * np.eye(4)).astype(np.float32)
    ti, tj = dtw_mod.dtw(x)
    np.testing.assert_array_equal(ti, [0, 1, 2, 3])
    np.testing.assert_array_equal(tj, [0, 1, 2, 3])


def test_hand_checkable_2x3():
    x = np.array([[0.0, 1.0, 1.0],
                  [1.0, 1.0, 0.0]], dtype=np.float32)
    ti_np, tj_np = dtw_mod.dtw_np(x)
    ti, tj = dtw_mod.dtw(x)
    np.testing.assert_array_equal(ti, ti_np)
    np.testing.assert_array_equal(tj, tj_np)
    # path must start at (0,0) and end at (1,2), monotonic
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == 1 and tj[-1] == 2


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("shape", [(5, 9), (9, 5), (1, 7), (7, 1), (24, 60)])
def test_random_parity_vs_numpy(seed, shape):
    rng = np.random.default_rng(seed)
    x = _random_cost(rng, *shape)
    ti_np, tj_np = dtw_mod.dtw_np(x)
    ti, tj = dtw_mod.dtw(x)
    np.testing.assert_array_equal(ti, ti_np)
    np.testing.assert_array_equal(tj, tj_np)


def test_tie_break_parity():
    # constant matrix: every step ties; parity depends on exact tie-break order
    x = np.zeros((4, 6), dtype=np.float32)
    ti_np, tj_np = dtw_mod.dtw_np(x)
    ti, tj = dtw_mod.dtw(x)
    np.testing.assert_array_equal(ti, ti_np)
    np.testing.assert_array_equal(tj, tj_np)


@pytest.mark.parametrize("seed", range(8))
def test_plateau_tie_parity_vs_numpy(seed):
    """Plateau-heavy costs (few distinct values) create near-tie partial sums
    where the `<` tie-breaks are precision-sensitive: an f64 oracle picks
    different paths than the f32 device recurrence (and than upstream's f32
    numba kernel). dtw_np must accumulate in f32 to stay an oracle here."""
    rng = np.random.default_rng(1000 + seed)
    x = rng.choice(np.float32([0.1, 0.2, 0.3]), size=(6, 6))
    ti_np, tj_np = dtw_mod.dtw_np(x)
    ti, tj = dtw_mod.dtw(x)
    np.testing.assert_array_equal(ti, ti_np)
    np.testing.assert_array_equal(tj, tj_np)


@pytest.mark.parametrize("seed", range(4))
def test_padded_equals_sliced(seed):
    """Running the padded (N_max, M_max) recurrence and backtracing from the true
    (n, m) must equal slicing first (reference timing.py:64,102 semantics)."""
    rng = np.random.default_rng(100 + seed)
    n, m = 7, 23
    n_max, m_max = 12, 40
    x_true = _random_cost(rng, n, m)
    x_pad = np.zeros((n_max, m_max), dtype=np.float32)
    x_pad[:n, :m] = x_true

    tr = dtw_mod.dtw_trace(jnp.asarray(x_pad), jnp.int32(n), jnp.int32(m))
    ti, tj, k = dtw_mod.dtw_backtrace(tr, jnp.int32(n), jnp.int32(m))
    k = int(k)
    ti = np.asarray(ti)[:k][::-1]
    tj = np.asarray(tj)[:k][::-1]

    ti_np, tj_np = dtw_mod.dtw_np(x_true)
    np.testing.assert_array_equal(ti, ti_np)
    np.testing.assert_array_equal(tj, tj_np)


@pytest.mark.parametrize("seed", range(4))
def test_jump_frames_match_reference_jump_extraction(seed):
    rng = np.random.default_rng(7 + seed)
    n, m = 9, 30
    x = _random_cost(rng, n, m)
    ti_np, tj_np = dtw_mod.dtw_np(x)
    # reference jump extraction (timing.py:110-111)
    jumps = np.pad(np.diff(ti_np), (1, 0), constant_values=1).astype(bool)
    jump_frames_ref = tj_np[jumps]

    tr = dtw_mod.dtw_trace(jnp.asarray(x), jnp.int32(n), jnp.int32(m))
    jf = np.asarray(dtw_mod.dtw_jump_frames(tr, jnp.int32(n), jnp.int32(m)))
    np.testing.assert_array_equal(jf[:n], jump_frames_ref)
    assert (jf[n:] == -1).all()


@pytest.mark.parametrize("seed", range(8))
def test_path_is_globally_optimal_by_enumeration(seed):
    """Independent optimality oracle: every test above compares the device
    kernel to dtw_np, but dtw_np itself encodes the same DP/backtrace
    conventions. Here the returned path's total cost must equal the true
    minimum over ALL monotonic paths (diag/down/right moves), computed by an
    independent forward recursion that shares no code, layout, or tie-break
    conventions with the production DP — and the path itself must be
    structurally valid."""
    rng = np.random.default_rng(100 + seed)
    n, m = int(rng.integers(2, 6)), int(rng.integers(2, 7))
    x = rng.normal(size=(n, m)).astype(np.float32)

    def best_path_cost(i, j, memo={}):
        # min cost of reaching (i, j) from (0, 0); fresh memo per call chain
        key = (id(x), i, j)
        if key in memo:
            return memo[key]
        if i == 0 and j == 0:
            v = float(x[0, 0])
        else:
            prev = []
            if i > 0 and j > 0:
                prev.append(best_path_cost(i - 1, j - 1))
            if i > 0:
                prev.append(best_path_cost(i - 1, j))
            if j > 0:
                prev.append(best_path_cost(i, j - 1))
            v = float(x[i, j]) + min(prev)
        memo[key] = v
        return v

    optimal = best_path_cost(n - 1, m - 1)
    for impl in (dtw_mod.dtw_np, dtw_mod.dtw):
        ti, tj = impl(x)
        ti, tj = np.asarray(ti), np.asarray(tj)
        got = float(x[ti, tj].sum())
        assert abs(got - optimal) < 1e-5, (impl.__name__, got, optimal)
        # structural checks: starts at (0,0), ends at (n-1,m-1), monotone
        # non-repeating moves from the allowed set
        assert ti[0] == 0 and tj[0] == 0
        assert ti[-1] == n - 1 and tj[-1] == m - 1
        di, dj = np.diff(ti), np.diff(tj)
        assert ((di >= 0) & (dj >= 0) & (di + dj >= 1)
                & (di <= 1) & (dj <= 1)).all()


@pytest.mark.parametrize("seed", range(8))
def test_diag_sync_backtrace_bit_equals_per_row_walk(seed):
    """dtw_jump_frames_batch (the diagonal-synchronized batched backtrace that
    streams the trace as scan input — the production align/probe path) must be
    BIT-equal to the per-row dtw_jump_frames walk for every row, across random
    shapes, true (n, m) strictly inside the padding, and plateau-tie costs."""
    import jax

    rng = np.random.default_rng(500 + seed)
    b = int(rng.integers(1, 9))
    n_max = int(rng.integers(2, 24))
    m_max = int(rng.integers(2, 48))
    x = rng.normal(size=(b, n_max, m_max)).astype(np.float32)
    if seed % 2:  # quantize to force tie plateaus through the tie-break path
        x = np.round(x * 2) / 2
    n = rng.integers(1, n_max + 1, size=(b,)).astype(np.int32)
    m = rng.integers(1, m_max + 1, size=(b,)).astype(np.int32)
    tr = jax.vmap(lambda xx, nn, mm: dtw_mod.dtw_trace(xx, nn, mm))(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(m))
    per_row = np.asarray(jax.vmap(dtw_mod.dtw_jump_frames)(
        tr, jnp.asarray(n), jnp.asarray(m)))
    batched = np.asarray(dtw_mod.dtw_jump_frames_batch(
        tr, jnp.asarray(n), jnp.asarray(m)))
    np.testing.assert_array_equal(per_row, batched)
