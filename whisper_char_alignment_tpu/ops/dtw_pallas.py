"""Pallas TPU wavefront kernel for the DTW cost/trace recurrence.

The anti-diagonal recurrence of ``ops.dtw`` as a single on-chip kernel: 8
utterances ride the 8 sublanes of the VPU, the token axis rides the lanes, and the
grid's diagonal dimension streams one skewed-input diagonal per step from HBM into
VMEM (double-buffered by the Pallas pipeline) while the two previous cost diagonals
persist in VMEM scratch across grid steps. This removes the per-iteration op
dispatch of the ``lax.scan`` reference implementation (~N+M tiny host-of-ops loop
bodies) — the whole recurrence is one fused kernel.

Semantics are identical to ``dtw.dtw_trace`` (same asymmetric tie-break; padded
recurrence subsumes per-item (n, m) — see ops/dtw.py docstring). Parity is tested
in interpret mode on CPU and against the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# utterances per kernel instance: they ride the VPU sublanes. 8 -> 32 was a
# measured win (round 3); widths beyond 32 are NOT (round-5 chunk sweep:
# 64 neutral, 128/256 +12/+19% — halving the sequential step count changes
# nothing, so the kernel is bound by the width-invariant VPU recurrence work,
# not per-step overhead; the bf16-stream A/B bounds HBM at ~8% of chunk time).
# Default from WCA_DTW_MAX_SUB; `max_sub` stays a static arg as the A/B hook
# (scripts/profile_probe_dtw.py). Rounded to the 8-sublane tile; small
# batches stay narrow.


def _max_sub_default() -> int:
    import os

    return int(os.environ.get("WCA_DTW_MAX_SUB", "32"))


def _sub_for(b: int, max_sub: int | None = None) -> int:
    # largest power-of-two width in [8, max_sub] that divides the 8-rounded
    # batch: b=33 pads to 40 and runs 8-wide (5 groups) rather than padding
    # to 64 rows
    if max_sub is None:
        max_sub = _max_sub_default()
    b8 = ((b + 7) // 8) * 8
    width = max(8, 1 << (max_sub.bit_length() - 1))
    while width > 8 and b8 % width != 0:
        width //= 2
    return width


# VMEM budget per streamed block (input diagonals / trace out), bytes. Blocks
# are double-buffered by the Pallas pipeline, and the wavefront holds an input
# AND an output block live: ~4x this figure in VMEM (~16 MB/core) plus the
# (SUB, N1) f32 scratch diagonals.
_BLOCK_BYTES = 2 * 1024 * 1024


def _k_for(sub: int, n1: int) -> int:
    """Diagonals per grid step: the round-4 fixed 64 when it fits the block
    budget, shrunk (to an 8-multiple, >= 8) as SUB widens so the streamed
    (K, SUB, N1) i32/f32 blocks stay within VMEM."""
    k = min(64, _BLOCK_BYTES // (sub * n1 * 4))
    return max(8, (k // 8) * 8)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _skew_batch(x: jax.Array) -> jax.Array:
    """(B, N, M) -> (B, D, N1_pad) with out[b, d, i] = x[b, i, d - i]."""
    b, n, m = x.shape
    d = n + m - 1
    n1 = _round_up(n + 1, 128)
    d_idx = jnp.arange(d)[:, None]
    i_idx = jnp.arange(n1)[None, :]
    j_idx = d_idx - i_idx
    valid = (i_idx < n) & (j_idx >= 0) & (j_idx < m)
    gathered = x[:, jnp.clip(i_idx, 0, n - 1), jnp.clip(j_idx, 0, m - 1)]
    return jnp.where(valid[None], gathered, 0.0)


def _dtw_kernel(xs_ref, trace_ref, prev_ref, prev2_ref, m_max_ref=None):
    # xs_ref: (1, K, SUB, N1) — K input diagonals (grid diags d0+2 .. d0+K+1)
    # trace_ref: (1, K, SUB, N1) int32 out; prev/prev2: (SUB, N1) f32 scratch
    k_block = xs_ref.shape[1]
    d0 = pl.program_id(1) * k_block
    sub, n1 = prev_ref.shape
    inf = jnp.float32(jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, n1), 1)

    @pl.when(d0 == 0)
    def _init():
        # diagonal 0 of the cost grid: cost[0,0] = 0, rest +inf
        prev2_ref[:] = jnp.where(lane == 0, 0.0, inf)
        prev_ref[:] = jnp.full((sub, n1), inf)

    def shift(v, fill):
        return jnp.where(lane == 0, fill, pltpu.roll(v, 1, axis=1))

    m_bound = m_max_ref[0] if m_max_ref is not None else None

    def body(k, carry):
        prev, prev2 = carry
        c0 = shift(prev2, inf)  # cost[i-1, j-1]
        c1 = shift(prev, inf)   # cost[i-1, j]
        c2 = prev               # cost[i, j-1]
        t = jnp.where((c0 < c1) & (c0 < c2), 0,
                      jnp.where((c1 < c0) & (c1 < c2), 1, 2)).astype(jnp.int32)
        c = jnp.where(t == 0, c0, jnp.where(t == 1, c1, c2))
        # xs may stream as bf16 (half the diagonal read; see the probe A/B in
        # scripts/profile_probe_dtw.py) — upcast BEFORE the rotate (Mosaic has
        # no sub-32-bit dynamic_rotate) and accumulate the cost in f32 always
        xval = shift(xs_ref[0, k].astype(jnp.float32), 0.0)  # x at (i, j)
        grid_d = d0 + k + 2  # cells on grid diagonal i + j
        j_vec = grid_d - lane
        valid = (lane >= 1) & (j_vec >= 1)
        if m_bound is not None:
            valid = valid & (j_vec <= m_bound)
        cur = jnp.where(valid, xval + c, inf)
        trace_ref[0, k] = jnp.where(valid, t, -1)
        return cur, prev

    prev, prev2 = jax.lax.fori_loop(0, k_block, body,
                                    (prev_ref[:], prev2_ref[:]))
    prev_ref[:] = prev
    prev2_ref[:] = prev2


def _dtw_trace_raw(x: jax.Array, interpret: bool = False,
                   max_sub: int | None = None):
    """Run the wavefront kernel and return its NATIVE (groups, D_pad, SUB, N1)
    int32 trace plus the (sub, d_pad, k) layout — shared by the public
    transposed API below and the fused backtrace kernel (which consumes this
    layout directly, skipping the 2x-trace-size transpose + int8 convert)."""
    b, n, m = x.shape
    sub = _sub_for(b, max_sub)
    b_pad = _round_up(b, sub)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
    xs = _skew_batch(x)  # (B_pad, D, N1)
    _, d, n1 = xs.shape
    k = _k_for(sub, n1)
    d_pad = _round_up(d, k)
    if d_pad != d:
        xs = jnp.pad(xs, ((0, 0), (0, d_pad - d), (0, 0)))
    groups = b_pad // sub
    # group layout: (G, D, SUB, N1) so a block's last two dims are (SUB, N1)
    xs_g = jnp.transpose(xs.reshape(groups, sub, d_pad, n1), (0, 2, 1, 3))
    m_bound = jnp.full((1,), m, jnp.int32)

    def kernel_with_m(m_ref, xs_ref, trace_ref, prev_ref, prev2_ref):
        _dtw_kernel(xs_ref, trace_ref, prev_ref, prev2_ref, m_max_ref=m_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(groups, d_pad // k),
        in_specs=[
            pl.BlockSpec((1, k, sub, n1), lambda b_, d_, m_: (b_, d_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, sub, n1), lambda b_, d_, m_: (b_, d_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((sub, n1), jnp.float32),
            pltpu.VMEM((sub, n1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel_with_m,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups, d_pad, sub, n1), jnp.int32),
        interpret=interpret,
    )(m_bound, xs_g)
    return out, sub, d_pad, k


def _backtrace_kernel(nm_ref, trace_ref, jump_ref, i_ref, dn_ref, done_ref):
    # grid = (groups, n_chunks) with the chunk axis REVERSED by the index_map:
    # step c reads data chunk cd = n_chunks - 1 - c, so diagonals stream from
    # high d to low. trace_ref: (1, K, SUB, N1) int32 (wavefront-native
    # layout); nm_ref: (1, SUB, 128) int32 with lane 0 = n, lane 1 = m;
    # jump_ref: (1, SUB, N1) int32 out; scratch: per-sublane walker state.
    k_block = trace_ref.shape[1]
    sub, n1 = trace_ref.shape[2], trace_ref.shape[3]
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    cd = n_chunks - 1 - c
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, n1), 1)

    @pl.when(c == 0)
    def _init():
        n_col = nm_ref[0, :, 0:1]
        m_col = nm_ref[0, :, 1:2]
        i_ref[:] = n_col
        dn_ref[:] = n_col + m_col
        done_ref[:] = jnp.zeros((sub, 1), jnp.int32)
        jump_ref[0] = jnp.full((sub, n1), -1, jnp.int32)

    def one_diag(u, state):
        i_cur, d_next, done = state
        # slot u (within this chunk, from the top) covers grid diagonal d
        s = cd * k_block + (k_block - 1 - u)
        d = s + 2
        on = (done == 0) & (d_next == d)
        j = d - i_cur
        trace_d = trace_ref[0, k_block - 1 - u]  # (SUB, N1) int32
        t_raw = jnp.sum(
            jnp.where(lane == i_cur, trace_d, 0), axis=1, keepdims=True)
        t = jnp.where(i_cur == 0, 2, jnp.where(j == 0, 1, t_raw))
        upd = on & (lane == i_cur - 1)
        jump_ref[0] = jnp.where(upd, j - 1, jump_ref[0])
        di = jnp.where((t == 0) | (t == 1), 1, 0)
        dj = jnp.where((t == 0) | (t == 2), 1, 0)
        new_i = i_cur - di
        new_j = j - dj
        done = jnp.where(on & (new_i == 0) & (new_j == 0), 1, done)
        i_cur = jnp.where(on, new_i, i_cur)
        d_next = jnp.where(on, d - 1 - (t == 0).astype(jnp.int32), d_next)
        return i_cur, d_next, done

    state = jax.lax.fori_loop(
        0, k_block, one_diag, (i_ref[:], dn_ref[:], done_ref[:]))
    i_cur, d_next, done = state

    @pl.when(c == n_chunks - 1)
    def _final():
        # grid diagonal d = 1: cells (0, 1) / (1, 0), boundary rules only (the
        # trace is never read there). Cell (1, 0) emits row 0 at frame -1 —
        # matching the per-row walk; (0, 1) emits nothing (ti = -1). The walk
        # ends at (0, 0) after this, so no state carry is needed: the next
        # grid step is a new group's c == 0 re-init.
        ic, dn, do = state
        on = (do == 0) & (dn == 1)
        upd = on & (lane == ic - 1)
        jump_ref[0] = jnp.where(upd, -ic, jump_ref[0])

    @pl.when(c != n_chunks - 1)
    def _carry():
        i_ref[:] = i_cur
        dn_ref[:] = d_next
        done_ref[:] = done


@functools.partial(jax.jit, static_argnames=("interpret", "max_sub"))
def dtw_jump_frames_pallas(x: jax.Array, n: jax.Array, m: jax.Array,
                           interpret: bool = False,
                           max_sub: int | None = None) -> jax.Array:
    """Fused wavefront + backtrace: (B, N, M) f32 costs -> (B, N+1) int32 jump
    frames, bit-equal to ``dtw.dtw_jump_frames_batch`` over the scan trace.

    The backtrace kernel consumes the wavefront's native (groups, D, SUB, N1)
    trace with the chunk grid axis reversed (high diagonals first), walking
    the diagonal-synchronized backtrace entirely in VMEM: per diagonal, one
    masked lane-select reads trace[i, j] and one masked store records the
    row's first-visit frame. The (B, D, N1) transposed trace, its int8
    convert, and the XLA scan's per-step (B, N1) streamed selects never
    happen — the trace is read exactly once, in layout. Measured ~6x on the
    probe's 1024-row chunk shape (docs/DESIGN.md round-4 revision)."""
    b, n_rows, m_cols = x.shape
    trace_g, sub, d_pad, k = _dtw_trace_raw(x, interpret=interpret,
                                            max_sub=max_sub)
    groups = trace_g.shape[0]
    n1 = trace_g.shape[3]
    b_pad = groups * sub
    nv = jnp.zeros((b_pad,), jnp.int32).at[:b].set(n.astype(jnp.int32))
    mv = jnp.zeros((b_pad,), jnp.int32).at[:b].set(m.astype(jnp.int32))
    nm = jnp.zeros((groups, sub, 128), jnp.int32)
    nm = nm.at[:, :, 0].set(nv.reshape(groups, sub))
    nm = nm.at[:, :, 1].set(mv.reshape(groups, sub))

    n_chunks = d_pad // k
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(groups, n_chunks),
        in_specs=[
            pl.BlockSpec((1, sub, 128), lambda b_, c_: (b_, 0, 0)),
            pl.BlockSpec((1, k, sub, n1),
                         lambda b_, c_: (b_, n_chunks - 1 - c_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sub, n1), lambda b_, c_: (b_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((sub, 1), jnp.int32),
            pltpu.VMEM((sub, 1), jnp.int32),
            pltpu.VMEM((sub, 1), jnp.int32),
        ],
    )
    jump = pl.pallas_call(
        _backtrace_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups, sub, n1), jnp.int32),
        interpret=interpret,
    )(nm, trace_g)
    jump = jump.reshape(b_pad, n1)[:b, : n_rows + 1]
    row_ids = jnp.arange(n_rows + 1)
    return jnp.where(row_ids[None, :] < n[:, None].astype(jnp.int32), jump, -1)


@functools.partial(jax.jit, static_argnames=("interpret", "max_sub"))
def dtw_trace_pallas(x: jax.Array, interpret: bool = False,
                     max_sub: int | None = None) -> jax.Array:
    """Batched DTW trace: x (B, N, M) f32 cost -> trace diagonals (B, D, N1_pad)
    int32 with trace[b, i, j] == out[b, i + j - 2, i] for interior cells.

    B is padded to a multiple of 8 internally; N+1 is padded to a lane multiple.
    The M bound enters through a scalar passed per kernel call.
    """
    b, n, m = x.shape
    d = n + m - 1
    out, sub, d_pad, _ = _dtw_trace_raw(x, interpret=interpret,
                                        max_sub=max_sub)
    groups = out.shape[0]
    n1 = out.shape[3]
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(groups * sub, d_pad, n1)
    return out[:b, :d]


def dtw_trace_batch(x: jax.Array, use_pallas: bool = True,
                    interpret: bool = False) -> jax.Array:
    """(B, N, M) -> (B, D, N1) trace diagonals via the Pallas kernel (TPU) or the
    vmapped lax.scan reference (any backend)."""
    from . import dtw as dtw_ops

    if use_pallas:
        tr = dtw_trace_pallas(x, interpret=interpret)
        # the scan path emits int8 diagonals of width N+1; slice to match
        return tr[:, :, : x.shape[1] + 1].astype(jnp.int8)
    b = x.shape[0]
    n = jnp.full((b,), x.shape[1], jnp.int32)
    m = jnp.full((b,), x.shape[2], jnp.int32)
    return jax.vmap(dtw_ops.dtw_trace)(x, n, m)
