"""Monotonic DTW over token×frame cost matrices.

Replaces ``whisper.timing.dtw`` (reference call sites: timing.py:9, 103, 165 — numba
CPU kernel + Triton CUDA wavefront kernel). The TPU-native design computes the
cost/trace recurrence as a ``lax.scan`` over anti-diagonals (the recurrence's only
parallel axis), keeps the int8 trace on device, and walks the backtrace with a
fixed-length masked scan — all jittable and vmappable over a batch of utterances.

Exact reference semantics, including the asymmetric tie-break of the recurrence
(diagonal wins only on strict minimum; otherwise "up" wins only on strict minimum;
otherwise "left"):

    c0 = cost[i-1, j-1]; c1 = cost[i-1, j]; c2 = cost[i, j-1]
    t = 0 if (c0 < c1 and c0 < c2) else 1 if (c1 < c0 and c1 < c2) else 2

Variable sizes: the recurrence at (i, j) only reads ``x[:i, :j]`` and smaller-index
costs, so running the full padded (N_max, M_max) recurrence and starting the
backtrace at the true (n, m) is exactly equivalent to slicing the matrix first
(which is what the reference does at timing.py:64,102).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# plain Python float (weak-typed in jnp ops): creating a jnp scalar here would
# initialize the JAX backend at import time, before callers can force a platform
_INF = float("inf")


def _skew(x: jax.Array) -> jax.Array:
    """Skew (N, M) into diagonal layout: out[d, i] = x[i, d - i] (masked gather)."""
    n, m = x.shape
    d_idx = jnp.arange(n + m - 1)[:, None]  # diagonal index of the *input* cell
    i_idx = jnp.arange(n)[None, :]
    j_idx = d_idx - i_idx
    valid = (j_idx >= 0) & (j_idx < m)
    return jnp.where(valid, x[i_idx, jnp.clip(j_idx, 0, m - 1)], 0.0)


@functools.partial(jax.jit, static_argnums=(3,))
def dtw_trace(x: jax.Array, n: jax.Array, m: jax.Array, dummy: int = 0):
    """Compute the DTW trace tensor for cost matrix ``x`` (N_max, M_max).

    Returns ``trace_diags`` of shape (N_max + M_max - 1, N_max + 1) int8 where
    ``trace[i, j] == trace_diags[i + j - 2, i]`` for interior cells (i, j >= 1) of
    the (N_max+1, M_max+1) cost grid. ``n``/``m`` are accepted for API symmetry and
    unused (the padded recurrence subsumes all (n, m) prefixes).
    """
    del n, m, dummy
    n_max, m_max = x.shape
    n1 = n_max + 1
    xs = _skew(x)  # xs[d, i] = x[i, d - i]; cell (i, j) reads xs[i + j - 2, i - 1]

    i_vec = jnp.arange(n1)

    def step(carry, xs_d):
        # processing grid diagonal d (= i + j); xs_d = xs[d - 2]
        prev, prev2, d = carry
        j_vec = d - i_vec
        valid = (i_vec >= 1) & (j_vec >= 1) & (j_vec <= m_max)
        shift = lambda v: jnp.concatenate([jnp.full((1,), _INF), v[:-1]])
        c0 = shift(prev2)  # cost[i-1, j-1]
        c1 = shift(prev)   # cost[i-1, j]
        c2 = prev          # cost[i, j-1]
        t = jnp.where(
            (c0 < c1) & (c0 < c2), jnp.int8(0),
            jnp.where((c1 < c0) & (c1 < c2), jnp.int8(1), jnp.int8(2)),
        )
        c = jnp.where(t == 0, c0, jnp.where(t == 1, c1, c2))
        # xval at (i, j): x[i-1, j-1] = xs[i+j-2, i-1] = xs_d[i-1]
        xval = jnp.concatenate([jnp.zeros((1,), xs_d.dtype), xs_d])
        cur = jnp.where(valid, xval.astype(jnp.float32) + c, _INF)
        # keep cost[0, 0] = 0 alive on the d=0 diagonal history
        return (cur, prev, d + 1), jnp.where(valid, t, jnp.int8(-1))

    init_prev2 = jnp.full((n1,), _INF).at[0].set(0.0)  # diagonal d=0: cost[0,0]=0
    init_prev = jnp.full((n1,), _INF)  # diagonal d=1: cost[0,1]=cost[1,0]=inf
    (_, _, _), trace_diags = jax.lax.scan(
        step, (init_prev, init_prev2, jnp.int32(2)), xs
    )
    return trace_diags


@jax.jit
def dtw_backtrace(trace_diags: jax.Array, n: jax.Array, m: jax.Array):
    """Walk the trace from (n, m) back to (0, 0).

    Returns ``(text_indices, time_indices, length)`` where the first ``length``
    entries are the path **in reverse order** (end -> start), padded with -1. The
    reference's boundary rules (timing trace[0,:]=2, trace[:,0]=1) are applied
    inline: at i==0 move left, at j==0 move up.
    """
    n_diags, n1 = trace_diags.shape
    max_steps = n_diags + 1  # path length <= n + m

    def step(carry, _):
        i, j, k, ti, tj = carry
        active = (i > 0) | (j > 0)
        write = jnp.where(active, k, max_steps)  # drop writes when inactive
        ti = ti.at[write].set(i - 1, mode="drop")
        tj = tj.at[write].set(j - 1, mode="drop")
        d = jnp.clip(i + j - 2, 0, n_diags - 1)
        t_mid = trace_diags[d, jnp.clip(i, 0, n1 - 1)]
        t = jnp.where(i == 0, jnp.int8(2), jnp.where(j == 0, jnp.int8(1), t_mid))
        di = jnp.where((t == 0) | (t == 1), 1, 0)
        dj = jnp.where((t == 0) | (t == 2), 1, 0)
        i = jnp.where(active, i - di, i)
        j = jnp.where(active, j - dj, j)
        k = k + active.astype(jnp.int32)
        return (i, j, k, ti, tj), None

    ti0 = jnp.full((max_steps,), -1, dtype=jnp.int32)
    tj0 = jnp.full((max_steps,), -1, dtype=jnp.int32)
    (i, j, k, ti, tj), _ = jax.lax.scan(
        step, (n.astype(jnp.int32), m.astype(jnp.int32), jnp.int32(0), ti0, tj0),
        None, length=max_steps,
    )
    return ti, tj, k


@jax.jit
def dtw_jump_frames(trace_diags: jax.Array, n: jax.Array, m: jax.Array):
    """First frame index at which the DTW path enters each token row.

    Fuses the reference's backtrace + jump extraction (timing.py:110-111):
    ``jump_frames[r] = min{ j : (r, j) on the path }`` for rows r in [0, n), padded
    with -1 beyond row n-1. Equivalent to ``time_indices[jumps]`` because the path
    is monotonic and visits every row.
    """
    ti, tj, _ = dtw_backtrace(trace_diags, n, m)
    n1 = trace_diags.shape[1]
    jump = jnp.full((n1,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    rows = jnp.where(ti >= 0, ti, n1)  # drop padded slots
    jump = jump.at[rows].min(jnp.where(ti >= 0, tj, jnp.iinfo(jnp.int32).max),
                             mode="drop")
    row_ids = jnp.arange(n1)
    return jnp.where(row_ids < n, jump, -1)


@jax.jit
def dtw_jump_frames_batch(trace_diags: jax.Array, n: jax.Array, m: jax.Array):
    """Batched first-visit frames via a diagonal-synchronized backtrace.

    Semantically identical to ``vmap(dtw_jump_frames)`` (same trace, same
    boundary rules, same tie-breaks — bit-exact, fuzz-tested), but organized
    so the whole batch walks the SAME grid anti-diagonal ``d = i + j`` at each
    scan step. Every path move decreases ``d`` by 1 (up/left) or 2 (diagonal),
    so the path visits each diagonal at most once; a row is simply inactive on
    the steps its path skips. Synchronizing on ``d`` turns the per-step trace
    lookup into a streamed scan input — one contiguous (B, N1) diagonal block
    per step with a masked lane-select — instead of a per-row gather into the
    full (B, D, N1) trace with per-step scatters, which measured ~38 ms per
    1024-row probe chunk on v5e (the dominant term of the probe's head-DTW
    stage; see docs/DESIGN.md round-4 probe roofline revision).

    trace_diags: (B, D, N1) as produced by ``dtw_trace``/``dtw_trace_batch``
    (``trace[i, j] == trace_diags[i + j - 2, i]``). Returns (B, N1) int32
    jump frames: ``jump[b, r] = min{ j-1 : (r+1, j) on b's path }`` for rows
    r < n_b, padded with -1 — exactly ``vmap(dtw_jump_frames)``'s output.
    """
    b, n_diags, n1 = trace_diags.shape
    d_total = n_diags + 1  # max grid diagonal: cell (N_max, M_max)
    n = n.astype(jnp.int32)
    m = m.astype(jnp.int32)

    # step s covers grid diagonal d = d_total - s, s in [0, d_total - 1]
    # (d from d_total down to 1; (0, 0) emits nothing). The trace entry for
    # diagonal d sits at index d - 2, so the stream is the trace reversed
    # along its diagonal axis plus one dummy block for d = 1 (boundary rules
    # only — cells (0, 1) / (1, 0) never read the trace). UNROLL diagonals
    # are processed per lax.scan step: the per-step loop overhead (~25 us on
    # v5e, larger than the body's vector work) amortizes across the unroll.
    UNROLL = 8
    s_total = ((d_total + UNROLL - 1) // UNROLL) * UNROLL
    pad = s_total - n_diags  # 1 dummy for d=1 + tail dummies (all rows done)
    xs = jnp.flip(trace_diags, axis=1)  # xs[s] = diag d_total - s, s <= D-2
    xs = jnp.concatenate([xs, jnp.zeros((b, pad, n1), xs.dtype)], axis=1)
    # (S/k, k, B, N1): one k-diagonal block per scan step
    xs = jnp.moveaxis(xs, 1, 0).reshape(s_total // UNROLL, UNROLL, b, n1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n1), 1)

    def one_diag(carry, diag):
        i_cur, d_next, done, d = carry
        on = (~done) & (d_next == d)
        j = d - i_cur
        # masked lane-select of trace[i, j] = diag[i]: one compare + reduce
        # (no gather). i_cur < n1 always (i <= N_max = n1 - 1).
        t_raw = jnp.sum(
            jnp.where(lane == i_cur[:, None], diag.astype(jnp.int32), 0),
            axis=1)
        t = jnp.where(i_cur == 0, 2, jnp.where(j == 0, 1, t_raw))
        ti = jnp.where(on, i_cur - 1, -1)
        tj = jnp.where(on, j - 1, -1)
        di = jnp.where((t == 0) | (t == 1), 1, 0)
        dj = jnp.where((t == 0) | (t == 2), 1, 0)
        new_i = i_cur - di
        new_j = j - dj
        done = done | (on & (new_i == 0) & (new_j == 0))
        i_cur = jnp.where(on, new_i, i_cur)
        # a diagonal move lands on d - 2, skipping d - 1
        d_next = jnp.where(on, d - 1 - (t == 0).astype(jnp.int32), d_next)
        return (i_cur, d_next, done, d - 1), (ti, tj)

    def step(carry, inp):
        tis, tjs = [], []
        for u in range(UNROLL):
            carry, (ti, tj) = one_diag(carry, inp[u])
            tis.append(ti)
            tjs.append(tj)
        return carry, (jnp.stack(tis), jnp.stack(tjs))

    init = (n, n + m, jnp.zeros((b,), bool), jnp.int32(d_total))
    _, (ti_s, tj_s) = jax.lax.scan(step, init, xs)
    ti_b = ti_s.reshape(s_total, b).T  # (B, S)
    tj_b = tj_s.reshape(s_total, b).T

    def extract(ti, tj, n_b):
        jump = jnp.full((n1,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        rows = jnp.where(ti >= 0, ti, n1)
        jump = jump.at[rows].min(
            jnp.where(ti >= 0, tj, jnp.iinfo(jnp.int32).max), mode="drop")
        row_ids = jnp.arange(n1)
        return jnp.where(row_ids < n_b, jump, -1)

    return jax.vmap(extract)(ti_b, tj_b, n)


def dtw(x) -> tuple:
    """Single-matrix convenience wrapper matching ``whisper.timing.dtw``:
    takes a (N, M) cost matrix, returns ``(text_indices, time_indices)`` as numpy
    int arrays in path order (start -> end)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n, m = x.shape
    tr = dtw_trace(x, jnp.int32(n), jnp.int32(m))
    ti, tj, k = dtw_backtrace(tr, jnp.int32(n), jnp.int32(m))
    k = int(k)
    ti = np.asarray(ti)[:k][::-1]
    tj = np.asarray(tj)[:k][::-1]
    return ti, tj


def dtw_np(x: np.ndarray) -> tuple:
    """NumPy reference with identical semantics (test oracle / host fallback).

    Accumulates in float32 — the SAME precision as the device recurrence and
    as upstream whisper's numba kernel (its ``dtw_cpu`` allocates an f32 cost
    matrix). An f64 oracle picks different paths on near-tie plateau costs:
    the `<` tie-break comparisons see unrounded partial sums the f32 paths
    never see (regression: tests/test_dtw.py plateau case).
    """
    x = np.asarray(x, dtype=np.float32)
    n, m = x.shape
    cost = np.full((n + 1, m + 1), np.inf, dtype=np.float32)
    trace = -np.ones((n + 1, m + 1), dtype=np.int8)
    cost[0, 0] = 0.0
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t

    trace[0, :] = 2
    trace[:, 0] = 1
    i, j = n, m
    text_indices, time_indices = [], []
    while i > 0 or j > 0:
        text_indices.append(i - 1)
        time_indices.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return (np.array(text_indices[::-1], dtype=np.int64),
            np.array(time_indices[::-1], dtype=np.int64))
