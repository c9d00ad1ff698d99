"""Unit tests for boundary metrics (hand-computable fixtures, SURVEY.md §4)."""

import numpy as np
import pytest

from whisper_char_alignment_tpu.align import metrics


def test_eval_n1_exact_match():
    y = [0.5, 1.0, 2.0]
    n, _ = metrics.eval_n1(y, y, tolerance=0.0)
    assert n == 3


def test_eval_n1_tolerance_window():
    y = [1.0, 2.0, 3.0]
    yhat = [1.04, 2.5, 2.96]
    n, _ = metrics.eval_n1(y, yhat, tolerance=0.05)
    # 1.04 matches 1.0; 2.5 matches nothing (2.0 passed over); 2.96 matches 3.0
    assert n == 2


def test_eval_n1_empty_pred():
    assert metrics.eval_n1([1.0], [], tolerance=0.1) == (0, 0)


def test_eval_n1_greedy_two_pointer_semantics():
    # the greedy matcher never revisits: y=..., a late yhat can't claim an early y
    y = [1.0, 1.1]
    yhat = [1.1]
    n, _ = metrics.eval_n1(y, yhat, tolerance=0.05)
    assert n == 1  # 1.0 vs 1.1 fails at tol .05? |1.0-1.1|=0.1 > .05 -> advance y; match 1.1


def test_eval_n1_strict_word_identity():
    y = [1.0, 2.0]
    words = ["Hello", "world"]
    yhat = [1.01, 2.01]
    words_hat = ["hello,", "there"]
    tp, fp, fn = metrics.eval_n1_strict(y, yhat, words, words_hat, tolerance=0.05)
    assert (tp, fp, fn) == (1, 1, 1)  # 'hello' matches (case/punct folded), 'there' doesn't


def test_eval_n1_strict_each_ref_used_once():
    y = [1.0]
    words = ["a"]
    yhat = [1.0, 1.0]
    words_hat = ["a", "a"]
    tp, fp, fn = metrics.eval_n1_strict(y, yhat, words, words_hat, tolerance=0.01)
    assert (tp, fp, fn) == (1, 1, 0)


def test_get_seg_metrics_perfect():
    p, r, f1, rv, _ = metrics.get_seg_metrics(10, 10, 10, 10)
    assert p == pytest.approx(1.0, abs=1e-5)
    assert r == pytest.approx(1.0, abs=1e-5)
    assert f1 == pytest.approx(1.0, abs=1e-4)
    assert rv == pytest.approx(1.0, abs=1e-4)


def test_get_seg_metrics_half_precision():
    p, r, f1, rv, os_ = metrics.get_seg_metrics(5, 5, 10, 5)
    assert p == pytest.approx(0.5, abs=1e-5)
    assert r == pytest.approx(1.0, abs=1e-5)
    # R-value formula check (reference metrics.py:81-84)
    os_expected = 1.0 / 0.5 - 1
    r1 = np.sqrt((1 - 1.0) ** 2 + os_expected ** 2)
    r2 = (-os_expected + 1.0 - 1) / np.sqrt(2)
    assert rv == pytest.approx(1 - (abs(r1) + abs(r2)) / 2, abs=1e-4)


def test_coverage_penalty_uniform_below_threshold():
    # coverage per frame = 0.4 < 0.5 -> penalty = sum(max(c, .5)) - F*.5 = 0
    attn = np.full((4, 10), 0.1)
    assert metrics.coverage_penalty(attn, threshold=0.5) == pytest.approx(0.0)


def test_coverage_penalty_overcovered_frames():
    attn = np.zeros((4, 10))
    attn[:, 0] = 0.5  # coverage 2.0 on frame 0
    assert metrics.coverage_penalty(attn, threshold=0.5) == pytest.approx(1.5)


def test_entropy_uniform_vs_peaked():
    uniform = np.full((2, 4), 0.25)
    peaked = np.array([[0.97, 0.01, 0.01, 0.01]] * 2)
    # reference returns NEGATED mean entropy (metrics.py:120)
    assert metrics.entropy(uniform) < metrics.entropy(peaked)
    assert metrics.entropy(uniform) == pytest.approx(-np.log(4))


def test_dtw_timestamp_identical():
    d, _ = metrics.dtw_timestamp(np.array([1.0, 2.0]), np.array([1.0, 2.0]))
    assert d == pytest.approx(0.0)


def test_count_transitions():
    c, pos = metrics.count_transitions([0, 0, 1, 1, 0])
    assert c == 2 and pos == [2, 4]


def test_eval_n1_strict_many_equals_loop():
    """The probe's vectorized per-head strict eval must equal row-by-row
    eval_n1_strict exactly (same greedy claim order), including repeated
    words, out-of-tolerance preds, and pred/gt length mismatches."""
    import numpy as np
    from whisper_char_alignment_tpu.align.metrics import (eval_n1_strict,
                                                          eval_n1_strict_many)

    rng = np.random.default_rng(7)
    words = "the cat sat on the mat the end".split()
    gts = np.cumsum(rng.uniform(0.1, 0.5, len(words)))
    for n_pred_words, n_sets in [(len(words), 40), (5, 17), (11, 8), (0, 3)]:
        words_hat = (words * 2)[:n_pred_words]
        y_hat_many = rng.uniform(0, gts[-1] + 0.5,
                                 (n_sets, max(n_pred_words, 1)))
        if n_pred_words == 0:
            y_hat_many = y_hat_many[:, :0]
        tp_v, fp_v, fn_v = eval_n1_strict_many(gts, y_hat_many, words,
                                               words_hat, tolerance=0.2)
        for s in range(n_sets):
            tp, fp, fn = eval_n1_strict(gts, y_hat_many[s], words, words_hat,
                                        tolerance=0.2)
            assert (tp, fp, fn) == (tp_v[s], fp_v[s], fn_v[s]), s


# ---------------------------------------------------------------------------
# Differential fuzz vs direct transcriptions of the reference's published
# matching loops (reference metrics.py:5-72). The production functions are
# restructured/vectorized; these oracles follow the reference line by line,
# so any semantic drift (tie handling, reuse of reference boundaries, the
# punctuation strip) shows up as a mismatch on some random draw.
# ---------------------------------------------------------------------------

def _ref_eval_n1(y, yhat, tolerance):
    if len(yhat) == 0:
        return 0, 0
    n_match, i, j = 0, 0, 0
    while i < len(y) and j < len(yhat):
        if abs(y[i] - yhat[j]) <= tolerance:
            i += 1
            j += 1
            n_match += 1
        elif y[i] < yhat[j]:
            i += 1
        else:
            j += 1
    return n_match, n_match


def _ref_eval_n1_strict(y, y_hat, words, words_hat, tolerance):
    import string

    words = [w.lower().strip(string.punctuation) for w in words]
    words_hat = [w.lower().strip(string.punctuation) for w in words_hat]
    tp, used = 0, set()
    for i in range(len(y_hat)):
        for j in range(len(y)):
            if j in used:
                continue
            if words[j] == words_hat[i] and abs(y[j] - y_hat[i]) <= tolerance:
                tp += 1
                used.add(j)
                break
    return tp, len(y_hat) - tp, len(y) - len(used)


def _ref_dtw_timestamp(gt_ends, pred_ends):
    n, m = len(gt_ends), len(pred_ends)
    d = np.full((n + 1, m + 1), np.inf)
    d[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = abs(gt_ends[i - 1] - pred_ends[j - 1])
            d[i, j] = cost + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return d[n, m], d


@pytest.mark.parametrize("seed", range(25))
def test_eval_n1_fuzz_vs_reference_loop(seed):
    rng = np.random.default_rng(seed)
    # sorted boundary times with deliberate near-tolerance gaps
    y = np.sort(rng.choice(np.arange(0, 4.0, 0.05), size=rng.integers(0, 12)))
    yhat = np.sort(rng.choice(np.arange(0, 4.0, 0.05),
                              size=rng.integers(0, 12)))
    tol = float(rng.choice([0.02, 0.05, 0.1]))
    assert metrics.eval_n1(y, yhat, tol) == _ref_eval_n1(y, yhat, tol), (
        y, yhat, tol)


@pytest.mark.parametrize("seed", range(25))
def test_eval_n1_strict_fuzz_vs_reference_loop(seed):
    rng = np.random.default_rng(100 + seed)
    vocab = ["the", "cat", "sat", "mat", "dog", "Dog.", "cat!", "'the'"]
    n = int(rng.integers(0, 10))
    m = int(rng.integers(0, 10))
    y = np.sort(rng.choice(np.arange(0, 3.0, 0.05), size=n))
    y_hat = np.sort(rng.choice(np.arange(0, 3.0, 0.05), size=m))
    words = [str(rng.choice(vocab)) for _ in range(n)]
    words_hat = [str(rng.choice(vocab)) for _ in range(m)]
    tol = float(rng.choice([0.02, 0.05]))
    got = metrics.eval_n1_strict(y, y_hat, words, words_hat, tol)
    want = _ref_eval_n1_strict(list(y), list(y_hat), words, words_hat, tol)
    assert tuple(got) == tuple(want), (y, y_hat, words, words_hat, tol)
    # the vectorized many-row variant must agree row-for-row too
    if m:
        tp_v, fp_v, fn_v = metrics.eval_n1_strict_many(
            y, y_hat[None, :], words, words_hat, tol)
        assert (tp_v[0], fp_v[0], fn_v[0]) == tuple(want)


@pytest.mark.parametrize("seed", range(8))
def test_dtw_timestamp_fuzz_vs_reference_loop(seed):
    rng = np.random.default_rng(200 + seed)
    a = np.sort(rng.uniform(0, 3, rng.integers(1, 10)))
    b = np.sort(rng.uniform(0, 3, rng.integers(1, 10)))
    dist, mat = metrics.dtw_timestamp(a, b)
    dist_o, mat_o = _ref_dtw_timestamp(list(a), list(b))
    assert np.isclose(dist, dist_o)
    np.testing.assert_allclose(mat, mat_o)
