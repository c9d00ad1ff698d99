"""Boundary-matching evaluation metrics and head-scoring penalties.

NumPy re-implementation of the reference's metrics module (reference: metrics.py).
These run on host over tiny arrays (per-utterance boundary lists), so NumPy is the
right tool; the device-side twin of ``coverage_penalty`` used inside head scoring is
in ``align.timing`` as a fused jnp reduction.
"""

from __future__ import annotations

import string

import numpy as np


def dtw_timestamp(gt_ends, pred_ends):
    """Classic DTW distance between two boundary sequences
    (reference: metrics.py:5-20; unused by the CLIs but part of the public surface)."""
    n, m = len(gt_ends), len(pred_ends)
    dtw_matrix = np.full((n + 1, m + 1), np.inf)
    dtw_matrix[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = np.abs(gt_ends[i - 1] - pred_ends[j - 1])
            dtw_matrix[i, j] = cost + min(
                dtw_matrix[i - 1, j],
                dtw_matrix[i, j - 1],
                dtw_matrix[i - 1, j - 1],
            )
    return dtw_matrix[n, m], dtw_matrix


def eval_n1(y, yhat, tolerance=1):
    """Greedy two-pointer boundary matching (reference: metrics.py:22-43).

    Returns ``(n_match, n_match)`` — the duplicated return mirrors the reference
    signature (metrics.py:43); callers use only the first element.
    """
    if len(yhat) == 0:
        return 0, 0
    n_match = 0
    i, j = 0, 0
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


def eval_n1_strict(y, y_hat, words, words_hat, tolerance=1):
    """Word-identity-aware TP/FP/FN boundary matching (reference: metrics.py:45-72).

    Each prediction may claim at most one unused ground-truth boundary whose word
    matches (case/punctuation-insensitive) within ``tolerance`` seconds.
    """
    words = [w.lower().strip(string.punctuation) for w in words]
    words_hat = [w.lower().strip(string.punctuation) for w in words_hat]

    tp = 0
    used_refs = set()
    for i in range(len(y_hat)):
        for j in range(len(y)):
            if j in used_refs:
                continue
            if words[j] == words_hat[i] and abs(y[j] - y_hat[i]) <= tolerance:
                tp += 1
                used_refs.add(j)
                break

    fp = len(y_hat) - tp
    fn = len(y) - len(used_refs)
    return tp, fp, fn


def get_seg_metrics(correct_predict, correct_retrieve, total_predict, total_gold):
    """Precision / recall / F1 / R-value (reference: metrics.py:74-86)."""
    EPS = 1e-7
    precision = correct_predict / (total_predict + EPS)
    recall = correct_retrieve / (total_gold + EPS)
    f1 = 2 * (precision * recall) / (precision + recall + EPS)

    os_ = recall / (precision + EPS) - 1
    r1 = np.sqrt((1 - recall) ** 2 + os_ ** 2)
    r2 = (-os_ + recall - 1) / (np.sqrt(2))
    r_value = 1 - (abs(r1) + abs(r2)) / 2
    return precision, recall, f1, r_value, os_


def count_transitions(x):
    """Count value changes in a sequence (reference: metrics.py:88-97)."""
    count = 0
    positions = []
    for i in range(1, len(x)):
        if x[i] != x[i - 1]:
            positions.append(i)
            count += 1
    return count, positions


def coverage_penalty(attn, threshold=0.5):
    """Penalize frames whose total attention mass exceeds ``threshold``
    (reference: metrics.py:99-111). ``attn``: (tokens, frames) array."""
    attn = np.asarray(attn)
    coverage = attn.sum(axis=0)
    penalty = np.maximum(coverage, threshold).sum(-1)
    return penalty - attn.shape[-1] * threshold


def entropy(prob, eps=1e-15):
    """Negated mean row entropy (reference: metrics.py:113-120)."""
    prob = np.asarray(prob, dtype=np.float64)
    prob = prob / prob.sum(axis=-1, keepdims=True)
    ent = -(prob * np.log(prob + eps)).sum(axis=-1)
    return -ent.mean()
