"""Attention-matrix visualization (reference: plot.py:22-59).

Renders the aggregated token x frame matrix with ground-truth boundaries as white
vlines, predictions as dotted cyan (subword) / red (char) vlines, gray hlines at
word-token boundaries, and per-token y labels; saves ``{path}/{fid}.png``.
"""

from __future__ import annotations

import os

import numpy as np

from ..text.retokenize import split_tokens_on_spaces


def plot_attn(weights, text_tokens, tokenizer, gt_alignment, pred_alignment,
              fid, aligned_unit_type, path, dpi=400):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(path, exist_ok=True)
    color = "cyan" if aligned_unit_type == "subword" else "red"
    weights = np.asarray(weights)

    fig, ax = plt.subplots(figsize=(8, 3.5))
    ax.imshow(weights, aspect="auto")

    if gt_alignment is not None:
        for e in gt_alignment:
            ax.axvline(int(e / 0.02), linewidth=2, color="white")
    for e in pred_alignment:
        ax.axvline(int(e / 0.02), linewidth=3, color=color, ls="dotted")

    words, word_tokens = split_tokens_on_spaces(
        list(text_tokens) + [tokenizer.eot], tokenizer, aligned_unit_type)
    token_boundaries = np.cumsum([len(w) for w in word_tokens[:-1]])
    for b in token_boundaries:
        ax.axhline(b - 0.5, linewidth=1.5, color="gray", ls="--")
    ax.set_yticks(np.arange(len(weights) - 1, -1, -1))
    ylabels = [tokenizer.decode([t]) for t in text_tokens] + [""]
    ax.set_yticklabels(ylabels[::-1], fontsize=9)
    ax.set_xticks([])

    plt.xlabel(r"${time} (\rightarrow)$", fontsize=18)
    plt.tight_layout()
    out = os.path.join(path, f"{fid}.png")
    plt.savefig(out, bbox_inches="tight", dpi=dpi)
    plt.close(fig)
    return out
