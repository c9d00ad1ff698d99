"""Synthetic TIMIT-style corpus generation (shared by tests and bench.py).

No real speech assets exist in this image, so end-to-end plumbing (scp parsing,
WAV decode, batching, alignment bookkeeping, eval) is exercised on generated
sine+noise utterances with evenly spaced ground-truth word boundaries, in the
reference's TIMIT on-disk layout: ``<fid> <wav path>`` scp lines plus sibling
``.wrd`` files with ``<start_sample> <end_sample> <word>`` rows
(reference dataset.py:21-64).
"""

from __future__ import annotations

import os

import numpy as np

from ..audio import wav

_WORD_POOL = ["she", "had", "your", "dark", "suit", "in", "greasy", "wash",
              "water", "all", "year", "artificial", "intelligence", "is",
              "for", "real"]


def make_timit_corpus(root: str, n_utts: int = 5, seconds=1.0,
                      words_per_utt=(3, 5), sample_rate: int = 16000,
                      seed: int = 0) -> str:
    """Write a synthetic TIMIT corpus under ``root``; returns the scp path.

    ``seconds`` may be a float (fixed duration) or a (lo, hi) range sampled per
    utterance. ``words_per_utt`` is an inclusive (lo, hi) range.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    scp_lines = []
    for i in range(n_utts):
        if isinstance(seconds, (tuple, list)):
            dur = float(rng.uniform(seconds[0], seconds[1]))
        else:
            dur = float(seconds)
        n = int(sample_rate * dur)
        audio = (0.2 * np.sin(2 * np.pi * (200 + 50 * (i % 16))
                              * np.arange(n) / sample_rate)
                 + rng.normal(0, 0.01, n)).astype(np.float32)
        path = os.path.join(root, f"utt{i}.wav")
        wav.save(path, audio, sample_rate)
        n_words = int(rng.integers(words_per_utt[0], words_per_utt[1] + 1))
        bounds = np.linspace(0, n, n_words + 1).astype(int)
        with open(os.path.join(root, f"utt{i}.wrd"), "w") as f:
            for w in range(n_words):
                word = _WORD_POOL[(i + w) % len(_WORD_POOL)]
                f.write(f"{bounds[w]} {bounds[w + 1]} {word}\n")
        scp_lines.append(f"dr1-utt{i} {path}")
    scp = os.path.join(root, "test.scp")
    with open(scp, "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    return scp
