#!/usr/bin/env python
"""Generate the synthetic sample fixture (test.wav + test.scp + test.wrd).

The reference ships a real TIMIT utterance ("Artificial intelligence is for
real"); this repo is built in an offline image, so the committed fixture is a
deterministic synthetic 2.2 s formant-like audio with 5 word segments at the
README golden boundaries. Useful for CLI smoke runs; real-weight golden parity
uses the reference wav via tests/test_golden.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from whisper_char_alignment_tpu.audio import wav  # noqa: E402

SR = 16000
WORDS = [
    ("artificial", 0.00, 0.70),
    ("intelligence", 0.70, 1.38),
    ("is", 1.38, 1.52),
    ("for", 1.52, 1.76),
    ("real", 1.76, 2.06),
]


def main():
    here = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.abspath(__file__))
    os.makedirs(here, exist_ok=True)
    rng = np.random.default_rng(0)
    n = int(2.2 * SR)
    audio = np.zeros(n, np.float32)
    t = np.arange(n) / SR
    for i, (word, s, e) in enumerate(WORDS):
        seg = (t >= s) & (t < e)
        f0 = 120 + 15 * i
        env = np.sin(np.pi * (t[seg] - s) / (e - s)) ** 0.5
        tone = sum(np.sin(2 * np.pi * f0 * k * t[seg] + 0.7 * k) / k
                   for k in range(1, 6))
        audio[seg] = 0.25 * env * tone
    audio += rng.normal(0, 0.004, n).astype(np.float32)

    wav.save(os.path.join(here, "test.wav"), audio, SR)
    with open(os.path.join(here, "test.wrd"), "w") as f:
        for word, s, e in WORDS:
            f.write(f"{int(s * SR)} {int(e * SR)} {word}\n")
    with open(os.path.join(here, "test.scp"), "w") as f:
        # relative to the repo root so the fixture works in any checkout
        f.write("dr0-sample-test sample/test.wav\n")
    print("wrote", here)


if __name__ == "__main__":
    main()
