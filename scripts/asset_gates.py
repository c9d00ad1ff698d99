#!/usr/bin/env python
"""THE asset-arrival runbook: one command that fires every quality gate the
air-gapped build image cannot, the day real assets exist.

    export WCA_CHECKPOINT=/path/to/medium.pt        # or .npz/.safetensors
    export WCA_TOKENIZER_DIR=/path/with/multilingual.tiktoken
    python scripts/asset_gates.py [--timit_scp /path/to/timit_test.scp]
                                  [--reference_repo /path/to/ref]

Gates, in order (each prints PASS/FAIL; exit code = number of failures):

1. **Golden sample** — `pytest tests/test_golden.py`: the README-pinned word
   boundaries for sample/test.wav (/root/reference/README.md:134-140), the
   single most important reference fixture.
2. **TIMIT F1@50ms sweep** (needs --timit_scp): the full infer_ali CLI with
   the README-recommended recipe (char units, topk=10, medfilt 3, strict,
   tolerance 0.05) — produces the accuracy number that must match the
   reference's on the same corpus (north star: identical accuracy @50 ms).
3. **Boundary parity vs the PyTorch reference** (needs --reference_repo and
   its deps installed): scripts/parity_vs_reference.py at the 1-mel-frame
   (20 ms) bound.

Offline stand-ins that run TODAY (no assets) live in the test suite:
tests/test_planted_accuracy.py (planted-attention F1=1.0 gate),
tests/test_tiktoken_parity.py (tokenizer fuzz), tests/test_model_parity.py
(HF-random-weight model parity), tests/test_beam_decoding.py (decode oracles).
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, env=None):
    print(f"\n=== {name} ===\n$ {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    rc = subprocess.call(cmd, cwd=REPO, env=e)
    print(f"=== {name}: {'PASS' if rc == 0 else f'FAIL (rc={rc})'} ===",
          flush=True)
    return rc


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--timit_scp", default=os.environ.get("WCA_TIMIT_SCP"))
    p.add_argument("--reference_repo",
                   default=os.environ.get("WCA_REFERENCE_REPO"))
    p.add_argument("--model", default="medium")
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args()

    if not os.environ.get("WCA_CHECKPOINT"):
        sys.exit("WCA_CHECKPOINT is not set — this runbook needs real "
                 "weights (see scripts/fetch_assets.py to convert them)")
    if not os.environ.get("WCA_TOKENIZER_DIR"):
        sys.exit("WCA_TOKENIZER_DIR is not set — this runbook needs the "
                 "published tokenizer assets")

    failures = 0
    failures += run("golden sample boundaries",
                    [sys.executable, "-m", "pytest",
                     "tests/test_golden.py", "-q"]) != 0

    if args.timit_scp:
        failures += run(
            "TIMIT F1@50ms (recommended recipe)",
            [sys.executable, "-m", "whisper_char_alignment_tpu.cli.infer_ali",
             "--dataset", "TIMIT", "--scp", args.timit_scp,
             "--model", args.model, "--aggr", "topk", "--topk", "10",
             "--aligned_unit_type", "char", "--medfilt_width", "3",
             "--strict", "--tolerance", "0.05",
             "--batch_size", str(args.batch_size),
             "--compute_dtype", "bfloat16", "--save_prediction"]) != 0
    else:
        print("\n(skipping TIMIT F1 sweep: no --timit_scp / WCA_TIMIT_SCP)")

    if args.reference_repo:
        failures += run(
            "boundary parity vs PyTorch reference (20 ms bound)",
            [sys.executable, "scripts/parity_vs_reference.py",
             "--scp", args.timit_scp or os.path.join(REPO, "sample/test.scp"),
             "--reference_repo", args.reference_repo,
             "--model", args.model]) != 0
    else:
        print("\n(skipping reference parity: no --reference_repo / "
              "WCA_REFERENCE_REPO — needs the reference's torch deps)")

    print(f"\n{'ALL GATES PASS' if failures == 0 else f'{failures} GATE(S) FAILED'}")
    sys.exit(failures)


if __name__ == "__main__":
    main()
