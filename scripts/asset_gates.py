#!/usr/bin/env python
"""THE asset-arrival runbook: one command that fires every quality gate the
air-gapped build image cannot, the day real assets exist — and writes the
full accuracy scoreboard as ONE JSON artifact.

    export WCA_CHECKPOINT=/path/to/medium.pt        # or .npz/.safetensors
    export WCA_TOKENIZER_DIR=/path/with/multilingual.tiktoken
    python scripts/asset_gates.py [--timit_scp /path/to/timit_test.scp]
                                  [--librispeech_scp /path/to/ls.scp]
                                  [--librispeech_alignments /path/to/ali]
                                  [--reference_repo /path/to/ref]
                                  [--artifact asset_gates_results.json]

Gates, in BASELINE.json config order (each prints PASS/FAIL; exit code =
number of failures; gates whose inputs are absent are SKIPPED loudly):

1. **Golden sample** (config #1) — `pytest tests/test_golden.py`: the
   README-pinned word boundaries for sample/test.wav
   (/root/reference/README.md:134-140), the single most important fixture.
2. **TIMIT F1@50ms, recommended recipe** (config #2, needs --timit_scp):
   char units, topk=10, medfilt 3, strict, tolerance 0.05 — the accuracy
   number that must match the reference's on the same corpus.
3. **TIMIT subword/mean recipe** (config #3, needs --timit_scp): exercises
   the subword retokenize path end to end.
4. **LibriSpeech vs Kaldi alignments** (config #4, needs --librispeech_scp
   and --librispeech_alignments).
5. **probe_oracle sweep** (config #5, needs --timit_scp): per-head alignment
   eval across all layers/heads, hit_rate + best-head F1.
6. **default whisper timing baseline** (needs --timit_scp): the published
   default-heads path (`--default_whisper_timing`) on the strict protocol,
   the comparison row the paper's recipe is measured against.
7. **Boundary parity vs the PyTorch reference** (needs --reference_repo and
   its deps installed): scripts/parity_vs_reference.py FAILS unless 100% of
   word boundaries agree within 1 mel frame (20 ms) with zero word
   mismatches — the north-star parity promise asserted, not just printed.

Offline stand-ins that run TODAY (no assets) live in the test suite:
tests/test_planted_accuracy.py (planted-attention F1=1.0 gate),
tests/test_tiktoken_parity.py (tokenizer fuzz), tests/test_model_parity.py
(HF-random-weight model parity), tests/test_beam_decoding.py (decode
oracles).
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _flush_artifact(results: dict):
    """Write the scoreboard after EVERY gate: the TIMIT gates can run for
    hours, and an operator who kills a seemingly-hung runbook must not lose
    the completed gates' results."""
    path = results.get("_artifact")
    if path:
        clean = {k: v for k, v in results.items() if not k.startswith("_")}
        with open(path, "w") as f:
            json.dump(clean, f, indent=2)


def run(name, cmd, results: dict, cwd=None, parse_stdout=False):
    """Run one gate; record rc (and any metrics dict the CLI printed)."""
    print(f"\n=== {name} ===\n$ {' '.join(cmd)}", flush=True)
    if parse_stdout:
        # capture stdout only (the metrics line); stderr streams LIVE so the
        # multi-hour gates show progress bars and compile warnings as they run
        proc = subprocess.run(cmd, cwd=cwd or REPO, text=True,
                              stdout=subprocess.PIPE)
        sys.stdout.write(proc.stdout)
        rc = proc.returncode
        metrics = _parse_metrics(proc.stdout)
    else:
        rc = subprocess.call(cmd, cwd=cwd or REPO)
        metrics = None
    print(f"=== {name}: {'PASS' if rc == 0 else f'FAIL (rc={rc})'} ===",
          flush=True)
    results[name] = {"rc": rc, **({"metrics": metrics} if metrics else {})}
    _flush_artifact(results)
    return rc


def _parse_metrics(stdout: str):
    """The CLIs print their results dict as the last stdout line (repr with
    np.float64 wrappers); extract the numeric fields robustly."""
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{") and ("precision" in line or "hit_rate" in line):
            pairs = re.findall(r"'(\w+)':\s*(?:np\.float64\()?([-0-9.e+]+)",
                               line)
            if pairs:
                return {k: float(v) for k, v in pairs}
    return None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--timit_scp", default=os.environ.get("WCA_TIMIT_SCP"))
    p.add_argument("--librispeech_scp",
                   default=os.environ.get("WCA_LIBRISPEECH_SCP"))
    p.add_argument("--librispeech_alignments",
                   default=os.environ.get("WCA_LIBRISPEECH_ALI"))
    p.add_argument("--reference_repo",
                   default=os.environ.get("WCA_REFERENCE_REPO"))
    p.add_argument("--model", default="medium")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--artifact", default="asset_gates_results.json",
                   help="where the one-file accuracy scoreboard is written")
    args = p.parse_args()

    if not os.environ.get("WCA_CHECKPOINT"):
        sys.exit("WCA_CHECKPOINT is not set — this runbook needs real "
                 "weights (see scripts/fetch_assets.py to convert them)")
    if not os.environ.get("WCA_TOKENIZER_DIR"):
        sys.exit("WCA_TOKENIZER_DIR is not set — this runbook needs the "
                 "published tokenizer assets")

    results: dict = {"model": args.model, "skipped": [],
                     "_artifact": args.artifact}
    out_root = os.path.abspath("asset_gates_out")
    os.makedirs(out_root, exist_ok=True)

    def common(gate):
        d = os.path.join(out_root, gate)
        os.makedirs(d, exist_ok=True)
        return ["--model", args.model, "--batch_size", str(args.batch_size),
                "--compute_dtype", "bfloat16", "--output_dir", d]

    strict = ["--strict", "--tolerance", "0.05"]
    failures = 0

    failures += run("1 golden sample boundaries",
                    [sys.executable, "-m", "pytest",
                     "tests/test_golden.py", "-q"], results) != 0

    def infer(gate, extra):
        return [sys.executable, "-m",
                "whisper_char_alignment_tpu.cli.infer_ali",
                "--dataset", "TIMIT", "--scp", args.timit_scp,
                *common(gate), *strict, *extra]

    if args.timit_scp:
        failures += run(
            "2 TIMIT F1@50ms (recommended recipe)",
            infer("2_timit_recipe",
                  ["--aggr", "topk", "--topk", "10", "--aligned_unit_type",
                   "char", "--medfilt_width", "3", "--save_prediction"]),
            results, parse_stdout=True) != 0
        failures += run(
            "3 TIMIT subword/mean recipe",
            infer("3_subword_mean",
                  ["--aggr", "mean", "--aligned_unit_type", "subword",
                   "--medfilt_width", "7"]),
            results, parse_stdout=True) != 0
        failures += run(
            "5 probe_oracle sweep",
            [sys.executable, "-m",
             "whisper_char_alignment_tpu.cli.probe_oracle",
             "--dataset", "TIMIT", "--scp", args.timit_scp,
             *common("5_probe"), *strict,
             "--aligned_unit_type", "char", "--medfilt_width", "3"],
            results, parse_stdout=True) != 0
        failures += run(
            "6 default whisper timing baseline",
            infer("6_default_timing",
                  ["--default_whisper_timing", "--aligned_unit_type",
                   "subword"]),
            results, parse_stdout=True) != 0
    else:
        results["skipped"] += ["2 TIMIT recipe", "3 subword/mean recipe",
                               "5 probe sweep", "6 default timing"]
        print("\n(skipping TIMIT gates 2/3/5/6: no --timit_scp / "
              "WCA_TIMIT_SCP)")

    if args.librispeech_scp and args.librispeech_alignments:
        failures += run(
            "4 LibriSpeech vs Kaldi alignments",
            [sys.executable, "-m",
             "whisper_char_alignment_tpu.cli.infer_ali",
             "--dataset", "LibriSpeech", "--scp", args.librispeech_scp,
             "--alignment_file", args.librispeech_alignments,
             *common("4_librispeech"), *strict,
             "--aggr", "topk", "--topk", "10",
             "--aligned_unit_type", "char", "--medfilt_width", "3"],
            results, parse_stdout=True) != 0
    else:
        results["skipped"].append("4 LibriSpeech")
        print("\n(skipping LibriSpeech gate: needs --librispeech_scp AND "
              "--librispeech_alignments)")

    if args.reference_repo:
        failures += run(
            "7 boundary parity vs PyTorch reference (20 ms bound)",
            [sys.executable, "scripts/parity_vs_reference.py",
             "--scp", args.timit_scp or os.path.join(REPO, "sample/test.scp"),
             "--reference_repo", args.reference_repo,
             "--model", args.model], results) != 0
    else:
        results["skipped"].append("7 reference parity")
        print("\n(skipping reference parity: no --reference_repo / "
              "WCA_REFERENCE_REPO — needs the reference's torch deps)")

    results["failures"] = failures
    _flush_artifact(results)
    print(f"\nscoreboard -> {args.artifact}")
    print(f"{'ALL GATES PASS' if failures == 0 else f'{failures} GATE(S) FAILED'}")
    sys.exit(failures)


if __name__ == "__main__":
    main()
