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

**Rehearsal mode** (`--rehearse`): run the ENTIRE runbook offline, today.
Generates a random checkpoint in the real asset formats (OpenAI `.pt`
zip-pickle + a `multilingual.tiktoken` tokenizer dir — the same serializers
scripts/rehearse_asset_day.py proves against the HF-torch twin), synthetic
TIMIT and LibriSpeech corpora in the reference on-disk layouts, and drives
every gate's REAL command through the production `WCA_CHECKPOINT` /
`WCA_TOKENIZER_DIR` loader path on CPU. Metric VALUES are meaningless with
random weights (gates run `--use_gt_transcript` so the alignment stage sees
real multi-word token workloads); what the rehearsal asserts is that every
command exits 0 and prints a parseable metrics line — so on asset day the
runbook can only fail on weight values, never on formats, flags, or
plumbing. Gate 1 maps to the HF-twin boundary-parity rehearsal; gate 7
(reference-repo parity) stays skipped — its torch-whisper deps don't exist
offline, and gate 1's twin carries the same 20 ms bound.
`--only 2,2b,5` restricts either mode to the named gates (by leading token).
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


def run(name, cmd, results: dict, cwd=None, parse_stdout=False,
        require_metrics=False):
    """Run one gate; record rc (and any metrics dict the CLI printed).
    ``require_metrics`` (rehearsal mode) fails the gate when the command
    exits 0 but its stdout metrics line doesn't parse — the print contract
    is part of the plumbing being rehearsed."""
    only = results.get("_only")
    if only and name.split()[0] not in only:
        results.setdefault("skipped", []).append(f"{name} (--only)")
        return 0
    print(f"\n=== {name} ===\n$ {' '.join(cmd)}", flush=True)
    if parse_stdout:
        # capture stdout only (the metrics line); stderr streams LIVE so the
        # multi-hour gates show progress bars and compile warnings as they run
        proc = subprocess.run(cmd, cwd=cwd or REPO, text=True,
                              stdout=subprocess.PIPE)
        sys.stdout.write(proc.stdout)
        rc = proc.returncode
        metrics = _parse_metrics(proc.stdout)
        if rc == 0 and require_metrics and metrics is None:
            print(f"(gate exited 0 but printed no parseable metrics line)")
            rc = 97
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
    np.float64 wrappers); extract the numeric fields robustly. eval_ali
    instead prints the reference's two-decimal 'precision: 0.23' block
    (reference eval_ali.py:48-53) — parsed as the fallback."""
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{") and ("precision" in line or "hit_rate" in line):
            pairs = re.findall(r"'(\w+)':\s*(?:np\.float64\()?([-0-9.e+]+)",
                               line)
            if pairs:
                return {k: float(v) for k, v in pairs}
    pairs = re.findall(r"^(precision|recall|f1|r value):\s*([-0-9.e+]+)\s*$",
                       stdout, re.MULTILINE)
    if pairs:
        return {k.replace(" ", "_"): float(v) for k, v in pairs}
    return None


def setup_rehearsal(args) -> str:
    """Generate real-format synthetic assets + corpora and point the runbook
    at them (offline dress rehearsal of every gate's plumbing)."""
    import importlib.util
    import tempfile

    sys.path.insert(0, REPO)
    # children resolve WCA_PLATFORM via cli.common.apply_platform_env (the
    # axon plugin ignores JAX_PLATFORMS); the parent only serializes assets
    os.environ.setdefault("WCA_PLATFORM", "cpu")
    spec = importlib.util.spec_from_file_location(
        "rehearse_asset_day", os.path.join(REPO, "scripts",
                                           "rehearse_asset_day.py"))
    rad = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rad)

    from whisper_char_alignment_tpu.config import tiny_test_dims
    from whisper_char_alignment_tpu.data.synthetic import (
        make_librispeech_corpus, make_timit_corpus)
    from whisper_char_alignment_tpu.text.bpe import ByteBPE, toy_ranks
    from whisper_char_alignment_tpu.text.tokenizer import WhisperTokenizer

    work = args.rehearse_dir or tempfile.mkdtemp(prefix="wca_asset_gates_")
    os.makedirs(work, exist_ok=True)
    n_vocab = WhisperTokenizer(ByteBPE(toy_ranks())).n_vocab
    # ctx sized so the probe gate's >=18-word utterances fit: ~110 char
    # tokens + specials < n_text_ctx, and the 3.84 s audio window holds the
    # 2.0-3.4 s corpus below
    dims = tiny_test_dims(n_vocab=n_vocab, n_audio_ctx=192, n_text_ctx=192,
                          state=32, head=4, layers=2)
    assets = rad.make_assets(work, dims, seed=args.rehearse_seed)
    print(f"rehearsal assets: {assets}", flush=True)
    args.timit_scp = make_timit_corpus(
        os.path.join(work, "timit"), n_utts=args.rehearse_utts,
        seconds=(2.0, 3.4), words_per_utt=(18, 20), seed=0)
    args.librispeech_scp, args.librispeech_alignments = \
        make_librispeech_corpus(os.path.join(work, "librispeech"),
                                n_utts=max(2, args.rehearse_utts // 2),
                                seconds=(2.0, 3.4), words_per_utt=(4, 7),
                                seed=0)
    os.environ["WCA_CHECKPOINT"] = assets["pt"]
    os.environ["WCA_TOKENIZER_DIR"] = assets["tokenizer_dir"]
    # an unknown model name: get_alignment_heads falls back to the last-half
    # layer heads, so gate 6's baseline path works at rehearsal dims
    args.model = "wca-rehearsal"
    args.batch_size = min(args.batch_size, 4)
    return work


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
    p.add_argument("--only", default=None,
                   help="comma-separated gate numbers (e.g. 2,2b,5): run "
                        "only those gates, skip the rest loudly")
    p.add_argument("--rehearse", action="store_true",
                   help="offline dress rehearsal: synthetic real-format "
                        "assets + corpora through every gate's real command")
    p.add_argument("--rehearse_dir", default=None,
                   help="keep rehearsal assets/corpora here (default: tmp)")
    p.add_argument("--rehearse_utts", type=int, default=6)
    p.add_argument("--rehearse_seed", type=int, default=10)
    args = p.parse_args()

    if args.rehearse:
        work = setup_rehearsal(args)
        out_root = os.path.join(work, "asset_gates_out")
    else:
        if not os.environ.get("WCA_CHECKPOINT"):
            sys.exit("WCA_CHECKPOINT is not set — this runbook needs real "
                     "weights (see scripts/fetch_assets.py to convert them); "
                     "or run --rehearse for the offline dress rehearsal")
        if not os.environ.get("WCA_TOKENIZER_DIR"):
            sys.exit("WCA_TOKENIZER_DIR is not set — this runbook needs the "
                     "published tokenizer assets (or run --rehearse)")
        out_root = os.path.abspath("asset_gates_out")

    results: dict = {"model": args.model, "rehearse": args.rehearse,
                     "skipped": [], "_artifact": args.artifact,
                     "_only": ([s.strip() for s in args.only.split(",")]
                               if args.only else None)}
    os.makedirs(out_root, exist_ok=True)

    def common(gate):
        d = os.path.join(out_root, gate)
        os.makedirs(d, exist_ok=True)
        flags = ["--model", args.model, "--batch_size", str(args.batch_size),
                 "--compute_dtype", "bfloat16", "--output_dir", d]
        if args.rehearse:
            # random weights transcribe to garbage: GT-fed alignment keeps
            # every gate's alignment stage on realistic multi-word token
            # workloads (decode still runs); 8 steps bound the CPU decode
            flags += ["--use_gt_transcript", "--decode_sample_len", "8"]
        return flags

    strict = ["--strict", "--tolerance", "0.05"]
    failures = 0
    rm = args.rehearse  # rehearsal: the metrics PRINT CONTRACT is the gate

    if args.rehearse:
        # the golden boundaries need real weights; the rehearsal-mode stand-in
        # is the HF-twin end-to-end parity run on the same serializers
        failures += run(
            "1 golden-style parity rehearsal (HF twin, real-format assets)",
            [sys.executable, "scripts/rehearse_asset_day.py",
             "--seed", str(args.rehearse_seed)], results) != 0
    else:
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
            results, parse_stdout=True, require_metrics=rm) != 0
        pkls = glob.glob(os.path.join(out_root, "2_timit_recipe",
                                      "*-predictions.pkl"))
        if pkls:
            failures += run(
                "2b eval_ali re-score of gate 2's pkl at 0.1s",
                [sys.executable, "-m",
                 "whisper_char_alignment_tpu.cli.eval_ali",
                 "--pred", max(pkls, key=os.path.getmtime),
                 "--tolerance", "0.1"],
                results, parse_stdout=True, require_metrics=rm) != 0
        else:
            results["skipped"].append("2b eval_ali (no gate-2 pkl)")
        failures += run(
            "3 TIMIT subword/mean recipe",
            infer("3_subword_mean",
                  ["--aggr", "mean", "--aligned_unit_type", "subword",
                   "--medfilt_width", "7"]),
            results, parse_stdout=True, require_metrics=rm) != 0
        failures += run(
            "5 probe_oracle sweep",
            [sys.executable, "-m",
             "whisper_char_alignment_tpu.cli.probe_oracle",
             "--dataset", "TIMIT", "--scp", args.timit_scp,
             *common("5_probe"), *strict,
             "--aligned_unit_type", "char", "--medfilt_width", "3",
             # rehearsal dims have 8 total heads; keep the hit_rate
             # non-vacuous by asking for the top-2 instead of the top-10
             *(["--hit_within", "2"] if args.rehearse else [])],
            results, parse_stdout=True, require_metrics=rm) != 0
        failures += run(
            "6 default whisper timing baseline",
            infer("6_default_timing",
                  ["--default_whisper_timing", "--aligned_unit_type",
                   "subword"]),
            results, parse_stdout=True, require_metrics=rm) != 0
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
            results, parse_stdout=True, require_metrics=rm) != 0
    else:
        results["skipped"].append("4 LibriSpeech")
        print("\n(skipping LibriSpeech gate: needs --librispeech_scp AND "
              "--librispeech_alignments)")

    if args.reference_repo and not args.rehearse:
        failures += run(
            "7 boundary parity vs PyTorch reference (20 ms bound)",
            [sys.executable, "scripts/parity_vs_reference.py",
             "--scp", args.timit_scp or os.path.join(REPO, "sample/test.scp"),
             "--reference_repo", args.reference_repo,
             "--model", args.model], results) != 0
    elif args.rehearse:
        results["skipped"].append("7 reference parity (rehearsal: gate 1's "
                                  "HF twin carries the 20 ms bound offline)")
        print("\n(skipping reference parity in rehearsal: its torch-whisper "
              "deps don't exist offline; gate 1's HF twin asserts the same "
              "20 ms boundary bound)")
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
