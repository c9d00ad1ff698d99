#!/usr/bin/env python
"""Boundary-parity harness vs the PyTorch reference.

Runs BOTH implementations on the same scp and compares (word, start, end) tuples
at a 1-mel-frame (20 ms) tolerance — the north-star parity bound (BASELINE.md).
Requires an environment that has the reference's dependencies installed
(``openai-whisper``, torch, torchaudio) *and* this repo's assets
(WCA_CHECKPOINT / WCA_TOKENIZER_DIR); neither is available in the air-gapped
build image, so this script is the ready-to-run recipe for an asset-ful machine.

Usage:
    python scripts/parity_vs_reference.py --scp /path/to/test.scp \
        --reference_repo /path/to/whisper-char-alignment --model medium
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_ours(args):
    from whisper_char_alignment_tpu import api
    from whisper_char_alignment_tpu.data.dataset import TIMIT

    model = api.load_model(args.model, checkpoint=args.checkpoint,
                           tokenizer_dir=args.tokenizer_dir)
    out = {}
    ds = TIMIT(args.scp)
    for i in range(len(ds)):
        u = ds[i]
        res = api.align(model, u.audio, aligned_unit_type=args.aligned_unit_type,
                        aggregation="topk", topk=args.topk,
                        medfilt_width=args.medfilt_width)
        out[u.fid] = [(w.strip(), float(s), float(e)) for w, s, e in
                      zip(res.words[:-1], res.start_times, res.end_times)]
    return out


def run_reference(args):
    sys.path.insert(0, args.reference_repo)
    import torch
    import whisper
    from whisper.tokenizer import get_tokenizer

    from timing import get_attentions, force_align  # reference modules
    from retokenize import encode, remove_punctuation

    from whisper_char_alignment_tpu.data.dataset import TIMIT

    model = whisper.load_model(args.model)
    tokenizer = get_tokenizer(model.is_multilingual, language="English")
    options = whisper.DecodingOptions(language="en")
    out = {}
    ds = TIMIT(args.scp)
    for i in range(len(ds)):
        u = ds[i]
        audio = whisper.pad_or_trim(torch.from_numpy(u.audio))
        mel = whisper.log_mel_spectrogram(audio, 80).to(model.device)
        transcription = remove_punctuation(whisper.decode(model, mel, options).text)
        text_tokens = encode(transcription, tokenizer, args.aligned_unit_type)
        max_frames = u.duration // 320
        attn_w, _ = get_attentions(
            mel, torch.tensor([*tokenizer.sot_sequence, tokenizer.no_timestamps,
                               *text_tokens, tokenizer.eot]).to(model.device),
            model, tokenizer, max_frames, args.medfilt_width, 1.0)
        words, starts, ends, _, _ = force_align(
            attn_w, text_tokens, tokenizer,
            aligned_unit_type=args.aligned_unit_type, aggregation="topk",
            topk=args.topk)
        out[u.fid] = [(w.strip(), float(s), float(e)) for w, s, e in
                      zip(words[:-1], starts, ends)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scp", required=True)
    ap.add_argument("--reference_repo", required=True)
    ap.add_argument("--model", default="medium")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer_dir", default=None)
    ap.add_argument("--aligned_unit_type", default="char")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--medfilt_width", type=int, default=3)
    ap.add_argument("--tolerance", type=float, default=0.02,
                    help="1 mel frame (20 ms) per BASELINE.md")
    args = ap.parse_args()

    ours = run_ours(args)
    ref = run_reference(args)

    n_words = n_match = n_word_mismatch = 0
    worst = 0.0
    for fid in ref:
        a, b = ours.get(fid, []), ref[fid]
        if len(a) != len(b):
            print(f"{fid}: word count differs ({len(a)} vs {len(b)})")
            n_word_mismatch += max(len(a), len(b))
            continue
        for (w1, s1, e1), (w2, s2, e2) in zip(a, b):
            n_words += 1
            if w1.lower() != w2.lower():
                n_word_mismatch += 1
                continue
            d = max(abs(s1 - s2), abs(e1 - e2))
            worst = max(worst, d)
            if d <= args.tolerance:
                n_match += 1
            else:
                print(f"{fid}: {w1} off by {d * 1000:.0f} ms")
    print(f"\nwords: {n_words}  within {args.tolerance * 1000:.0f} ms: {n_match} "
          f"({100 * n_match / max(n_words, 1):.2f}%)  word mismatches: "
          f"{n_word_mismatch}  worst boundary delta: {worst * 1000:.0f} ms")
    if n_words == 0:
        # zero comparisons must FAIL, not pass vacuously — a malformed scp
        # would otherwise let the asset gate report 100% parity over nothing
        # (round-4 review finding)
        print("no words were compared — refusing to report parity",
              file=sys.stderr)
        return 2
    return 0 if n_match == n_words and n_word_mismatch == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
