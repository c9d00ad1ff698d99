"""Offline re-evaluation of saved predictions at a new tolerance
(reference: eval_ali.py:9-65)."""

from __future__ import annotations

import argparse

from ..align.metrics import eval_n1_strict, get_seg_metrics
from ..text.retokenize import remove_punctuation


def run_eval(args) -> dict:
    import joblib

    preds = joblib.load(args.pred)
    pred_ali = {}
    gt_ali = {}
    for i in range(len(preds)):
        if not preds[i]:
            continue
        fid = preds[i]["fids"].replace("eval_", "").upper()
        pred_ali[fid] = {
            "starts": preds[i]["starts_hat"],
            "ends": preds[i]["ends_hat"],
            "words": [remove_punctuation(w) for w in preds[i]["predwords"]],
        }
        gt_ali[fid] = {
            "starts": preds[i]["starts"],
            "ends": preds[i]["ends"],
            "words": [remove_punctuation(w) for w in preds[i]["texts"]],
        }

    corrects = 0
    total_preds = 0
    total_gts = 0
    for k in gt_ali:
        tp, fp, fn = eval_n1_strict(
            gt_ali[k]["ends"], pred_ali[k]["ends"], gt_ali[k]["words"],
            pred_ali[k]["words"], tolerance=args.tolerance)
        corrects += tp
        total_gts += tp + fn
        total_preds += tp + fp

    precision, recall, f1, r_value, _ = get_seg_metrics(
        corrects, corrects, total_preds, total_gts)
    print("-----------------")
    print(f"precision: {precision:.2f}")
    print(f"recall: {recall:.2f}")
    print(f"f1: {f1:.2f}")
    print(f"r value: {r_value:.2f}")
    print("-----------------")
    return dict(precision=precision, recall=recall, f1=f1, r_value=r_value)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="eval alignment")
    parser.add_argument("--pred", type=str, required=True)
    parser.add_argument("--tolerance", type=float, default=0.05)
    return parser.parse_args(argv)


def main(argv=None):
    return run_eval(parse_args(argv))


if __name__ == "__main__":
    main()
