"""Batch alignment CLI — flag-compatible replacement for the reference's
infer_ali.py (reference: infer_ali.py:31-182), running the batched TPU pipeline.

Example (README-recommended recipe):
    python -m whisper_char_alignment_tpu.cli.infer_ali --dataset TIMIT \
        --scp /path/to/scp --model medium --aggr topk --topk 10 \
        --aligned_unit_type char --strict --output_dir results \
        --tolerance 0.05 --medfilt_width 3
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import jax.numpy as jnp

from ..align.metrics import eval_n1, eval_n1_strict, get_seg_metrics
from ..data.dataset import DATASETS
from ..runner import AlignmentPipeline
from ..parallel import distributed
from ..parallel.mesh import make_mesh
from . import common


def infer_dataset(args) -> dict:
    multihost = getattr(args, "multihost", False)
    if multihost:
        # must run before any other JAX device use in this process
        distributed.initialize(args.coordinator_address, args.num_processes,
                               args.process_id)

    params, dims, tok = common.load_model_and_tokenizer(args)
    cfg = common.config_from_args(args)
    tp = max(1, getattr(args, "tensor_parallel", 0))
    # --data_parallel: -1 = no data mesh (the historical sentinel), 0 = all
    # devices, N = exactly N. With --tensor_parallel > 1 a mesh always exists;
    # -1/0 then mean "infer the data axis from the device count".
    dp = args.data_parallel if args.data_parallel > 0 else None
    mesh = (make_mesh(dp, n_model=tp)
            if args.data_parallel >= 0 or tp > 1 else None)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    pipe = AlignmentPipeline(params, dims, tok, cfg, mesh=mesh,
                             compute_dtype=dtype)

    ds_kwargs = {}
    if getattr(args, "alignment_file", None):
        # LibriSpeech Kaldi word alignments at an explicit path (the default
        # discovers ls_alignment_{split}.txt from the corpus layout, ref
        # dataset.py:67-122); TIMIT reads .wrd files and takes no such flag
        ds_kwargs["alignment_file"] = args.alignment_file
    dataset = DATASETS[args.dataset](args.scp, n_mels=args.n_mels, **ds_kwargs)
    if multihost:
        # each process aligns its round-robin shard of the scp entries
        dataset.entries = distributed.shard_entries(dataset.entries)

    from ..utils.profiling import device_trace
    # a with-block, not a bare __enter__/__exit__ pair: a per-utterance
    # exception must still stop the profiler and flush the partial trace —
    # the most useful artifact for debugging exactly that failure
    trace_ctx = device_trace(getattr(args, "trace_dir", None))

    corrects = 0
    total_preds = 0
    total_gts = 0
    all_predictions = defaultdict(int)
    n = 0
    with trace_ctx:
        for res in pipe.run_dataset(dataset):
            if res.skipped:
                print(res.fid)
                continue
            ends_hat = res.end_times
            if args.save_prediction:
                all_predictions[n] = dict(
                    starts=res.starts, ends=res.ends, texts=res.text.split(),
                    starts_hat=res.start_times, ends_hat=ends_hat,
                    predwords=res.words, fids=res.fid)
            if args.plot and res.matrix is not None:
                from ..viz.plot import plot_attn
                from ..text.retokenize import encode as tok_encode
                text_tokens = tok_encode(res.transcription, tok,
                                         args.aligned_unit_type)
                plot_attn(res.matrix, text_tokens, tok, gt_alignment=res.ends,
                          pred_alignment=ends_hat, fid=res.fid,
                          aligned_unit_type=args.aligned_unit_type,
                          path=f"{args.output_dir}/imgs/{args.dataset}")
            # eval (reference infer_ali.py:121-132)
            if not args.strict:
                correct_pred, _ = eval_n1(res.ends, ends_hat, args.tolerance)
                total_gts += len(res.ends)
                total_preds += len(ends_hat)
                corrects += correct_pred
            else:
                words = " ".join(res.words[:-1]).split()
                tp, fp, fn = eval_n1_strict(res.ends, ends_hat, res.text.split(),
                                            words, args.tolerance)
                corrects += tp
                total_gts += tp + fn
                total_preds += tp + fp
            n += 1

    if getattr(args, "profile", False):
        pipe.timers.report()

    if multihost:
        # the reference's host-side accumulators become one cross-process sum
        summed = distributed.allreduce_counters(dict(
            corrects=corrects, total_preds=total_preds, total_gts=total_gts))
        corrects = summed["corrects"]
        total_preds = summed["total_preds"]
        total_gts = summed["total_gts"]

    precision, recall, f1, r_value, _ = get_seg_metrics(
        corrects, corrects, total_preds, total_gts)
    results = dict(precision=precision, recall=recall, f1=f1, r_value=r_value)
    print(results)
    import jax
    import time as _time
    if multihost:
        # one stem for the metrics JSON and every process's prediction shard
        stem = common.results_basename(
            args, ts=distributed.broadcast_scalar(_time.time()))
        if jax.process_index() == 0:
            common.dump_results(args, results, stem=stem)
        if args.save_prediction:
            # every process saves ITS scp shard (suffix -pN); re-scoring one
            # shard with eval_ali gives that shard's metrics, not the corpus's
            import joblib
            joblib.dump(all_predictions,
                        f"{stem}-predictions-p{jax.process_index()}.pkl")
    else:
        out = common.dump_results(args, results)
        if args.save_prediction:
            import joblib
            joblib.dump(all_predictions, out.replace(".json", "-predictions.pkl"))
    return results


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Arguments for whisper-based forced alignments")
    common.add_reference_flags(parser)
    parser.add_argument("--w_colnorm", type=float, default=1.0)
    parser.add_argument("--w_rownorm", type=float, default=1.0)
    parser.add_argument("--w_coverage", type=float, default=0.0)
    parser.add_argument("--save_prediction", action="store_true")
    parser.add_argument("--default_whisper_timing", action="store_true")
    parser.add_argument("--alignment_file", type=str, default=None,
                        help="explicit Kaldi word-alignment file for "
                             "--dataset LibriSpeech (default: discovered "
                             "from the corpus layout)")
    common.add_tpu_flags(parser)
    common.add_pipeline_flags(parser)
    return parser.parse_args(argv)


def main(argv=None):
    common.apply_platform_env()
    args = parse_args(argv)
    print(args)
    return infer_dataset(args)


if __name__ == "__main__":
    main()
