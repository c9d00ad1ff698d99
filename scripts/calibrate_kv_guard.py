"""Calibrate the guard margins for the guarded decode modes.

--mode int8   (default): WCA_KV_INT8_GUARD_MARGIN for --decode_kv_int8_guarded
--mode bucket : WCA_BUCKET_GUARD_MARGIN for --decode_frame_bucket_guarded
--mode both   : the SUM bound when both guarded modes run together

A guarded mode (models/decoding.py) keeps an utterance's perturbed-decode
transcript only when EVERY sampled step's top1-top2 filtered-logit margin
exceeds the guard bound; utterances below it re-decode with the guarded
perturbation off. The bound is checkpoint/data dependent — this script
measures it on a real corpus the day assets arrive (and smokes on the
offline test model):

1. decode each batch twice: exact, and perturbed (int8 and/or frame-bucketed)
   with margin tracking (guard=0.0 tracks margins but flags nothing),
2. compare transcripts: any difference is a "flip" the guard must catch,
3. recommend bound = safety x the LARGEST margin observed on a flipped
   utterance (flips with bigger margins would escape a smaller bound); with
   zero flips the tested default for the mode stands,
4. report the predicted re-decode (flag) rate of the recommended bound from
   the corpus margin distribution — the deployability condition is
   flag_rate < ~4% (DESIGN.md guarded-int8 envelope: cost = guard-track +
   flag_rate x exact re-decode).

Prints ONE JSON line on stdout; logs on stderr.

Usage:
  python scripts/calibrate_kv_guard.py --test_model            # offline smoke
  python scripts/calibrate_kv_guard.py --rehearse --mode both  # asset-day dry run
  WCA_CHECKPOINT=medium.npz python scripts/calibrate_kv_guard.py \
      --model medium --scp timit_test.scp --dataset TIMIT

--rehearse serializes a random tiny checkpoint in the REAL formats (OpenAI
.pt zip-pickle + tokenizer dir, scripts/rehearse_asset_day.make_assets) and
loads it through the production --checkpoint/--tokenizer_dir path before
calibrating — the asset-day procedure end-to-end, so the day real weights
arrive only the weight VALUES are new (VERDICT r04: "the calibration
procedure can still be rehearsed on the synthetic-asset fixture").
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores the env var; honor it explicitly so the
    # documented CPU smoke does not pay remote compiles on the tunnel
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="medium")
    ap.add_argument("--test_model", action="store_true",
                    help="offline smoke: tiny random model + synthetic corpus")
    ap.add_argument("--rehearse", action="store_true",
                    help="asset-day dry run: real-format synthetic assets "
                         "loaded through the production checkpoint/tokenizer "
                         "path (see module docstring)")
    ap.add_argument("--scp", default=None,
                    help="corpus scp (default: a synthetic TIMIT-style one)")
    ap.add_argument("--dataset", default="TIMIT")
    ap.add_argument("--n_utts", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--decode_len", type=int, default=32)
    ap.add_argument("--safety", type=float, default=2.0,
                    help="bound = safety x max flipped-utterance margin")
    ap.add_argument("--mode", choices=("int8", "bucket", "both"),
                    default="int8",
                    help="which guarded perturbation to calibrate")
    ap.add_argument("--frame_bucket", type=int, default=128,
                    help="bucket multiple for --mode bucket/both (the "
                         "--decode_frame_bucket value being deployed)")
    args = ap.parse_args()

    from whisper_char_alignment_tpu.cli import common
    from whisper_char_alignment_tpu.config import tiny_test_dims
    from whisper_char_alignment_tpu.data.dataset import DATASETS, batch_iter
    from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
    from whisper_char_alignment_tpu.models import decoding
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.audio.mel import log_mel_spectrogram, \
        pad_or_trim
    from whisper_char_alignment_tpu import constants

    if args.rehearse:
        import rehearse_asset_day
        from whisper_char_alignment_tpu.text.bpe import ByteBPE, toy_ranks
        from whisper_char_alignment_tpu.text.tokenizer import WhisperTokenizer

        # the tokenizer-dir tokenizer's vocab must equal the checkpoint's
        n_vocab = WhisperTokenizer(ByteBPE(toy_ranks())).n_vocab
        rdims = tiny_test_dims(n_vocab=n_vocab, n_audio_ctx=96, n_text_ctx=64,
                               state=16, head=2, layers=2)
        asset_dir = tempfile.mkdtemp(prefix="wca_calib_assets_")
        assets = rehearse_asset_day.make_assets(asset_dir, rdims)
        log(f"rehearsal assets (real formats): {assets}")
        ns = argparse.Namespace(model=args.model, test_model=False,
                                checkpoint=assets["pt"],
                                tokenizer_dir=assets["tokenizer_dir"])
        params, dims, tok = common.load_model_and_tokenizer(ns)
        dtype = jnp.float32
    elif args.test_model:
        from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

        tok = get_test_tokenizer()
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=96,
                              n_text_ctx=64, state=16, head=2, layers=2)
        params = wmodel.init_params(jax.random.PRNGKey(0), dims)
        dtype = jnp.float32
    else:
        ns = argparse.Namespace(model=args.model, test_model=False,
                                checkpoint=os.environ.get("WCA_CHECKPOINT"),
                                tokenizer_dir=os.environ.get(
                                    "WCA_TOKENIZER_DIR"))
        params, dims, tok = common.load_model_and_tokenizer(ns)
        dtype = jnp.bfloat16
        params = jax.tree.map(lambda x: x.astype(dtype), params)

    scp = args.scp
    tmp = None
    if scp is None:
        tmp = tempfile.mkdtemp(prefix="wca_calib_")
        scp = make_timit_corpus(tmp, n_utts=args.n_utts, seconds=(2.0, 5.0))
        log(f"synthetic corpus: {args.n_utts} utts under {tmp}")
    ds = DATASETS[args.dataset](scp)

    n_samples = 2 * dims.n_audio_ctx * constants.HOP_LENGTH
    opts = decoding.DecodingOptions(without_timestamps=True,
                                    sample_len=args.decode_len)

    margins = []            # int8-pass min margins, all utterances
    flipped_margins = []    # ... restricted to transcript flips
    n_total = 0
    for batch in batch_iter(ds, args.batch_size):
        # pad the trailing partial batch to the full batch size (repeat the
        # last utterance): every distinct batch size is a fresh jit signature
        # for BOTH decode loops — a trailing batch of 2 would otherwise cost
        # two extra multi-minute remote compiles (the production runner pads
        # for exactly this reason, runner._pad_batch)
        n_live = len(batch)
        if n_live < args.batch_size:
            batch = list(batch) + [batch[-1]] * (args.batch_size - n_live)
        audio = np.stack([np.asarray(pad_or_trim(u.audio, n_samples))
                          for u in batch])
        mel = log_mel_spectrogram(jnp.asarray(audio),
                                  n_mels=dims.n_mels).astype(dtype)
        exact = decoding.decode(params, dims, tok, mel, opts,
                                compute_dtype=dtype)
        kv_frames = None
        if args.mode in ("bucket", "both"):
            # same bucket arithmetic as the production runner
            # (runner._dispatch_transcribe): batch-max true frames rounded up
            # to the bucket multiple, capped at the full window
            from whisper_char_alignment_tpu.parallel import mesh as mesh_lib

            max_fl = max(max(u.duration // constants.AUDIO_SAMPLES_PER_TOKEN,
                             1) for u in batch)
            kv_frames = min(dims.n_audio_ctx,
                            mesh_lib.pad_to_multiple(int(max_fl),
                                                     args.frame_bucket))
        quant = decoding.decode(
            params, dims, tok, mel, opts, compute_dtype=dtype,
            kv_int8=args.mode in ("int8", "both"),
            kv_frames=kv_frames,
            # guard=0.0: track margins, flag nothing
            kv_int8_guard=0.0 if args.mode in ("int8", "both") else None,
            kv_frames_guard=0.0 if args.mode in ("bucket", "both") else None)
        for e, q in zip(exact[:n_live], quant[:n_live]):  # skip pad rows
            n_total += 1
            margins.append(q.min_margin)
            if e.tokens != q.tokens:
                flipped_margins.append(q.min_margin)
        log(f"{n_total} utts: {len(flipped_margins)} flips so far")

    margins = np.asarray(margins, np.float64)
    default = {
        "int8": decoding.DEFAULT_KV_INT8_GUARD_MARGIN,
        "bucket": decoding.DEFAULT_BUCKET_GUARD_MARGIN,
        "both": (decoding.DEFAULT_KV_INT8_GUARD_MARGIN
                 + decoding.DEFAULT_BUCKET_GUARD_MARGIN),
    }[args.mode]
    if flipped_margins:
        bound = args.safety * max(flipped_margins)
        basis = "safety x max flipped-utterance margin"
    else:
        bound = default
        basis = "no flips observed; tested default stands"
    flag_rate = float((margins < bound).mean())
    flag_rate_default = float((margins < default).mean())

    print(json.dumps({
        "metric": f"kv_{args.mode}_guard_calibration",
        "mode": args.mode,
        "source": ("rehearsal-assets" if args.rehearse
                   else "test_model" if args.test_model else args.model),
        "recommended_guard_margin": round(float(bound), 4),
        "basis": basis,
        "n_utts": n_total,
        "flip_rate_unguarded": round(len(flipped_margins) / max(n_total, 1), 4),
        "predicted_flag_rate": round(flag_rate, 4),
        "predicted_flag_rate_at_default": round(flag_rate_default, 4),
        "margin_percentiles": {p: round(float(np.percentile(margins, p)), 4)
                               for p in (1, 5, 25, 50)},
        "deployable_hint": "guard beats exact decode below ~4% flag rate "
                           "(DESIGN.md envelope)",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
