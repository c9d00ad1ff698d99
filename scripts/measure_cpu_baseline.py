#!/usr/bin/env python
"""Measure a torch-CPU reference-equivalent baseline for bench.py's denominator.

The reference repo cannot run in this image (no openai-whisper package), but its
execution model — one utterance at a time, eager PyTorch on CPU, hook-captured
cross-attentions, numpy DTW — can be reproduced faithfully with the HF torch
Whisper implementation (same architecture/math) at Whisper-medium shapes with
random weights (runtime is weight-independent).

Per utterance, mirroring bench.py's workload:
  1. 32 greedy decode steps with KV cache (the transcription pass),
  2. one teacher-forced forward (96 tokens) with all cross-attentions,
  3. width-3 median filter + softmax + top-10 head selection,
  4. numpy DTW over the aggregated (92, 300) matrix.

Prints utts/sec; set WCA_BENCH_BASELINE to this value for a measured
vs_baseline. (Takes minutes: a medium forward on one CPU core is slow — that is
the point.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

torch.set_num_threads(int(os.environ.get("WCA_BASELINE_THREADS", "1")))

from whisper_char_alignment_tpu.ops.dtw import dtw_np  # numpy DTW, like numba's


def main():
    import transformers

    cfg = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=1024, encoder_layers=24,
        encoder_attention_heads=16, decoder_layers=24,
        decoder_attention_heads=16, encoder_ffn_dim=4096, decoder_ffn_dim=4096,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=50256, bos_token_id=50257, eos_token_id=50256,
        decoder_start_token_id=50257)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg)
    model.eval()

    rng = np.random.default_rng(0)
    mel = torch.from_numpy(rng.normal(0, 1, (1, 80, 3000)).astype(np.float32))
    n_utts = int(os.environ.get("WCA_BASELINE_UTTS", "1"))
    decode_len = 32
    t_tokens = 96

    with torch.no_grad():
        t0 = time.time()
        for _ in range(n_utts):
            # 1. encoder once + 32 cached decode steps (transcription pass)
            enc = model.model.encoder(mel).last_hidden_state
            ids = torch.tensor([[cfg.decoder_start_token_id]])
            past = None
            for _ in range(decode_len):
                out = model(encoder_outputs=(enc,), decoder_input_ids=ids[:, -1:],
                            past_key_values=past, use_cache=True)
                past = out.past_key_values
                ids = torch.cat([ids, out.logits[:, -1:].argmax(-1)], dim=1)

            # 2. teacher-forced capture of all cross-attentions
            tokens = torch.from_numpy(
                rng.integers(0, 255, (1, t_tokens)).astype(np.int64))
            out = model(encoder_outputs=(enc,), decoder_input_ids=tokens,
                        output_attentions=True)
            qk = torch.stack(out.cross_attentions)[:, 0]  # (L, H, T, 1500)

            # 3. frame slice + medfilt(3) + softmax + top-10 selection
            w = qk[..., :300]
            pad = 1
            l_, h_, t_, f_ = w.shape
            wp = torch.nn.functional.pad(w.reshape(l_ * h_, t_, f_),
                                         (pad, pad), mode="reflect")
            w = wp.unfold(-1, 3, 1).sort(dim=-1)[0][..., pad]
            w = w.reshape(l_, h_, t_, f_)
            w = w.softmax(dim=-1)
            scores = (w.norm(dim=-2).sum(-1) + w.norm(dim=-1).sum(-1)).flatten()
            top = torch.topk(scores, 10).indices
            sel = w.reshape(-1, t_tokens, 300)[top]
            matrix = (sel / sel.norm(dim=-2, keepdim=True)).mean(0)

            # 4. numpy DTW over the text rows
            dtw_np(-matrix[3:-1].numpy())
        wall = time.time() - t0

    tput = n_utts / wall
    print(f"torch-CPU reference-equivalent: {n_utts} utts in {wall:.1f}s "
          f"-> {tput:.4f} utts/sec")
    print(f"export WCA_BENCH_BASELINE={tput:.4f}")


if __name__ == "__main__":
    main()
