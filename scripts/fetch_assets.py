#!/usr/bin/env python
"""Fetch Whisper weights + tokenizer assets (requires network; not available in
air-gapped environments — there, copy the files in by hand and convert).

Weights: the published OpenAI checkpoints (https://openaipublic.azureedge.net/
main/whisper/models/...) or the HF mirrors (openai/whisper-<size>). Tokenizer:
``multilingual.tiktoken`` / ``gpt2.tiktoken`` from the openai-whisper package
assets, or ``vocab.json`` from the HF tokenizer repos.

Usage:
    python scripts/fetch_assets.py --model medium --out assets/
    # then:
    export WCA_CHECKPOINT=assets/medium.npz
    export WCA_TOKENIZER_DIR=assets/

Conversion without this script (e.g. files copied in by hand):
    python -c "from whisper_char_alignment_tpu.models import convert; \
        p, d = convert.load_openai_checkpoint('medium.pt'); \
        convert.save_npz('medium.npz', p, d)"
"""

import argparse
import os
import sys

# Published checkpoint URLs (openai-whisper _MODELS table format).
OPENAI_BASE = "https://openaipublic.azureedge.net/main/whisper/models"
HF_BASE = "https://huggingface.co/openai"
TOKENIZER_FILES = {
    "multilingual": ("https://raw.githubusercontent.com/openai/whisper/main/"
                     "whisper/assets/multilingual.tiktoken"),
    "gpt2": ("https://raw.githubusercontent.com/openai/whisper/main/"
             "whisper/assets/gpt2.tiktoken"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="medium")
    ap.add_argument("--out", default="assets")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    def fetch(url, path):
        # download to a temp name and os.replace: urlretrieve writes the
        # final path directly, so an interrupted run leaves a TRUNCATED file
        # that the exists-check below silently reuses (a tiktoken file cut at
        # a line boundary loads as a smaller vocab with no error)
        import urllib.request

        tmp = path + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)

    try:
        tok_name = "gpt2" if args.model.endswith(".en") else "multilingual"
        tok_path = os.path.join(args.out, f"{tok_name}.tiktoken")
        if not os.path.exists(tok_path):
            print(f"fetching tokenizer -> {tok_path}")
            fetch(TOKENIZER_FILES[tok_name], tok_path)

        # HF safetensors are the lightest-weight source; fall back to manual.
        # aliases: MODEL_DIMS['large'] is the large-v3 config (and
        # openai/whisper-turbo does not exist on HF), so the repo name must
        # point at the checkpoint those dims describe — fetching
        # openai/whisper-large (v1: 80 mels, 51865 vocab) against v3 dims
        # shape-crashes the convert (round-4 review finding)
        hf_model = {"large": "large-v3",
                    "large-v1": "large",  # v1 lives at openai/whisper-large
                    "turbo": "large-v3-turbo"}.get(args.model, args.model)
        url = f"{HF_BASE}/whisper-{hf_model}/resolve/main/model.safetensors"
        st_path = os.path.join(args.out, f"{args.model}.safetensors")
        if not os.path.exists(st_path):
            print(f"fetching weights -> {st_path}")
            fetch(url, st_path)
    except Exception as e:
        print(f"download failed ({e}); in an air-gapped environment copy the "
              f"files in manually — see the module docstring", file=sys.stderr)
        return 1

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from whisper_char_alignment_tpu.config import MODEL_DIMS
    from whisper_char_alignment_tpu.models import convert

    dims = MODEL_DIMS[args.model]
    params = convert.load_safetensors(st_path, dims)
    out = os.path.join(args.out, f"{args.model}.npz")
    convert.save_npz(out, params, dims)
    print(f"converted -> {out}\nexport WCA_CHECKPOINT={out}\n"
          f"export WCA_TOKENIZER_DIR={args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
