"""The real asset path: npz checkpoint + tiktoken vocab file through the CLI
(no --test_model) — what a user with downloaded assets actually runs."""

import base64
import os

import numpy as np
import pytest

import jax


def make_assets(tmp_path):
    from whisper_char_alignment_tpu.config import tiny_test_dims
    from whisper_char_alignment_tpu.models import convert, whisper as wmodel
    from whisper_char_alignment_tpu.text.bpe import toy_ranks
    from whisper_char_alignment_tpu.text.tokenizer import WhisperTokenizer
    from whisper_char_alignment_tpu.text.bpe import ByteBPE

    ranks = toy_ranks()
    tok = WhisperTokenizer(ByteBPE(ranks))
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = jax.tree.map(np.asarray,
                          wmodel.init_params(jax.random.PRNGKey(0), dims))
    ckpt = str(tmp_path / "model.npz")
    convert.save_npz(ckpt, params, dims)
    tok_dir = str(tmp_path)
    with open(os.path.join(tok_dir, "multilingual.tiktoken"), "wb") as f:
        for k, v in ranks.items():
            f.write(base64.b64encode(k) + b" " + str(v).encode() + b"\n")
    return ckpt, tok_dir


@pytest.mark.slow
def test_infer_cli_with_npz_and_tiktoken_assets(tmp_path):
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.cli import infer_ali

    ckpt, tok_dir = make_assets(tmp_path)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    scp = make_timit_fixture(str(corpus), n_utts=2, seconds=0.3)
    # NOTE: the tiny model's window is 0.64 s; utterances fit
    out_dir = str(tmp_path / "results")
    results = infer_ali.main([
        "--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
        "--model", "medium", "--aggr", "topk", "--topk", "2",
        "--aligned_unit_type", "char", "--medfilt_width", "3",
        "--batch_size", "2", "--checkpoint", ckpt, "--tokenizer_dir", tok_dir])
    assert set(results) == {"precision", "recall", "f1", "r_value"}
    assert any(f.endswith(".json") for f in os.listdir(out_dir))


def test_api_load_model_from_env(tmp_path, monkeypatch):
    from whisper_char_alignment_tpu import api

    ckpt, tok_dir = make_assets(tmp_path)
    monkeypatch.setenv("WCA_CHECKPOINT", ckpt)
    monkeypatch.setenv("WCA_TOKENIZER_DIR", tok_dir)
    model = api.load_model("medium")
    assert model.dims.n_text_layer == 2
    assert model.tokenizer.language == "en"
    sr = 16000
    audio = (0.2 * np.sin(2 * np.pi * 330 * np.arange(sr // 2) / sr)
             ).astype(np.float32)
    res = api.align(model, audio, topk=2)
    assert len(res.start_times) == len(res.end_times)