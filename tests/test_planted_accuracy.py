"""Accuracy-shaped offline gate: a planted-attention model whose true word
boundaries are known BY CONSTRUCTION, driven through the full infer_ali CLI,
must score strict F1 = 1.0 at 50 ms.

No real weights exist in this image, so every other end-to-end test can only
check mechanism (plumbing, shapes, metric accumulation) — metric VALUES are
meaningless under random weights. This test closes that gap: the capture stage
is replaced by a deterministic banded cross-attention (text token i hot on
exactly frames [i*W, (i+1)*W)), which pins the DTW path, hence the word
boundaries, hence the ground truth to plant in the .wrd files. If aggregation,
DTW, boundary bookkeeping, eval matching, or the CLI metric accumulation drift
by even one band, F1 drops below 1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu import constants
from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.audio import wav
from whisper_char_alignment_tpu.config import tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.text import retokenize
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

W = 2  # frames per text token in the planted bands (40 ms per char token)


def _make_planted_corpus(root, texts, tok, sot_len):
    """For each text: char-tokenize, derive the word boundaries the banded
    attention will produce (end of word j = wb[j+1] * W frames), and write a
    WAV + .wrd pair pinning exactly those times as ground truth."""
    os.makedirs(root, exist_ok=True)
    scp_lines = []
    metas = []
    for i, text in enumerate(texts):
        text_tokens = retokenize.encode(text, tok, "char")
        words, _, wb = timing.words_and_boundaries(text_tokens, tok, "char")
        assert wb is not None
        n = len(text_tokens)
        dur_samples = n * W * constants.AUDIO_SAMPLES_PER_TOKEN
        audio = np.zeros((dur_samples,), np.float32)
        path = os.path.join(root, f"p{i}.wav")
        wav.save(path, audio, constants.SAMPLE_RATE)
        # GT bounds in samples: word j spans frames [wb[j]*W, wb[j+1]*W)
        with open(os.path.join(root, f"p{i}.wrd"), "w") as f:
            for j, word in enumerate(words[:-1]):  # last group is eot
                s = wb[j] * W * constants.AUDIO_SAMPLES_PER_TOKEN
                e = wb[j + 1] * W * constants.AUDIO_SAMPLES_PER_TOKEN
                f.write(f"{s} {e} {word.strip()}\n")
        scp_lines.append(f"dr1-p{i} {path}")
        metas.append((text, n))
    scp = os.path.join(root, "planted.scp")
    with open(scp, "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    return scp, metas


def _fake_get_attentions(sot_len):
    """A capture stand-in producing the banded maps (traceable: pure jnp on
    the jitted _align_step's inputs; params/mel/xa ignored)."""

    def fake(params, dims, mel, tokens, token_len, frame_len, **kw):
        b, t = tokens.shape
        f = dims.n_audio_ctx
        row = jnp.arange(t)[None, :, None] - sot_len  # (1, T, 1)
        col = jnp.arange(f)[None, None, :]
        band = (col >= row * W) & (col < (row + 1) * W)
        token_ok = ((jnp.arange(t)[None, :, None]
                     < (token_len[:, None, None] - 1)) & (row >= 0))
        frame_ok = col < frame_len[:, None, None]
        m = (band & token_ok & frame_ok).astype(jnp.float32)  # (B, T, F)
        attn = jnp.broadcast_to(
            m[None, :, None], (dims.n_text_layer, b, dims.n_text_head, t, f))
        return attn, None

    return fake


@pytest.mark.parametrize("aggr,topk", [
    pytest.param("topk", 2, marks=pytest.mark.slow), ("mean", -1)])
def test_planted_attention_scores_perfect_f1(tmp_path, monkeypatch, aggr,
                                             topk):
    from whisper_char_alignment_tpu.cli import common, infer_ali

    tok = get_test_tokenizer()
    sot_len = len(tok.sot_sequence)
    texts = ["she had your dark suit",
             "greasy wash water all year",
             "artificial intelligence is for real"]
    scp, metas = _make_planted_corpus(str(tmp_path), texts, tok, sot_len)
    # distinctive dims so the jitted _align_step traces fresh with the
    # planted capture (jit caches key on shapes/statics, not function bodies)
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=101,
                          n_text_ctx=96, state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    monkeypatch.setattr(common, "load_model_and_tokenizer",
                        lambda args: (params, dims, tok))
    monkeypatch.setattr(timing, "get_attentions", _fake_get_attentions(sot_len))

    out_dir = str(tmp_path / "results")
    results = infer_ali.main([
        "--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
        "--aggr", aggr, "--topk", str(topk), "--aligned_unit_type", "char",
        "--strict", "--tolerance", "0.05", "--medfilt_width", "3",
        "--batch_size", "3", "--use_gt_transcript", "--decode_sample_len",
        "2", "--test_model"])
    # EPS in get_seg_metrics keeps exact 1.0 out of reach by ~1e-7
    assert results["f1"] > 0.9999, results
    assert results["precision"] > 0.9999 and results["recall"] > 0.9999


@pytest.mark.slow
def test_planted_oracle_head_through_probe_cli(tmp_path, monkeypatch):
    """probe_oracle accuracy gate: plant ONE banded head (layer 1, head 1)
    among all-zero heads. The probe must pick it as the oracle head (best F1
    = 1.0 on the planted boundaries) and, since zero maps score zero
    saliency, rank it top — hit_rate 1.0 over the full corpus. hit_within=2:
    the reference's hit check is a STRICT '>' against the hit_within-th
    score, so the top head itself never beats its own score at
    hit_within=1 (kept reference-exact)."""
    from whisper_char_alignment_tpu.cli import common, probe_oracle

    tok = get_test_tokenizer()
    sot_len = len(tok.sot_sequence)
    base = ("she had your dark suit in greasy wash water all year and then "
            "some more words to pass the filter")  # 19 words
    texts = [base, base + " now", base + " again"]
    scp, _ = _make_planted_corpus(str(tmp_path), texts, tok, sot_len)

    star = (1, 1)

    def fake(params, dims, mel, tokens, token_len, frame_len, **kw):
        b, t = tokens.shape
        f = dims.n_audio_ctx
        row = jnp.arange(t)[None, :, None] - sot_len
        col = jnp.arange(f)[None, None, :]
        band = (col >= row * W) & (col < (row + 1) * W)
        token_ok = ((jnp.arange(t)[None, :, None]
                     < (token_len[:, None, None] - 1)) & (row >= 0))
        frame_ok = col < frame_len[:, None, None]
        m = (band & token_ok & frame_ok).astype(jnp.float32)  # (B, T, F)
        attn = jnp.zeros((dims.n_text_layer, b, dims.n_text_head, t, f),
                         jnp.float32)
        return attn.at[star[0], :, star[1]].set(m), None

    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=256,
                          n_text_ctx=160, state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    monkeypatch.setattr(common, "load_model_and_tokenizer",
                        lambda args: (params, dims, tok))
    monkeypatch.setattr(timing, "get_attentions", fake)

    results = probe_oracle.main([
        "--dataset", "TIMIT", "--scp", scp,
        "--output_dir", str(tmp_path / "results"),
        "--aligned_unit_type", "char", "--strict", "--tolerance", "0.05",
        "--medfilt_width", "3", "--hit_within", "2", "--batch_size", "3",
        "--use_gt_transcript", "--decode_sample_len", "2", "--test_model"])
    assert results["f1"] > 0.9999, results
    assert results["hit_rate"] == 1.0, results


def test_probe_oracle_topk_cut_excludes_low_saliency_heads(tmp_path,
                                                           monkeypatch):
    """The reference's oracle sweep only searches the top-360 saliency heads
    (filter_attention(w, topk=360), probe_oracle.py:83): a head outside the
    cut is NOT an oracle candidate even when it would score the best F1.
    Plant the perfect banded head with the LOWEST saliency (the other three
    heads are dense all-ones maps with far larger row/col norms): with the
    cut at all 4 heads the probe finds it (F1 = 1); with the cut at 3 the
    banded head is excluded and F1 collapses."""
    from whisper_char_alignment_tpu.cli import common, probe_oracle

    tok = get_test_tokenizer()
    sot_len = len(tok.sot_sequence)
    base = ("she had your dark suit in greasy wash water all year and then "
            "some more words to pass the filter")  # 19 words
    scp, _ = _make_planted_corpus(str(tmp_path), [base], tok, sot_len)

    star = (0, 0)

    def fake(params, dims, mel, tokens, token_len, frame_len, **kw):
        b, t = tokens.shape
        f = dims.n_audio_ctx
        row = jnp.arange(t)[None, :, None] - sot_len
        col = jnp.arange(f)[None, None, :]
        band = (col >= row * W) & (col < (row + 1) * W)
        token_ok = ((jnp.arange(t)[None, :, None]
                     < (token_len[:, None, None] - 1)) & (row >= 0))
        frame_ok = col < frame_len[:, None, None]
        banded = (band & token_ok & frame_ok).astype(jnp.float32)  # (B, T, F)
        ones = (token_ok & frame_ok).astype(jnp.float32)
        attn = jnp.broadcast_to(
            ones[None, :, None], (dims.n_text_layer, b, dims.n_text_head, t, f))
        return attn.at[star[0], :, star[1]].set(banded), None

    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=256,
                          n_text_ctx=160, state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    monkeypatch.setattr(common, "load_model_and_tokenizer",
                        lambda args: (params, dims, tok))
    monkeypatch.setattr(timing, "get_attentions", fake)
    argv = ["--dataset", "TIMIT", "--scp", scp,
            "--output_dir", str(tmp_path / "results"),
            "--aligned_unit_type", "char", "--strict", "--tolerance", "0.05",
            "--medfilt_width", "3", "--hit_within", "2", "--batch_size", "1",
            "--use_gt_transcript", "--decode_sample_len", "2", "--test_model"]

    monkeypatch.setattr(probe_oracle, "ORACLE_TOPK", 4)
    all_heads = probe_oracle.main(argv)
    assert all_heads["f1"] > 0.9999, all_heads
    # the oracle head is the lowest-saliency one — the hit test must miss
    assert all_heads["hit_rate"] == 0.0, all_heads

    monkeypatch.setattr(probe_oracle, "ORACLE_TOPK", 3)
    cut = probe_oracle.main(argv)
    assert cut["f1"] < 0.6, cut


def test_planted_attention_detects_drift(tmp_path, monkeypatch):
    """The gate actually bites: shift the ground truth by 3 bands (120 ms >
    the 50 ms tolerance) and F1 must drop well below 1."""
    from whisper_char_alignment_tpu.cli import common, infer_ali

    tok = get_test_tokenizer()
    sot_len = len(tok.sot_sequence)
    scp, _ = _make_planted_corpus(str(tmp_path), ["she had your dark suit"],
                                  tok, sot_len)
    # corrupt the GT: shift every boundary by 3*W frames
    wrd = os.path.join(str(tmp_path), "p0.wrd")
    rows = [l.split() for l in open(wrd).read().splitlines()]
    shift = 3 * W * constants.AUDIO_SAMPLES_PER_TOKEN
    with open(wrd, "w") as f:
        for s, e, word in rows:
            f.write(f"{int(s) + shift} {int(e) + shift} {word}\n")

    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=101,
                          n_text_ctx=96, state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    monkeypatch.setattr(common, "load_model_and_tokenizer",
                        lambda args: (params, dims, tok))
    monkeypatch.setattr(timing, "get_attentions", _fake_get_attentions(sot_len))
    results = infer_ali.main([
        "--dataset", "TIMIT", "--scp", scp,
        "--output_dir", str(tmp_path / "results"),
        "--aggr", "topk", "--topk", "2", "--aligned_unit_type", "char",
        "--strict", "--tolerance", "0.05", "--medfilt_width", "3",
        "--batch_size", "3", "--use_gt_transcript", "--decode_sample_len",
        "2", "--test_model"])
    assert results["f1"] < 0.6, results
