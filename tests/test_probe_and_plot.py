"""probe_oracle CLI end-to-end (tiny model, synthetic corpus) and plot_attn."""

import json
import os

import numpy as np
import pytest

from tests.test_pipeline_e2e import make_timit_fixture


def make_long_corpus(root, n_utts=2):
    """Utterances with >= 18 ground-truth words (probe_oracle's filter)."""
    from whisper_char_alignment_tpu.audio import wav
    os.makedirs(root, exist_ok=True)
    sr = 16000
    rng = np.random.default_rng(1)
    scp_lines = []
    words = ("she had your dark suit in greasy wash water all year and then "
             "some more words to pass the filter easily").split()
    for i in range(n_utts):
        n = sr  # 1 s
        audio = rng.normal(0, 0.05, n).astype(np.float32)
        path = os.path.join(root, f"long{i}.wav")
        wav.save(path, audio, sr)
        bounds = np.linspace(0, n, len(words) + 1).astype(int)
        with open(os.path.join(root, f"long{i}.wrd"), "w") as f:
            for w in range(len(words)):
                f.write(f"{bounds[w]} {bounds[w + 1]} {words[w]}\n")
        scp_lines.append(f"dr1-long{i} {path}")
    scp = os.path.join(root, "long.scp")
    with open(scp, "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    return scp


def test_probe_oracle_cli(tmp_path):
    scp = make_long_corpus(str(tmp_path))
    out_dir = str(tmp_path / "results")
    from whisper_char_alignment_tpu.cli import probe_oracle
    results = probe_oracle.main([
        "--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
        "--aligned_unit_type", "char", "--strict", "--tolerance", "0.05",
        "--medfilt_width", "3", "--hit_within", "2", "--test_model",
        "--batch_size", "2"])
    assert set(results) >= {"precision", "recall", "f1", "r_value", "hit_rate"}
    assert 0.0 <= results["hit_rate"] <= 1.0
    assert any(f.endswith(".json") for f in os.listdir(out_dir))


def _make_same_bucket_corpus(root, texts):
    """WAV + .wrd fixtures whose GT texts differ in length but share one
    32-token char bucket."""
    from whisper_char_alignment_tpu.audio import wav
    os.makedirs(root, exist_ok=True)
    sr = 16000
    rng = np.random.default_rng(2)
    scp_lines = []
    for i, text in enumerate(texts):
        words = text.split()
        n = sr // 2  # 0.5 s
        path = os.path.join(root, f"u{i}.wav")
        wav.save(path, rng.normal(0, 0.05, n).astype(np.float32), sr)
        bounds = np.linspace(0, n, len(words) + 1).astype(int)
        with open(os.path.join(root, f"u{i}.wrd"), "w") as f:
            for w in range(len(words)):
                f.write(f"{bounds[w]} {bounds[w + 1]} {words[w]}\n")
        scp_lines.append(f"dr1-u{i} {path}")
    scp = os.path.join(root, "bucket.scp")
    with open(scp, "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    return scp


@pytest.mark.slow
def test_probe_capture_signatures_bounded(tmp_path, monkeypatch):
    """Distinct transcript lengths inside one 32-token bucket must share ONE
    jit signature for the capture and for the per-head DTW launch — remote
    compiles cost minutes per signature, so the probe must never recompile
    per utterance (round-2 finding)."""
    import jax
    from whisper_char_alignment_tpu.align import timing
    from whisper_char_alignment_tpu.cli import common, probe_oracle
    from whisper_char_alignment_tpu.config import tiny_test_dims
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    base = ("she had your dark suit in greasy wash water all year and then "
            "some more words to pass the filter")  # 19 words, 99 chars
    texts = [base, base + " now", base + " again", base + " once more"]
    scp = _make_same_bucket_corpus(str(tmp_path), texts)

    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=96, n_text_ctx=160,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    monkeypatch.setattr(common, "load_model_and_tokenizer",
                        lambda args: (params, dims, tok))

    att_before = timing._get_attentions_jit._cache_size()
    dtw_before = probe_oracle._per_head_jump_frames_jit._cache_size()
    results = probe_oracle.main([
        "--dataset", "TIMIT", "--scp", scp,
        "--output_dir", str(tmp_path / "results"),
        "--aligned_unit_type", "char", "--strict", "--tolerance", "0.05",
        "--medfilt_width", "3", "--hit_within", "2", "--batch_size", "2",
        "--use_gt_transcript", "--test_model"])
    assert 0.0 <= results["hit_rate"] <= 1.0
    # 2 batches, 4 distinct transcript lengths -> ONE signature each
    assert timing._get_attentions_jit._cache_size() - att_before == 1
    assert probe_oracle._per_head_jump_frames_jit._cache_size() - dtw_before == 1


@pytest.mark.slow
def test_per_head_dtw_chunking_equals_single_launch(monkeypatch):
    """WCA_PROBE_LAYER_CHUNK (memory chunking of the per-head DTW sweep) is a
    launch-shape knob only: chunked results must equal the single launch,
    including a remainder group (3 layers, chunk 2)."""
    import jax
    import jax.numpy as jnp
    from whisper_char_alignment_tpu.cli import probe_oracle

    rng = np.random.default_rng(0)
    l, b, h, t, f = 3, 2, 2, 10, 24
    attn = jnp.asarray(rng.random((l, b, h, t, f)), jnp.float32)
    tl = jnp.asarray([t, t - 2], jnp.int32)
    fl = jnp.asarray([f, f - 5], jnp.int32)
    monkeypatch.delenv("WCA_PROBE_LAYER_CHUNK", raising=False)
    single = np.asarray(probe_oracle._per_head_jump_frames(attn, tl, fl, 3))
    monkeypatch.setenv("WCA_PROBE_LAYER_CHUNK", "2")
    chunked = np.asarray(probe_oracle._per_head_jump_frames(attn, tl, fl, 3))
    np.testing.assert_array_equal(single, chunked)


def test_per_head_dtw_frame_slice_equals_full_width(monkeypatch):
    """CLAUDE.md invariant: fixed-shape fast paths must stay PROVABLY equal to
    physical slicing, enforced bit-exactly. The probe's frame_slice fast path
    (slice the frame axis to the batch's bucketed max frame_len before
    column-normalize + DTW) relied on a prose-only argument; this test pins
    it: with frames >= frame_len zeroed — the capture output's guarantee
    (qk_to_attention masks them to exactly 0) — the sliced sweep's jump
    frames equal the full-width sweep's for every (utterance, head)."""
    import jax.numpy as jnp
    from whisper_char_alignment_tpu.cli import probe_oracle

    rng = np.random.default_rng(3)
    l, b, h, t, f = 2, 3, 2, 10, 48
    attn = rng.random((l, b, h, t, f)).astype(np.float32)
    fl = np.array([17, 9, 23], np.int32)
    attn *= (np.arange(f)[None, None, None, None, :]
             < fl[None, :, None, None, None])
    tl = np.array([t, t - 2, t - 1], np.int32)
    attn, tl, fl = jnp.asarray(attn), jnp.asarray(tl), jnp.asarray(fl)
    monkeypatch.delenv("WCA_PROBE_LAYER_CHUNK", raising=False)
    full = np.asarray(
        probe_oracle._per_head_jump_frames(attn, tl, fl, 3, frame_slice=0))
    sliced = np.asarray(
        probe_oracle._per_head_jump_frames(attn, tl, fl, 3, frame_slice=24))
    np.testing.assert_array_equal(full, sliced)


def test_plot_attn(tmp_path):
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer
    from whisper_char_alignment_tpu.text.retokenize import encode
    from whisper_char_alignment_tpu.viz.plot import plot_attn

    tok = get_test_tokenizer()
    text_tokens = encode("hi there", tok, "char")
    n = len(text_tokens) + 1
    rng = np.random.default_rng(0)
    weights = rng.random((n, 50)).astype(np.float32)
    out = plot_attn(weights, text_tokens, tok, gt_alignment=[0.3, 0.9],
                    pred_alignment=[0.32, 0.88], fid="demo",
                    aligned_unit_type="char", path=str(tmp_path), dpi=72)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


@pytest.mark.slow
def test_infer_cli_plot_flag(tmp_path, monkeypatch):
    """Full plot plumbing through the CLI; the random test model transcribes to
    empty text, so pin the transcription stage to a fixed string."""
    scp = make_timit_fixture(str(tmp_path), n_utts=2)
    out_dir = str(tmp_path / "results")
    from whisper_char_alignment_tpu.runner import AlignmentPipeline

    orig_init = AlignmentPipeline.__init__

    def patched_init(self, *a, **k):
        orig_init(self, *a, **k)
        self.transcribe_override = lambda utts: ["hello world" for _ in utts]

    monkeypatch.setattr(AlignmentPipeline, "__init__", patched_init)
    from whisper_char_alignment_tpu.cli import infer_ali
    infer_ali.main([
        "--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
        "--aggr", "topk", "--topk", "2", "--aligned_unit_type", "char",
        "--medfilt_width", "3", "--batch_size", "2", "--test_model", "--plot"])
    img_dir = os.path.join(out_dir, "imgs", "TIMIT")
    assert os.path.isdir(img_dir) and len(os.listdir(img_dir)) == 2
