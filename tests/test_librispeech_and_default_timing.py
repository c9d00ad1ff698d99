"""LibriSpeech dataset parsing (trans.txt discovery + Kaldi alignment file) and
the --default_whisper_timing CLI path end-to-end."""

import os

import numpy as np
import pytest

from whisper_char_alignment_tpu.audio import wav


def make_librispeech_fixture(root):
    """LibriSpeech-style layout: root/split/spk/chap/{fid.wav, spk-chap.trans.txt}
    plus ls_alignment_{split}.txt in cwd-relative form."""
    sr = 16000
    split = "test-clean"
    rng = np.random.default_rng(0)
    scp_lines = []
    ali_lines = []
    for spk, chap in [("19", "198"), ("26", "495")]:
        d = os.path.join(root, split, spk, chap)
        os.makedirs(d, exist_ok=True)
        trans_lines = []
        for utt in range(2):
            fid = f"{spk}-{chap}-{utt:04d}"
            n = sr // 2
            audio = rng.normal(0, 0.05, n).astype(np.float32)
            path = os.path.join(d, f"{fid}.wav")
            wav.save(path, audio, sr)
            words = ["alpha", "beta", "gamma"]
            trans_lines.append(f"{fid} {' '.join(w.upper() for w in words)}")
            ali = [("", 0.0, 0.05)]  # leading silence entry must be dropped
            t = 0.05
            for w in words:
                ali.append((w, t, t + 0.1))
                t += 0.1
            ali_lines.append(f"{fid} {ali!r}")
            scp_lines.append(f"{fid} {path}")
        with open(os.path.join(d, f"{spk}-{chap}.trans.txt"), "w") as f:
            f.write("\n".join(trans_lines) + "\n")
    scp = os.path.join(root, "ls.scp")
    with open(scp, "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    ali_file = os.path.join(root, f"ls_alignment_{split}.txt")
    with open(ali_file, "w") as f:
        f.write("\n".join(ali_lines) + "\n")
    return scp, ali_file


def test_librispeech_parsing(tmp_path):
    from whisper_char_alignment_tpu.data.dataset import LibriSpeech

    scp, ali_file = make_librispeech_fixture(str(tmp_path))
    ds = LibriSpeech(scp, alignment_file=ali_file)
    assert len(ds) == 4
    u = ds[0]
    assert u.fid == "19-198-0000"
    # silence entries dropped; words/starts/ends from the alignment literal
    assert u.text == "alpha beta gamma"
    assert len(u.starts) == 3
    np.testing.assert_allclose(u.starts[0], 0.05)
    np.testing.assert_allclose(u.ends[-1], 0.35)
    assert u.audio.size == 8000


@pytest.mark.slow
def test_infer_cli_librispeech_alignment_file_flag(tmp_path, monkeypatch):
    """--alignment_file feeds an EXPLICIT Kaldi alignment path through the
    CLI (asset-gate #4's invocation shape) instead of the layout-discovered
    default."""
    from whisper_char_alignment_tpu.cli import infer_ali

    scp, ali_file = make_librispeech_fixture(str(tmp_path))
    moved = str(tmp_path / "moved_alignments.txt")
    os.replace(ali_file, moved)
    monkeypatch.chdir(tmp_path)
    rc = infer_ali.main([
        "--dataset", "LibriSpeech", "--scp", scp, "--alignment_file", moved,
        "--test_model", "--batch_size", "2", "--aligned_unit_type", "char",
        "--output_dir", str(tmp_path / "out")])
    assert isinstance(rc, dict) and "f1" in rc


def test_librispeech_rejects_malicious_alignment(tmp_path):
    """ast.literal_eval must refuse code (the reference used eval())."""
    from whisper_char_alignment_tpu.data.dataset import LibriSpeech

    scp, ali_file = make_librispeech_fixture(str(tmp_path))
    with open(ali_file, "w") as f:
        f.write("19-198-0000 __import__('os').system('true')\n")
    with pytest.raises(ValueError):
        LibriSpeech(scp, alignment_file=ali_file)


@pytest.mark.slow
def test_default_whisper_timing_cli(tmp_path):
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.cli import infer_ali

    scp = make_timit_fixture(str(tmp_path), n_utts=2)
    out_dir = str(tmp_path / "results")
    results = infer_ali.main([
        "--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
        "--aligned_unit_type", "subword", "--medfilt_width", "3",
        "--batch_size", "2", "--test_model", "--default_whisper_timing"])
    assert set(results) == {"precision", "recall", "f1", "r_value"}


@pytest.mark.slow
def test_default_timing_word_probabilities(tmp_path):
    """The baseline path reports per-word probabilities (timing.py:181-184)."""
    import jax
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp = make_timit_fixture(str(tmp_path), n_utts=2, seconds=0.4)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=24,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    cfg = AlignConfig(aligned_unit_type="subword", batch_size=2,
                      default_whisper_timing=True, medfilt_width=3)

    pipe = AlignmentPipeline(params, dims, tok, cfg)
    pipe.transcribe_override = lambda utts: ["hello world" for _ in utts]
    ds = TIMIT(scp)
    res = pipe.align_batch([ds[0], ds[1]])
    for r in res:
        assert r.word_probabilities is not None
        assert len(r.word_probabilities) == len(r.words) - 1
        assert all(0.0 <= p <= 1.0 for p in r.word_probabilities)
