"""End-to-end pipeline test: synthetic TIMIT-style corpus -> infer_ali CLI with a
random tiny model -> results JSON + predictions pkl -> eval_ali CLI re-scoring.

No real weights exist offline, so metric VALUES are meaningless; what this locks
down is the full plumbing: scp/wrd parsing, WAV decode, batched mel/decode/capture/
DTW, word bookkeeping, eval accumulation, provenance dumping.
"""

import json
import os

import numpy as np
import pytest

from whisper_char_alignment_tpu.audio import wav
from whisper_char_alignment_tpu.data.dataset import TIMIT, batch_iter

pytestmark = pytest.mark.slow  # heavy integration: excluded from the fast tier


def make_timit_fixture(root, n_utts=5, seconds=1.0):
    """Thin wrapper over the shared generator (data/synthetic.py), which is also
    what bench.py's corpus mode uses."""
    from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus

    return make_timit_corpus(root, n_utts=n_utts, seconds=seconds,
                             words_per_utt=(3, 5), seed=0)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("timit"))
    return make_timit_fixture(root), root


def test_timit_dataset_parsing(corpus):
    scp, root = corpus
    ds = TIMIT(scp)
    assert len(ds) == 5
    u = ds[0]
    assert u.fid == "dr1-utt0"
    assert u.audio.dtype == np.float32 and u.audio.size == 16000
    assert len(u.starts) == len(u.ends) == len(u.text.split()) >= 3
    assert u.ends[-1] == pytest.approx(1.0)
    batches = list(batch_iter(ds, 2))
    assert [len(b) for b in batches] == [2, 2, 1]


@pytest.fixture(scope="module")
def infer_run(corpus, tmp_path_factory):
    scp, root = corpus
    out_dir = str(tmp_path_factory.mktemp("results"))
    from whisper_char_alignment_tpu.cli import infer_ali
    argv = ["--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
            "--aggr", "topk", "--topk", "3", "--aligned_unit_type", "char",
            "--strict", "--tolerance", "0.05", "--medfilt_width", "3",
            "--batch_size", "4", "--test_model", "--save_prediction",
            "--data_parallel", "0"]
    results = infer_ali.main(argv)
    return results, out_dir


def test_infer_cli_end_to_end(infer_run):
    results, out_dir = infer_run
    assert set(results) == {"precision", "recall", "f1", "r_value"}
    files = os.listdir(out_dir)
    jsons = [f for f in files if f.endswith(".json")]
    pkls = [f for f in files if f.endswith(".pkl")]
    assert len(jsons) == 1 and len(pkls) == 1
    with open(os.path.join(out_dir, jsons[0])) as f:
        dumped = json.load(f)
    # provenance: config union metrics (reference infer_ali.py:142)
    assert dumped["aggr"] == "topk" and "f1" in dumped


def test_predictions_pkl_schema_and_eval_cli(infer_run, capsys):
    results, out_dir = infer_run
    import joblib
    pkl = [f for f in os.listdir(out_dir) if f.endswith(".pkl")][0]
    preds = joblib.load(os.path.join(out_dir, pkl))
    assert len(preds) > 0
    row = preds[0]
    assert set(row) >= {"starts", "ends", "texts", "starts_hat", "ends_hat",
                        "predwords", "fids"}
    assert len(row["starts_hat"]) == len(row["ends_hat"])

    from whisper_char_alignment_tpu.cli import eval_ali
    out = eval_ali.main(["--pred", os.path.join(out_dir, pkl),
                         "--tolerance", "0.5"])
    assert set(out) == {"precision", "recall", "f1", "r_value"}


def test_alignment_outputs_are_coherent(corpus):
    """Directly drive the pipeline: boundary arrays must be monotone, within the
    audio duration, and sized len(words)-1 (eot group has no interval)."""
    import jax
    import jax.numpy as jnp
    from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp, root = corpus
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=64, n_text_ctx=48,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(1), dims)
    cfg = AlignConfig.recommended(topk=3, batch_size=4)
    pipe = AlignmentPipeline(params, dims, tok, cfg)
    ds = TIMIT(scp)
    # trim audio to the tiny model's 1.28 s window so nothing is skipped
    utts = []
    for i in range(4):
        u = ds[i]
        u.audio = u.audio[:2 * 64 * 160]
        u.duration = u.audio.size
        utts.append(u)
    res = pipe.align_batch(utts)
    assert len(res) == 4
    for r in res:
        if not r.words:
            continue
        assert len(r.start_times) == len(r.end_times) == len(r.words) - 1
        assert (np.diff(r.start_times) >= 0).all()
        assert (r.end_times >= r.start_times).all()
        assert r.end_times.max() <= 64 / 50 + 1e-6  # within the audio window


def test_sort_by_duration_same_results_different_order(tmp_path):
    """--sort_by_duration batches length-sorted utterances: per-fid boundaries
    must be identical to the unsorted run; only the yield order changes."""
    import jax

    from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
    from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp = make_timit_corpus(str(tmp_path), n_utts=6, seconds=(0.3, 1.6),
                            words_per_utt=(3, 5), seed=3)
    ds = TIMIT(scp)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=96, n_text_ctx=64,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(2), dims)

    def run(sort):
        cfg = AlignConfig.recommended(topk=2, batch_size=2,
                                      use_gt_transcript=True,
                                      sort_by_duration=sort)
        pipe = AlignmentPipeline(params, dims, tok, cfg)
        return list(pipe.run_dataset(ds, progress=False))

    plain = {r.fid: r for r in run(False)}
    ordered = run(True)  # file-size order == duration order for PCM16
    fids_sorted = [r.fid for r in ordered]
    assert fids_sorted != list(plain)  # order actually changed
    assert set(fids_sorted) == set(plain)
    for r in ordered:
        np.testing.assert_array_equal(r.start_times, plain[r.fid].start_times)
        np.testing.assert_array_equal(r.end_times, plain[r.fid].end_times)
        assert r.words == plain[r.fid].words


def test_pipeline_depth_invariance(tmp_path):
    """run_dataset's software-pipeline depth is a scheduling knob only: depths
    1, 2, and 3 (and depth > number of batches) must yield identical
    per-utterance boundaries in identical order."""
    import jax

    from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
    from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp = make_timit_corpus(str(tmp_path), n_utts=7, seconds=(0.4, 1.2),
                            words_per_utt=(3, 5), seed=6)
    ds = TIMIT(scp)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=96, n_text_ctx=64,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(7), dims)

    def run(depth):
        cfg = AlignConfig.recommended(topk=2, batch_size=2,
                                      use_gt_transcript=True,
                                      pipeline_depth=depth)
        pipe = AlignmentPipeline(params, dims, tok, cfg)
        return list(pipe.run_dataset(ds, progress=False))

    base = run(1)
    assert [r.fid for r in base] == [ds[i].fid for i in range(len(ds))]
    for depth in (2, 3, 10):  # 10 > 4 batches: full drain path
        other = run(depth)
        assert [r.fid for r in other] == [r.fid for r in base]
        for a, b in zip(other, base):
            np.testing.assert_array_equal(a.start_times, b.start_times)
            np.testing.assert_array_equal(a.end_times, b.end_times)
            assert a.words == b.words


def test_pipeline_with_128_mel_model(tmp_path):
    """large-v3-style 128-mel frontend end-to-end through the pipeline."""
    import jax
    from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
    from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus
    from whisper_char_alignment_tpu.models import whisper as wmodel
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp = make_timit_corpus(str(tmp_path), n_utts=2, seconds=0.6,
                            words_per_utt=(3, 4), seed=4)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=32,
                          state=16, head=2, layers=2, n_mels=128)
    params = wmodel.init_params(jax.random.PRNGKey(5), dims)
    cfg = AlignConfig.recommended(topk=2, batch_size=2, n_mels=128,
                                  use_gt_transcript=True)
    pipe = AlignmentPipeline(params, dims, tok, cfg)
    res = list(pipe.run_dataset(TIMIT(scp), progress=False))
    assert len(res) == 2
    for r in res:
        assert not r.skipped and len(r.start_times) == len(r.words) - 1
