"""The asset-day runbook's offline dress rehearsal: ``scripts/asset_gates.py
--rehearse`` drives every gate's REAL CLI command through the production
``WCA_CHECKPOINT`` / ``WCA_TOKENIZER_DIR`` loader path on synthetic
real-format assets and synthetic TIMIT/LibriSpeech corpora in the reference
on-disk layouts (reference dataset.py:21-122), so on asset day the runbook
can only fail on weight values, never on formats, flags, or plumbing.

This test runs the gate subset that exercises the NEW plumbing: the
recommended-recipe infer_ali gate via the production loader, eval_ali
re-scoring of its predictions pkl, the synthetic-LibriSpeech Kaldi-alignment
gate, and the probe_oracle sweep. Gate 1 (the HF-twin boundary-parity
rehearsal) is covered by tests/test_asset_rehearsal.py in the same tier;
gates 3/6 are flag variants of gate 2's command path."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_asset_gates_rehearsal_subset(tmp_path):
    artifact = tmp_path / "scoreboard.json"
    env = os.environ.copy()
    # the rehearsal must provision its OWN assets — a stray operator env must
    # not leak into the gates under test
    env.pop("WCA_CHECKPOINT", None)
    env.pop("WCA_TOKENIZER_DIR", None)
    env["WCA_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "asset_gates.py"),
         "--rehearse", "--rehearse_dir", str(tmp_path / "work"),
         "--rehearse_utts", "4", "--artifact", str(artifact),
         "--only", "2,2b,4,5"],
        cwd=REPO, env=env, text=True, capture_output=True, timeout=1500)
    assert proc.returncode == 0, (proc.stdout[-4000:], proc.stderr[-4000:])

    board = json.loads(artifact.read_text())
    assert board["rehearse"] is True
    assert board["failures"] == 0
    for gate in ("2 TIMIT F1@50ms (recommended recipe)",
                 "2b eval_ali re-score of gate 2's pkl at 0.1s",
                 "4 LibriSpeech vs Kaldi alignments",
                 "5 probe_oracle sweep"):
        assert board[gate]["rc"] == 0, (gate, board)
        # the print contract parsed — each gate emitted a metrics line
        assert board[gate].get("metrics"), (gate, board)
    # the un-run gates were skipped LOUDLY, not silently dropped
    assert any(s.startswith("3 ") for s in board["skipped"]), board["skipped"]
    assert any(s.startswith("7 ") for s in board["skipped"]), board["skipped"]
    # the probe gate found live (>=18-word) utterances: hit_rate is a real
    # number over a non-empty denominator only if utterances survived the cut
    assert "hit_rate" in board["5 probe_oracle sweep"]["metrics"]


def test_make_librispeech_corpus_parses_through_dataset(tmp_path):
    """The synthetic LibriSpeech layout round-trips through the production
    parser: trans.txt discovery from the scp path, safe literal alignment
    parse, silence-entry skip, word/boundary bookkeeping."""
    from whisper_char_alignment_tpu.data.dataset import LibriSpeech
    from whisper_char_alignment_tpu.data.synthetic import \
        make_librispeech_corpus

    scp, ali = make_librispeech_corpus(str(tmp_path), n_utts=3,
                                       seconds=(1.0, 1.5),
                                       words_per_utt=(4, 6), seed=0)
    ds = LibriSpeech(scp, alignment_file=ali)
    assert len(ds) == 3
    for i in range(len(ds)):
        utt = ds[i]
        words = utt.text.split()
        assert 4 <= len(words) <= 6
        # the silence entry was dropped: every word has a real interval
        assert len(utt.starts) == len(utt.ends) == len(words)
        assert all(e > s - 1e-9 for s, e in zip(utt.starts, utt.ends))
        assert utt.audio.dtype.name == "float32" and utt.audio.size > 0
        # trans.txt discovery found this fid's transcript (upper-cased words)
        assert ds.label_dict[utt.fid].lower() == utt.text
