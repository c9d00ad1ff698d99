"""The committed sample fixture loads through the TIMIT dataset path and runs
through the pipeline (smoke; golden boundary parity needs real weights)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sample_loads_via_timit():
    from whisper_char_alignment_tpu.data.dataset import TIMIT

    os.chdir(REPO)
    ds = TIMIT(os.path.join(REPO, "sample", "test.scp"))
    u = ds[0]
    assert u.fid == "dr0-sample-test"
    assert u.text == "artificial intelligence is for real"
    assert len(u.ends) == 5
    np.testing.assert_allclose(u.ends[-1], 2.06, atol=1e-3)
    assert u.audio.size == int(2.2 * 16000)


@pytest.mark.slow
def test_sample_regeneration_is_deterministic(tmp_path):
    import subprocess
    import sys

    out = str(tmp_path / "sample_out")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "sample", "make_sample.py"), out],
        check=True, cwd=REPO)
    with open(os.path.join(REPO, "sample", "test.wav"), "rb") as f:
        a = f.read()
    with open(os.path.join(out, "test.wav"), "rb") as f:
        b = f.read()
    assert a == b
