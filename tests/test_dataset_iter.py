"""Dataset iteration robustness (round-4 review findings): the prefetch
thread must PROPAGATE worker exceptions instead of silently truncating the
corpus, and TIMIT label paths must survive '.wav' appearing in a directory
component."""

import os

import numpy as np
import pytest

from whisper_char_alignment_tpu.audio import wav
from whisper_char_alignment_tpu.data.dataset import TIMIT, iter_utterances


class _Boom(Exception):
    pass


class _FlakyDataset:
    """5 items; item 2 raises (a corrupt WAV mid-corpus)."""

    def __len__(self):
        return 5

    def __getitem__(self, i):
        if i == 2:
            raise _Boom(f"corrupt item {i}")
        return i


def test_prefetch_propagates_worker_exceptions():
    """A mid-corpus decode error previously ended iteration cleanly after the
    items before it — infer_ali/probe then reported metrics over a PARTIAL
    corpus as if the run succeeded (the reference's eager load crashes)."""
    got = []
    with pytest.raises(_Boom, match="corrupt item 2"):
        for item in iter_utterances(_FlakyDataset(), prefetch=2):
            got.append(item)
    assert got == [0, 1]  # everything before the failure still streamed
    # the no-prefetch path raises too (it always did; pinned for symmetry)
    with pytest.raises(_Boom):
        list(iter_utterances(_FlakyDataset(), prefetch=0))


def test_prefetch_worker_exits_when_consumer_abandons():
    """Abandoning the generator early (break / exception in the consumer)
    previously left the worker blocked FOREVER in q.put with the queue full,
    pinning the thread plus `prefetch` decoded utterances per abandoned run —
    a real leak in a long-lived serve process. Closing the generator must
    release the worker."""
    import threading
    import time

    before = set(threading.enumerate())
    it = iter_utterances(list(range(64)), prefetch=2)
    assert next(it) == 0  # worker started and is now blocked on the full queue
    it.close()  # GeneratorExit -> finally -> cancellation flag

    deadline = time.time() + 5.0
    extra = None
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"prefetch worker leaked: {extra}"


def test_timit_label_path_survives_wav_in_directory_name(tmp_path):
    """path.split('.wav')[0] truncated at the FIRST '.wav' anywhere in the
    path; a '/corpus.wav_16k/' directory broke label discovery."""
    root = tmp_path / "corpus.wav_16k"
    os.makedirs(root)
    audio = np.zeros(1600, np.float32)
    wav.save(str(root / "x.wav"), audio, 16000)
    with open(root / "x.wrd", "w") as f:
        f.write("0 800 hello\n800 1600 world\n")
    scp = tmp_path / "t.scp"
    scp.write_text(f"dr1-x {root / 'x.wav'}\n")
    ds = TIMIT(str(scp))
    u = ds[0]
    assert u.text == "hello world"
    assert u.ends == [0.05, 0.1]
