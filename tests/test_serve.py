"""HTTP serving layer: /align and /transcribe round-trips against a live
server thread with the offline test model (stdlib client, WAV bytes in,
JSON out)."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from whisper_char_alignment_tpu import api
from whisper_char_alignment_tpu.audio.wav import save as wav_save
from whisper_char_alignment_tpu.cli.serve import serve


@pytest.fixture(scope="module")
def srv_obj():
    model = api.test_model()
    # long linger so concurrent test clients reliably coalesce into one
    # micro-batch on a 1-core host (production default is 5 ms)
    srv = serve(model, host="127.0.0.1", port=0,  # ephemeral port
                batch_size=4, linger_ms=300.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.batcher.close()


@pytest.fixture(scope="module")
def server(srv_obj):
    return f"http://127.0.0.1:{srv_obj.server_address[1]}"


def _wav_bytes(seconds=0.6, seed=0, sr=16000):
    import tempfile, os

    audio = (np.random.default_rng(seed).normal(0, 0.05, int(sr * seconds))
             .astype(np.float32))
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    try:
        wav_save(path, audio, sr)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=60) as r:
        assert r.status == 200
        assert json.loads(r.read()) == {"ok": True, "model": "test"}


def test_align_endpoint(server):
    status, out = _post(f"{server}/align?topk=3", _wav_bytes())
    assert status == 200
    for key in ("fid", "words", "start_times", "end_times", "transcription"):
        assert key in out
    assert len(out["start_times"]) == len(out["end_times"])


@pytest.mark.slow
def test_transcribe_endpoint(server):
    status, out = _post(
        f"{server}/transcribe?language=en&sample_len=6&without_timestamps=1",
        _wav_bytes(seed=1))
    assert status == 200
    assert "segments" in out and "text" in out and out["language"] == "en"


def test_unknown_route_and_bad_body(server):
    req = urllib.request.Request(f"{server}/nope", data=b"x", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 404
    # malformed WAV -> structured 500, server stays alive
    req = urllib.request.Request(f"{server}/align", data=b"not a wav",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 500
    assert "error" in json.loads(e.value.read())
    # still healthy afterwards
    with urllib.request.urlopen(f"{server}/healthz", timeout=60) as r:
        assert r.status == 200


def _pin_transcripts(pipe):
    """Deterministic per-utterance fake transcripts (keyed on the audio's
    sample count) so every aligned request has NON-EMPTY words: the
    random-weight test model transcribes to empty text, which made a
    batched-vs-solo comparison pass vacuously and masked a real
    cross-request alignment mix-up (round-4 review finding)."""
    words = ("alpha", "beta", "gamma", "delta", "epsilon")

    def fake(utts):
        return [f"{words[u.duration % 5]} {words[(u.duration // 3) % 5]}"
                for u in utts]

    pipe.transcribe_override = fake


@pytest.mark.slow
def test_concurrent_aligns_micro_batch_and_match_solo(server, srv_obj):
    """VERDICT r03 #5: concurrent /align requests coalesce into shared device
    launches AND each response is identical to the same request served alone.
    Three distinct audios are posted solo first (each its own launch), then
    six requests (the three audios twice) land concurrently; every concurrent
    response must equal its solo twin bit-for-bit, and the batcher must have
    used fewer launches than requests."""
    srv_obj.batcher.pipe_hook = _pin_transcripts
    for pipe in srv_obj.batcher._pipes.values():
        _pin_transcripts(pipe)
    bodies = {s: _wav_bytes(seconds=0.4 + 0.2 * s, seed=s) for s in range(3)}
    solo = {}
    for s, body in bodies.items():
        status, out = _post(f"{server}/align?topk=3", body)
        assert status == 200
        solo[s] = out
    # the comparison below must not be vacuous: every solo answer has words
    # and boundaries, and the three answers are pairwise distinct (so a
    # cross-wired batch CANNOT reproduce them)
    for s in range(3):
        assert len(solo[s]["words"]) >= 2
        assert len(solo[s]["end_times"]) >= 2
    assert len({json.dumps(solo[s], sort_keys=True) for s in range(3)}) == 3

    launches0 = srv_obj.batcher.n_launches
    reqs0 = srv_obj.batcher.n_reqs
    results = {}
    errors = []

    def client(i, s):
        try:
            results[i] = (s, _post(f"{server}/align?topk=3", bodies[s]))
        except Exception as e:  # pragma: no cover - surfaced via errors
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i, i % 3))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors and len(results) == 6
    for s, (status, out) in results.values():
        assert status == 200
        assert out == solo[s]
    assert srv_obj.batcher.n_reqs - reqs0 == 6
    assert srv_obj.batcher.n_launches - launches0 < 6  # batching happened


@pytest.mark.slow
def test_mixed_recipe_keys_never_share_a_batch(server, srv_obj):
    """Requests with different align options must not cross-contaminate: a
    topk=3 and a topk=1 request posted concurrently each match their solo
    answer (different keys form separate launches by construction)."""
    # self-sufficient non-vacuity: pin transcripts here too (random weights
    # otherwise transcribe empty and 'out == solo' holds for ANY cross-wiring)
    srv_obj.batcher.pipe_hook = _pin_transcripts
    for pipe in srv_obj.batcher._pipes.values():
        _pin_transcripts(pipe)
    body = _wav_bytes(seconds=0.5, seed=7)
    solo = {q: _post(f"{server}/align?topk={q}", body)[1] for q in (3, 1)}
    for q in (3, 1):
        assert len(solo[q]["words"]) >= 2 and len(solo[q]["end_times"]) >= 2
    # the two recipes must answer differently, or cross-key contamination
    # would be invisible
    assert solo[3] != solo[1]
    out = {}

    def client(q):
        out[q] = _post(f"{server}/align?topk={q}", body)[1]

    threads = [threading.Thread(target=client, args=(q,)) for q in (3, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert out[3] == solo[3] and out[1] == solo[1]


@pytest.mark.slow
def test_warmup_precompiles_buckets():
    """--warmup runs one dummy align per audio bucket (tiny model: durations
    beyond the model window collapse into the single full-window bucket)."""
    from whisper_char_alignment_tpu.cli.serve import warmup

    model = api.test_model()
    n = warmup(model, seconds=(0.2, 0.4))
    assert n == 2


def test_warmup_transcribe_precompiles_pow2_buckets():
    """warmup_transcribe covers every pow2 launch bucket transcribe_batched
    can pad a shared group to (1, 2, 4 at batch_size=4) — an unwarmed bucket
    costs a first-request compile mid-traffic (docs/DESIGN.md round 5)."""
    from whisper_char_alignment_tpu.cli.serve import warmup_transcribe

    model = api.test_model()
    n = warmup_transcribe(model, batch_size=4, seconds=0.3,
                          sample_len=4, temperature=0.0)
    assert n == 3  # buckets 1, 2, 4


def test_oversized_body_rejected_413(server, monkeypatch):
    """A Content-Length beyond the cap is refused BEFORE the body is read —
    the host must not buffer an arbitrarily large POST."""
    from whisper_char_alignment_tpu.cli import serve as serve_mod

    monkeypatch.setattr(serve_mod, "MAX_BODY_BYTES", 1024)
    body = b"\x00" * 4096
    req = urllib.request.Request(f"{server}/align", data=body, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 413
    assert "exceeds cap" in json.loads(e.value.read())["error"]
    # server survives the refusal
    with urllib.request.urlopen(f"{server}/healthz", timeout=60) as r:
        assert r.status == 200


@pytest.mark.slow
def test_timed_out_request_is_withdrawn_from_queue():
    """Round-4 review: a request whose submit() times out must leave the
    queue — the dispatcher previously ran a full device launch for a client
    that had already received its error."""
    from whisper_char_alignment_tpu.cli.serve import AlignBatcher

    model = api.test_model()
    gate = threading.Lock()
    gate.acquire()  # stall the dispatcher's first launch on the device lock
    b = AlignBatcher(model, np.float32, batch_size=1, linger_ms=0.0,
                     device_lock=gate)
    try:
        audio = np.zeros(1600, np.float32)
        key = ("char", "topk", 3, 3)
        t1 = threading.Thread(target=lambda: b.submit(audio, key, timeout=120))
        t1.start()
        # wait until the dispatcher has TAKEN request 1 (queue drained) and is
        # blocked on the device lock
        for _ in range(200):
            if not b._queue and t1.is_alive():
                break
            time.sleep(0.01)
        with pytest.raises(TimeoutError):
            b.submit(audio, key, timeout=0.2)
        with b._cv:
            assert len(b._queue) == 0  # the timed-out request withdrew itself
    finally:
        gate.release()
        t1.join(timeout=300)
        b.close()


def test_batcher_loop_checks_host_mapping_guard(monkeypatch):
    """The dispatcher must invoke the VM-mapping guard once per launch: a
    long-lived server whose clients vary decode options compiles unboundedly
    many signatures and would otherwise segfault past vm.max_map_count
    (utils/hostmaps.py post-mortem)."""
    from whisper_char_alignment_tpu.cli import serve as serve_mod
    from whisper_char_alignment_tpu.cli.serve import AlignBatcher

    calls = []
    monkeypatch.setattr(serve_mod.hostmaps, "clear_jax_caches_if_crowded",
                        lambda *a, **k: calls.append(1) or False)
    model = api.test_model()
    b = AlignBatcher(model, np.float32, batch_size=1, linger_ms=0.0,
                     device_lock=threading.Lock())
    try:
        b.submit(np.zeros(1600, np.float32), ("char", "topk", 3, 3),
                 timeout=300)
    finally:
        b.close()
    assert calls, "guard not called after a batch launch"


@pytest.mark.slow
def test_batcher_stress_mixed_keys_and_clients(server, srv_obj):
    """Soak the micro-batcher: 24 requests across 8 client threads and two
    recipe keys land concurrently; every response must equal its solo twin
    (pinned non-empty transcripts), with no lost or misrouted request."""
    srv_obj.batcher.pipe_hook = _pin_transcripts
    for pipe in srv_obj.batcher._pipes.values():
        _pin_transcripts(pipe)
    bodies = {s: _wav_bytes(seconds=0.35 + 0.15 * s, seed=20 + s)
              for s in range(3)}
    solo = {(s, q): _post(f"{server}/align?topk={q}", bodies[s])[1]
            for s in range(3) for q in (3, 1)}
    for v in solo.values():
        assert len(v["words"]) >= 2
    jobs = [(s, q) for s in range(3) for q in (3, 1)] * 4  # 24 requests
    results = {}
    errors = []
    lock = threading.Lock()

    def client(i, s, q):
        try:
            out = _post(f"{server}/align?topk={q}", bodies[s])[1]
            with lock:
                results[i] = ((s, q), out)
        except Exception as e:  # pragma: no cover - surfaced via errors
            with lock:
                errors.append(e)

    threads = [threading.Thread(target=client, args=(i, s, q))
               for i, (s, q) in enumerate(jobs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors and len(results) == len(jobs)
    for key, out in results.values():
        assert out == solo[key], key


@pytest.mark.slow
def test_pipe_cache_is_lru_bounded():
    """Each cached pipeline owns a preallocated wire-staging pool, so the
    per-recipe cache must be LRU-bounded: cycling recipe keys evicts the
    oldest, and an evicted recipe still aligns correctly when rebuilt."""
    from whisper_char_alignment_tpu.cli.serve import AlignBatcher

    model = api.test_model()
    b = AlignBatcher(model, np.float32, batch_size=1, linger_ms=0.0,
                     max_pipes=2)
    b.pipe_hook = _pin_transcripts
    try:
        audio = (np.random.default_rng(5).normal(0, 0.05, 4800)
                 .astype(np.float32))
        key = lambda q: ("char", "topk", q, 3)
        first = b.submit(audio, key(1))
        for q in (2, 3):  # evicts q=1
            b.submit(audio, key(q))
        assert len(b._pipes) == 2
        assert key(1) not in b._pipes
        again = b.submit(audio, key(1))  # rebuilt, must match the first run
        assert again.words == first.words
        np.testing.assert_array_equal(again.end_times, first.end_times)
    finally:
        b.close()


@pytest.mark.slow
def test_concurrent_transcribes_micro_batch_and_match_solo(server, srv_obj):
    """VERDICT r04 #7: concurrent same-recipe /transcribe requests must share
    window-decode launches (TranscribeBatcher -> transcribe_batched) and each
    must return exactly what a solo request returns. Distinct audios so a
    cross-wired response would be visible (round-4 test rule)."""
    tb = srv_obj.tbatcher
    assert tb is not None
    bodies = [_wav_bytes(seconds=0.7 + 0.1 * k, seed=10 + k)
              for k in range(3)]
    url = f"{server}/transcribe?language=en&sample_len=6"
    # solo baselines first (serial posts never coalesce past the linger)
    solo = [_post(url, b)[1] for b in bodies]
    launches0, reqs0 = tb.n_launches, tb.n_reqs

    outs = [None] * 3
    errs = []

    def client(k):
        try:
            outs[k] = _post(url, bodies[k])[1]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(k,)) for k in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errs, errs
    assert tb.n_reqs - reqs0 == 3
    # the three requests coalesced into fewer dispatcher launches than
    # requests (the 300 ms test linger makes coalescing deterministic)
    assert tb.n_launches - launches0 < 3
    for k in range(3):
        assert outs[k]["text"] == solo[k]["text"], k
        assert outs[k]["language"] == solo[k]["language"]
        assert len(outs[k]["segments"]) == len(solo[k]["segments"])
        for a, b in zip(outs[k]["segments"], solo[k]["segments"]):
            assert a["tokens"] == b["tokens"]
            assert a["start"] == b["start"] and a["end"] == b["end"]
    # payload sanity: not all empty/identical
    assert len({o["text"] for o in outs} | {s["text"] for s in solo}) >= 1
