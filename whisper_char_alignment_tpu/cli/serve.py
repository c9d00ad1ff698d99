"""Minimal HTTP serving layer: load the model once, serve alignment and
transcription over plain HTTP (stdlib only — no web-framework dependency).

    python -m whisper_char_alignment_tpu.cli.serve --port 8200 \
        --model medium --checkpoint medium.npz

Endpoints (WAV bytes in, JSON out):
- ``POST /align``       -> {fid, words, start_times, end_times, transcription}
  query params: aligned_unit_type, aggregation, topk, medfilt_width
- ``POST /transcribe``  -> the transcribe() result dict
  query params: language, task, beam_size, best_of, temperature,
  word_timestamps, without_timestamps
- ``GET /healthz``      -> {"ok": true, "model": ...}

Serving notes: requests are handled on a thread pool; DEVICE work is
serialized behind one lock (a single accelerator executes one batch at a
time, and axon serializes processes too, CLAUDE.md). Concurrent /align
requests are MICRO-BATCHED: a dispatcher thread collects requests that share
one recipe (aligned_unit_type, aggregation, topk, medfilt_width) for up to
--serve_linger_ms or --serve_batch_size items and runs them as ONE device
launch — the serving-side twin of the runner's batch-the-device thesis.
Concurrent same-recipe /transcribe requests micro-batch too: their seek loops
advance independently, but each round's pending window decodes run as shared
launches (TranscribeBatcher -> transcribe_batched).
Results are bit-identical to serving each request alone (the fixed-shape
masking proofs, docs/DESIGN.md §1; locked by tests/test_serve.py). First
request per (endpoint, audio-length bucket) pays the jit compile;
subsequent requests reuse the cache. This is an extension (no reference
analog) aimed at the production-serving story.
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from .. import api
from ..config import AlignConfig
from ..data.dataset import Utterance
from ..runner import AlignmentPipeline
from ..utils import hostmaps
from . import common

_TRUE = ("1", "true", "True", "yes")

# request-body cap: 30 s of 16 kHz float64 WAV is ~4 MB; 256 MB leaves room
# for long-form multi-channel uploads while bounding a single POST's memory
MAX_BODY_BYTES = int(float(os.environ.get("WCA_SERVE_MAX_BODY_MB", "256"))
                     * 1024 * 1024)


class _BodyTooLarge(ValueError):
    """Raised before reading an oversized request body (HTTP 413)."""


def _q(qs, name, default=None, cast=str):
    vals = qs.get(name)
    if not vals:
        return default
    return cast(vals[0])


class _AlignRequest:
    __slots__ = ("audio", "key", "event", "result", "error")

    def __init__(self, audio, key):
        self.audio = audio
        self.key = key
        self.event = threading.Event()
        self.result = None
        self.error = None


class _MicroBatcher:
    """Queue/linger/dispatch skeleton shared by the /align and /transcribe
    batchers: handler threads :meth:`submit` and block; one dispatcher thread
    drains the queue, groups requests sharing a recipe key, lingers up to
    ``linger_ms`` for the batch to fill, and runs subclasses'
    :meth:`_run_batch` (one device-side launch set) for each group."""

    def __init__(self, batch_size: int = 8, linger_ms: float = 5.0,
                 device_lock: "threading.Lock | None" = None,
                 name: str = "micro-batcher"):
        self.batch_size = max(1, batch_size)
        self.linger_s = max(0.0, linger_ms) / 1000.0
        self.device_lock = device_lock or threading.Lock()
        self._queue: "collections.deque[_AlignRequest]" = collections.deque()
        self._cv = threading.Condition()
        self._stop = False
        self.n_launches = 0
        self.n_reqs = 0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name=name)
        self._thread.start()

    def _run_batch(self, batch):  # -> list of per-request results
        raise NotImplementedError

    def submit(self, audio: np.ndarray, key, timeout: "float | None" = None):
        """Queue one request and block until its batch completes.

        The default timeout must tolerate a first-request jit compile, which
        on a remote-compile backend can take tens of minutes
        (WCA_SERVE_SUBMIT_TIMEOUT_S overrides; --warmup moves the cost to
        boot)."""
        if timeout is None:
            timeout = float(os.environ.get("WCA_SERVE_SUBMIT_TIMEOUT_S",
                                           "3600"))
        req = _AlignRequest(audio, key)
        with self._cv:
            self._queue.append(req)
            self._cv.notify_all()
        if not req.event.wait(timeout):
            # withdraw a still-queued request so the dispatcher never burns a
            # device launch (possibly a first-bucket compile) on a client
            # that already got its error; an already-taken request's launch
            # is in flight and completes harmlessly (nobody waits on it)
            with self._cv:
                try:
                    self._queue.remove(req)
                except ValueError:
                    pass
            raise TimeoutError("request timed out in the batch queue")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _take_batch(self):
        """Under the cv: pop the oldest request plus up to batch_size-1 more
        sharing its key, lingering until the deadline while short."""
        first = self._queue.popleft()
        batch = [first]
        deadline = time.monotonic() + self.linger_s

        def drain():
            keep = collections.deque()
            while self._queue and len(batch) < self.batch_size:
                r = self._queue.popleft()
                (batch if r.key == first.key else keep).append(r)
            # unmatched keys keep their arrival order for the next launch
            self._queue.extendleft(reversed(keep))

        drain()
        while len(batch) < self.batch_size and not self._stop:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            self._cv.wait(remaining)
            drain()
        return batch

    def _loop(self):
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop:
                    for r in self._queue:
                        r.error = RuntimeError("server shutting down")
                        r.event.set()
                    return
                batch = self._take_batch()
            try:
                results = self._run_batch(batch)
                for r, res in zip(batch, results):
                    r.result = res
                    r.event.set()
                self.n_launches += 1
                self.n_reqs += len(batch)
            except Exception as e:  # fan the failure out to every waiter
                for r in batch:
                    r.error = e
                    r.event.set()
            # A long-lived server whose clients vary decode options/shapes
            # compiles unboundedly many signatures; each live XLA executable
            # holds per-kernel VM mappings and the process segfaults past the
            # kernel's vm.max_map_count (utils/hostmaps.py has the full
            # post-mortem). Check once per launch, off the request path —
            # clearing near the ceiling trades one warm-cache reload for not
            # crashing the server.
            hostmaps.clear_jax_caches_if_crowded()


class AlignBatcher(_MicroBatcher):
    """Cross-request micro-batching for /align.

    Handler threads :meth:`submit` and block; one dispatcher thread drains the
    queue, groups requests sharing a recipe key, lingers up to ``linger_ms``
    for the batch to fill (the first request pays the linger; under load the
    batch fills before the deadline), and runs ONE padded device launch
    through the same AlignmentPipeline.align_batch the offline CLI uses — so
    the fixed-shape masking proofs make a batched request's boundaries
    bit-identical to a solo one's. Requests with a different recipe key stay
    queued and form the next launch. ``device_lock`` is shared with
    /transcribe so the two endpoints never interleave device work."""

    def __init__(self, model: api.Model, compute_dtype,
                 batch_size: int = 8, linger_ms: float = 5.0,
                 device_lock: "threading.Lock | None" = None,
                 config_overrides: "dict | None" = None,
                 max_pipes: int = 8):
        self.model = model
        self.compute_dtype = compute_dtype
        self.config_overrides = dict(config_overrides or {})
        # LRU-bounded: each pipeline owns a preallocated wire-staging pool
        # (tens of MB at serving batch sizes), so a client cycling recipe
        # options must not grow host memory without limit
        self.max_pipes = max(1, max_pipes)
        self._pipes: "collections.OrderedDict" = collections.OrderedDict()
        # test seam: called with each newly built pipeline (e.g. to install a
        # deterministic transcribe_override so batched-vs-solo checks compare
        # real, non-empty alignments)
        self.pipe_hook = None
        super().__init__(batch_size=batch_size, linger_ms=linger_ms,
                         device_lock=device_lock, name="align-batcher")

    def _pipe(self, key) -> AlignmentPipeline:
        pipe = self._pipes.get(key)
        if pipe is not None:
            self._pipes.move_to_end(key)
        else:
            unit, aggr, topk, medfilt = key
            cfg = AlignConfig(aligned_unit_type=unit, aggr=aggr, topk=topk,
                              medfilt_width=medfilt,
                              batch_size=self.batch_size,
                              model=self.model.name,
                              **self.config_overrides)
            pipe = AlignmentPipeline(self.model.params, self.model.dims,
                                     self.model.tokenizer, cfg,
                                     compute_dtype=self.compute_dtype)
            if self.pipe_hook is not None:
                self.pipe_hook(pipe)
            self._pipes[key] = pipe
            while len(self._pipes) > self.max_pipes:
                self._pipes.popitem(last=False)  # evict least recently used
        return pipe

    def _run_batch(self, batch):
        pipe = self._pipe(batch[0].key)
        # unique fids per request: _collect_align indexes device rows
        # positionally, but duplicate fids must never be load-bearing
        # again (they cross-wired batched alignments in round 4)
        utts = [Utterance(audio=r.audio.astype(np.float32),
                          duration=r.audio.size, text="", starts=[],
                          ends=[], fid=f"req{j}")
                for j, r in enumerate(batch)]
        with self.device_lock:
            # no matrix: do_POST serializes only words/times/text, and
            # a (B, T, F) f32 matrix costs ~MBs over the ~75 MB/s
            # tunnel per launch purely to be discarded
            return pipe.align_batch(utts, return_matrix=False)


class TranscribeBatcher(_MicroBatcher):
    """Cross-request micro-batching for /transcribe (VERDICT r04 #7).

    Concurrent requests sharing one recipe key (the transcribe query params)
    run as ONE ``transcribe_batched`` call: each request's seek loop advances
    independently, but every round their pending window decodes group into
    shared device launches (grouping dynamics in transcribe_batched's
    docstring — all first windows batch; later windows batch per prompt
    bucket, always under condition_on_previous_text=False). Per-request
    results are identical to solo serving."""

    def __init__(self, model: api.Model, compute_dtype,
                 batch_size: int = 8, linger_ms: float = 5.0,
                 device_lock: "threading.Lock | None" = None):
        self.model = model
        self.compute_dtype = compute_dtype
        super().__init__(batch_size=batch_size, linger_ms=linger_ms,
                         device_lock=device_lock, name="transcribe-batcher")

    def _run_batch(self, batch):
        from ..transcribe import transcribe_batched

        kwargs = dict(batch[0].key)
        kwargs.setdefault("model_name", self.model.name)
        with self.device_lock:
            return transcribe_batched(
                self.model.params, self.model.dims, self.model.tokenizer,
                [r.audio for r in batch], compute_dtype=self.compute_dtype,
                max_batch=self.batch_size, **kwargs)


def make_handler(model: api.Model, compute_dtype, lock: threading.Lock,
                 batcher: "AlignBatcher | None" = None,
                 tbatcher: "TranscribeBatcher | None" = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            print(f"{self.address_string()} {fmt % args}", file=sys.stderr)

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_wav(self) -> np.ndarray:
            n = int(self.headers.get("Content-Length", "0"))
            if n > MAX_BODY_BYTES:
                # refuse before reading: an oversized POST must not be able to
                # exhaust host memory (relevant when --host exposes the server
                # beyond loopback). WCA_SERVE_MAX_BODY_MB overrides the cap.
                raise _BodyTooLarge(
                    f"request body {n} bytes exceeds cap {MAX_BODY_BYTES}")
            data = self.rfile.read(n)
            # decode in memory — a temp-file round trip per request (up to
            # the body cap) is pure I/O waste on the serving hot path
            from ..audio.resample import load_resampled_bytes

            return load_resampled_bytes(data)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                return self._json(200, {"ok": True, "model": model.name})
            return self._json(404, {"error": "unknown route"})

        def do_POST(self):
            url = urlparse(self.path)
            qs = parse_qs(url.query)
            if url.path not in ("/align", "/transcribe"):
                return self._json(404, {"error": "unknown route"})
            try:
                audio = self._read_wav()
                if url.path == "/align":
                    key = (_q(qs, "aligned_unit_type", "char"),
                           _q(qs, "aggregation", "topk"),
                           _q(qs, "topk", 10, int),
                           _q(qs, "medfilt_width", 3, int))
                    if batcher is not None:
                        res = batcher.submit(audio, key)
                    else:
                        with lock:
                            res = api.align(
                                model, audio,
                                aligned_unit_type=key[0], aggregation=key[1],
                                topk=key[2], medfilt_width=key[3],
                                compute_dtype=compute_dtype)
                    return self._json(200, {
                        # the internal fid encodes the batch slot (req0, req1,
                        # ...); a response must not depend on which slot the
                        # batcher happened to assign
                        "fid": "utterance",
                        "words": res.words,
                        "start_times": [float(t) for t in res.start_times],
                        "end_times": [float(t) for t in res.end_times],
                        "transcription": res.transcription,
                        "skipped": res.skipped,
                    })
                # path is /transcribe (the 404 guard above excludes the rest)
                kwargs = {}
                for name, cast in (("language", str), ("task", str),
                                   ("beam_size", int), ("best_of", int),
                                   ("patience", float),
                                   ("length_penalty", float),
                                   ("initial_prompt", str),
                                   ("temperature", float),
                                   ("sample_len", int)):
                    v = _q(qs, name, None, cast)
                    if v is not None:
                        kwargs[name] = v
                if _q(qs, "word_timestamps") in _TRUE:
                    kwargs["word_timestamps"] = True
                if _q(qs, "without_timestamps") in _TRUE:
                    kwargs["without_timestamps"] = True
                if tbatcher is not None:
                    # same-recipe concurrent requests share window-decode
                    # launches; the key is the full kwarg tuple so a recipe
                    # mismatch can never mix decoding options
                    out = tbatcher.submit(audio,
                                          tuple(sorted(kwargs.items())))
                else:
                    with lock:
                        out = api.transcribe(model, audio,
                                             compute_dtype=compute_dtype,
                                             **kwargs)
                return self._json(200, out)
            except _BodyTooLarge as e:
                return self._json(413, {"error": str(e)})
            except Exception as e:  # surface the failure to the client
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(model: api.Model, host: str = "127.0.0.1", port: int = 8200,
          compute_dtype=jnp.float32, batch_size: int = 8,
          linger_ms: float = 5.0,
          config_overrides: "dict | None" = None,
          max_pipes: int = 8) -> ThreadingHTTPServer:
    """Build the server (caller invokes serve_forever / shutdown).

    ``batch_size`` > 1 enables /align micro-batching (see AlignBatcher);
    ``batch_size=1`` serves each request as its own launch (still through one
    dispatcher thread, so device work stays serialized). ``config_overrides``
    are extra AlignConfig fields for the batcher's pipelines (e.g.
    ``decode_sample_len`` to bound per-request decode cost)."""
    lock = threading.Lock()
    batcher = AlignBatcher(model, compute_dtype, batch_size=batch_size,
                           linger_ms=linger_ms, device_lock=lock,
                           config_overrides=config_overrides,
                           max_pipes=max_pipes)
    tbatcher = (TranscribeBatcher(model, compute_dtype,
                                  batch_size=batch_size, linger_ms=linger_ms,
                                  device_lock=lock)
                if batch_size > 1 else None)
    handler = make_handler(model, compute_dtype, lock, batcher, tbatcher)
    srv = ThreadingHTTPServer((host, port), handler)
    srv.batcher = batcher  # tests/shutdown paths reach it here
    srv.tbatcher = tbatcher
    return srv


def warmup(model: api.Model, compute_dtype=jnp.float32,
           seconds=(4.9, 9.9, 29.5),
           batcher: "AlignBatcher | None" = None) -> int:
    """Pre-compile the /align jit signatures before accepting traffic.

    The runner buckets uploaded audio to 5 s steps, so each previously-unseen
    length bucket costs a fresh compile on the first request that hits it —
    minutes on a remote-compile backend. One dummy align per requested
    duration moves that cost to boot. When ``batcher`` is given the warmup
    runs THROUGH it, so the compiled signatures carry the server's actual
    padded batch shape. Returns the number of warmup runs."""
    n_samples = 2 * model.dims.n_audio_ctx * 160
    n = 0
    for sec in seconds:
        take = min(int(sec * 16000), n_samples)
        if take <= 0:
            continue
        audio = np.zeros((take,), np.float32)
        if batcher is not None:
            batcher.submit(audio, ("char", "topk", 10, 3))
        else:
            api.align(model, audio, compute_dtype=compute_dtype)
        n += 1
        print(f"warmup: {sec:.1f}s bucket compiled", file=sys.stderr)
    return n


def warmup_transcribe(model: api.Model, compute_dtype=jnp.float32,
                      batch_size: int = 8, seconds: float = 5.0,
                      **decode_options) -> int:
    """Pre-compile the /transcribe window-decode bucket signatures.

    ``transcribe_batched`` pads each shared launch to a power of two <=
    ``batch_size``, so every pow2 bucket is its own jit signature — minutes
    on a remote-compile backend when a concurrent wave hits it first
    (measured: unwarmed B=2/B=4 buckets compiling inside a timed serving
    phase turned a 1.9x batching win into 0.55x — docs/DESIGN.md round 5).
    One dummy ``transcribe_batched`` call per bucket moves that cost to
    boot. ``decode_options`` must match the traffic's recipe (language /
    sample_len / temperature are part of the signature); fallback-ladder
    rungs (t > 0) run solo by design and compile on first use."""
    from ..transcribe import transcribe_batched

    audio = np.zeros((int(seconds * 16000),), np.float32)
    decode_options.setdefault("language", "en")
    sizes = []
    b = 1
    while b <= max(1, batch_size):
        sizes.append(b)
        b *= 2
    for b in sizes:
        transcribe_batched(model.params, model.dims, model.tokenizer,
                           [audio] * b, compute_dtype=compute_dtype,
                           max_batch=batch_size, **decode_options)
        print(f"warmup: transcribe bucket B={b} compiled", file=sys.stderr)
    return len(sizes)


def main(argv=None) -> int:
    common.apply_platform_env()  # WCA_PLATFORM=cpu must work for serve too
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8200)
    p.add_argument("--model", type=str, default="medium")
    p.add_argument("--n_mels", type=int, default=80)
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile the /align signatures for 5/10/30 s "
                        "audio buckets before accepting traffic (first "
                        "requests otherwise stall on multi-minute compiles)")
    p.add_argument("--serve_batch_size", type=int, default=8,
                   help="micro-batch size for concurrent /align requests "
                        "(one device launch per batch; 1 disables batching)")
    p.add_argument("--serve_linger_ms", type=float, default=5.0,
                   help="max time the align dispatcher waits for a "
                        "micro-batch to fill before launching short")
    p.add_argument("--decode_sample_len", type=int, default=0,
                   help="cap /align decode steps per request (0 = published "
                        "default, n_text_ctx // 2) — bounds worst-case "
                        "per-request device time")
    p.add_argument("--max_pipes", type=int, default=8,
                   help="LRU bound on cached per-recipe align pipelines "
                        "(each owns a wire-staging pool; bounds host memory "
                        "under clients cycling recipe options)")
    p.add_argument("--decode_kv_int8_guarded", action="store_true",
                   help="serve with the guarded int8 K/V decode "
                        "(WCA_KV_INT8_GUARD_MARGIN; see infer_ali --help)")
    p.add_argument("--decode_frame_bucket", type=int, default=0,
                   help="bucket decode cross-K/V to each batch's true frames "
                        "(multiple N; 0 = full 30s window, reference-exact)")
    p.add_argument("--decode_frame_bucket_guarded", action="store_true",
                   help="guard the bucketed decode (WCA_BUCKET_GUARD_MARGIN; "
                        "see infer_ali --help)")
    common.add_tpu_flags(p)
    args = p.parse_args(argv)
    if args.decode_frame_bucket_guarded and args.decode_frame_bucket <= 0:
        # fail at parse time, not inside the batcher's worker thread on the
        # first request (AlignmentPipeline raises the same requirement)
        p.error("--decode_frame_bucket_guarded requires "
                "--decode_frame_bucket N (the bucket multiple)")
    params, dims, tok = common.load_model_and_tokenizer(args)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    params = common.cast_params(params, dtype)  # int8 leaves survive the cast
    name = "tiny-test" if args.test_model else args.model
    model = api.Model(params=params, dims=dims, tokenizer=tok, name=name)
    srv = serve(model, args.host, args.port, compute_dtype=dtype,
                batch_size=args.serve_batch_size,
                linger_ms=args.serve_linger_ms,
                config_overrides={
                    k: v for k, v in dict(
                        decode_sample_len=args.decode_sample_len,
                        decode_kv_int8_guarded=args.decode_kv_int8_guarded,
                        decode_frame_bucket=args.decode_frame_bucket,
                        decode_frame_bucket_guarded=(
                            args.decode_frame_bucket_guarded),
                    ).items() if v} or None,
                max_pipes=args.max_pipes)
    if args.warmup:
        warmup(model, compute_dtype=dtype, batcher=srv.batcher)
        if srv.tbatcher is not None:
            warmup_transcribe(model, compute_dtype=dtype,
                              batch_size=args.serve_batch_size)
    print(f"serving {args.model} on http://{args.host}:{args.port}",
          file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
