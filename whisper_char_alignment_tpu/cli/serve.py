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

Serving notes: requests are handled on a thread pool but DEVICE work is
serialized behind one lock — a single accelerator executes one batch at a
time anyway, and concurrent jit dispatch from multiple host threads buys
nothing (axon serializes processes too, CLAUDE.md). First request per
(endpoint, audio-length bucket) pays the jit compile; subsequent requests
reuse the cache. This is an extension (no reference analog) aimed at the
production-serving story; batching across requests is a client concern here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from .. import api
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


def make_handler(model: api.Model, compute_dtype, lock: threading.Lock):
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
            from ..audio.resample import load_resampled

            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                f.write(data)
                f.flush()
                return load_resampled(f.name)

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
                    with lock:
                        res = api.align(
                            model, audio,
                            aligned_unit_type=_q(qs, "aligned_unit_type",
                                                 "char"),
                            aggregation=_q(qs, "aggregation", "topk"),
                            topk=_q(qs, "topk", 10, int),
                            medfilt_width=_q(qs, "medfilt_width", 3, int),
                            compute_dtype=compute_dtype)
                    return self._json(200, {
                        "fid": res.fid,
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
          compute_dtype=jnp.float32) -> ThreadingHTTPServer:
    """Build the server (caller invokes serve_forever / shutdown)."""
    handler = make_handler(model, compute_dtype, threading.Lock())
    return ThreadingHTTPServer((host, port), handler)


def warmup(model: api.Model, compute_dtype=jnp.float32,
           seconds=(4.9, 9.9, 29.5)) -> int:
    """Pre-compile the /align jit signatures before accepting traffic.

    The runner buckets uploaded audio to 5 s steps, so each previously-unseen
    length bucket costs a fresh compile on the first request that hits it —
    minutes on a remote-compile backend. One dummy align per requested
    duration moves that cost to boot. Returns the number of warmup runs."""
    n_samples = 2 * model.dims.n_audio_ctx * 160
    n = 0
    for sec in seconds:
        take = min(int(sec * 16000), n_samples)
        if take <= 0:
            continue
        audio = np.zeros((take,), np.float32)
        api.align(model, audio, compute_dtype=compute_dtype)
        n += 1
        print(f"warmup: {sec:.1f}s bucket compiled", file=sys.stderr)
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8200)
    p.add_argument("--model", type=str, default="medium")
    p.add_argument("--n_mels", type=int, default=80)
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile the /align signatures for 5/10/30 s "
                        "audio buckets before accepting traffic (first "
                        "requests otherwise stall on multi-minute compiles)")
    common.add_tpu_flags(p)
    args = p.parse_args(argv)
    params, dims, tok = common.load_model_and_tokenizer(args)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    params = common.cast_params(params, dtype)  # int8 leaves survive the cast
    name = "tiny-test" if args.test_model else args.model
    model = api.Model(params=params, dims=dims, tokenizer=tok, name=name)
    if args.warmup:
        warmup(model, compute_dtype=dtype)
    srv = serve(model, args.host, args.port, compute_dtype=dtype)
    print(f"serving {args.model} on http://{args.host}:{args.port}",
          file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
