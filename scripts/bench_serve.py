#!/usr/bin/env python
"""Serving-layer throughput bench: multi-stream /align vs request-at-a-time.

Boots the real HTTP server (cli/serve.py) in-process with Whisper-medium
shapes and random bf16 weights (runtime is weight-independent), warms the
30 s audio bucket, then measures the same client workload two ways:

1. **serial** — one client posts N requests back to back (the p50 here is
   the per-request floor: one device launch per request).
2. **concurrent** — M client threads post the same N requests; the server's
   micro-batcher coalesces them into shared padded launches.

Prints ONE JSON line: serial/concurrent throughput (req/s), p50 latency for
both, and the speedup ratio. Everything else on stderr.

Knobs (env): WCA_SERVE_BENCH_REQS (32), WCA_SERVE_BENCH_CLIENTS (8),
WCA_SERVE_BENCH_BATCH (8), WCA_SERVE_BENCH_DECODE_LEN (32 — same
real-transcript proxy as bench.py), WCA_SERVE_BENCH_SECONDS (5.0),
WCA_SERVE_BENCH_TINY=1 (CPU smoke).
"""

import json
import os
import statistics
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_wca"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from whisper_char_alignment_tpu import api
from whisper_char_alignment_tpu.audio.wav import save as wav_save
from whisper_char_alignment_tpu.cli.serve import (serve, warmup,
                                                  warmup_transcribe)
from whisper_char_alignment_tpu.config import MODEL_DIMS, tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

TINY = os.environ.get("WCA_SERVE_BENCH_TINY") == "1"
N_REQS = int(os.environ.get("WCA_SERVE_BENCH_REQS", "8" if TINY else "32"))
CLIENTS = int(os.environ.get("WCA_SERVE_BENCH_CLIENTS", "4" if TINY else "8"))
BATCH = int(os.environ.get("WCA_SERVE_BENCH_BATCH", "4" if TINY else "8"))
DECODE_LEN = int(os.environ.get("WCA_SERVE_BENCH_DECODE_LEN",
                                "8" if TINY else "32"))
SECONDS = float(os.environ.get("WCA_SERVE_BENCH_SECONDS",
                               "0.5" if TINY else "5.0"))
# "align" (default) or "transcribe": which endpoint the workload drives.
# /transcribe measures TranscribeBatcher (shared window-decode launches,
# VERDICT r04 #7) instead of AlignBatcher.
ENDPOINT = os.environ.get("WCA_SERVE_BENCH_ENDPOINT", "align")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    tok = get_test_tokenizer()
    if TINY:
        dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=128,
                              n_text_ctx=96, state=32, head=4, layers=2)
        name = "tiny-test"
    else:
        name = os.environ.get("WCA_SERVE_BENCH_MODEL", "medium")
        dims = MODEL_DIMS[name]
    log(f"devices: {jax.devices()}")
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    model = api.Model(params=params, dims=dims, tokenizer=tok, name=name)

    srv = serve(model, host="127.0.0.1", port=0, compute_dtype=jnp.bfloat16,
                batch_size=BATCH, linger_ms=5.0,
                config_overrides={"decode_sample_len": DECODE_LEN})
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    audio = (np.random.default_rng(0)
             .normal(0, 0.05, int(SECONDS * 16000)).astype(np.float32))
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    wav_save(path, audio, 16000)
    body = open(path, "rb").read()
    os.unlink(path)

    if ENDPOINT == "transcribe":
        url = f"{base}/transcribe?language=en&sample_len={DECODE_LEN}"
        # WCA_SERVE_BENCH_TEMPERATURE=0 pins a single-rung ladder (no
        # fallback retries) — the representative real-checkpoint shape, where
        # greedy passes the quality thresholds and windows batch. Unset, the
        # published default ladder runs, and with random weights EVERY window
        # fails the thresholds, so ~5 solo sampled retries per request dwarf
        # the shared greedy launch (measured 0.98x — see docs/DESIGN.md r5).
        temp = os.environ.get("WCA_SERVE_BENCH_TEMPERATURE")
        if temp is not None:
            url += f"&temperature={temp}"
        expect_key = "segments"
    else:
        url = f"{base}/align?topk=10"
        expect_key = "end_times"

    def post():
        t0 = time.perf_counter()
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=3600) as r:
            out = json.loads(r.read())
        assert expect_key in out, out
        return time.perf_counter() - t0

    log("warmup (compiles the batcher's padded signature)...")
    t0 = time.perf_counter()
    if ENDPOINT == "transcribe":
        # every pow2 bucket a staggered concurrent wave can land on must be
        # compiled BEFORE timing (an unwarmed B=2/B=4 bucket compiling inside
        # the timed phase measured 0.55x where the warm path is >1x)
        tkw = dict(language="en", sample_len=DECODE_LEN)
        if temp is not None:
            tkw["temperature"] = float(temp)
        warmup_transcribe(model, compute_dtype=jnp.bfloat16,
                          batch_size=BATCH, seconds=SECONDS, **tkw)
    else:
        warmup(model, compute_dtype=jnp.bfloat16, seconds=(SECONDS,),
               batcher=srv.batcher)
    log(f"warmup done in {time.perf_counter() - t0:.1f}s")
    post()  # one warm request through the HTTP path (transcribe: compiles
    # the B=1 window signature; the concurrent wave below compiles the rest)
    # a full-live concurrent wave hits a DIFFERENT live-token bucket than the
    # 1-live warmup batch; compile it before timing anything
    t0 = time.perf_counter()
    warm_errors = []

    def warm_post():
        # collect failures: a silently failed warmup leaves the full-live
        # bucket uncompiled and the TIMED concurrent wave absorbs the
        # multi-minute compile, understating req/s with no failure signal
        try:
            post()
        except Exception as e:  # noqa: BLE001 - re-raised below
            warm_errors.append(e)

    ws = [threading.Thread(target=warm_post)
          for _ in range(min(CLIENTS, BATCH))]
    for t in ws:
        t.start()
    for t in ws:
        t.join()
    if warm_errors:
        raise RuntimeError(f"concurrent-wave warmup failed: {warm_errors[0]}")
    log(f"concurrent-wave warmup done in {time.perf_counter() - t0:.1f}s")

    log(f"serial: {N_REQS} requests, 1 client...")
    t0 = time.perf_counter()
    serial_lat = [post() for _ in range(N_REQS)]
    serial_wall = time.perf_counter() - t0

    log(f"concurrent: {N_REQS} requests, {CLIENTS} clients...")
    conc_lat = []
    errors = []
    lat_lock = threading.Lock()
    idx = iter(range(N_REQS))
    idx_lock = threading.Lock()

    def client():
        while True:
            with idx_lock:
                if next(idx, None) is None:
                    return
            try:
                d = post()
            except Exception as e:  # noqa: BLE001 - re-raised below
                with lat_lock:
                    errors.append(e)
                return
            with lat_lock:
                conc_lat.append(d)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_wall = time.perf_counter() - t0
    if errors or len(conc_lat) != N_REQS:
        # a partially failed wave must crash LOUDLY like the serial phase,
        # never print a plausible JSON over the surviving subset
        raise RuntimeError(
            f"concurrent phase failed: {len(errors)} errors, "
            f"{len(conc_lat)}/{N_REQS} completed; first: "
            f"{errors[0] if errors else 'requests lost'}")

    serial_rps = N_REQS / serial_wall
    conc_rps = len(conc_lat) / conc_wall
    batcher = srv.tbatcher if ENDPOINT == "transcribe" else srv.batcher
    payload = {
        "metric": f"serve_{ENDPOINT}_multistream_req_per_sec",
        "value": round(conc_rps, 3),
        "unit": "req/sec",
        "vs_baseline": None,
        "serial_req_per_sec": round(serial_rps, 3),
        "speedup_vs_serial": round(conc_rps / serial_rps, 2),
        "p50_serial_ms": round(1000 * statistics.median(serial_lat), 1),
        "p50_concurrent_ms": round(1000 * statistics.median(conc_lat), 1),
        "n_reqs": N_REQS, "clients": CLIENTS, "batch": BATCH,
        "decode_len": DECODE_LEN, "audio_seconds": SECONDS,
        "batcher_launches": batcher.n_launches,
        "batcher_reqs": batcher.n_reqs,
    }
    log(f"serial {serial_rps:.2f} req/s (p50 {payload['p50_serial_ms']} ms) "
        f"-> concurrent {conc_rps:.2f} req/s "
        f"(p50 {payload['p50_concurrent_ms']} ms), "
        f"{payload['speedup_vs_serial']}x")
    print(json.dumps(payload))
    srv.shutdown()
    srv.batcher.close()
    if srv.tbatcher is not None:
        srv.tbatcher.close()


if __name__ == "__main__":
    main()
