"""Driver-artifact contract tests: bench.py and scripts/bench_probe.py tiny
modes run end-to-end on CPU and print EXACTLY ONE JSON line to stdout (the
driver parses stdout; everything else must go to stderr — CLAUDE.md
invariant)."""

import json
import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, extra_env):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no virtual-device mesh needed
    env.update(extra_env)
    return subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)


@pytest.mark.slow
def test_bench_tiny_prints_one_json_line():
    r = _run([sys.executable, "bench.py"],
             {"WCA_BENCH_TINY": "1", "WCA_BENCH_PASSES": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    # the one-line contract: core keys plus self-describing run metadata
    assert {"metric", "value", "unit", "vs_baseline",
            "stage_split_s", "decode_len", "pipeline_depth"} <= set(payload)
    assert payload["unit"] == "utts/sec" and payload["value"] > 0
    # tiny dims are not the measured-baseline workload: no ratio claimed
    assert payload["vs_baseline"] is None
    assert "pass:" in r.stderr  # logs went to stderr, not stdout


@pytest.mark.slow
def test_asset_gates_metrics_parser():
    """The scoreboard's stdout parser must survive the CLIs' dict repr with
    np.float64 wrappers and ignore chatter lines."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "asset_gates", os.path.join(REPO, "scripts", "asset_gates.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = ("Namespace(model='medium')\nsome log line\n"
           "{'precision': 0.91, 'recall': 0.88, 'f1': 0.895, "
           "'r_value': np.float64(0.9012), 'hit_rate': 1.0}\n")
    m = mod._parse_metrics(out)
    assert m == {"precision": 0.91, "recall": 0.88, "f1": 0.895,
                 "r_value": 0.9012, "hit_rate": 1.0}
    assert mod._parse_metrics("no metrics here\n") is None
    # a trailing chatter line that MENTIONS hit_rate (with parseable pairs)
    # must not shadow the real dict line above it — `A and (B or C)`, not
    # `(A and B) or C` (round-4 review finding)
    noisy = out + "note: 'hit_rate': 0.0 computed over the full corpus\n"
    assert mod._parse_metrics(noisy)["hit_rate"] == 1.0


def test_asset_gates_refuses_without_assets():
    """The runbook must exit with a clear message (not a traceback) when the
    asset env vars are missing."""
    env = dict(os.environ)
    env.pop("WCA_CHECKPOINT", None)
    r = subprocess.run([sys.executable, "scripts/asset_gates.py"], cwd=REPO,
                       env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "WCA_CHECKPOINT is not set" in (r.stderr + r.stdout)
    assert "Traceback" not in r.stderr


@pytest.mark.slow
def test_bench_probe_tiny_prints_one_json_line():
    r = _run([sys.executable, "scripts/bench_probe.py"],
             {"WCA_PROBE_TINY": "1", "WCA_PROBE_PASSES": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "probe_oracle_utts_per_sec_per_chip"
    assert payload["value"] > 0 and 0.0 <= payload["hit_rate"] <= 1.0


def test_bench_backend_init_retry_reexecs(monkeypatch):
    """A transiently UNAVAILABLE backend (observed: the axon tunnel after a
    heavy session) must not cost the round its BENCH artifact: the first
    device touch re-execs the process with a decremented retry budget
    (a failed plugin init is cached in-process, so looping won't do), and
    raises once the budget is spent."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon'")

    calls = []
    monkeypatch.setattr(bench.jax, "devices", boom)
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.append(("sleep", s)))
    monkeypatch.setattr(
        bench.os, "execve",
        lambda exe, argv, env: calls.append(("execve", env)) or (_ for _ in ())
        .throw(SystemExit(0)))
    monkeypatch.setenv("WCA_BENCH_INIT_RETRIES", "2")
    monkeypatch.setenv("WCA_BENCH_INIT_RETRY_S", "7")
    with pytest.raises(SystemExit):
        bench._devices_with_retry()
    assert calls[0] == ("sleep", 7.0)
    assert calls[1][0] == "execve"
    assert calls[1][1]["WCA_BENCH_INIT_RETRIES"] == "1"
    # budget spent -> the failure propagates
    monkeypatch.setenv("WCA_BENCH_INIT_RETRIES", "0")
    with pytest.raises(RuntimeError, match="axon"):
        bench._devices_with_retry()
