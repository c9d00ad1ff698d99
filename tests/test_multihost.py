"""2-process multi-host sweep: `infer_ali --multihost` on a local jax.distributed
CPU cluster must reproduce the single-process metrics exactly.

Each process aligns its round-robin shard of the scp on its own local device
mesh; tp/fp/fn counters are all-reduced at the end (SURVEY.md §2c). Per-utterance
results are batch-composition-independent (masked fixed shapes), so the combined
counters must equal a single-process run over the full corpus bit-for-bit.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from whisper_char_alignment_tpu.data.synthetic import make_timit_corpus

pytestmark = pytest.mark.slow  # heavy integration: excluded from the fast tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cli_argv(scp, out_dir, extra=()):
    return [sys.executable, "-m", "whisper_char_alignment_tpu.cli.infer_ali",
            "--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
            "--aggr", "topk", "--topk", "3", "--aligned_unit_type", "char",
            "--strict", "--tolerance", "0.05", "--medfilt_width", "3",
            "--batch_size", "2", "--test_model", *extra]


def _subproc_env(n_local_devices: int = 2):
    env = dict(os.environ)
    env["WCA_PLATFORM"] = "cpu"
    # keep the collective terminate timeout raised on every CPU-mesh entry
    # point (CLAUDE.md invariant): XLA:CPU LOG(FATAL)s the process when a
    # rendezvous participant is >40 s late, reachable by scheduling
    # starvation alone on this 1-core host
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _read_metrics(out_dir):
    jsons = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    assert len(jsons) == 1, jsons
    with open(os.path.join(out_dir, jsons[0])) as f:
        blob = json.load(f)
    return {k: blob[k] for k in ("precision", "recall", "f1", "r_value")}



def _run_two_process(argv_fn, scp, env, tmp_path, extra=(), attempts=2):
    """Launch the 2-process jax.distributed run; one retry — the local
    rendezvous is load-sensitive on this single-core host (observed failing
    only when the whole suite and a device benchmark run concurrently;
    always passes in isolation). Returns the output dir of the good run."""
    multi_dir = None
    for attempt in range(attempts):
        multi_dir = str(tmp_path / f"multi{attempt}")
        os.makedirs(multi_dir)
        port = _free_port()
        procs = []
        for pid in range(2):
            flags = ["--multihost", "--coordinator_address",
                     f"localhost:{port}", "--num_processes", "2",
                     "--process_id", str(pid), *extra]
            procs.append(subprocess.Popen(argv_fn(scp, multi_dir, flags),
                                          env=env, stdout=subprocess.PIPE,
                                          stderr=subprocess.PIPE, text=True))
        outs = [p.communicate(timeout=600) for p in procs]
        if all(p.returncode == 0 for p in procs):
            return multi_dir
        if attempt == attempts - 1:
            for p, (out, err) in zip(procs, outs):
                assert p.returncode == 0, err[-3000:]
    return multi_dir


def test_two_process_sweep_matches_single_process(tmp_path):
    scp = make_timit_corpus(str(tmp_path / "corpus"), n_utts=6,
                            seconds=(0.8, 1.4), words_per_utt=(3, 5), seed=0)
    env = _subproc_env()

    single_dir = str(tmp_path / "single")
    os.makedirs(single_dir)
    r = subprocess.run(_cli_argv(scp, single_dir), env=env, timeout=600,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-3000:]

    multi_dir = _run_two_process(_cli_argv, scp, env, tmp_path,
                                 extra=["--save_prediction"])

    # only process 0 dumps the results JSON, holding the all-reduced counters
    assert _read_metrics(multi_dir) == _read_metrics(single_dir)
    # every process saves its scp shard; together they cover the corpus
    import joblib
    shards = sorted(f for f in os.listdir(multi_dir)
                    if f.endswith((".pkl",)) and "-p" in f)
    assert len(shards) == 2, os.listdir(multi_dir)
    fids = set()
    for f in shards:
        data = joblib.load(os.path.join(multi_dir, f))
        rows = data.values() if isinstance(data, dict) else data
        fids |= {r["fids"] for r in rows if r}
    assert len(fids) == 6, fids


def test_two_process_data_tensor_mesh_matches_single_process(tmp_path):
    """VERDICT r04 #8: 2 processes x a (2 data x 2 model) LOCAL mesh each —
    multihost scp sharding combined with per-process data+tensor parallelism,
    a geometry no prior test exercised. Metrics must equal the plain
    single-process run bit-for-bit (per-utterance results are
    batch-composition- and sharding-independent)."""
    scp = make_timit_corpus(str(tmp_path / "corpus"), n_utts=6,
                            seconds=(0.8, 1.4), words_per_utt=(3, 5), seed=0)
    env = _subproc_env(n_local_devices=4)

    single_dir = str(tmp_path / "single")
    os.makedirs(single_dir)
    r = subprocess.run(_cli_argv(scp, single_dir), env=env, timeout=600,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-3000:]

    multi_dir = _run_two_process(
        _cli_argv, scp, env, tmp_path,
        extra=["--data_parallel", "2", "--tensor_parallel", "2"])

    assert _read_metrics(multi_dir) == _read_metrics(single_dir)


def _probe_argv(scp, out_dir, extra=()):
    return [sys.executable, "-m", "whisper_char_alignment_tpu.cli.probe_oracle",
            "--dataset", "TIMIT", "--scp", scp, "--output_dir", out_dir,
            "--aligned_unit_type", "char", "--strict", "--tolerance", "0.05",
            "--medfilt_width", "3", "--hit_within", "2", "--test_model",
            *extra]


def _read_probe_metrics(out_dir):
    jsons = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    assert len(jsons) == 1, jsons
    with open(os.path.join(out_dir, jsons[0])) as f:
        blob = json.load(f)
    return {k: blob[k] for k in ("precision", "recall", "f1", "r_value",
                                 "hit_rate")}


def test_two_process_probe_oracle_matches_single_process(tmp_path):
    """probe_oracle --multihost: sharded sweep reproduces the single-process
    metrics, including the reference-faithful full-corpus hit_rate denominator."""
    from tests.test_probe_and_plot import make_long_corpus

    scp = make_long_corpus(str(tmp_path / "corpus"), n_utts=4)
    env = _subproc_env()

    single_dir = str(tmp_path / "single")
    os.makedirs(single_dir)
    r = subprocess.run(_probe_argv(scp, single_dir), env=env, timeout=600,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-3000:]

    multi_dir = _run_two_process(_probe_argv, scp, env, tmp_path)

    assert _read_probe_metrics(multi_dir) == _read_probe_metrics(single_dir)


def test_broadcast_scalar_keeps_second_precision(tmp_path):
    """Round-4 review: broadcast_scalar wrapped the value in jnp.float64,
    which silently downcasts to float32 under the default x64-disabled
    config — a unix timestamp quantized to a ~128 s grid, so two multihost
    runs in the same bucket shared an output stem and the second OVERWROTE
    the first's metrics/predictions. The value now rides as split int32
    words: exact to the millisecond."""
    env = _subproc_env()
    # one retry: the local jax.distributed rendezvous is load-sensitive on
    # this single-core host (same mitigation as _run_two_process — observed
    # timing out only when the whole suite runs concurrently)
    for attempt in range(2):
        port = _free_port()
        script = (
            "import sys\n"
            # force CPU before ANY device use: two bare processes would
            # otherwise both grab the axon TPU tunnel and deadlock (the CLI
            # path honors WCA_PLATFORM via common.force_platform; a -c
            # script must do it itself)
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from whisper_char_alignment_tpu.parallel import distributed\n"
            "distributed.initialize('localhost:%d', 2, int(sys.argv[1]))\n"
            "v = distributed.broadcast_scalar(1755443211.789)\n"
            "print('GOT %%.3f' %% v)\n" % port)
        procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                                  env=env, stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, text=True)
                 for pid in range(2)]
        try:
            outs = [p.communicate(timeout=300) for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            if attempt == 0:
                continue
            raise
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        assert "GOT 1755443211.789" in out, out
