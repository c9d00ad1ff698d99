"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.config import AlignConfig, tiny_test_dims
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def test_dryrun_multichip_entrypoint(eight_devices):
    """Run the driver's dryrun in a SUBPROCESS — exactly how the driver runs
    it. In-process execution inside the full suite deadlocked twice (rounds 4
    and 5) in a cross-collective rendezvous wait cycle (threads of ONE
    (4x2)-mesh execution stuck across its data-axis all-gather and model-axis
    all-reduce) that never reproduces standalone or in a fresh process —
    combination-sensitive XLA:CPU in-process collective scheduling, round-4's
    cache-disable fix notwithstanding. A fresh process has clean thread pools
    and is the artifact-relevant execution mode anyway."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the dryrun injects its own device count
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"), "8"],
        env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multichip OK" in r.stdout, r.stdout


def test_make_mesh_rejects_negative_counts(eight_devices):
    """The CLI's `--data_parallel -1` sentinel means "no data mesh" and is
    normalized to None BEFORE make_mesh; a negative count reaching make_mesh
    must raise instead of slicing devices[:-k] into a silently-smaller mesh
    (round-4 review finding: `--data_parallel -1 --tensor_parallel 2`)."""
    with pytest.raises(ValueError, match="n_data"):
        mesh_lib.make_mesh(-1)
    with pytest.raises(ValueError, match="n_data"):
        mesh_lib.make_mesh(-1, n_model=2)
    # the auto forms still work
    assert mesh_lib.make_mesh(None, n_model=2).shape["model"] == 2
    assert mesh_lib.data_size(mesh_lib.make_mesh(None)) == 8
    # oversubscription raises in BOTH branches — never a silently-smaller
    # mesh (a scaling measurement at half the requested width)
    with pytest.raises(ValueError, match="devices"):
        mesh_lib.make_mesh(16)
    with pytest.raises(ValueError, match="devices"):
        mesh_lib.make_mesh(16, n_model=2)
    with pytest.raises(ValueError, match="devices"):
        mesh_lib.make_mesh(None, n_model=16)  # data axis would infer to 0


def test_pad_batch_rounds_to_data_axis_multiple(eight_devices, tmp_path):
    """Round-4 review: _pad_batch used max(batch_size, data_size), so any
    batch_size not divisible by the mesh data size crashed at device_put
    ('dimension 0 should be divisible by N'). It must round UP to a
    data-axis multiple, and the pipeline must actually run that way."""
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=32,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(1), dims)
    # the arithmetic, across the awkward combinations
    cfg = AlignConfig.recommended(topk=2, batch_size=12)
    pipe = AlignmentPipeline(params, dims, tok, cfg,
                             mesh=mesh_lib.make_mesh(8))
    assert pipe._pad_batch(5) == 16  # 12 -> next multiple of 8
    cfg3 = AlignConfig.recommended(topk=2, batch_size=3)
    pipe3 = AlignmentPipeline(params, dims, tok, cfg3,
                              mesh=mesh_lib.make_mesh(2))
    assert pipe3._pad_batch(3) == 4
    # and the previously-crashing shape end-to-end (batch 3 on a 2-wide mesh)
    scp = make_timit_fixture(str(tmp_path), n_utts=3, seconds=0.4)
    res = list(pipe3.run_dataset(TIMIT(scp), progress=False))
    assert len(res) == 3


def test_tensor_parallel_spec_covers_int8_leaves():
    """Round-4 review: quantized encoder leaves (w8/s) were silently
    REPLICATED because the spec matched only 'w' — tensor parallelism
    measured without actually sharding the quantized encoder. w8 follows its
    float twin; the per-output-channel scale s shards with column-split
    projections and replicates for row-split ones."""
    from jax.sharding import PartitionSpec as P
    from whisper_char_alignment_tpu.models import whisper as wmodel2
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=16, n_text_ctx=16,
                          state=16, head=2, layers=2)
    params = wmodel2.quantize_encoder_int8(
        wmodel2.init_params(jax.random.PRNGKey(0), dims))
    specs = {}
    jax.tree_util.tree_map_with_path(
        lambda path, x: specs.__setitem__(
            jax.tree_util.keystr(path), mesh_lib.tensor_parallel_spec(path, x)),
        params)

    col = P(None, None, "model")
    row = P(None, "model", None)
    enc = "['encoder']['blocks']['attn']"
    assert specs[f"{enc}['q']['w8']"] == col
    assert specs[f"{enc}['q']['s']"] == col
    assert specs[f"{enc}['out']['w8']"] == row
    assert specs[f"{enc}['out']['s']"] == P()
    mlp = "['encoder']['blocks']['mlp']"
    assert specs[f"{mlp}['fc1']['w8']"] == col
    assert specs[f"{mlp}['fc1']['s']"] == col
    assert specs[f"{mlp}['fc2']['w8']"] == row
    assert specs[f"{mlp}['fc2']['s']"] == P()
    # float decoder weights keep the proven layout; biases stay replicated
    dec = "['decoder']['blocks']['attn']"
    assert specs[f"{dec}['q']['w']"] == col
    assert specs[f"{dec}['out']['w']"] == row
    assert specs[f"{enc}['q']['b']"] == P()


def test_entry_compiles_single_chip_tinyshapes(eight_devices):
    """entry() must be jittable; compile-check with tiny dims to keep CPU time
    sane (the driver compile-checks the real medium shapes on TPU)."""
    import __graft_entry__ as g
    dims = tiny_test_dims(n_vocab=128, n_audio_ctx=32, n_text_ctx=16)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    fn = g._align_fn(dims, sot_len=3, medfilt_width=3, topk=2,
                     compute_dtype=jnp.float32)
    mel = jnp.zeros((1, dims.n_mels, 2 * dims.n_audio_ctx))
    tokens = jnp.zeros((1, 12), jnp.int32)
    jf, logits = jax.jit(fn)(params, mel, tokens, jnp.asarray([12]),
                             jnp.asarray([32]))
    assert jf.shape[0] == 1 and logits.shape[:2] == (1, 12)


def test_data_parallel_alignment_matches_single_device(eight_devices):
    """Sharding the batch over a 1-D mesh must not change any result."""
    dims = tiny_test_dims(n_vocab=128, n_audio_ctx=32, n_text_ctx=24)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    b, t = 8, 12
    mel = rng.normal(0, 1, (b, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32)
    tokens = rng.integers(0, 100, (b, t)).astype(np.int32)
    token_len = np.full((b,), t, np.int32)
    frame_len = rng.integers(8, 33, (b,)).astype(np.int32)

    def run(shard):
        m = mesh_lib.make_mesh(8) if shard else None
        put = (lambda x: mesh_lib.shard_batch(x, m)) if shard else jnp.asarray
        p = mesh_lib.replicate(params, m) if shard else params
        attn, _ = timing.get_attentions(p, dims, put(jnp.asarray(mel)),
                                        put(jnp.asarray(tokens)),
                                        put(jnp.asarray(token_len)),
                                        put(jnp.asarray(frame_len)),
                                        medfilt_width=3)
        jf, matrix, _ = timing.force_align_batch(
            attn, jnp.asarray(token_len), jnp.asarray(frame_len), 3, "topk", 2)
        return np.asarray(jf), np.asarray(matrix)

    jf_s, mx_s = run(shard=False)
    jf_m, mx_m = run(shard=True)
    np.testing.assert_array_equal(jf_s, jf_m)
    np.testing.assert_allclose(mx_s, mx_m, atol=1e-5)


@pytest.mark.slow
def test_pipeline_with_mesh(eight_devices, tmp_path):
    """Full AlignmentPipeline over an 8-device mesh on a synthetic corpus."""
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp = make_timit_fixture(str(tmp_path), n_utts=3, seconds=0.5)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=32,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(1), dims)
    cfg = AlignConfig.recommended(topk=2, batch_size=3)
    mesh = mesh_lib.make_mesh(8)
    pipe = AlignmentPipeline(params, dims, tok, cfg, mesh=mesh)
    res = list(pipe.run_dataset(TIMIT(scp), progress=False))
    assert len(res) == 3
    for r in res:
        assert len(r.start_times) == len(r.end_times)


@pytest.mark.slow
def test_pipeline_tensor_parallel_matches_single_device(eight_devices, tmp_path):
    """VERDICT r03 #2: the PRODUCTION pipeline on a (4x2) (data, model) mesh —
    tensor-parallel weight layout via parallel/mesh.py::shard_params — must be
    bit-equal to the single-device pipeline on the same corpus."""
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp = make_timit_fixture(str(tmp_path), n_utts=4, seconds=0.5)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=32,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(1), dims)
    cfg = AlignConfig.recommended(topk=2, batch_size=4,
                                  use_gt_transcript=True,
                                  decode_sample_len=4)

    def run(mesh):
        pipe = AlignmentPipeline(params, dims, tok, cfg, mesh=mesh)
        return list(pipe.run_dataset(TIMIT(scp), progress=False))

    ref = run(None)
    mesh = mesh_lib.make_mesh(4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    got = run(mesh)
    assert len(got) == len(ref) == 4
    for a, b in zip(ref, got):
        assert a.fid == b.fid and a.words == b.words
        np.testing.assert_array_equal(a.start_times, b.start_times)
        np.testing.assert_array_equal(a.end_times, b.end_times)


@pytest.mark.slow
def test_pipeline_int8_tensor_parallel_matches_single_device(eight_devices,
                                                             tmp_path):
    """Round-4 review follow-through: with the w8/s PartitionSpecs in place,
    the QUANTIZED-encoder pipeline on a (4x2) (data, model) mesh must be
    bit-equal to the quantized single-device pipeline — int8 dots sharded
    over the contraction accumulate exact int32 partial sums, so the
    all-reduced result reassociates exactly (unlike floats)."""
    from tests.test_pipeline_e2e import make_timit_fixture
    from whisper_char_alignment_tpu.data.dataset import TIMIT
    from whisper_char_alignment_tpu.runner import AlignmentPipeline
    from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer

    scp = make_timit_fixture(str(tmp_path), n_utts=4, seconds=0.5)
    tok = get_test_tokenizer()
    dims = tiny_test_dims(n_vocab=tok.n_vocab, n_audio_ctx=32, n_text_ctx=32,
                          state=16, head=2, layers=2)
    params = wmodel.init_params(jax.random.PRNGKey(1), dims)
    cfg = AlignConfig.recommended(topk=2, batch_size=4,
                                  use_gt_transcript=True,
                                  decode_sample_len=4, encoder_int8=True)

    def run(mesh):
        pipe = AlignmentPipeline(params, dims, tok, cfg, mesh=mesh)
        return list(pipe.run_dataset(TIMIT(scp), progress=False))

    ref = run(None)
    got = run(mesh_lib.make_mesh(4, n_model=2))
    assert len(got) == len(ref) == 4
    for a, b in zip(ref, got):
        assert a.fid == b.fid and a.words == b.words
        np.testing.assert_array_equal(a.start_times, b.start_times)
        np.testing.assert_array_equal(a.end_times, b.end_times)


def test_cpu_mesh_disables_persistent_compile_cache(eight_devices):
    """Round-4 incident regression: multi-device XLA:CPU programs
    DESERIALIZED from the persistent cache deadlock in the in-process
    collective rendezvous (the suite died in AwaitAndLogIfStuck after the
    600 s terminate timeout; the identical programs compiled fresh pass).
    make_mesh must therefore flip the compilation cache OFF for CPU meshes —
    and conftest's autouse fixture restores it after each test, which
    test_cache_flag_restored_between_tests below asserts."""
    assert jax.config.jax_enable_compilation_cache
    mesh_lib.make_mesh(4, n_model=2)
    assert not jax.config.jax_enable_compilation_cache
    # single-device "mesh" keeps the cache (no collectives, no deadlock)
    jax.config.update("jax_enable_compilation_cache", True)
    mesh_lib.make_mesh(1)
    assert jax.config.jax_enable_compilation_cache
    mesh_lib.make_mesh(2)  # any >1-device CPU mesh flips it
    assert not jax.config.jax_enable_compilation_cache


def test_cache_flag_restored_between_tests():
    """Runs after the test above (file order): the autouse conftest fixture
    must have restored the flag so non-mesh tests keep their warm cache."""
    assert jax.config.jax_enable_compilation_cache


@pytest.mark.slow
@pytest.mark.parametrize("n_devices,model_axis", [(16, 2), (16, 4), (32, 4)])
def test_dryrun_wider_virtual_meshes(n_devices, model_axis):
    """VERDICT r04 #8: the (4x2) mesh was the only geometry ever exercised and
    round-4's own _pad_batch/make_mesh divisibility bugs hid in geometry
    assumptions. Run the full dryrun (sharded == single-device parity
    self-check included) at 16 virtual devices with both model-axis widths.
    Subprocess: --xla_force_host_platform_device_count is only read at CPU
    client creation, and this process already holds an 8-device client."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # dryrun injects its own device count
    env["WCA_DRYRUN_MODEL_AXIS"] = str(model_axis)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"),
         str(n_devices)],
        env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    n_data = n_devices // model_axis
    assert f"mesh=({n_data}x{model_axis})" in r.stdout, r.stdout
