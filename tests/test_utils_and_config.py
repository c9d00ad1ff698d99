"""Coverage for config presets, stage timers, and multi-host helpers."""

import numpy as np

from whisper_char_alignment_tpu.config import (AlignConfig, MODEL_DIMS,
                                               get_alignment_heads,
                                               set_alignment_heads)


def test_reference_argparse_defaults():
    cfg = AlignConfig()
    assert (cfg.model, cfg.aggr, cfg.topk, cfg.aligned_unit_type,
            cfg.medfilt_width, cfg.tolerance) == (
        "medium", "mean", 15, "subword", 7, 0.02)


def test_readme_recommended_recipe():
    cfg = AlignConfig.recommended()
    assert (cfg.aggr, cfg.topk, cfg.aligned_unit_type, cfg.medfilt_width,
            cfg.tolerance, cfg.strict) == ("topk", 10, "char", 3, 0.05, True)


def test_model_dims_table():
    m = MODEL_DIMS["medium"]
    assert (m.n_text_layer, m.n_text_head, m.n_text_state, m.n_vocab) == (
        24, 16, 1024, 51865)
    assert MODEL_DIMS["medium.en"].n_vocab == 51864
    assert MODEL_DIMS["large-v3"].n_mels == 128


def test_alignment_heads_published_table():
    """Every shipped model gets its published head list (reference: the decoded
    openai-whisper _ALIGNMENT_HEADS blobs, ref timing.py:156), in-bounds for its
    dims; `--default_whisper_timing` must therefore select the reference's heads."""
    for name, dims in MODEL_DIMS.items():
        heads = get_alignment_heads(name, dims)
        assert heads, name
        assert len(set(heads)) == len(heads), name
        for layer, head in heads:
            assert 0 <= layer < dims.n_text_layer, (name, layer)
            assert 0 <= head < dims.n_text_head, (name, head)
    # medium's published list, spot-checked verbatim
    assert get_alignment_heads("medium", MODEL_DIMS["medium"]) == [
        (13, 15), (15, 4), (15, 15), (16, 1), (20, 0), (23, 4)]
    assert get_alignment_heads("tiny", MODEL_DIMS["tiny"]) == [
        (2, 2), (3, 0), (3, 2), (3, 3), (3, 4), (3, 5)]


def test_alignment_heads_fallback_and_override():
    dims = MODEL_DIMS["tiny"]
    fallback = get_alignment_heads("not-a-model", dims)
    # last half of the decoder layers, all heads
    assert fallback[0] == (dims.n_text_layer // 2, 0)
    assert len(fallback) == (dims.n_text_layer - dims.n_text_layer // 2
                             ) * dims.n_text_head
    orig = get_alignment_heads("tiny", dims)
    try:
        set_alignment_heads("tiny", [(1, 2), (3, 4)])
        assert get_alignment_heads("tiny", dims) == [(1, 2), (3, 4)]
    finally:
        set_alignment_heads("tiny", orig)


def test_stage_timers():
    import time

    from whisper_char_alignment_tpu.utils.profiling import StageTimers

    t = StageTimers()
    with t.stage("a", units=4):
        time.sleep(0.01)
    with t.stage("a", units=4):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2
    assert s["a"]["total_s"] >= 0.01
    assert s["a"]["units_per_s"] > 0


def test_distributed_single_host_helpers():
    from whisper_char_alignment_tpu.parallel import distributed as dist

    dist.initialize()  # no-op single host
    entries = list(range(10))
    assert dist.shard_entries(entries, 0, 3) == [0, 3, 6, 9]
    assert dist.shard_entries(entries, 2, 3) == [2, 5, 8]
    out = dist.allreduce_counters({"tp": 3, "fp": 1})
    assert out == {"tp": 3.0, "fp": 1.0}
