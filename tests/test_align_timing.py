"""Alignment-core parity: the batched masked device path must reproduce a NumPy
oracle that implements the reference's timing pipeline verbatim on sliced arrays
(medfilt -> softmax -> head scoring -> top-k -> col-normalized mean -> DTW -> jumps;
reference timing.py:13-114)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu import constants
from whisper_char_alignment_tpu.align import timing
from whisper_char_alignment_tpu.models import whisper as wmodel
from whisper_char_alignment_tpu.ops.dtw import dtw_np
from whisper_char_alignment_tpu.ops.medfilt import median_filter_np
from whisper_char_alignment_tpu.text import retokenize
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


# ---------------------------------------------------------------------------
# NumPy oracle (reference semantics, physical slicing)
# ---------------------------------------------------------------------------

def oracle_get_attentions(qk, max_frames, medfilt_width, qk_scale):
    w = qk[..., :max_frames]
    w = median_filter_np(w, medfilt_width)
    w = w * qk_scale
    e = np.exp(w - w.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def oracle_filter_attention(attns, topk, w_colnorm=1.0, w_rownorm=1.0,
                            w_coverage=0.0):
    n_layers, n_heads = attns.shape[:2]
    score = np.zeros((n_layers, n_heads))
    if w_colnorm > 0:
        score += w_colnorm * np.linalg.norm(attns, axis=-2).sum(-1)
    if w_rownorm > 0:
        score += w_rownorm * np.linalg.norm(attns, axis=-1).sum(-1)
    entries = []
    for l in range(n_layers):
        for h in range(n_heads):
            s = score[l, h]
            if w_coverage > 0:
                cov = attns[l, h].sum(0)
                s -= w_coverage * (np.maximum(cov, 0.5).sum() -
                                   attns.shape[-1] * 0.5)
            entries.append((float(s), (l, h)))
    entries_sorted = sorted(entries)[-topk:]
    sel = np.stack([attns[l, h] for _, (l, h) in entries_sorted])
    return sel, entries_sorted


def oracle_force_align(ws, sot_len, aggregation, topk):
    if aggregation == "mean":
        ws = ws / np.linalg.norm(ws, axis=-2, keepdims=True)
        ws = ws[ws.shape[0] // 2:]
        matrix = ws.mean(axis=(0, 1))
        sel_info = None
    else:
        sel, sel_info = oracle_filter_attention(ws, topk)
        col = np.linalg.norm(sel, axis=-2, keepdims=True)
        matrix = (sel / col).mean(axis=0)
    matrix = matrix[sot_len:-1]
    text_indices, time_indices = dtw_np(-matrix)
    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / constants.TOKENS_PER_SECOND
    return matrix, jump_times, sel_info


def _fake_utterance(rng, n_layers=3, n_heads=4, n_text=14, max_frames=90):
    """Random QK logits with a diagonal-ish structure in some heads."""
    sot_len = 3
    t = sot_len + 1 + n_text + 1
    qk = rng.normal(0, 1, (n_layers, n_heads, t, max_frames)).astype(np.float32)
    for l in range(n_layers):
        for h in range(n_heads):
            if (l + h) % 2 == 0:
                for i in range(t):
                    lo = int(i / t * max_frames)
                    qk[l, h, i, lo:lo + 8] += 3.0
    return qk, sot_len, t


@pytest.mark.parametrize("aggregation,topk", [
    pytest.param("topk", 5, marks=pytest.mark.slow), ("mean", -1)])
@pytest.mark.parametrize("medfilt_width", [3, pytest.param(7, marks=pytest.mark.slow)])
def test_batched_masked_path_equals_sliced_oracle(aggregation, topk, medfilt_width):
    rng = np.random.default_rng(0)
    qk, sot_len, t = _fake_utterance(rng)
    max_frames = qk.shape[-1]

    # oracle on physically sliced arrays
    attn_o = oracle_get_attentions(qk, max_frames, medfilt_width, 1.0)
    matrix_o, jump_times_o, sel_o = oracle_force_align(
        attn_o, sot_len, aggregation, topk)

    # ours: pad tokens to a bucket and frames to F_MAX, mask
    t_bucket, f_max = t + 6, max_frames + 40
    qk_pad = rng.normal(0, 1, (qk.shape[0], qk.shape[1], t_bucket, f_max)
                        ).astype(np.float32)  # garbage in the padding
    qk_pad[:, :, :t, :max_frames] = qk
    token_len = jnp.asarray([t], jnp.int32)
    frame_len = jnp.asarray([max_frames], jnp.int32)
    # qk_to_attention expects (B, H, T, F); apply per layer as the decoder scan does
    attn = jnp.stack([
        wmodel.qk_to_attention(jnp.asarray(qk_pad[l])[None], frame_len, token_len,
                               medfilt_width, 1.0)[0]
        for l in range(qk.shape[0])
    ])[:, None]  # (L, 1, H, T, F)

    np.testing.assert_allclose(
        np.asarray(attn)[:, 0, :, :t, :max_frames], attn_o, atol=1e-5)
    # padding must be exactly zero
    assert np.asarray(attn)[:, 0, :, t:, :].sum() == 0
    assert np.asarray(attn)[:, 0, :, :, max_frames:].sum() == 0

    jump_frames, matrix, scores = timing.force_align_batch(
        attn, token_len, frame_len, sot_len, aggregation, topk)
    n_rows = t - sot_len - 1
    jf = np.asarray(jump_frames)[0][:n_rows]
    jump_times = jf / constants.TOKENS_PER_SECOND
    np.testing.assert_allclose(jump_times, jump_times_o, atol=0)
    np.testing.assert_allclose(
        np.asarray(matrix)[0, :t, :max_frames][sot_len:-1], matrix_o, atol=1e-5)

    if aggregation == "topk":
        _, l_sel, h_sel = scores
        got_pairs = list(zip(np.asarray(l_sel)[0].tolist(),
                             np.asarray(h_sel)[0].tolist()))
        expect_pairs = [lh for _, lh in sel_o]
        assert got_pairs == expect_pairs


def test_single_utterance_force_align_wrapper():
    rng = np.random.default_rng(1)
    qk, sot_len, t = _fake_utterance(rng, n_text=10)
    tok = get_test_tokenizer()
    text = "hello world"
    text_tokens = retokenize.encode(text, tok, "char")
    # rebuild qk with the right token count for this text
    n_text = len(text_tokens)
    qk, sot_len, t = _fake_utterance(rng, n_text=n_text)
    attn_o = oracle_get_attentions(qk, qk.shape[-1], 3, 1.0)
    words, starts, ends, matrix, scores = timing.force_align(
        attn_o, text_tokens, tok, aligned_unit_type="char",
        aggregation="topk", topk=4)
    assert len(words) == len(starts) + 1  # eot group has no boundary pair
    _, jump_times_o, _ = oracle_force_align(attn_o, sot_len, "topk", 4)
    wb = np.pad(np.cumsum([len(w) for w in
                           timing.words_and_boundaries(text_tokens, tok, "char")[1][:-1]]),
                (1, 0))
    np.testing.assert_allclose(starts, jump_times_o[wb[:-1]])
    np.testing.assert_allclose(ends, jump_times_o[wb[1:]])
    assert len(scores) == 4


@pytest.mark.slow
def test_grad_norm_passthrough_aggregation():
    """'grad_norm' takes a pre-aggregated (T, F) matrix straight to DTW
    (reference timing.py:99-100)."""
    rng = np.random.default_rng(9)
    tok = get_test_tokenizer()
    text = "hi there"
    text_tokens = retokenize.encode(text, tok, "char")
    qk2, sot_len, t = _fake_utterance(rng, n_text=len(text_tokens))
    attn2 = oracle_get_attentions(qk2, qk2.shape[-1], 3, 1.0)
    ws2 = attn2 / np.linalg.norm(attn2, axis=-2, keepdims=True)
    matrix2 = ws2[ws2.shape[0] // 2:].mean(axis=(0, 1))

    w_a, s_a, e_a, _, _ = timing.force_align(
        attn2, text_tokens, tok, aligned_unit_type="char", aggregation="mean")
    w_b, s_b, e_b, _, _ = timing.force_align(
        matrix2, text_tokens, tok, aligned_unit_type="char",
        aggregation="grad_norm")
    assert w_a == w_b
    np.testing.assert_array_equal(s_a, s_b)
    np.testing.assert_array_equal(e_a, e_b)


def test_filter_attention_reference_compat():
    rng = np.random.default_rng(2)
    qk, sot_len, t = _fake_utterance(rng)
    attn = oracle_get_attentions(qk, qk.shape[-1], 3, 1.0)
    sel, scores = timing.filter_attention(attn, topk=6)
    sel_o, scores_o = oracle_filter_attention(attn, topk=6)
    assert [lh for _, lh, _ in scores] == [lh for _, lh in scores_o]
    np.testing.assert_allclose(np.concatenate(sel, 0), sel_o, atol=1e-4)


@pytest.mark.slow
def test_coverage_penalty_weight_changes_selection_consistently():
    rng = np.random.default_rng(3)
    qk, sot_len, t = _fake_utterance(rng)
    attn = oracle_get_attentions(qk, qk.shape[-1], 3, 1.0)
    sel_o, scores_o = oracle_filter_attention(attn, topk=5, w_coverage=2.0)
    a = jnp.asarray(attn)[:, None]
    frame_len = jnp.asarray([attn.shape[-1]], jnp.int32)
    s = timing.head_scores(a, frame_len, 1.0, 1.0, 2.0)
    ls, hs = timing.topk_heads(s, 5)
    got = list(zip(np.asarray(ls)[0].tolist(), np.asarray(hs)[0].tolist()))
    assert got == [lh for _, lh in scores_o]


def test_get_attentions_integration_tiny_model():
    """End-to-end device capture on a tiny random model: shapes + masking."""
    from whisper_char_alignment_tpu.config import tiny_test_dims

    dims = tiny_test_dims(n_audio_ctx=32, n_text_ctx=24)
    params = wmodel.init_params(jax.random.PRNGKey(0), dims)
    b = 2
    mel = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (b, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32))
    tokens = jnp.zeros((b, 16), jnp.int32)
    token_len = jnp.asarray([16, 10], jnp.int32)
    frame_len = jnp.asarray([32, 20], jnp.int32)
    attn, logits = timing.get_attentions(params, dims, mel, tokens, token_len,
                                         frame_len, medfilt_width=3)
    attn = np.asarray(attn)
    assert attn.shape == (dims.n_text_layer, b, dims.n_text_head, 16,
                          dims.n_audio_ctx)
    # masked regions are exactly zero
    assert attn[:, 1, :, 10:, :].sum() == 0
    assert attn[:, 1, :, :, 20:].sum() == 0
    # valid rows are proper distributions
    np.testing.assert_allclose(attn[:, 0, :, :16, :].sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(attn[:, 1, :, :10, :20].sum(-1), 1.0, atol=1e-5)


def test_default_alignment_znorm_matches_oracle():
    rng = np.random.default_rng(4)
    qk, sot_len, t = _fake_utterance(rng, n_layers=4, n_heads=2)
    attn = oracle_get_attentions(qk, qk.shape[-1], 7, 1.0)
    heads = [(2, 0), (3, 1), (1, 1)]
    sel = np.stack([attn[l, h] for l, h in heads])  # (n_sel, T, F)
    std = sel.std(axis=-2, keepdims=True)  # biased (ddof=0), like torch unbiased=False
    mean = sel.mean(axis=-2, keepdims=True)
    matrix_o = ((sel - mean) / std).mean(axis=0)

    z = timing._znorm_mean_heads(jnp.asarray(sel)[None], jnp.asarray([t], jnp.int32))
    np.testing.assert_allclose(np.asarray(z)[0], matrix_o, atol=1e-5)


@pytest.mark.parametrize("seed", [
    0, 1,  # two seeds in the fast tier; the rest are slow-tier breadth
    *(pytest.param(s, marks=pytest.mark.slow) for s in range(2, 10))])
def test_alignment_core_fuzz_vs_sliced_oracle(seed):
    """Seeded fuzz of the full batched masked alignment core against the
    verbatim-transcribed reference oracle: random layer/head/token/frame
    shapes, sot lengths, medfilt widths, qk scales, both aggregations, and
    random head-scoring weights (incl. the coverage penalty). The fixed-grid
    test above locks the recipe configs; this sweeps the config SPACE."""
    rng = np.random.default_rng(1000 + seed)
    n_layers = int(rng.integers(2, 5))
    n_heads = int(rng.integers(2, 7))
    n_text = int(rng.integers(3, 30))
    max_frames = int(rng.integers(40, 160))
    sot_len = int(rng.integers(1, 4))
    medfilt_width = int(rng.choice([3, 5, 7]))
    qk_scale = float(rng.choice([0.5, 1.0, 2.0]))
    aggregation = str(rng.choice(["mean", "topk"]))
    topk = int(rng.integers(1, n_layers * n_heads + 1))
    w_col = float(rng.choice([0.0, 0.5, 1.0]))
    w_row = float(rng.choice([0.0, 1.0, 2.0]))
    w_cov = float(rng.choice([0.0, 0.3]))
    if w_col == 0.0 and w_row == 0.0 and w_cov == 0.0:
        w_col = 1.0

    t = sot_len + 1 + n_text + 1
    qk = rng.normal(0, 1, (n_layers, n_heads, t, max_frames)).astype(np.float32)
    for l in range(n_layers):
        for h in range(n_heads):
            if (l + h) % 2 == 0:
                for i in range(t):
                    lo = int(i / t * max_frames)
                    qk[l, h, i, lo:lo + 6] += 3.0

    attn_o = oracle_get_attentions(qk, max_frames, medfilt_width, qk_scale)
    if aggregation == "mean":
        matrix_o, jump_times_o, sel_o = oracle_force_align(
            attn_o, sot_len, "mean", -1)
    else:
        sel, sel_o = oracle_filter_attention(attn_o, topk, w_col, w_row, w_cov)
        col = np.linalg.norm(sel, axis=-2, keepdims=True)
        matrix_o = (sel / col).mean(axis=0)[sot_len:-1]
        ti_o, tj_o = dtw_np(-matrix_o)
        jumps = np.pad(np.diff(ti_o), (1, 0), constant_values=1).astype(bool)
        jump_times_o = tj_o[jumps] / constants.TOKENS_PER_SECOND

    t_bucket = t + int(rng.integers(0, 9))
    f_max = max_frames + int(rng.integers(0, 50))
    qk_pad = rng.normal(0, 1, (n_layers, n_heads, t_bucket, f_max)
                        ).astype(np.float32)  # garbage in the padding
    qk_pad[:, :, :t, :max_frames] = qk
    token_len = jnp.asarray([t], jnp.int32)
    frame_len = jnp.asarray([max_frames], jnp.int32)
    attn = jnp.stack([
        wmodel.qk_to_attention(jnp.asarray(qk_pad[l])[None], frame_len,
                               token_len, medfilt_width, qk_scale)[0]
        for l in range(n_layers)
    ])[:, None]
    np.testing.assert_allclose(
        np.asarray(attn)[:, 0, :, :t, :max_frames], attn_o, atol=1e-5)

    jump_frames, matrix, scores = timing.force_align_batch(
        attn, token_len, frame_len, sot_len, aggregation, topk,
        w_colnorm=w_col, w_rownorm=w_row, w_coverage=w_cov)
    n_rows = t - sot_len - 1
    jf = np.asarray(jump_frames)[0][:n_rows]
    np.testing.assert_allclose(jf / constants.TOKENS_PER_SECOND,
                               jump_times_o, atol=0)
    np.testing.assert_allclose(
        np.asarray(matrix)[0, :t, :max_frames][sot_len:-1], matrix_o,
        atol=1e-4)
    if aggregation == "topk":
        _, l_sel, h_sel = scores
        got_pairs = list(zip(np.asarray(l_sel)[0].tolist(),
                             np.asarray(h_sel)[0].tolist()))
        assert got_pairs == [lh for _, lh in sel_o]
