"""Numerical parity of the JAX Whisper vs a random-weight HF torch Whisper.

The published HF implementation computes the same math as openai-whisper (same
architecture, scaling, masking); a random tiny model checked at <=1e-4 tolerance
validates our forward + converter without needing real weights (none are available
offline — SURVEY.md §4 test strategy)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from whisper_char_alignment_tpu.models import convert, whisper as wmodel

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.WhisperConfig(
        vocab_size=213,
        num_mel_bins=80,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=3,
        decoder_attention_heads=2,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=48,
        max_target_positions=24,
        attention_dropout=0.0,
        dropout=0.0,
        activation_dropout=0.0,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
    )
    cfg._attn_implementation = "eager"  # needed for output_attentions=True
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    params, dims = convert.from_hf_model(hf_model)
    return jax.tree.map(jnp.asarray, params), dims


@pytest.fixture(scope="module")
def sample_inputs(hf_model):
    rng = np.random.default_rng(0)
    cfg = hf_model.config
    mel = rng.normal(0, 1, (2, cfg.num_mel_bins,
                            2 * cfg.max_source_positions)).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, (2, 11)).astype(np.int32)
    return mel, tokens


def test_encoder_parity(hf_model, converted, sample_inputs):
    mel, _ = sample_inputs
    params, dims = converted
    with torch.no_grad():
        expect = hf_model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(wmodel.encode_audio(params, dims, jnp.asarray(mel)))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_teacher_forced_logits_and_cross_attention_parity(
        hf_model, converted, sample_inputs):
    mel, tokens = sample_inputs
    params, dims = converted
    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
            output_attentions=True,
        )
    logits_t = out.logits.numpy()
    cross_t = np.stack([a.numpy() for a in out.cross_attentions])  # (L,B,H,T,S)

    logits_j, qk = wmodel.forward(params, dims, jnp.asarray(mel),
                                  jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-4)
    # our qk is pre-softmax; HF reports post-softmax probabilities
    probs_j = np.asarray(jax.nn.softmax(qk, axis=-1))
    np.testing.assert_allclose(probs_j, cross_t, atol=1e-5)


def test_qk_matches_hand_numpy_computation(converted, sample_inputs):
    """QK parity against an independent numpy computation of layer-0's cross
    attention logits (validates the *pre*-softmax quantity the pipeline filters)."""
    mel, tokens = sample_inputs
    params, dims = converted
    xa = np.asarray(wmodel.encode_audio(params, dims, jnp.asarray(mel)))
    _, qk = wmodel.forward(params, dims, jnp.asarray(mel), jnp.asarray(tokens))
    qk0 = np.asarray(qk)[0]  # (B, H, T, F)

    p = jax.tree.map(np.asarray, params)
    blk = jax.tree.map(lambda x: x[0], p["decoder"]["blocks"])
    t = tokens.shape[1]
    x = p["decoder"]["tok_emb"][tokens] + p["decoder"]["pos_emb"][:t]

    def ln(pp, v):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * pp["scale"] + pp["bias"]

    # self-attention sublayer (causal)
    h = ln(blk["attn_ln"], x)
    n_head = dims.n_text_head
    hd = dims.n_text_state // n_head
    scale = hd ** -0.25

    def split(v):
        return v.reshape(v.shape[0], v.shape[1], n_head, hd).transpose(0, 2, 1, 3)

    q = split(h @ blk["attn"]["q"]["w"] + blk["attn"]["q"]["b"]) * scale
    k = split(h @ blk["attn"]["k"]["w"]) * scale
    v = split(h @ blk["attn"]["v"]["w"] + blk["attn"]["v"]["b"])
    sqk = np.einsum("bhtd,bhsd->bhts", q, k)
    sqk = sqk + np.triu(np.full((t, t), -np.inf), k=1)
    w = np.exp(sqk - sqk.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    a = np.einsum("bhts,bhsd->bhtd", w, v).transpose(0, 2, 1, 3).reshape(x.shape)
    x = x + (a @ blk["attn"]["out"]["w"] + blk["attn"]["out"]["b"])

    # cross-attention qk
    h = ln(blk["cross_attn_ln"], x)
    q = split(h @ blk["cross_attn"]["q"]["w"] + blk["cross_attn"]["q"]["b"]) * scale
    k = split(xa @ blk["cross_attn"]["k"]["w"]) * scale
    qk_hand = np.einsum("bhtd,bhsd->bhts", q, k)
    np.testing.assert_allclose(qk0, qk_hand, atol=1e-4)


def _openai_state_dict(p, dims):
    """Assemble an OpenAI-whisper-layout state dict from our params."""
    sd = {}

    def put_dense(prefix, d):
        sd[f"{prefix}.weight"] = d["w"].T
        if "b" in d:
            sd[f"{prefix}.bias"] = d["b"]

    def put_ln(prefix, d):
        sd[f"{prefix}.weight"] = d["scale"]
        sd[f"{prefix}.bias"] = d["bias"]

    sd["encoder.conv1.weight"] = p["encoder"]["conv1"]["w"]
    sd["encoder.conv1.bias"] = p["encoder"]["conv1"]["b"]
    sd["encoder.conv2.weight"] = p["encoder"]["conv2"]["w"]
    sd["encoder.conv2.bias"] = p["encoder"]["conv2"]["b"]
    sd["encoder.positional_embedding"] = p["encoder"]["pos_emb"]
    for i in range(dims.n_audio_layer):
        blk = jax.tree.map(lambda x: x[i], p["encoder"]["blocks"])
        put_ln(f"encoder.blocks.{i}.attn_ln", blk["attn_ln"])
        for name, ours in [("query", "q"), ("key", "k"), ("value", "v"), ("out", "out")]:
            put_dense(f"encoder.blocks.{i}.attn.{name}", blk["attn"][ours])
        put_ln(f"encoder.blocks.{i}.mlp_ln", blk["mlp_ln"])
        put_dense(f"encoder.blocks.{i}.mlp.0", blk["mlp"]["fc1"])
        put_dense(f"encoder.blocks.{i}.mlp.2", blk["mlp"]["fc2"])
    put_ln("encoder.ln_post", p["encoder"]["ln_post"])
    sd["decoder.token_embedding.weight"] = p["decoder"]["tok_emb"]
    sd["decoder.positional_embedding"] = p["decoder"]["pos_emb"]
    for i in range(dims.n_text_layer):
        blk = jax.tree.map(lambda x: x[i], p["decoder"]["blocks"])
        put_ln(f"decoder.blocks.{i}.attn_ln", blk["attn_ln"])
        for name, ours in [("query", "q"), ("key", "k"), ("value", "v"), ("out", "out")]:
            put_dense(f"decoder.blocks.{i}.attn.{name}", blk["attn"][ours])
        put_ln(f"decoder.blocks.{i}.cross_attn_ln", blk["cross_attn_ln"])
        for name, ours in [("query", "q"), ("key", "k"), ("value", "v"), ("out", "out")]:
            put_dense(f"decoder.blocks.{i}.cross_attn.{name}", blk["cross_attn"][ours])
        put_ln(f"decoder.blocks.{i}.mlp_ln", blk["mlp_ln"])
        put_dense(f"decoder.blocks.{i}.mlp.0", blk["mlp"]["fc1"])
        put_dense(f"decoder.blocks.{i}.mlp.2", blk["mlp"]["fc2"])
    put_ln("decoder.ln", p["decoder"]["ln"])
    return sd


def _assert_params_equal(a, b):
    flat_a, flat_b = convert._flatten(a), convert._flatten(b)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], atol=0, err_msg=k)


def test_openai_layout_roundtrip(converted):
    """Build an OpenAI-style state dict from our params and convert it back."""
    params, dims = converted
    p = jax.tree.map(np.asarray, params)
    back = convert.from_openai_state_dict(_openai_state_dict(p, dims), dims)
    _assert_params_equal(p, back)


def test_openai_pt_checkpoint_file_roundtrip(tmp_path, converted):
    """The actual ``.pt`` file path (reference entry: whisper.load_model at
    infer_ali.py:36): torch.save an OpenAI-style
    ``{"dims": ..., "model_state_dict": ...}`` zip-pickle of torch tensors,
    load it through load_checkpoint's dispatch, and assert both the recovered
    dims and bit-identical params vs from_openai_state_dict on the same dict."""
    import torch

    params, dims = converted
    p = jax.tree.map(np.asarray, params)
    sd_np = _openai_state_dict(p, dims)
    sd_torch = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd_np.items()}
    dims_dict = {f: getattr(dims, f)
                 for f in type(dims).__dataclass_fields__}
    path = str(tmp_path / "model.pt")
    torch.save({"dims": dims_dict, "model_state_dict": sd_torch}, path)

    loaded, loaded_dims = convert.load_checkpoint(path)
    assert loaded_dims == dims
    _assert_params_equal(convert.from_openai_state_dict(sd_np, dims), loaded)


def test_npz_roundtrip(tmp_path, converted):
    params, dims = converted
    p = jax.tree.map(np.asarray, params)
    path = str(tmp_path / "m.npz")
    convert.save_npz(path, p, dims)
    p2, dims2 = convert.load_npz(path)
    assert dims2 == dims
    flat_a, flat_b = convert._flatten(p), convert._flatten(p2)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_safetensors_roundtrip_with_shape_inference(tmp_path, hf_model, converted):
    from safetensors.numpy import save_file

    params, dims = converted
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    path = str(tmp_path / "m.safetensors")
    save_file(sd, path)
    p2, dims2 = convert.load_checkpoint(path)
    assert (dims2.n_audio_state, dims2.n_audio_layer, dims2.n_text_layer,
            dims2.n_vocab, dims2.n_mels) == (
        dims.n_audio_state, dims.n_audio_layer, dims.n_text_layer,
        dims.n_vocab, dims.n_mels)
    fa = convert._flatten(jax.tree.map(np.asarray, params))
    fb = convert._flatten(p2)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path, converted):
    params, dims = converted
    p = jax.tree.map(np.asarray, params)
    path = str(tmp_path / "ckpt")
    convert.save_orbax(path, p, dims)
    p2, dims2 = convert.load_checkpoint(path)  # directory -> orbax dispatch
    assert dims2 == dims
    fa, fb = convert._flatten(p), convert._flatten(p2)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], np.asarray(fb[k]))


def test_kv_cached_decode_matches_teacher_forced(converted, sample_inputs):
    mel, tokens = sample_inputs
    params, dims = converted
    mel_j, tok_j = jnp.asarray(mel), jnp.asarray(tokens)
    full_logits, _ = wmodel.forward(params, dims, mel_j, tok_j, return_qk=False)

    xa = wmodel.encode_audio(params, dims, mel_j)
    cross_kv = wmodel.precompute_cross_kv(params, dims, xa)
    cache = wmodel.init_kv_cache(dims, mel.shape[0], tokens.shape[1])
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, cache = wmodel.decode_step(params, dims, tok_j[:, t:t + 1],
                                       jnp.int32(t), cache, cross_kv)
        step_logits.append(np.asarray(lg))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), atol=2e-4)
