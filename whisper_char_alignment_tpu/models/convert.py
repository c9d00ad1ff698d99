"""Checkpoint conversion: OpenAI whisper ``.pt`` / HF transformers -> our pytree.

Replaces the reference's ``whisper.load_model`` download-cache path
(reference: infer_ali.py:36). Sources supported:

- OpenAI checkpoint files (``{"dims": ..., "model_state_dict": ...}`` zip-pickles),
- HF ``WhisperForConditionalGeneration`` state dicts / safetensors files,
- our own ``.npz`` exports (fast re-load, no torch needed).

All linear weights are transposed from torch's (out, in) to (in, out) for the
``x @ W`` convention, and per-layer tensors are stacked along axis 0 to match the
``lax.scan`` execution layout in ``models.whisper``.
"""

from __future__ import annotations

import io
import os
from typing import Any, Dict, Tuple

import numpy as np

from ..config import ModelDims
from . import whisper as wmodel


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().float().numpy()  # torch tensor


def _dense_from_torch(sd, prefix, bias=True):
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _ln_from_torch(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _stack(dicts):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *dicts)


# ---------------------------------------------------------------------------
# OpenAI whisper state dict layout (encoder.blocks.N.attn.query. ...)
# ---------------------------------------------------------------------------

def from_openai_state_dict(sd: Dict[str, Any], dims: ModelDims) -> Dict[str, Any]:
    def attn(prefix):
        return {
            "q": _dense_from_torch(sd, f"{prefix}.query"),
            "k": _dense_from_torch(sd, f"{prefix}.key", bias=False),
            "v": _dense_from_torch(sd, f"{prefix}.value"),
            "out": _dense_from_torch(sd, f"{prefix}.out"),
        }

    def block(prefix, cross):
        b = {
            "attn_ln": _ln_from_torch(sd, f"{prefix}.attn_ln"),
            "attn": attn(f"{prefix}.attn"),
            "mlp_ln": _ln_from_torch(sd, f"{prefix}.mlp_ln"),
            "mlp": {
                "fc1": _dense_from_torch(sd, f"{prefix}.mlp.0"),
                "fc2": _dense_from_torch(sd, f"{prefix}.mlp.2"),
            },
        }
        if cross:
            b["cross_attn_ln"] = _ln_from_torch(sd, f"{prefix}.cross_attn_ln")
            b["cross_attn"] = attn(f"{prefix}.cross_attn")
        return b

    if "encoder.positional_embedding" in sd:
        enc_pos = _np(sd["encoder.positional_embedding"])
    else:
        enc_pos = wmodel.sinusoids(dims.n_audio_ctx, dims.n_audio_state)

    params = {
        "encoder": {
            "conv1": {"w": _np(sd["encoder.conv1.weight"]),
                      "b": _np(sd["encoder.conv1.bias"])},
            "conv2": {"w": _np(sd["encoder.conv2.weight"]),
                      "b": _np(sd["encoder.conv2.bias"])},
            "pos_emb": enc_pos,
            "blocks": _stack([block(f"encoder.blocks.{i}", False)
                              for i in range(dims.n_audio_layer)]),
            "ln_post": _ln_from_torch(sd, "encoder.ln_post"),
        },
        "decoder": {
            "tok_emb": _np(sd["decoder.token_embedding.weight"]),
            "pos_emb": _np(sd["decoder.positional_embedding"]),
            "blocks": _stack([block(f"decoder.blocks.{i}", True)
                              for i in range(dims.n_text_layer)]),
            "ln": _ln_from_torch(sd, "decoder.ln"),
        },
    }
    return params


def load_openai_checkpoint(path: str) -> Tuple[Dict[str, Any], ModelDims]:
    """Load an OpenAI whisper ``.pt`` checkpoint (requires torch for unpickling)."""
    import torch

    with open(path, "rb") as f:
        ckpt = torch.load(io.BytesIO(f.read()), map_location="cpu",
                          weights_only=False)
    d = ckpt["dims"]
    dims = ModelDims(**{k: d[k] for k in ModelDims.__dataclass_fields__})
    return from_openai_state_dict(ckpt["model_state_dict"], dims), dims


def to_openai_state_dict(params: Dict[str, Any],
                         dims: ModelDims) -> Dict[str, np.ndarray]:
    """Inverse of :func:`from_openai_state_dict`: our pytree -> an
    OpenAI-whisper-layout flat state dict (numpy, torch (out, in) weight
    convention, per-layer keys unstacked). Used to EXPORT checkpoints in the
    published ``.pt`` layout — and by the offline asset-day rehearsal, which
    serializes a random model in the real format and reloads it through
    load_checkpoint (the exact path real weights will take)."""
    import jax

    sd: Dict[str, np.ndarray] = {}

    def put_dense(prefix, d):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(d["w"]).T)
        if "b" in d:
            sd[f"{prefix}.bias"] = np.asarray(d["b"])

    def put_ln(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["scale"])
        sd[f"{prefix}.bias"] = np.asarray(d["bias"])

    def put_attn(prefix, a):
        for name, ours in (("query", "q"), ("key", "k"), ("value", "v"),
                           ("out", "out")):
            put_dense(f"{prefix}.{name}", a[ours])

    enc, dec = params["encoder"], params["decoder"]
    sd["encoder.conv1.weight"] = np.asarray(enc["conv1"]["w"])
    sd["encoder.conv1.bias"] = np.asarray(enc["conv1"]["b"])
    sd["encoder.conv2.weight"] = np.asarray(enc["conv2"]["w"])
    sd["encoder.conv2.bias"] = np.asarray(enc["conv2"]["b"])
    sd["encoder.positional_embedding"] = np.asarray(enc["pos_emb"])
    for i in range(dims.n_audio_layer):
        blk = jax.tree.map(lambda x: np.asarray(x)[i], enc["blocks"])
        put_ln(f"encoder.blocks.{i}.attn_ln", blk["attn_ln"])
        put_attn(f"encoder.blocks.{i}.attn", blk["attn"])
        put_ln(f"encoder.blocks.{i}.mlp_ln", blk["mlp_ln"])
        put_dense(f"encoder.blocks.{i}.mlp.0", blk["mlp"]["fc1"])
        put_dense(f"encoder.blocks.{i}.mlp.2", blk["mlp"]["fc2"])
    put_ln("encoder.ln_post", enc["ln_post"])
    sd["decoder.token_embedding.weight"] = np.asarray(dec["tok_emb"])
    sd["decoder.positional_embedding"] = np.asarray(dec["pos_emb"])
    for i in range(dims.n_text_layer):
        blk = jax.tree.map(lambda x: np.asarray(x)[i], dec["blocks"])
        put_ln(f"decoder.blocks.{i}.attn_ln", blk["attn_ln"])
        put_attn(f"decoder.blocks.{i}.attn", blk["attn"])
        put_ln(f"decoder.blocks.{i}.cross_attn_ln", blk["cross_attn_ln"])
        put_attn(f"decoder.blocks.{i}.cross_attn", blk["cross_attn"])
        put_ln(f"decoder.blocks.{i}.mlp_ln", blk["mlp_ln"])
        put_dense(f"decoder.blocks.{i}.mlp.0", blk["mlp"]["fc1"])
        put_dense(f"decoder.blocks.{i}.mlp.2", blk["mlp"]["fc2"])
    put_ln("decoder.ln", dec["ln"])
    return sd


def save_openai_pt(path: str, params: Dict[str, Any], dims: ModelDims) -> None:
    """Write the published OpenAI checkpoint format: a torch zip-pickle of
    ``{"dims": {...}, "model_state_dict": {tensors}}`` (what whisper.load_model
    reads, reference infer_ali.py:36)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_openai_state_dict(params, dims).items()}
    dims_dict = {f: getattr(dims, f) for f in ModelDims.__dataclass_fields__}
    torch.save({"dims": dims_dict, "model_state_dict": sd}, path)


# ---------------------------------------------------------------------------
# HF transformers WhisperForConditionalGeneration layout
# ---------------------------------------------------------------------------

def dims_from_hf_config(cfg) -> ModelDims:
    return ModelDims(
        n_mels=cfg.num_mel_bins,
        n_audio_ctx=cfg.max_source_positions,
        n_audio_state=cfg.d_model,
        n_audio_head=cfg.encoder_attention_heads,
        n_audio_layer=cfg.encoder_layers,
        n_vocab=cfg.vocab_size,
        n_text_ctx=cfg.max_target_positions,
        n_text_state=cfg.d_model,
        n_text_head=cfg.decoder_attention_heads,
        n_text_layer=cfg.decoder_layers,
    )


def from_hf_state_dict(sd: Dict[str, Any], dims: ModelDims) -> Dict[str, Any]:
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def attn(prefix):
        return {
            "q": _dense_from_torch(sd, f"{prefix}.q_proj"),
            "k": _dense_from_torch(sd, f"{prefix}.k_proj", bias=False),
            "v": _dense_from_torch(sd, f"{prefix}.v_proj"),
            "out": _dense_from_torch(sd, f"{prefix}.out_proj"),
        }

    def block(prefix, cross):
        b = {
            "attn_ln": _ln_from_torch(sd, f"{prefix}.self_attn_layer_norm"),
            "attn": attn(f"{prefix}.self_attn"),
            "mlp_ln": _ln_from_torch(sd, f"{prefix}.final_layer_norm"),
            "mlp": {
                "fc1": _dense_from_torch(sd, f"{prefix}.fc1"),
                "fc2": _dense_from_torch(sd, f"{prefix}.fc2"),
            },
        }
        if cross:
            b["cross_attn_ln"] = _ln_from_torch(sd, f"{prefix}.encoder_attn_layer_norm")
            b["cross_attn"] = attn(f"{prefix}.encoder_attn")
        return b

    return {
        "encoder": {
            "conv1": {"w": _np(sd[f"{pre}encoder.conv1.weight"]),
                      "b": _np(sd[f"{pre}encoder.conv1.bias"])},
            "conv2": {"w": _np(sd[f"{pre}encoder.conv2.weight"]),
                      "b": _np(sd[f"{pre}encoder.conv2.bias"])},
            "pos_emb": _np(sd[f"{pre}encoder.embed_positions.weight"]),
            "blocks": _stack([block(f"{pre}encoder.layers.{i}", False)
                              for i in range(dims.n_audio_layer)]),
            "ln_post": _ln_from_torch(sd, f"{pre}encoder.layer_norm"),
        },
        "decoder": {
            "tok_emb": _np(sd[f"{pre}decoder.embed_tokens.weight"]),
            "pos_emb": _np(sd[f"{pre}decoder.embed_positions.weight"]),
            "blocks": _stack([block(f"{pre}decoder.layers.{i}", True)
                              for i in range(dims.n_text_layer)]),
            "ln": _ln_from_torch(sd, f"{pre}decoder.layer_norm"),
        },
    }


def to_hf_state_dict(params: Dict[str, Any],
                     dims: ModelDims) -> Dict[str, np.ndarray]:
    """Inverse of :func:`from_hf_state_dict`: our pytree -> an HF
    ``WhisperForConditionalGeneration``-layout flat state dict (with the
    ``model.`` prefix; ``proj_out`` is tied to the token embedding, as in the
    published HF models, so no separate head tensor is written). Feeds both
    the safetensors export and the asset-day rehearsal's torch twin."""
    import jax

    sd: Dict[str, np.ndarray] = {}

    def put_dense(prefix, d):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(d["w"]).T)
        if "b" in d:
            sd[f"{prefix}.bias"] = np.asarray(d["b"])

    def put_ln(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["scale"])
        sd[f"{prefix}.bias"] = np.asarray(d["bias"])

    def put_attn(prefix, a):
        for name, ours in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                           ("out_proj", "out")):
            put_dense(f"{prefix}.{name}", a[ours])

    enc, dec = params["encoder"], params["decoder"]
    sd["model.encoder.conv1.weight"] = np.asarray(enc["conv1"]["w"])
    sd["model.encoder.conv1.bias"] = np.asarray(enc["conv1"]["b"])
    sd["model.encoder.conv2.weight"] = np.asarray(enc["conv2"]["w"])
    sd["model.encoder.conv2.bias"] = np.asarray(enc["conv2"]["b"])
    sd["model.encoder.embed_positions.weight"] = np.asarray(enc["pos_emb"])
    for i in range(dims.n_audio_layer):
        blk = jax.tree.map(lambda x: np.asarray(x)[i], enc["blocks"])
        p = f"model.encoder.layers.{i}"
        put_ln(f"{p}.self_attn_layer_norm", blk["attn_ln"])
        put_attn(f"{p}.self_attn", blk["attn"])
        put_ln(f"{p}.final_layer_norm", blk["mlp_ln"])
        put_dense(f"{p}.fc1", blk["mlp"]["fc1"])
        put_dense(f"{p}.fc2", blk["mlp"]["fc2"])
    put_ln("model.encoder.layer_norm", enc["ln_post"])
    sd["model.decoder.embed_tokens.weight"] = np.asarray(dec["tok_emb"])
    sd["model.decoder.embed_positions.weight"] = np.asarray(dec["pos_emb"])
    for i in range(dims.n_text_layer):
        blk = jax.tree.map(lambda x: np.asarray(x)[i], dec["blocks"])
        p = f"model.decoder.layers.{i}"
        put_ln(f"{p}.self_attn_layer_norm", blk["attn_ln"])
        put_attn(f"{p}.self_attn", blk["attn"])
        put_ln(f"{p}.encoder_attn_layer_norm", blk["cross_attn_ln"])
        put_attn(f"{p}.encoder_attn", blk["cross_attn"])
        put_ln(f"{p}.final_layer_norm", blk["mlp_ln"])
        put_dense(f"{p}.fc1", blk["mlp"]["fc1"])
        put_dense(f"{p}.fc2", blk["mlp"]["fc2"])
    put_ln("model.decoder.layer_norm", dec["ln"])
    return sd


def save_hf_safetensors(path: str, params: Dict[str, Any],
                        dims: ModelDims) -> None:
    """Write the HF safetensors layout load_checkpoint's ``.safetensors``
    dispatch reads (dims re-inferred from shapes on load)."""
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in to_hf_state_dict(params, dims).items()}, path)


def from_hf_model(model) -> Tuple[Dict[str, Any], ModelDims]:
    dims = dims_from_hf_config(model.config)
    return from_hf_state_dict(dict(model.state_dict()), dims), dims


def load_safetensors(path: str, dims: ModelDims) -> Dict[str, Any]:
    """Load an HF-layout safetensors file (no torch required)."""
    from safetensors.numpy import load_file

    return from_hf_state_dict(load_file(path), dims)


def dims_from_hf_shapes(sd: Dict[str, Any]) -> ModelDims:
    """Infer ModelDims from an HF-layout state dict's tensor shapes.

    Head counts are not derivable from shapes alone; they come from the published
    size table (unique per (d_model, n_layers))."""
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    tok_emb = sd[f"{pre}decoder.embed_tokens.weight"]
    n_vocab, d_model = tok_emb.shape
    n_mels = sd[f"{pre}encoder.conv1.weight"].shape[1]
    li = 3 if pre else 2  # ["model",] "encoder", "layers", "<idx>", ...
    enc_layers = len({k.split(".")[li] for k in sd
                      if k.startswith(f"{pre}encoder.layers.")})
    dec_layers = len({k.split(".")[li] for k in sd
                      if k.startswith(f"{pre}decoder.layers.")})
    n_audio_ctx = sd[f"{pre}encoder.embed_positions.weight"].shape[0]
    n_text_ctx = sd[f"{pre}decoder.embed_positions.weight"].shape[0]
    from ..config import MODEL_DIMS

    for d in MODEL_DIMS.values():
        if (d.n_audio_state, d.n_audio_layer, d.n_text_layer) == (
                d_model, enc_layers, dec_layers):
            n_head = d.n_audio_head
            break
    else:
        n_head = max(1, d_model // 64)  # whisper uses 64-dim heads throughout
    return ModelDims(n_mels=n_mels, n_audio_ctx=n_audio_ctx,
                     n_audio_state=d_model, n_audio_head=n_head,
                     n_audio_layer=enc_layers, n_vocab=n_vocab,
                     n_text_ctx=n_text_ctx, n_text_state=d_model,
                     n_text_head=n_head, n_text_layer=dec_layers)


# ---------------------------------------------------------------------------
# npz round-trip (our own fast format)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz(path: str, params: Dict[str, Any], dims: ModelDims) -> None:
    flat = _flatten(params)
    flat["__dims__"] = np.array(
        [getattr(dims, f) for f in ModelDims.__dataclass_fields__], np.int64)
    np.savez(path, **flat)


def load_npz(path: str) -> Tuple[Dict[str, Any], ModelDims]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    dims_vec = flat.pop("__dims__")
    dims = ModelDims(*[int(x) for x in dims_vec])
    return _unflatten(flat), dims


# ---------------------------------------------------------------------------
# Orbax (directory checkpoints; useful on multi-host / GCS)
# ---------------------------------------------------------------------------

def save_orbax(path: str, params: Dict[str, Any], dims: ModelDims) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"params": params,
               "dims": {f: getattr(dims, f) for f in ModelDims.__dataclass_fields__}}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def load_orbax(path: str) -> Tuple[Dict[str, Any], ModelDims]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(path)
    dims = ModelDims(**{k: int(v) for k, v in payload["dims"].items()})
    return payload["params"], dims


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], ModelDims]:
    """Dispatch: .pt (OpenAI), .npz (ours), .safetensors (HF), dir (Orbax)."""
    if os.path.isdir(path):
        return load_orbax(path)
    ext = os.path.splitext(path)[1]
    if ext == ".pt":
        return load_openai_checkpoint(path)
    if ext == ".npz":
        return load_npz(path)
    if ext == ".safetensors":
        from safetensors.numpy import load_file

        sd = load_file(path)
        dims = dims_from_hf_shapes(sd)
        return from_hf_state_dict(sd, dims), dims
    raise ValueError(f"unsupported checkpoint format: {path}")
