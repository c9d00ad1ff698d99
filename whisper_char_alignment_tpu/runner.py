"""Batched alignment runner: the replacement for the reference's per-utterance loop.

One batch = one device launch per stage: batched mel frontend, batched greedy
decode, batched teacher-forced QK capture + head selection + DTW (a single jitted
program), with only O(words) host bookkeeping between stages (reference: the serial
loop at infer_ali.py:57-132). Data-parallel over a 1-D device mesh: inputs are
sharded on the batch axis, parameters replicated; this is the >=20x throughput
lever identified in SURVEY.md §7 step 7.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import constants
from .align import timing
from .models import whisper as wmodel_mod
from .audio.mel import log_mel_spectrogram
from .config import AlignConfig, ModelDims, get_alignment_heads
from .data.dataset import Utterance, batch_iter
from .models import decoding
from .parallel import mesh as mesh_lib
from .text import retokenize
from .utils.profiling import StageTimers


@dataclasses.dataclass
class UttAlignment:
    fid: str
    words: List[str]
    start_times: np.ndarray
    end_times: np.ndarray
    transcription: str
    text: str  # normalized ground-truth text
    starts: List[float]
    ends: List[float]
    matrix: Optional[np.ndarray] = None
    scores: Optional[list] = None
    word_probabilities: Optional[List[float]] = None
    skipped: bool = False


@functools.partial(jax.jit, static_argnames=(
    "dims", "medfilt_width", "aggregation", "topk", "sot_len", "compute_dtype",
    "return_matrix", "w_colnorm", "w_rownorm", "w_coverage", "kernel_modes"))
def _align_step(params, dims: ModelDims, xa, tokens, token_len, frame_len,
                *, medfilt_width: int, qk_scale, aggregation: str, topk: int,
                w_colnorm, w_rownorm, w_coverage, sot_len: int,
                compute_dtype=jnp.float32, return_matrix: bool = False,
                cross_kv=None, kernel_modes=(False, "scan")):
    """Fused capture + head-select + aggregate + DTW for one padded batch.

    ``xa`` are the encoder states from the transcription pass — the 24-layer
    encoder runs once per batch, not twice (decode + capture); ``cross_kv``
    (when reusable) are the decode loop's K/V stacks, skipping the per-layer
    cross projections too. ``kernel_modes`` is the (qkpost, dtw_impl) tuple
    resolved by :func:`_kernel_modes` OUTSIDE this jit so the WCA_* kernel
    flags key the cached trace. The encoder never executes here (xa or
    cross_kv is always supplied), so WCA_ENC_ATTN is deliberately NOT part of
    this program's cache key — flipping it must not recompile the capture
    step (attn_mode below is an inert constant)."""
    qkpost, dtw_impl = kernel_modes
    attn, _ = timing.get_attentions(
        params, dims, None, tokens, token_len, frame_len,
        medfilt_width=medfilt_width, qk_scale=qk_scale,
        compute_dtype=compute_dtype, return_logits=False, xa=xa,
        cross_kv=cross_kv, attn_mode="xla", qkpost=qkpost)
    jump_frames, matrix, scores = timing.force_align_batch(
        attn, token_len, frame_len, sot_len, aggregation, topk,
        w_colnorm, w_rownorm, w_coverage, dtw_impl=dtw_impl)
    sel = None if scores is None else scores[1:]
    return jump_frames, (matrix if return_matrix else None), sel


def _kernel_modes():
    """(qkpost, dtw_impl) resolved from the WCA_* env flags at call time —
    passed into _align_step as one hashable static argument. WCA_ENC_ATTN is
    intentionally excluded: the align step never runs the encoder, so adding
    it would only force spurious multi-minute recompiles of the largest jit
    program when the flag flips."""
    from .align.timing import _dtw_impl
    from .models.whisper import _use_fused_qkpost

    return (_use_fused_qkpost(), _dtw_impl())


def _mel_step(audio, dims: ModelDims, compute_dtype=jnp.float32,
              total_samples: int = None):
    # WCA_MEL_IMPL resolves here, outside the jit, so flipping it mid-process
    # switches implementations (the choice keys the cached trace)
    return _mel_step_jit(audio, dims, compute_dtype=compute_dtype,
                         total_samples=total_samples,
                         mel_impl=os.environ.get("WCA_MEL_IMPL", "xla"))


@functools.partial(jax.jit, static_argnames=("dims", "compute_dtype",
                                             "total_samples", "mel_impl"))
def _mel_step_jit(audio, dims: ModelDims, compute_dtype=jnp.float32,
                  total_samples: int = None, mel_impl: str = "xla"):
    if audio.dtype == jnp.int16:
        # int16 wire format (bit-exact for 16-bit PCM sources): the host sends
        # half the bytes over the axon tunnel and the scale fuses into the mel
        audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    if total_samples is not None and audio.shape[-1] < total_samples:
        # the host uploads only the true audio (bucketed); the 30 s window's
        # zero padding happens here on device — bit-exact with host padding
        audio = jnp.pad(audio, ((0, 0), (0, total_samples - audio.shape[-1])))
    if mel_impl == "pallas":
        from .ops.mel_pallas import log_mel_pallas

        return log_mel_pallas(audio, n_mels=dims.n_mels).astype(compute_dtype)
    return log_mel_spectrogram(audio, n_mels=dims.n_mels).astype(compute_dtype)


def _cross_kv_bytes(dims: ModelDims, batch: int, compute_dtype) -> int:
    """HBM bytes of the decode loop's cross K/V stacks (K and V, all layers)."""
    return (2 * dims.n_text_layer * batch * dims.n_text_state
            * dims.n_audio_ctx * jnp.dtype(compute_dtype).itemsize)


def pack_fixed_batch(items, utts, b_pad: int, t_bucket: int, eot: int,
                     n_audio_ctx: int):
    """Fixed-shape packing shared by the runner's align dispatch and the
    probe CLI (one copy keeps the shapes provably equal to the reference's
    physical slicing — docs/DESIGN.md §1).

    ``items``: list of ``(utt, tokens, max_frames)`` for the live (non-skip)
    utterances; ``utts`` the original batch order (encoder-state rows).
    Returns (tokens_arr, token_len, frame_len, xa_idx) NumPy arrays; rows
    >= len(items) are pad rows whose outputs are discarded.
    """
    tokens_arr = np.full((b_pad, t_bucket), eot, np.int32)
    token_len = np.ones((b_pad,), np.int32)
    frame_len = np.ones((b_pad,), np.int32)
    # match rows to encoder states by OBJECT IDENTITY, never by fid: fids are
    # not unique (serve's micro-batcher submits a whole batch with one fid),
    # and a fid-keyed map pointed every duplicate at the LAST row's encoder
    # states (round-4 review finding; tests/test_pipeline_vs_single.py locks
    # this). Both call sites pass ``items`` drawn from ``utts`` itself.
    utt_index = {id(u): j for j, u in enumerate(utts)}
    xa_idx = np.zeros((b_pad,), np.int32)
    for i, (u, toks, max_frames) in enumerate(items):
        tokens_arr[i, :len(toks)] = toks
        token_len[i] = len(toks)
        # clip to the model window (relevant only for sub-30s test dims;
        # real dims skip overlong inputs via MAX_FRAMES upstream)
        frame_len[i] = min(max(int(max_frames), 1), n_audio_ctx)
        xa_idx[i] = utt_index[id(u)]
    return tokens_arr, token_len, frame_len, xa_idx


def _utt_wire_i16(u: Utterance):
    """Per-utterance int16 wire form, cached on the Utterance object: halve
    the host->device tunnel bytes when every sample is exactly representable
    as int16/32768 (true for 16-bit PCM sources, i.e. all the reference
    corpora).

    The losslessness test runs on the UNPADDED audio (2-7 s for TIMIT vs the
    bucketed window), once per utterance and in the background prep thread —
    round 3's batch-level scale/compare pass sat on the dispatch critical
    path (1.39 s of a 3.07 s driver wall, VERDICT r03). Returns the int16
    array, or None when the audio is not exactly int16/32768-representable
    (the batch then ships float32). NaN/out-of-range floats make the int16
    cast produce arbitrary values and a numpy warning — but the equality test
    is then False (NaN never compares equal; a wrapped value differs from its
    out-of-range source), so such audio falls through to the f32 path;
    errstate just silences the warning.
    """
    cached = getattr(u, "_wire_i16", False)
    if cached is not False:
        return cached
    scaled = u.audio * 32768.0
    with np.errstate(invalid="ignore"):
        as_i16 = scaled.astype(np.int16)
    cached = as_i16 if np.array_equal(as_i16, scaled) else None
    try:
        u._wire_i16 = cached
    except Exception:
        pass  # slotted/frozen utterance stand-ins: just skip the cache
    return cached


class _HostBufferPool:
    """Rotating preallocated host staging buffers for wire uploads.

    Avoids per-batch mmap + page-fault churn on the 1-core host. Pooling is
    DISABLED on the CPU backend (``pooled=False``): ``jnp.asarray`` there may
    alias the NumPy buffer zero-copy, and a later in-place refill of a rotated
    slot could corrupt an in-flight batch; over the TPU tunnel the upload
    always copies. A slot is only rewritten after ``slots`` further batches of
    the same shape — sized above the pipeline's max in-flight depth.
    """

    def __init__(self, slots: int, pooled: bool = True):
        self.slots = max(2, int(slots))
        self.pooled = pooled
        self._pools = {}

    def take(self, shape, dtype) -> np.ndarray:
        if not self.pooled:
            return np.empty(shape, dtype)
        key = (tuple(shape), np.dtype(dtype))
        pool = self._pools.setdefault(key, {"bufs": [], "next": 0})
        bufs = pool["bufs"]
        if len(bufs) < self.slots:
            buf = np.empty(shape, dtype)
            bufs.append(buf)
            return buf
        buf = bufs[pool["next"]]
        pool["next"] = (pool["next"] + 1) % self.slots
        return buf


class AlignmentPipeline:
    """End-to-end batched alignment with fixed-shape bucketing.

    Mirrors the per-utterance semantics of the reference CLI loop
    (infer_ali.py:57-132) over whole batches.
    """

    def __init__(self, params, dims: ModelDims, tokenizer, cfg: AlignConfig,
                 mesh=None, compute_dtype=jnp.float32,
                 token_bucket: int = 32):
        self.dims = dims
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        self.token_bucket = token_bucket
        self.mesh = mesh
        if cfg.decode_frame_bucket_guarded and cfg.decode_frame_bucket <= 0:
            raise ValueError(
                "--decode_frame_bucket_guarded guards the frame-bucketed "
                "decode: pass --decode_frame_bucket N (the bucket multiple, "
                "e.g. 128) alongside it")
        if cfg.encoder_int8:
            # the quantized pytree itself routes every encoder dense layer
            # through the int8-MXU path — no signature changes downstream
            params = wmodel_mod.quantize_encoder_int8(params)
        # compute-dtype cast HERE so every pipeline consumer honors it the
        # same way (infer_ali/probe_oracle previously ran bf16 compute over
        # f32 weights — a different config from bench/serve); int8 leaves and
        # scales survive (cast_params)
        params = wmodel_mod.cast_params(params, compute_dtype)
        if mesh is not None:
            # replicated on a pure-data mesh; tensor-parallel weight layout
            # (q/k/v/fc1 columns, out/fc2 rows on 'model') when the mesh has
            # a >1 model axis — the exact spec the multichip dryrun proves
            # parity-exact (parallel/mesh.py::tensor_parallel_spec)
            params = mesh_lib.shard_params(params, mesh)
        self.params = params
        self.sot_len = len(tokenizer.sot_sequence)
        self.options = decoding.DecodingOptions(
            language=tokenizer.language or "en",
            sample_len=cfg.decode_sample_len or None)
        self.alignment_heads = get_alignment_heads(cfg.model, dims)
        self.timers = StageTimers()
        # test/isolation hook: a callable (utts -> list[str]) that supplies
        # transcripts instead of the decode output (decode still runs)
        self.transcribe_override = None
        # guarded-mode telemetry: per-utterance min top1-top2 logit margins
        # (populated only when a guard tracked them). flag_rate() compares
        # them to the active guard — the scoreboard's deployability number
        self.min_margins: List[float] = []
        # shape telemetry for the MFU roll-up (utils/flops.py): the PADDED
        # shapes each device launch actually ran. (b_pad, n_live, kv_frames)
        # per decode batch; (t_bucket, b_pad, n_live, reused_kv) per capture
        # batch
        self.decode_shapes: List[tuple] = []
        self.capture_shapes: List[tuple] = []
        # wire staging buffers: a slot must outlive its batch's transcript
        # sync (<= pipeline_depth + 1 batches in flight) plus the one-batch
        # prep lookahead; pooling is unsafe under CPU zero-copy device_put
        self._host_pool = _HostBufferPool(
            slots=max(1, cfg.pipeline_depth) + 4,
            pooled=jax.default_backend() != "cpu")

    # -- helpers -------------------------------------------------------------

    def active_guard_margin(self) -> Optional[float]:
        """Sum of the active guard thresholds (decoding.decode flags an
        utterance when its min margin is below this), or None when no guarded
        mode is configured."""
        total, active = 0.0, False
        if self.cfg.decode_kv_int8_guarded:
            total += decoding.default_guard_margin()
            active = True
        if self.cfg.decode_frame_bucket_guarded:
            total += decoding.default_bucket_guard_margin()
            active = True
        return total if active else None

    def flag_rate(self) -> Optional[float]:
        """Fraction of margin-tracked utterances the guard re-decoded."""
        guard = self.active_guard_margin()
        if guard is None or not self.min_margins:
            return None
        return float(np.mean(np.asarray(self.min_margins) < guard))

    def _shard(self, tree):
        if self.mesh is None:
            return tree
        return mesh_lib.shard_batch(tree, self.mesh)

    def _pad_batch(self, n: int) -> int:
        """Pad the batch count to a full batch (and a data-axis MULTIPLE —
        a 'model' axis shards weights, not the batch). max() alone crashed any
        batch_size not divisible by the mesh data size at device_put
        (round-4 review: --batch_size 12 --data_parallel 8 -> 'dimension 0
        should be divisible by 8')."""
        b = self.cfg.batch_size
        if self.mesh is not None:
            b = mesh_lib.pad_to_multiple(b, mesh_lib.data_size(self.mesh))
        return b

    # -- stages ---------------------------------------------------------------

    def _prep_wire(self, utts: Sequence[Utterance]) -> np.ndarray:
        """Build a batch's wire buffer: (b_pad, wire_samples) int16 when every
        utterance is losslessly int16/32768-representable (16-bit PCM sources:
        half the tunnel bytes), else float32. Pure host work — run_dataset
        calls this in a background thread so it overlaps the previous batch's
        device stages instead of sitting on the dispatch critical path
        (VERDICT r03 directive #1). Each element of the staging buffer is
        written exactly once (live samples copied, tails zeroed), matching
        the old zeros+pad_or_trim fill bit-exactly."""
        b_pad = self._pad_batch(len(utts))
        # window follows the model: 2 * n_audio_ctx encoder-input mel frames
        n_samples = 2 * self.dims.n_audio_ctx * constants.HOP_LENGTH
        # upload only the batch's true audio length, bucketed to 5 s steps to
        # bound jit signatures (<= 6); the rest of the 30 s window is zero —
        # padded on device in _mel_step, so the wire carries ~4x fewer bytes
        # for TIMIT-length utterances over the ~75 MB/s tunnel
        sample_bucket = 5 * constants.SAMPLE_RATE
        max_live = max(min(u.audio.size, n_samples) for u in utts)
        wire_samples = min(n_samples,
                           mesh_lib.pad_to_multiple(max_live, sample_bucket))
        rows_i16 = [_utt_wire_i16(u) for u in utts]
        use_i16 = all(r is not None for r in rows_i16)
        wire = self._host_pool.take((b_pad, wire_samples),
                                    np.int16 if use_i16 else np.float32)
        for i in range(b_pad):
            row = wire[i]
            if i < len(utts):
                src = rows_i16[i] if use_i16 else utts[i].audio
                n = min(src.size, wire_samples)
                row[:n] = src[:n]  # pad_or_trim semantics: first n samples
                row[n:] = 0
            else:
                row[:] = 0
        return wire

    def _dispatch_transcribe(self, utts: Sequence[Utterance],
                             wire: Optional[np.ndarray] = None) -> dict:
        """Stage 1 dispatch: upload audio, queue mel + greedy decode on device.
        No host sync — transcripts arrive via the returned DecodeFuture.
        ``wire`` is the precomputed staging buffer from :meth:`_prep_wire`
        (run_dataset prepares it in the background); when None it is built
        inline (align_batch / probe callers)."""
        b_pad = self._pad_batch(len(utts))
        # window follows the model: 2 * n_audio_ctx encoder-input mel frames
        n_samples = 2 * self.dims.n_audio_ctx * constants.HOP_LENGTH
        if wire is None:
            with self.timers.stage("wire prep", units=len(utts)):
                wire = self._prep_wire(utts)
        with self.timers.stage("mel dispatch", units=len(utts)):
            mel = _mel_step(self._shard(jnp.asarray(wire)),
                            self.dims, compute_dtype=self.compute_dtype,
                            total_samples=n_samples)
        kv_frames = None
        if self.cfg.decode_frame_bucket > 0:
            max_fl = max(max(u.duration // constants.AUDIO_SAMPLES_PER_TOKEN, 1)
                         for u in utts)
            kv_frames = min(
                self.dims.n_audio_ctx,
                mesh_lib.pad_to_multiple(int(max_fl), self.cfg.decode_frame_bucket))
        # cross-K/V reuse: only in the parity-true configuration (full-frame,
        # un-quantized) and single-mesh (the (L, B, ...) stacks don't follow the
        # batch-axis sharding helper), and only when the stacks fit comfortably:
        # keeping them alive through the capture pass adds 2*L*B*d*F bytes to
        # HBM ON TOP of the f32 attention stack — at medium B=32 bf16 that is
        # 4.7 GB + 7 GB and the 16 GB chip OOMs (measured). The 3 GB default
        # 8 GB default budget divided by the live-stack count: run_dataset's
        # software pipeline keeps up to pipeline_depth+1 batches' stacks alive
        # at once (depth in the transcribe queue + one in the align step), so
        # at medium depth-2 reuse stays on through B=18 (3 x 2.36 GB at B=16 —
        # measured fitting with the attention stack on the 16 GB chip, 34.8
        # vs 33.8 utts/s with reuse off) and the gate falls back above (B=32's
        # 3 x 4.7 GB OOM'd in round 2). Override via WCA_REUSE_KV_MAX_BYTES.
        n_live = max(1, self.cfg.pipeline_depth) + 1
        reuse_kv = (self.cfg.reuse_cross_kv and kv_frames is None
                    and not self.cfg.decode_kv_int8
                    and not self.cfg.decode_kv_int8_guarded
                    and self.mesh is None
                    and _cross_kv_bytes(self.dims, b_pad, self.compute_dtype)
                    * n_live
                    <= int(float(os.environ.get("WCA_REUSE_KV_MAX_BYTES",
                                                8e9))))
        with self.timers.stage("decode dispatch", units=len(utts)):
            if reuse_kv:
                future, xa, cross_kv = decoding.decode(
                    self.params, self.dims, self.tokenizer, mel, self.options,
                    compute_dtype=self.compute_dtype,
                    return_cross_kv=True, async_results=True)
            else:
                future, xa = decoding.decode(
                    self.params, self.dims, self.tokenizer, mel, self.options,
                    compute_dtype=self.compute_dtype, kv_frames=kv_frames,
                    kv_int8=(self.cfg.decode_kv_int8
                             or self.cfg.decode_kv_int8_guarded),
                    kv_int8_guard=(decoding.default_guard_margin()
                                   if self.cfg.decode_kv_int8_guarded
                                   else None),
                    kv_frames_guard=(decoding.default_bucket_guard_margin()
                                     if self.cfg.decode_frame_bucket_guarded
                                     else None),
                    return_xa=True, async_results=True)
                cross_kv = None
        self.decode_shapes.append((b_pad, len(utts), kv_frames))
        return dict(utts=utts, future=future, mel=mel, xa=xa,
                    cross_kv=cross_kv)

    def transcribe_batch(self, utts: Sequence[Utterance]):
        """Synchronous wrapper: (transcripts, mel batch, encoder states)."""
        p = self._dispatch_transcribe(utts)
        results = p["future"].result()
        return [r.text for r in results[:len(utts)]], p["mel"], p["xa"]

    def align_batch(self, utts: Sequence[Utterance],
                    return_matrix: bool = False) -> List[UttAlignment]:
        """Synchronous one-batch path (dispatch + collect back to back)."""
        pending = self._dispatch_align(self._dispatch_transcribe(utts),
                                       return_matrix=return_matrix)
        return self._collect_align(pending)

    def _dispatch_align(self, tp: dict, return_matrix: bool = False) -> dict:
        """Stage 2 dispatch: sync this batch's transcripts (its only host wait),
        re-tokenize on host, queue the capture+align step on device."""
        cfg = self.cfg
        tok = self.tokenizer
        utts = tp["utts"]
        xa = tp["xa"]
        if self.transcribe_override is not None:
            transcripts = self.transcribe_override(utts)
        else:
            with self.timers.stage("transcripts sync", units=len(utts)):
                results = tp["future"].result()
            for r in results[:len(utts)]:
                if np.isfinite(r.min_margin):
                    self.min_margins.append(float(r.min_margin))
            transcripts = [r.text for r in results[:len(utts)]]

        # host: text normalization + re-tokenization (reference infer_ali.py:63-76)
        prepared = []
        for u, transcription in zip(utts, transcripts):
            text_norm = retokenize.remove_punctuation(u.text)
            tr_norm = (text_norm if cfg.use_gt_transcript
                       else retokenize.remove_punctuation(transcription))
            if len(tr_norm) == 0:  # reference guard (intended semantics of line 65)
                tr_norm = " "
            text_tokens = retokenize.encode(tr_norm, tok, cfg.aligned_unit_type)
            tokens = [*tok.sot_sequence, tok.no_timestamps, *text_tokens, tok.eot]
            max_frames = u.duration // constants.AUDIO_SAMPLES_PER_TOKEN
            # reference guards (infer_ali.py:78-81); the token cap also respects
            # the model's own context for sub-standard test dims
            skip = (max_frames > constants.MAX_FRAMES
                    or len(tokens) > min(constants.MAX_LENGTH,
                                         self.dims.n_text_ctx))
            prepared.append((u, tr_norm, text_norm, text_tokens, tokens,
                             int(max_frames), skip))

        live = [p for p in prepared if not p[6]]
        jump_dev = matrix_dev = sel_dev = probs_dev = None
        if live:
            b_pad = self._pad_batch(len(live))
            t_max = max(len(p[4]) for p in live)
            t_bucket = min(self.dims.n_text_ctx,
                           mesh_lib.pad_to_multiple(t_max, self.token_bucket))
            # encoder-state rows follow the original utts order; gather live rows
            tokens_arr, token_len, frame_len, xa_idx = pack_fixed_batch(
                [(p[0], p[4], p[5]) for p in live], utts, b_pad, t_bucket,
                tok.eot, self.dims.n_audio_ctx)
            # cross-K/V reuse needs the live rows in decode order (skip-guards
            # reorder them; gathering the multi-GB (L, B, ...) stacks would cost
            # more than recomputing). Rows >= len(live) are pad rows whose
            # outputs are discarded, so their K/V content is irrelevant.
            cross_kv = tp.get("cross_kv")
            if cross_kv is not None and not (
                    xa.shape[0] == b_pad
                    and np.array_equal(xa_idx[:len(live)],
                                       np.arange(len(live)))):
                cross_kv = None
            xa_live = (None if cross_kv is not None
                       else jnp.take(xa, jnp.asarray(xa_idx), axis=0))
            self.capture_shapes.append((t_bucket, b_pad, len(live),
                                        cross_kv is not None))
            with self.timers.stage("align dispatch", units=len(live)):
                xa_in = None if xa_live is None else self._shard(xa_live)
                if cfg.default_whisper_timing:
                    jump_dev, probs_dev, matrix_dev = \
                        timing.default_find_alignment_batch(
                            self.params, self.dims, None,
                            self._shard(jnp.asarray(tokens_arr)),
                            self._shard(jnp.asarray(token_len)),
                            self._shard(jnp.asarray(frame_len)),
                            self.alignment_heads, eot=tok.eot,
                            medfilt_width=cfg.medfilt_width,
                            qk_scale=cfg.qk_scale, sot_len=self.sot_len,
                            compute_dtype=self.compute_dtype,
                            xa=xa_in, cross_kv=cross_kv)
                    if not return_matrix:
                        matrix_dev = None
                else:
                    jump_dev, matrix_dev, sel_dev = _align_step(
                        self.params, self.dims, xa_in,
                        self._shard(jnp.asarray(tokens_arr)),
                        self._shard(jnp.asarray(token_len)),
                        self._shard(jnp.asarray(frame_len)),
                        medfilt_width=cfg.medfilt_width, qk_scale=cfg.qk_scale,
                        aggregation=cfg.aggr, topk=cfg.topk,
                        w_colnorm=cfg.w_colnorm, w_rownorm=cfg.w_rownorm,
                        w_coverage=cfg.w_coverage, sot_len=self.sot_len,
                        compute_dtype=self.compute_dtype,
                        return_matrix=return_matrix, cross_kv=cross_kv,
                        kernel_modes=_kernel_modes())
            for arr in (jump_dev, matrix_dev, probs_dev,
                        *(sel_dev or ())):
                if arr is not None:
                    try:
                        arr.copy_to_host_async()
                    except Exception:
                        pass
        return dict(utts=utts, prepared=prepared, live=live,
                    jump_dev=jump_dev, matrix_dev=matrix_dev, sel_dev=sel_dev,
                    probs_dev=probs_dev, return_matrix=return_matrix)

    def _collect_align(self, ap: dict) -> List[UttAlignment]:
        """Stage 3: materialize device outputs and do the word bookkeeping."""
        cfg = self.cfg
        tok = self.tokenizer
        prepared, live = ap["prepared"], ap["live"]
        return_matrix = ap["return_matrix"]
        out: List[UttAlignment] = []
        jump_frames = None
        token_probs_np = None
        sel = None
        matrix_np = None
        if live:
            with self.timers.stage("collect sync", units=len(live)):
                jump_frames = np.asarray(ap["jump_dev"])
            token_probs_np = (None if ap["probs_dev"] is None
                              else np.asarray(ap["probs_dev"]))
            if return_matrix and ap["matrix_dev"] is not None:
                matrix_np = np.asarray(ap["matrix_dev"])
            sel = ap["sel_dev"]
            if sel is not None:
                sel = (np.asarray(sel[0]), np.asarray(sel[1]))

        # device rows follow `live` (= prepared minus skips, order preserved),
        # so index them POSITIONALLY with a running live counter. fids are NOT
        # unique keys here: batched serve requests all arrive as "utterance",
        # and keying by fid silently cross-wired their alignments (round-4
        # review finding, regression-tested in tests/test_serve.py).
        live_i = -1
        for idx, (u, tr_norm, text_norm, text_tokens, tokens, max_frames,
                  skip) in enumerate(prepared):
            if skip:
                out.append(UttAlignment(
                    fid=u.fid, words=[], start_times=np.array([]),
                    end_times=np.array([]), transcription=tr_norm,
                    text=text_norm, starts=u.starts, ends=u.ends, skipped=True))
                continue
            live_i += 1  # this entry owns device row `live_i`, even if wb=None
            if cfg.default_whisper_timing:
                # the baseline path always groups with the tokenizer's own word
                # splitter (reference timing.py:167)
                words, word_tokens = tok.split_to_word_tokens(
                    list(text_tokens) + [tok.eot])
                if len(word_tokens) <= 1:
                    wb = None
                else:
                    wb = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]),
                                (1, 0))
            else:
                words, word_tokens, wb = timing.words_and_boundaries(
                    text_tokens, tok, cfg.aligned_unit_type)
            if wb is None:
                out.append(UttAlignment(
                    fid=u.fid, words=[], start_times=np.array([]),
                    end_times=np.array([]), transcription=tr_norm,
                    text=text_norm, starts=u.starts, ends=u.ends))
                continue
            jf = jump_frames[live_i][:len(text_tokens) + 1]
            starts, ends = timing.jump_frames_to_times(jf, wb)
            word_probs = None
            if token_probs_np is not None:
                tp_row = token_probs_np[live_i][:len(text_tokens)]
                word_probs = [float(np.mean(tp_row[i:j]))
                              for i, j in zip(wb[:-1], wb[1:])]
            m = None
            if return_matrix and matrix_np is not None:
                m = matrix_np[live_i][self.sot_len:len(tokens) - 1,
                                      :max_frames]
            out.append(UttAlignment(
                fid=u.fid, words=words, start_times=starts, end_times=ends,
                transcription=tr_norm, text=text_norm, starts=u.starts,
                ends=u.ends, matrix=m,
                scores=(None if sel is None
                        else (sel[0][live_i], sel[1][live_i])),
                word_probabilities=word_probs))
        return out

    def run_dataset(self, dataset, progress: bool = True):
        """Iterate a dataset in batches; yields UttAlignment per utterance.

        Software-pipelined to ``cfg.pipeline_depth``: up to that many batches
        keep their decode in flight before the oldest one's transcripts are
        synced, so the sync overlaps the NEXT batches' audio uploads + mel /
        decode dispatch (the tunnel upload is host wall time) while the device
        chews through the queue in order. One capture+align batch additionally
        stays in flight before its host collect. At depth 1 this degrades to
        the round-2 three-stage pipeline."""
        from collections import deque

        order = None
        if self.cfg.sort_by_duration:
            from .data.dataset import duration_order

            order = duration_order(dataset)
        it = batch_iter(dataset, self.cfg.batch_size, order=order)
        if progress:
            try:
                from tqdm import tqdm
                total = (len(dataset) + self.cfg.batch_size - 1) // self.cfg.batch_size
                it = tqdm(it, total=total)
            except Exception:
                pass
        rm = self.cfg.plot
        depth = max(1, self.cfg.pipeline_depth)
        transcribed = deque()  # batches with decode in flight
        aligned = deque()  # batches with capture+align in flight
        # one-batch-lookahead wire prep: batch N+1's staging buffer is built
        # in a background thread while batch N's uploads/device waits run on
        # the main thread (the prep is pure host work; device semantics are
        # untouched). On this 1-core host the overlap comes from the main
        # thread's tunnel/device blocking time, which releases the GIL.
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=1,
                                thread_name_prefix="wca-wireprep")

        def prepped(batches):
            prev = None
            for batch in batches:
                fut = ex.submit(self._prep_wire, batch)
                if prev is not None:
                    yield prev
                prev = (batch, fut)
            if prev is not None:
                yield prev

        try:
            for batch, wire_fut in prepped(it):
                with self.timers.stage("wire wait", units=len(batch)):
                    wire = wire_fut.result()
                transcribed.append(self._dispatch_transcribe(batch, wire=wire))
                if len(transcribed) > depth:
                    aligned.append(self._dispatch_align(transcribed.popleft(),
                                                        return_matrix=rm))
                while len(aligned) > 1:
                    yield from self._collect_align(aligned.popleft())
            while transcribed:
                aligned.append(self._dispatch_align(transcribed.popleft(),
                                                    return_matrix=rm))
                while len(aligned) > 1:
                    yield from self._collect_align(aligned.popleft())
            while aligned:
                yield from self._collect_align(aligned.popleft())
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
