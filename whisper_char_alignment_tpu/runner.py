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
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import constants
from .align import timing
from .audio.mel import log_mel_spectrogram, pad_or_trim
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
    "return_matrix", "w_colnorm", "w_rownorm", "w_coverage"))
def _align_step(params, dims: ModelDims, mel, tokens, token_len, frame_len,
                *, medfilt_width: int, qk_scale, aggregation: str, topk: int,
                w_colnorm, w_rownorm, w_coverage, sot_len: int,
                compute_dtype=jnp.float32, return_matrix: bool = False):
    """Fused capture + head-select + aggregate + DTW for one padded batch."""
    attn, _ = timing.get_attentions(
        params, dims, mel, tokens, token_len, frame_len,
        medfilt_width=medfilt_width, qk_scale=qk_scale,
        compute_dtype=compute_dtype, return_logits=False)
    jump_frames, matrix, scores = timing.force_align_batch(
        attn, token_len, frame_len, sot_len, aggregation, topk,
        w_colnorm, w_rownorm, w_coverage)
    sel = None if scores is None else scores[1:]
    return jump_frames, (matrix if return_matrix else None), sel


@functools.partial(jax.jit, static_argnames=("dims", "compute_dtype"))
def _mel_step(audio, dims: ModelDims, compute_dtype=jnp.float32):
    import os

    if os.environ.get("WCA_MEL_IMPL") == "pallas":
        from .ops.mel_pallas import log_mel_pallas

        return log_mel_pallas(audio, n_mels=dims.n_mels).astype(compute_dtype)
    return log_mel_spectrogram(audio, n_mels=dims.n_mels).astype(compute_dtype)


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
        if mesh is not None:
            params = mesh_lib.replicate(params, mesh)
        self.params = params
        self.sot_len = len(tokenizer.sot_sequence)
        self.options = decoding.DecodingOptions(language=tokenizer.language or "en")
        self.alignment_heads = get_alignment_heads(cfg.model, dims)
        self.timers = StageTimers()

    # -- helpers -------------------------------------------------------------

    def _shard(self, tree):
        if self.mesh is None:
            return tree
        return mesh_lib.shard_batch(tree, self.mesh)

    def _pad_batch(self, n: int) -> int:
        """Pad the batch count to a full batch (and a mesh multiple)."""
        b = self.cfg.batch_size
        if self.mesh is not None:
            b = max(b, self.mesh.devices.size)
        return b

    # -- stages ---------------------------------------------------------------

    def transcribe_batch(self, utts: Sequence[Utterance]):
        """Returns (transcripts for each utt, padded mel batch (B_pad, n_mels, F))."""
        b_pad = self._pad_batch(len(utts))
        # window follows the model: 2 * n_audio_ctx encoder-input mel frames
        n_samples = 2 * self.dims.n_audio_ctx * constants.HOP_LENGTH
        audio = np.zeros((b_pad, n_samples), np.float32)
        for i, u in enumerate(utts):
            audio[i] = np.asarray(pad_or_trim(u.audio, n_samples))
        with self.timers.stage("mel", units=len(utts)):
            mel = _mel_step(self._shard(jnp.asarray(audio)), self.dims,
                            compute_dtype=self.compute_dtype)
        kv_frames = None
        if self.cfg.decode_frame_bucket > 0:
            max_fl = max(max(u.duration // constants.AUDIO_SAMPLES_PER_TOKEN, 1)
                         for u in utts)
            kv_frames = min(
                self.dims.n_audio_ctx,
                mesh_lib.pad_to_multiple(int(max_fl), self.cfg.decode_frame_bucket))
        with self.timers.stage("decode", units=len(utts)):
            results = decoding.decode(self.params, self.dims, self.tokenizer,
                                      mel, self.options,
                                      compute_dtype=self.compute_dtype,
                                      kv_frames=kv_frames,
                                      kv_int8=self.cfg.decode_kv_int8)
        return [r.text for r in results[:len(utts)]], mel

    def align_batch(self, utts: Sequence[Utterance],
                    return_matrix: bool = False) -> List[UttAlignment]:
        cfg = self.cfg
        tok = self.tokenizer
        transcripts, mel = self.transcribe_batch(utts)

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
        out: List[UttAlignment] = []
        jump_map = {}
        sel_map = {}
        probs_map = {}
        matrix_np = None
        if live:
            b_pad = self._pad_batch(len(live))
            t_max = max(len(p[4]) for p in live)
            t_bucket = min(self.dims.n_text_ctx,
                           mesh_lib.pad_to_multiple(t_max, self.token_bucket))
            tokens_arr = np.full((b_pad, t_bucket), tok.eot, np.int32)
            token_len = np.ones((b_pad,), np.int32)
            frame_len = np.ones((b_pad,), np.int32)
            # mel rows follow the original utts order; gather the live rows
            utt_index = {u.fid: j for j, u in enumerate(utts)}
            mel_idx = np.zeros((b_pad,), np.int32)
            for i, p in enumerate(live):
                tokens_arr[i, :len(p[4])] = p[4]
                token_len[i] = len(p[4])
                # clip to the model window (relevant only for sub-30s test dims;
                # real dims skip overlong inputs via MAX_FRAMES above)
                frame_len[i] = min(max(p[5], 1), self.dims.n_audio_ctx)
                mel_idx[i] = utt_index[p[0].fid]
            mel_live = jnp.take(mel, jnp.asarray(mel_idx), axis=0)
            token_probs_np = None
            align_timer = self.timers.stage("capture+align", units=len(live))
            align_timer.__enter__()
            if cfg.default_whisper_timing:
                jump_frames, token_probs, matrix = \
                    timing.default_find_alignment_batch(
                        self.params, self.dims, self._shard(mel_live),
                        self._shard(jnp.asarray(tokens_arr)),
                        self._shard(jnp.asarray(token_len)),
                        self._shard(jnp.asarray(frame_len)),
                        self.alignment_heads, eot=tok.eot,
                        medfilt_width=cfg.medfilt_width, qk_scale=cfg.qk_scale,
                        sot_len=self.sot_len, compute_dtype=self.compute_dtype)
                token_probs_np = np.asarray(token_probs)
                sel = None
                if not return_matrix:
                    matrix = None
            else:
                jump_frames, matrix, sel = _align_step(
                    self.params, self.dims, self._shard(mel_live),
                    self._shard(jnp.asarray(tokens_arr)),
                    self._shard(jnp.asarray(token_len)),
                    self._shard(jnp.asarray(frame_len)),
                    medfilt_width=cfg.medfilt_width, qk_scale=cfg.qk_scale,
                    aggregation=cfg.aggr, topk=cfg.topk, w_colnorm=cfg.w_colnorm,
                    w_rownorm=cfg.w_rownorm, w_coverage=cfg.w_coverage,
                    sot_len=self.sot_len, compute_dtype=self.compute_dtype,
                    return_matrix=return_matrix)
            jump_frames = np.asarray(jump_frames)
            align_timer.__exit__(None, None, None)
            if return_matrix and matrix is not None:
                matrix_np = np.asarray(matrix)
            if sel is not None:
                sel = (np.asarray(sel[0]), np.asarray(sel[1]))
            for i, p in enumerate(live):
                jump_map[p[0].fid] = jump_frames[i]
                if sel is not None:
                    sel_map[p[0].fid] = (sel[0][i], sel[1][i])
                if token_probs_np is not None:
                    probs_map[p[0].fid] = token_probs_np[i]

        for idx, (u, tr_norm, text_norm, text_tokens, tokens, max_frames,
                  skip) in enumerate(prepared):
            if skip:
                out.append(UttAlignment(
                    fid=u.fid, words=[], start_times=np.array([]),
                    end_times=np.array([]), transcription=tr_norm,
                    text=text_norm, starts=u.starts, ends=u.ends, skipped=True))
                continue
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
            jf = jump_map[u.fid][:len(text_tokens) + 1]
            starts, ends = timing.jump_frames_to_times(jf, wb)
            word_probs = None
            if u.fid in probs_map:
                tp_row = probs_map[u.fid][:len(text_tokens)]
                word_probs = [float(np.mean(tp_row[i:j]))
                              for i, j in zip(wb[:-1], wb[1:])]
            m = None
            if return_matrix and matrix_np is not None:
                live_idx = [p[0].fid for p in live].index(u.fid)
                m = matrix_np[live_idx][self.sot_len:len(tokens) - 1,
                                        :max_frames]
            out.append(UttAlignment(
                fid=u.fid, words=words, start_times=starts, end_times=ends,
                transcription=tr_norm, text=text_norm, starts=u.starts,
                ends=u.ends, matrix=m, scores=sel_map.get(u.fid),
                word_probabilities=word_probs))
        return out

    def run_dataset(self, dataset, progress: bool = True):
        """Iterate a dataset in batches; yields UttAlignment per utterance."""
        it = batch_iter(dataset, self.cfg.batch_size)
        if progress:
            try:
                from tqdm import tqdm
                total = (len(dataset) + self.cfg.batch_size - 1) // self.cfg.batch_size
                it = tqdm(it, total=total)
            except Exception:
                pass
        for batch in it:
            yield from self.align_batch(batch, return_matrix=self.cfg.plot)
