"""Stateful streaming style transfer: live audio in, transferred audio out.

Capability extension beyond the reference (which is strictly offline: its
`process_audio` needs the whole clip before anything happens,
evaluation_style_transfer.py:135-159). Here the same pipeline runs as a
bounded-latency stream: push PCM chunks of ANY size, get transferred samples
back as soon as they are final. One fixed-shape XLA program executes per new
analysis window (every `step = window_size - overlap` frames ≈ 2.3 s of audio
at the standard config), so arbitrarily long / unbounded streams run in O(1)
memory with no recompiles — the TPU-native answer to "minutes-long clips"
that the reference handles by materializing the full spectrogram.

How each offline stage becomes streaming:

* features (STFT+CQT, utilityFunctions.py:12-60): each new window is
  featurized from a chunk with `margin_frames` of real context on both sides
  — by default the analytic receptive-field bound (dsp/cqt.py
  cqt_context_frames: octave-kernel FFT support at the lowest octave's rate
  plus the 2:1 decimator chain; 41 frames ≈ 0.48 s at the standard config),
  at which interior-window features EQUAL the offline whole-signal ones
  bit-for-bit (tested). The stream head is zero-padded (no past exists); the
  recursive CQT zero-pads there offline too (librosa pad_mode='constant'),
  the STFT differs in its first two frames only (offline 'reflect').
* content encoder (content_encoder.py:70-99): the per-window CNN runs once
  per window; the sequence transformer re-runs over a sliding ring of the
  last `context_windows` CNN tokens. Offline attends bidirectionally over
  ALL windows — impossible live; the stream is causal by construction and
  matches the offline math exactly for the windows' shared prefix when the
  ring has not slid yet (positions are ring-relative, so the stream is
  stationary and unbounded).
* decoder (SimpleDecoder_TransformerOnly.py:102-125): cross-attention memory
  is the causal content ring (+ class slots, masked to the same validity),
  self-attention re-runs over the ring of fed-back inputs — O(K^2) per step
  with K small (default 8) is cheaper than sliding-KV-cache bookkeeping.
  Both ar_feedback modes ("raw" faithful / "reencode" quirk fix) stream.
* overlap-average + ISTFT (utilityFunctions.py:265-283, 62-82): windows
  overlap only their immediate neighbours (overlap < step), so a frame is
  final one window after it is produced; samples are final once every
  contributing ISTFT frame is. The stream emits exactly the offline
  overlap-average + torch-semantics ISTFT (envelope division, center trim,
  length hop*(T-1)) — verified against the offline inversion in tests.

Algorithmic latency: a window's first output sample is emitted once the
stream reaches the end of that window's featurization chunk — worst case
(window_size + margin) * hop / sr ≈ 3.8 s at the defaults (auto margin 41);
the steady-state output cadence is step*hop/sr ≈ 2.3 s of audio per device
call.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

import math

from ast_tpu.config import Config
from ast_tpu.dsp.cqt import cqt_context_frames, cqt_ri
from ast_tpu.dsp.stft import (
    dot_precision,
    hann_window_np,
    irfft_ct,
    irfft_matmul,
    overlap_add_chunked,
    resolve_dft_method,
    stft_ri,
)
from ast_tpu.dsp.windows import concat_stft_cqt
from ast_tpu.models import ContentEncoder, Decoder  # noqa: F401 (re-export context)
from ast_tpu.models.attention import TransformerEncoder, causal_mask
from ast_tpu.models.blocks import DeepCNN, sinusoidal_position_encoding
from ast_tpu.eval.inference import NAME_TO_ID, StyleTransferPipeline

import flax.linen as nn


class StreamState(NamedTuple):
    """Device-side stream state (a fixed-shape pytree carried between steps).

    tokens:    (K, d) ring of per-window CNN features (pre-PE), oldest first
    inputs:    (K, d) ring of pre-PE decoder input embeddings (slot 0 holds
               the start token until it slides out)
    n_windows: windows processed so far (scalar int32)
    spec_tail: (2, overlap, stft_bins) spectrogram frames still awaiting the
               next window's overlapping contribution
    sig_tail:  (n_fft - hop,) ISTFT overlap-add signal carry
    env_tail:  (n_fft - hop,) ISTFT squared-window envelope carry
    """

    tokens: jnp.ndarray
    inputs: jnp.ndarray
    n_windows: jnp.ndarray
    spec_tail: jnp.ndarray
    sig_tail: jnp.ndarray
    env_tail: jnp.ndarray


def _subvars(variables, name: str):
    """Slice every collection of a flax variable dict down to one submodule."""
    return {coll: tree[name] for coll, tree in variables.items() if name in tree}


def _irfft(spec: jnp.ndarray, n_fft: int, method: str, precision) -> jnp.ndarray:
    """The same inverse-DFT dispatch istft() uses (dsp/stft.py:349-355)."""
    method = resolve_dft_method(method)
    if method == "matmul":
        return irfft_matmul(spec, n_fft, dot_precision(precision))
    if method == "ct":
        return irfft_ct(spec, n_fft, dot_precision(precision))
    return jnp.fft.irfft(spec, n=n_fft, axis=-1)


def _build_stream_step(pipe: StyleTransferPipeline, K: int, margin: int,
                       debug: bool = False):
    """One jitted program: featurize chunk -> content token -> causal
    transformer over the ring -> one decoder step -> OLA-mean -> streaming
    ISTFT. Returns (state', emitted_samples) (+ the raw output window with
    debug=True)."""
    cfg = pipe.cfg
    a, m = cfg.audio, cfg.model
    W, O = a.window_size, a.eval_overlap_frames
    P = W - O
    hop, n_fft = a.hop_length, a.n_fft
    tail_len = n_fft - hop
    d = m.d_model
    normed = getattr(m, "ar_feedback", "raw") == "reencode"
    decoder = pipe.decoder
    hann = jnp.asarray(hann_window_np(n_fft))
    stats = pipe.stats

    def content_token(content_vars, window_cl):
        """(1, W, F, 2) NHWC window -> (d,) CNN token (the pre-transformer
        part of ContentEncoder, content_encoder.py:45-51 equivalent)."""
        feats = DeepCNN(m.cnn_channels, m.cnn_out_dim, dtype=m.jnp_dtype,
                        remat=False, sn_folded=True).apply(
            _subvars(content_vars, "cnn"), window_cl, train=False)
        if m.cnn_out_dim != m.d_model:
            feats = nn.Dense(m.d_model, dtype=m.jnp_dtype).apply(
                _subvars(content_vars, "input_proj"), feats)
        return feats[0]

    def content_sequence(content_vars, tokens, key_invalid):
        """Ring of CNN tokens -> (1, K, d) content embeddings with invalid
        key slots masked out of attention (PE is ring-slot relative)."""
        seq = tokens[None]
        pe = jnp.asarray(sinusoidal_position_encoding(m.max_len, d)[:K],
                         seq.dtype)
        seq = seq + pe[None]
        seq = nn.LayerNorm(epsilon=1e-5, dtype=m.jnp_dtype).apply(
            _subvars(content_vars, "norm"), seq)
        mask = key_invalid[None, None, None, :]  # (1,1,1,K): True = masked
        return TransformerEncoder(d, m.num_heads, m.num_layers, m.ff_mult,
                                  m.dropout, m.jnp_dtype).apply(
            _subvars(content_vars, "transformer"), seq, mask,
            deterministic=True)

    @jax.jit
    def step(chunk, state: StreamState, class_embeddings, target_id,
             content_vars, decoder_vars, n_valid_frames):
        # ---- featurize the chunk, slice out this window's W frames ----
        s = stft_ri(chunk, n_fft=n_fft, hop_length=hop,
                    method=a.stft_method, precision=a.dft_precision)
        c = cqt_ri(chunk, sr=a.sample_rate, n_bins=a.cqt_bins,
                   hop_length=hop, algorithm=a.cqt_algorithm,
                   sparsity=a.cqt_sparsity, transform=a.cqt_transform,
                   precision=a.dft_precision,
                   bins_per_octave=a.cqt_bins_per_octave, fmin=a.cqt_fmin,
                   filter_scale=a.cqt_filter_scale)
        if stats is not None:  # opt-in, mirrors the batch core
            from ast_tpu.dsp.norm import normalize

            s = normalize(s, jnp.asarray(stats.stft_mean),
                          jnp.asarray(stats.stft_std))
            c = normalize(c, jnp.asarray(stats.cqt_mean),
                          jnp.asarray(stats.cqt_std))
        feats = concat_stft_cqt(s, c)  # (2, W + 2*margin, F)
        window = feats[:, margin:margin + W, :]  # (2, W, F)
        frame_valid = (jnp.arange(W) < n_valid_frames)
        window = window * frame_valid[None, :, None]

        # ---- content: CNN token -> sliding causal transformer ----
        token = content_token(content_vars,
                              jnp.transpose(window, (1, 2, 0))[None])
        full = state.n_windows >= K
        tokens = jnp.where(full, jnp.roll(state.tokens, -1, axis=0),
                           state.tokens)
        pos = jnp.minimum(state.n_windows, K - 1)
        tokens = jax.lax.dynamic_update_slice(tokens, token[None], (pos, 0))
        n_valid = jnp.minimum(state.n_windows + 1, K)
        key_invalid = jnp.arange(K) >= n_valid
        content_emb = content_sequence(content_vars, tokens, key_invalid)

        # ---- decoder: memory from the causal ring, one AR step ----
        class_emb = class_embeddings[target_id][None]  # (1, d)
        memory = decoder.apply(decoder_vars, content_emb, class_emb, False,
                               method=Decoder.prepare_memory)  # (1, 2K, d)
        mem_invalid = jnp.concatenate([key_invalid, key_invalid])
        mem_mask = mem_invalid[None, None, None, :]
        x = decoder.apply(decoder_vars, state.inputs[None], normed,
                          method=Decoder.prepare_stream_inputs)
        tgt_mask = causal_mask(K) | key_invalid[None, None, None, :]
        dec = decoder.apply(decoder_vars, x, memory, tgt_mask, mem_mask,
                            method=Decoder.core_forward)  # (1, K, d)
        y_t = jax.lax.dynamic_slice(dec, (0, pos, 0), (1, 1, d))
        out = decoder.apply(decoder_vars, y_t, False,
                            method=Decoder.generate_output)  # (1,1,2,W,513)

        # feedback embedding for the NEXT window's input ring slot
        if normed:
            fb = decoder.apply(decoder_vars, out,
                               method=Decoder.encode_frame)[0, 0]
        else:
            fb = y_t[0, 0]
        inputs = jnp.where(state.n_windows + 1 >= K,
                           jnp.roll(state.inputs, -1, axis=0), state.inputs)
        pos2 = jnp.minimum(state.n_windows + 1, K - 1)
        inputs = jax.lax.dynamic_update_slice(inputs, fb[None], (pos2, 0))

        # ---- overlap-average the first P frames final, stream-ISTFT them ----
        win = out[0, 0] * frame_valid[None, :, None]  # offline canvas crop
        head_cnt = jnp.where(state.n_windows > 0, 2.0, 1.0)
        head = (win[:, :O] + state.spec_tail) / head_cnt
        finalized = jnp.concatenate([head, win[:, O:P]], axis=1)  # (2, P, F)
        new_spec_tail = win[:, P:]  # (2, O, F)

        spec = jax.lax.complex(finalized[0], finalized[1])  # (P, stft_bins)
        fr = _irfft(spec, n_fft, a.stft_method, a.dft_precision) * hann
        sig = overlap_add_chunked(fr[None], hop)[0]  # (P*hop + tail_len,)
        env_fr = (hann ** 2)[None, :] * frame_valid[:P, None]
        env = overlap_add_chunked(env_fr[None], hop)[0]
        sig = sig.at[:tail_len].add(state.sig_tail)
        env = env.at[:tail_len].add(state.env_tail)
        emit = sig[:P * hop] / jnp.where(env[:P * hop] > 1e-11,
                                         env[:P * hop], 1.0)

        new_state = StreamState(tokens, inputs, state.n_windows + 1,
                                new_spec_tail, sig[P * hop:], env[P * hop:])
        if debug:
            return new_state, emit, win
        return new_state, emit

    return step


@dataclasses.dataclass
class StreamingTransfer:
    """Push-based streaming style transfer around a StyleTransferPipeline.

    >>> stream = StreamingTransfer(pipe, target="violin")
    >>> for block in microphone():        # arbitrary block sizes
    ...     play(stream.push(block))
    >>> play(stream.flush())

    The concatenation of everything returned equals the offline
    overlap-average + ISTFT of the stream's decoded windows (same envelope
    division, center trim and hop*(T-1) length as `istft`), with the model
    running causally over a `context_windows`-window sliding context.

    context_windows: model context K (content + decoder rings). While the
        stream is shorter than K windows the decode matches the offline
        causal prefix exactly; afterwards the context slides (stationary).
    margin_frames: featurization context on each side of a window. None
        (default) = the exact analytic bound — the CQT's full receptive
        field incl. the recursive decimator chain (dsp/cqt.py
        cqt_context_frames; 41 frames ≈ 0.48 s at the standard config) or
        the STFT center pad, whichever is larger — at which interior-window
        features EQUAL the offline whole-signal ones (tested). Smaller
        explicit values trade accuracy at the lowest CQT octaves for
        latency.
    collect_windows: keep the decoded (2, W, stft_bins) windows on host
        (debugging/tests; costs one extra device->host copy per window).
    """

    pipe: StyleTransferPipeline
    target: str | int = "violin"
    context_windows: int = 8
    margin_frames: Optional[int] = None
    collect_windows: bool = False

    def __post_init__(self):
        cfg = self.pipe.cfg
        a = cfg.audio
        self._W = a.window_size
        self._O = a.eval_overlap_frames
        self._P = self._W - self._O
        self._hop = a.hop_length
        self._n_fft = a.n_fft
        if self._O >= self._P:
            raise ValueError(
                f"streaming requires overlap < step (overlap {self._O}, "
                f"window {self._W}): windows may only overlap immediate "
                "neighbours")
        if self._O >= self._W * 0.5:
            raise ValueError("streaming requires overlap < window_size/2")
        if self._P * self._hop < self._n_fft:
            raise ValueError("step*hop must cover one FFT frame")
        if self._n_fft % self._hop != 0:
            raise ValueError("streaming ISTFT needs hop | n_fft")
        K = int(self.context_windows)
        if K < 2 or K > cfg.model.max_len:
            raise ValueError(f"context_windows must be in [2, max_len], got {K}")
        self._K = K
        if self.margin_frames is None:
            self._margin = max(
                cqt_context_frames(a.sample_rate, a.cqt_bins, a.hop_length,
                                   a.cqt_bins_per_octave, a.cqt_fmin,
                                   a.cqt_filter_scale, a.cqt_algorithm),
                math.ceil((a.n_fft // 2) / a.hop_length))
        else:
            self._margin = int(self.margin_frames)
        self._chunk_frames = self._W + 2 * self._margin
        self._chunk_len = (self._chunk_frames - 1) * self._hop
        self._tid = (NAME_TO_ID[self.target]
                     if isinstance(self.target, str) else int(self.target))
        # the jitted step is cached on the PIPELINE so concurrent streams
        # (e.g. per-connection streams in the serving daemon) share one
        # compiled program per (K, margin, debug) choice
        cache = self.pipe.__dict__.setdefault("_stream_steps", {})
        key = (K, self._margin, self.collect_windows)
        if key not in cache:
            cache[key] = _build_stream_step(self.pipe, K, self._margin,
                                            debug=self.collect_windows)
        self._step = cache[key]
        d = cfg.model.d_model
        start = np.asarray(
            self.pipe.decoder.apply(self.pipe.decoder_vars, 1,
                                    method=Decoder.start_tokens))[0]  # (1, d)
        inputs0 = np.zeros((K, d), np.float32)
        inputs0[:1] = start
        self._state = StreamState(
            tokens=jnp.zeros((K, d), jnp.float32),
            inputs=jnp.asarray(inputs0),
            n_windows=jnp.asarray(0, jnp.int32),
            spec_tail=jnp.zeros((2, self._O, a.stft_bins), jnp.float32),
            sig_tail=jnp.zeros((self._n_fft - self._hop,), jnp.float32),
            env_tail=jnp.zeros((self._n_fft - self._hop,), jnp.float32),
        )
        self._buf = np.zeros(0, np.float32)
        self._buf_start = 0      # global sample index of _buf[0]
        self._total_in = 0       # samples pushed so far
        self._next_w = 0         # next window index
        self._trim_left = self._n_fft // 2  # center-trim of the output stream
        # Hold the last n_fft//2 produced samples back until flush: the
        # offline ISTFT trims n_fft//2 from BOTH ends, and only flush knows
        # where the stream ends. Adds n_fft/2 samples (~12 ms) of latency.
        self._hold = self._n_fft // 2
        self._pending = np.zeros(0, np.float32)  # produced, not yet returned
        self._returned = 0       # samples already handed to the caller
        self._finished = False
        self.windows: list = []  # decoded windows (collect_windows=True)

    # ------------------------------------------------------------------

    @property
    def algorithmic_latency_seconds(self) -> float:
        """Worst-case stream latency excluding compute: a window's oldest
        sample is emitted once the stream reaches the end of its chunk."""
        a = self.pipe.cfg.audio
        return (self._W + self._margin) * self._hop / a.sample_rate

    def _chunk_start(self, w: int) -> int:
        return (w * self._P - self._margin) * self._hop

    def _extract_chunk(self, start: int) -> np.ndarray:
        """Assemble [start, start+chunk_len) from the buffer, zero-filling
        the pre-stream region (and, at flush, the post-stream region)."""
        out = np.zeros(self._chunk_len, np.float32)
        lo = max(start, self._buf_start)
        hi = min(start + self._chunk_len, self._total_in)
        if hi > lo:
            out[lo - start:hi - start] = self._buf[lo - self._buf_start:
                                                   hi - self._buf_start]
        return out

    def _run_window(self, w: int, n_valid_frames: int) -> np.ndarray:
        chunk = jnp.asarray(self._extract_chunk(self._chunk_start(w)))
        res = self._step(chunk, self._state, self.pipe.class_embeddings,
                         jnp.asarray(self._tid), self.pipe.content_vars_infer,
                         self.pipe.decoder_vars,
                         jnp.asarray(n_valid_frames, jnp.int32))
        if self.collect_windows:
            self._state, emit, win = res
            self.windows.append(np.asarray(win))
        else:
            self._state, emit = res
        return np.asarray(emit)

    def _trim(self, samples: np.ndarray) -> np.ndarray:
        """Drop the stream-initial n_fft//2 samples (ISTFT center trim)."""
        if self._trim_left > 0:
            cut = min(self._trim_left, len(samples))
            self._trim_left -= cut
            samples = samples[cut:]
        return samples

    def _release(self, produced: np.ndarray) -> np.ndarray:
        """Queue newly produced (already-trimmed) samples; return everything
        but the last `_hold` samples (flush resolves those)."""
        self._pending = np.concatenate([self._pending, produced])
        if len(self._pending) <= self._hold:
            return np.zeros(0, np.float32)
        ret = self._pending[: len(self._pending) - self._hold]
        self._pending = self._pending[len(self._pending) - self._hold:]
        self._returned += len(ret)
        return ret

    def push(self, samples) -> np.ndarray:
        """Feed PCM float samples (any block size); returns every output
        sample that became final — possibly empty, possibly several windows'
        worth."""
        if self._finished:
            raise RuntimeError("stream already flushed")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._total_in += len(samples)
        out = []
        while True:
            end = self._chunk_start(self._next_w) + self._chunk_len
            if self._total_in < end:
                break
            out.append(self._run_window(self._next_w, self._W))
            self._next_w += 1
            keep_from = max(0, self._chunk_start(self._next_w))
            if keep_from > self._buf_start:
                self._buf = self._buf[keep_from - self._buf_start:]
                self._buf_start = keep_from
        produced = (np.concatenate(out) if out else np.zeros(0, np.float32))
        return self._release(self._trim(produced))

    def flush(self) -> np.ndarray:
        """End of stream: process the final partial window (kept iff its
        frame count >= window_size/2, the reference drop rule —
        utilityFunctions.py:253-255), emit the remaining overlap-average
        tail, and match the offline ISTFT length hop*(T-1) exactly."""
        if self._finished:
            return np.zeros(0, np.float32)
        self._finished = True
        hop, n_fft = self._hop, self._n_fft
        T_total = 1 + self._total_in // hop
        start = self._next_w * self._P
        produced = np.zeros(0, np.float32)
        if T_total - start >= self._W * 0.5:
            valid = min(self._W, T_total - start)
            produced = self._run_window(self._next_w, valid)
            self._next_w += 1
        if self._next_w == 0:
            raise ValueError(
                f"stream too short: {T_total} frames < window_size/2")

        # ---- numpy tail: pending overlap frames + offline length semantics
        spec_tail = np.asarray(self._state.spec_tail)      # (2, O, F)
        sig_tail = np.asarray(self._state.sig_tail)
        env_tail = np.asarray(self._state.env_tail)
        frames_done = self._next_w * self._P
        n_extra = T_total - frames_done  # canvas/crop frames still to render
        w2 = hann_window_np(n_fft) ** 2
        if n_extra > 0:
            total = n_extra * hop + n_fft - hop
            sig = np.zeros(total, np.float32)
            env = np.zeros(total, np.float32)
            sig[: len(sig_tail)] += sig_tail
            env[: len(env_tail)] += env_tail
            n_content = min(self._O, n_extra)
            if n_content > 0:
                spec = spec_tail[0, :n_content] + 1j * spec_tail[1, :n_content]
                fr = np.fft.irfft(spec, n=n_fft, axis=-1) * hann_window_np(n_fft)
                for i in range(n_content):
                    sig[i * hop: i * hop + n_fft] += fr[i]
            for i in range(n_extra):  # every frame < T counts in the envelope
                env[i * hop: i * hop + n_fft] += w2
            tail_out = (sig / np.where(env > 1e-11, env, 1.0)).astype(np.float32)
        else:
            tail_out = (sig_tail / np.where(env_tail > 1e-11, env_tail, 1.0)
                        ).astype(np.float32)

        # offline: untrimmed length n_fft + hop*(T-1), center-trimmed to
        # hop*(T-1) (dsp/stft.py istft:385-392 semantics)
        final_len = hop * (T_total - 1)
        queued = np.concatenate([self._pending, self._trim(produced),
                                 self._trim(tail_out)])
        self._pending = np.zeros(0, np.float32)
        need = final_len - self._returned
        if need > len(queued):
            queued = np.concatenate(
                [queued, np.zeros(need - len(queued), np.float32)])
        ret = queued[: max(0, need)]
        self._returned += len(ret)
        return ret

    def process(self, waveform, block: int = 4096) -> np.ndarray:
        """Convenience: stream a whole waveform through push/flush."""
        wav = np.asarray(waveform, np.float32).reshape(-1)
        parts = [self.push(wav[i:i + block]) for i in range(0, len(wav), block)]
        parts.append(self.flush())
        return np.concatenate(parts)
