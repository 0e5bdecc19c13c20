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


# StreamState / the host session machinery live in the flax-free
# ast_tpu.streamcore so jax.export'd artifacts can stream on model-code-free
# hosts; re-exported here for back-compat.
from ast_tpu.streamcore import (  # noqa: E402
    StreamGeometry,
    StreamSession,
    StreamState,
    initial_state_np,
)


def _subvars(variables, name: str):
    """Slice every collection of a flax variable dict down to one submodule."""
    return {coll: tree[name] for coll, tree in variables.items() if name in tree}


def _irfft(spec: jnp.ndarray, n_fft: int, method: str, precision) -> jnp.ndarray:
    """The same inverse-DFT dispatch istft() uses (dsp/stft.py:349-355)."""
    method = resolve_dft_method(method)
    if method in ("matmul", "conv"):
        # the stream step OLAs frames itself (it carries an overlap tail
        # across chunks), so the fused conv-transpose formulation does not
        # apply here; "conv" degrades to the per-frame matmul inverse
        return irfft_matmul(spec, n_fft, dot_precision(precision))
    if method == "ct":
        return irfft_ct(spec, n_fft, dot_precision(precision))
    return jnp.fft.irfft(spec, n=n_fft, axis=-1)


def _build_stream_step_fn(pipe: StyleTransferPipeline, K: int, margin: int,
                          debug: bool = False):
    """The UNJITTED one-window stream step: featurize chunk -> content token
    -> causal transformer over the ring -> one decoder step -> OLA-mean ->
    streaming ISTFT. Returns (state', emitted_samples) (+ the raw output
    window with debug=True). `_build_stream_step` jits it for one session;
    `_build_stream_step_batched` vmaps it across concurrent sessions."""
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
        # the state rings stay f32 across steps (stable jit signature and
        # full-precision accumulation) even when the model computes in bf16
        tokens = jax.lax.dynamic_update_slice(
            tokens, token[None].astype(tokens.dtype), (pos, 0))
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
        inputs = jax.lax.dynamic_update_slice(
            inputs, fb[None].astype(inputs.dtype), (pos2, 0))

        # ---- overlap-average the first P frames final, stream-ISTFT them ----
        # f32 before the OLA/ISTFT tail state and lax.complex (bf16 models)
        win = (out[0, 0] * frame_valid[None, :, None]).astype(jnp.float32)
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


def _build_stream_step(pipe: StyleTransferPipeline, K: int, margin: int,
                       debug: bool = False):
    """One jitted per-session stream-step program."""
    return jax.jit(_build_stream_step_fn(pipe, K, margin, debug=debug))


def _build_stream_step_batched(pipe: StyleTransferPipeline, K: int,
                               margin: int):
    """One jitted program stepping a BATCH of concurrent sessions: vmap over
    (chunk, state, target_id, n_valid_frames); model variables and class
    embeddings are shared. This is what lets a serving daemon coalesce many
    live streams into one device call per output window (the step is fixed-
    shape, so sessions at the same (K, margin) batch freely)."""
    fn = _build_stream_step_fn(pipe, K, margin, debug=False)
    return jax.jit(jax.vmap(fn, in_axes=(0, 0, None, 0, None, None, 0)))


def resolve_margin(cfg, margin_frames: Optional[int]) -> int:
    """Resolve a session's featurization margin: None -> the exact analytic
    bound (the CQT's full receptive field incl. the recursive decimator
    chain, or the STFT center pad, whichever is larger — interior-window
    features then EQUAL the offline whole-signal ones, tested)."""
    if margin_frames is not None:
        return int(margin_frames)
    a = cfg.audio
    return max(
        cqt_context_frames(a.sample_rate, a.cqt_bins, a.hop_length,
                           a.cqt_bins_per_octave, a.cqt_fmin,
                           a.cqt_filter_scale, a.cqt_algorithm),
        math.ceil((a.n_fft // 2) / a.hop_length))


@dataclasses.dataclass
class StreamingTransfer(StreamSession):
    """Push-based streaming style transfer around a StyleTransferPipeline.

    >>> stream = StreamingTransfer(pipe, target="violin")
    >>> for block in microphone():        # arbitrary block sizes
    ...     play(stream.push(block))
    >>> play(stream.flush())

    The concatenation of everything returned equals the offline
    overlap-average + ISTFT of the stream's decoded windows (same envelope
    division, center trim and hop*(T-1) length as `istft`), with the model
    running causally over a `context_windows`-window sliding context.
    (push/flush live on the flax-free base, ast_tpu.streamcore.StreamSession,
    shared with artifact-backed sessions.)

    context_windows: model context K (content + decoder rings). While the
        stream is shorter than K windows the decode matches the offline
        causal prefix exactly; afterwards the context slides (stationary).
    margin_frames: featurization context on each side of a window. None
        (default) = the exact analytic bound — the CQT's full receptive
        field incl. the recursive decimator chain (dsp/cqt.py
        cqt_context_frames; 41 frames ~ 0.48 s at the standard config) or
        the STFT center pad, whichever is larger — at which interior-window
        features EQUAL the offline whole-signal ones (tested). Smaller
        explicit values trade accuracy at the lowest CQT octaves for
        latency.
    collect_windows: keep the decoded (2, W, stft_bins) windows on host
        (debugging/tests; costs one extra device->host copy per window).
    step_runner: optional external device-step dispatcher with the runner
        signature (chunk, state, target_id, n_valid_frames) ->
        (state', emit) — the serving daemon injects its cross-session
        stream batcher here so concurrent /stream sessions coalesce into
        one vmapped device call per window. Incompatible with
        collect_windows (the batched step has no debug output).
    """

    pipe: StyleTransferPipeline
    target: str | int = "violin"
    context_windows: int = 8
    margin_frames: Optional[int] = None
    collect_windows: bool = False
    step_runner: Optional[callable] = None

    def __post_init__(self):
        cfg = self.pipe.cfg
        a, m = cfg.audio, cfg.model
        K = int(self.context_windows)
        margin = resolve_margin(cfg, self.margin_frames)
        geometry = StreamGeometry(
            sample_rate=a.sample_rate, hop=a.hop_length, n_fft=a.n_fft,
            window_size=a.window_size, overlap=a.eval_overlap_frames,
            margin=margin, context_windows=K, max_len=m.max_len)
        tid = (NAME_TO_ID[self.target]
               if isinstance(self.target, str) else int(self.target))

        if self.step_runner is not None:
            if self.collect_windows:
                raise ValueError(
                    "collect_windows needs the per-session debug step; it "
                    "cannot ride an external step_runner")
            runner = self.step_runner
        else:
            # the jitted step is cached on the PIPELINE so concurrent
            # streams (e.g. per-connection streams in the serving daemon)
            # share one compiled program per (K, margin, debug) choice
            cache = self.pipe.__dict__.setdefault("_stream_steps", {})
            key = (K, margin, self.collect_windows)
            if key not in cache:
                cache[key] = _build_stream_step(self.pipe, K, margin,
                                                debug=self.collect_windows)
            step = cache[key]
            pipe = self.pipe

            def runner(chunk, state, target_id, n_valid_frames):
                return step(jnp.asarray(chunk), state,
                            pipe.class_embeddings,
                            jnp.asarray(target_id),
                            pipe.content_vars_infer, pipe.decoder_vars,
                            jnp.asarray(n_valid_frames, jnp.int32))

        start = np.asarray(
            self.pipe.decoder.apply(self.pipe.decoder_vars, 1,
                                    method=Decoder.start_tokens))[0, 0]
        init = initial_state_np(K, m.d_model, a.eval_overlap_frames,
                                a.stft_bins, a.n_fft, a.hop_length, start)
        StreamSession.__init__(self, geometry, init, runner, tid,
                               collect_windows=self.collect_windows)
