"""Host-side streaming-session machinery (flax-free).

The live-streaming transfer (ast_tpu/eval/streaming.py) splits into two
halves: a fixed-shape DEVICE step (one XLA program per analysis window) and
the HOST bookkeeping around it (sample buffering, chunk extraction, window
scheduling, ISTFT center-trim/hold, flush-time tail rendering). This module
holds the host half plus the device-state container, with NO model-code
dependencies (numpy + the DSP constants only), so that

* `eval.streaming.StreamingTransfer` builds sessions from a live flax
  pipeline (its device step closes over module applies), and
* `export.ExportedPipeline.stream_session` builds sessions from a
  `jax.export`'d step program on a model-code-free serving host —
  the artifact path that previously had to answer /stream with 501,

share one tested push/flush implementation.

Reference scope: the reference is strictly offline (`process_audio` needs
the whole clip, evaluation_style_transfer.py:135-159); streaming is a
capability extension. The flush-time length/trim semantics reproduce the
reference's torch.istft behavior exactly (utilityFunctions.py:62-82).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import numpy as np


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

    tokens: object
    inputs: object
    n_windows: object
    spec_tail: object
    sig_tail: object
    env_tail: object


@dataclasses.dataclass(frozen=True)
class StreamGeometry:
    """Static stream-session geometry, shared by the pipeline-backed and
    artifact-backed sessions (and serialized into artifact manifests)."""

    sample_rate: int
    hop: int
    n_fft: int
    window_size: int      # W: frames per analysis window
    overlap: int          # O: eval-side overlap frames
    margin: int           # featurization context frames per side
    context_windows: int  # K: model ring size
    max_len: int = 500    # PE table bound on K

    @property
    def step_frames(self) -> int:  # P
        return self.window_size - self.overlap

    @property
    def chunk_frames(self) -> int:
        return self.window_size + 2 * self.margin

    @property
    def chunk_len(self) -> int:
        return (self.chunk_frames - 1) * self.hop

    def validate(self) -> None:
        W, O, P = self.window_size, self.overlap, self.step_frames
        if O >= P:
            raise ValueError(
                f"streaming requires overlap < step (overlap {O}, window "
                f"{W}): windows may only overlap immediate neighbours")
        if O >= W * 0.5:
            raise ValueError("streaming requires overlap < window_size/2")
        if P * self.hop < self.n_fft:
            raise ValueError("step*hop must cover one FFT frame")
        if self.n_fft % self.hop != 0:
            raise ValueError("streaming ISTFT needs hop | n_fft")
        K = self.context_windows
        if K < 2 or K > self.max_len:
            raise ValueError(
                f"context_windows must be in [2, max_len], got {K}")


def _hann_np(n: int) -> np.ndarray:
    # torch.hann_window(periodic=True) (dsp/stft.py hann_window_np)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(
        np.float32)


class StreamSession:
    """Push-based streaming session around an injected device step.

    runner(chunk, state, target_id, n_valid_frames) -> (state', emit)
    (+ the raw decoded window when collect_windows=True) — either a jitted
    flax step, a serving daemon's cross-session stream batcher, or a
    deserialized jax.export program.

    The concatenation of everything returned by push()/flush() equals the
    offline overlap-average + ISTFT of the stream's decoded windows (same
    envelope division, center trim and hop*(T-1) length as `dsp.stft.istft`).
    """

    def __init__(self, geometry: StreamGeometry, init_state: StreamState,
                 runner: Callable, target_id: int,
                 collect_windows: bool = False):
        geometry.validate()
        g = geometry
        self.geometry = g
        self._W, self._O, self._P = g.window_size, g.overlap, g.step_frames
        self._hop, self._n_fft = g.hop, g.n_fft
        self._K, self._margin = g.context_windows, g.margin
        self._chunk_frames = g.chunk_frames
        self._chunk_len = g.chunk_len
        self._tid = int(target_id)
        self._runner = runner
        self.collect_windows = collect_windows
        self._state = init_state
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
        g = self.geometry
        return (self._W + self._margin) * self._hop / g.sample_rate

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
        chunk = self._extract_chunk(self._chunk_start(w))
        res = self._runner(chunk, self._state, self._tid, n_valid_frames)
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
        hann = _hann_np(n_fft)
        w2 = hann ** 2
        if n_extra > 0:
            total = n_extra * hop + n_fft - hop
            sig = np.zeros(total, np.float32)
            env = np.zeros(total, np.float32)
            sig[: len(sig_tail)] += sig_tail
            env[: len(env_tail)] += env_tail
            n_content = min(self._O, n_extra)
            if n_content > 0:
                spec = spec_tail[0, :n_content] + 1j * spec_tail[1, :n_content]
                fr = np.fft.irfft(spec, n=n_fft, axis=-1) * hann
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


def initial_state_np(K: int, d: int, overlap: int, stft_bins: int,
                     n_fft: int, hop: int,
                     start_token: Optional[np.ndarray]) -> StreamState:
    """Fresh host-side StreamState (numpy; callers device_put as needed).
    start_token: (d,) decoder start embedding for input-ring slot 0."""
    inputs0 = np.zeros((K, d), np.float32)
    if start_token is not None:
        inputs0[0] = np.asarray(start_token, np.float32).reshape(-1)
    return StreamState(
        tokens=np.zeros((K, d), np.float32),
        inputs=inputs0,
        n_windows=np.asarray(0, np.int32),
        spec_tail=np.zeros((2, overlap, stft_bins), np.float32),
        sig_tail=np.zeros((n_fft - hop,), np.float32),
        env_tail=np.zeros((n_fft - hop,), np.float32),
    )
