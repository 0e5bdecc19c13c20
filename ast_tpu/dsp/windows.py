"""Spectrogram windowing: slicing into fixed-size overlapping sections and
overlap-average reconstruction.

TPU-native rework of the reference's Python loops
(reference: utilityFunctions.py:240-263 `get_overlap_windows`,
utilityFunctions.py:265-283 `sections2spectrogram`): the slice loop becomes a
single static gather (one XLA op); the reconstruction loop becomes S shifted
pad+adds (pure elementwise, fuses in XLA) for the common small-S case, with a
single scatter-add fallback for minute-scale clips (S > 32, where an
unrolled pad chain would bloat the HLO), divided by a precomputed per-frame
count — all jittable and batchable.

Semantics preserved exactly:
  * step = window_size - overlap
  * trailing window shorter than window_size/2 is dropped; shorter-but-kept
    windows are zero-padded to window_size
  * reconstruction averages overlapping frames and crops to `original_size`
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ast_tpu.config import AudioConfig

_DEF = AudioConfig()


@functools.lru_cache(maxsize=32)
def window_starts(n_time: int, window_size: int, overlap: int) -> tuple:
    """Start frame of each kept window (reference loop semantics,
    utilityFunctions.py:249-261)."""
    step = window_size - overlap
    starts = []
    for start in range(0, n_time, step):
        end = min(start + window_size, n_time)
        if end - start < window_size * 0.5:
            break
        starts.append(start)
        if end == n_time:
            break
    return tuple(starts)


def num_windows(n_time: int, window_size: int = _DEF.window_size,
                overlap: int = _DEF.overlap_frames) -> int:
    return len(window_starts(n_time, window_size, overlap))


def get_overlap_windows(
    spec: jnp.ndarray,
    window_size: int = _DEF.window_size,
    overlap_frames: int = _DEF.overlap_frames,
) -> jnp.ndarray:
    """(2, T, F) -> (S, 2, window_size, F), with zero-padded tail windows.

    T is static under jit (XLA requirement), so the gather index matrix is a
    trace-time constant."""
    _, n_time, _ = spec.shape
    starts = window_starts(n_time, window_size, overlap_frames)
    if len(starts) == 0:
        raise ValueError(f"spectrogram too short: T={n_time} < {window_size/2}")
    # Starts are static, so each window is a static slice (zero-padded past
    # T for the tail window) — slices + one stack instead of an XLA gather.
    outs = []
    for start in starts:
        end = min(start + window_size, n_time)
        w = spec[:, start:end, :]
        if end - start < window_size:
            w = jnp.pad(w, ((0, 0), (0, window_size - (end - start)), (0, 0)))
        outs.append(w)
    return jnp.stack(outs, axis=0)


def get_overlap_windows_cl(
    spec: jnp.ndarray,
    window_size: int = _DEF.window_size,
    overlap_frames: int = _DEF.overlap_frames,
) -> jnp.ndarray:
    """Channels-last variant: (T, F, 2) -> (S, window_size, F, 2).

    Same reference loop semantics as get_overlap_windows
    (utilityFunctions.py:249-261); used by the fused inference cores so the
    per-window CNN receives NHWC directly (no materialized transpose)."""
    n_time = spec.shape[0]
    starts = window_starts(n_time, window_size, overlap_frames)
    if len(starts) == 0:
        raise ValueError(f"spectrogram too short: T={n_time} < {window_size/2}")
    outs = []
    for start in starts:
        end = min(start + window_size, n_time)
        w = spec[start:end]
        if end - start < window_size:
            w = jnp.pad(w, ((0, window_size - (end - start)), (0, 0), (0, 0)))
        outs.append(w)
    return jnp.stack(outs, axis=0)


@functools.lru_cache(maxsize=32)
def _ola_counts(n_sections: int, window_size: int, overlap: int) -> np.ndarray:
    hop = window_size - overlap
    n_time = hop * (n_sections - 1) + window_size
    count = np.zeros(n_time, dtype=np.float32)
    for i in range(n_sections):
        count[i * hop : i * hop + window_size] += 1.0
    return np.maximum(count, 1.0)


def sections2spectrogram(
    sections: jnp.ndarray,
    original_size: int,
    overlap: int = _DEF.overlap_frames,
) -> jnp.ndarray:
    """(S, 2, W, F) -> (2, original_size, F) by overlap-averaging
    (reference: utilityFunctions.py:265-283)."""
    n_sections, ch, window_size, n_freq = sections.shape
    hop = window_size - overlap
    n_time = hop * (n_sections - 1) + window_size

    if n_sections <= 32:
        # S is small and static: the overlap-add is S shifted pad+adds (pure
        # elementwise, fuses in XLA) instead of a scatter over S*W rows.
        full = None
        for s in range(n_sections):
            shifted = jnp.pad(
                sections[s],
                ((0, 0), (s * hop, n_time - s * hop - window_size), (0, 0)))
            full = shifted if full is None else full + shifted
    else:
        # minute-scale clips: an unrolled pad chain would bloat the HLO;
        # keep the single scatter-add
        idx = (np.arange(n_sections)[:, None] * hop
               + np.arange(window_size)[None, :]).reshape(-1)
        flat = jnp.transpose(sections, (1, 0, 2, 3)).reshape(ch, -1, n_freq)
        full = jnp.zeros((ch, n_time, n_freq), dtype=sections.dtype)
        full = full.at[:, idx, :].add(flat)
    count = jnp.asarray(_ola_counts(n_sections, window_size, overlap))
    full = full / count[None, :, None]
    out = full[:, :original_size, :]
    if original_size > n_time:
        out = jnp.pad(out, ((0, 0), (0, original_size - n_time), (0, 0)))
    return out


def concat_stft_cqt(stft_ri: jnp.ndarray, cqt_ri: jnp.ndarray) -> jnp.ndarray:
    """Concatenate (2, T, F1) and (2, T, F2) on the frequency axis
    (reference: utilityFunctions.py:285-299)."""
    if stft_ri.ndim != 3 or cqt_ri.ndim != 3:
        raise ValueError(f"Both tensors must be 3D, got {stft_ri.ndim}D and {cqt_ri.ndim}D.")
    if stft_ri.shape[0] != cqt_ri.shape[0] or stft_ri.shape[1] != cqt_ri.shape[1]:
        raise ValueError(
            f"Channel/Time mismatch: stft {stft_ri.shape[:2]} vs cqt {cqt_ri.shape[:2]}"
        )
    return jnp.concatenate([stft_ri, cqt_ri], axis=2)
