"""Fused feature-extraction pipeline: waveform -> model input windows.

Replaces the reference's per-clip host pipeline (dataloader.py:94-121:
get_STFT -> get_CQT(librosa, CPU) -> normalize -> concat -> windows) with one
jitted on-device function. The STFT and CQT share the framing machinery and
their FFTs batch together; normalization and windowing fuse into the same XLA
program, so a clip never leaves the device between decode and model input.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ast_tpu.config import AudioConfig
from ast_tpu.dsp.cqt import cqt_ri
from ast_tpu.dsp.norm import normalize
from ast_tpu.dsp.stft import stft_ri
from ast_tpu.dsp.windows import concat_stft_cqt, get_overlap_windows

_DEF = AudioConfig()


def extract_features(
    waveform: jnp.ndarray,
    stft_mean: jnp.ndarray,
    stft_std: jnp.ndarray,
    cqt_mean: jnp.ndarray,
    cqt_std: jnp.ndarray,
    cfg: AudioConfig = _DEF,
    overlap_frames: Optional[int] = None,
) -> jnp.ndarray:
    """(n_samples,) waveform -> (S, 2, window_size, F_stft+F_cqt) windows.

    Equivalent of the reference's dataloader.__getitem__ feature path for one
    instrument (dataloader.py:101-114)."""
    s = stft_ri(waveform, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                method=cfg.stft_method, precision=cfg.dft_precision)
    c = cqt_ri(waveform, sr=cfg.sample_rate, n_bins=cfg.cqt_bins,
               hop_length=cfg.hop_length, algorithm=cfg.cqt_algorithm,
               sparsity=cfg.cqt_sparsity, transform=cfg.cqt_transform,
               precision=cfg.dft_precision,
               bins_per_octave=cfg.cqt_bins_per_octave, fmin=cfg.cqt_fmin,
               filter_scale=cfg.cqt_filter_scale)
    s = normalize(s, stft_mean, stft_std)
    c = normalize(c, cqt_mean, cqt_std)
    feats = concat_stft_cqt(s, c)
    return get_overlap_windows(
        feats,
        window_size=cfg.window_size,
        overlap_frames=cfg.overlap_frames if overlap_frames is None else overlap_frames,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "overlap_frames"))
def extract_features_jit(waveform, stft_mean, stft_std, cqt_mean, cqt_std,
                         cfg: AudioConfig = _DEF, overlap_frames: Optional[int] = None):
    return extract_features(waveform, stft_mean, stft_std, cqt_mean, cqt_std,
                            cfg=cfg, overlap_frames=overlap_frames)


extract_features_batch = jax.vmap(
    extract_features, in_axes=(0, None, None, None, None)
)
