"""Normalization-statistics computation.

Capability-parity rebuild of Preprocessing_Dataset/compute_separated_stats.py
and compute_unified_stats.py, with two TPU-first changes: the per-clip
STFT+CQT runs on-device through the fused feature pipeline instead of
librosa-on-CPU, and the reference's output-filename bug is fixed (the
original saved BOTH instruments to the same stats_unified_stft_cqt.npz,
compute_separated_stats.py:57,71 — here separated stats land in the
per-instrument files the dataloader actually reads).

Aggregation formula preserved exactly: mean over clips of the per-clip
time-mean; std = sqrt(mean over clips of the per-clip time-variance)
(compute_separated_stats.py:27-42; clip std uses the unbiased ddof=1 variance
like torch.std)."""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.config import AudioConfig
from ast_tpu.data.audio_io import load_audio
from ast_tpu.data.dataset import list_audio_files
from ast_tpu.dsp.cqt import cqt_ri
from ast_tpu.dsp.norm import FeatureStats
from ast_tpu.dsp.stft import stft_ri


def _clip_moments(cfg: AudioConfig):
    @jax.jit
    def moments(waveform):
        s = stft_ri(waveform, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
        c = cqt_ri(waveform, sr=cfg.sample_rate, n_bins=cfg.cqt_bins,
                   hop_length=cfg.hop_length, algorithm=cfg.cqt_algorithm,
                   sparsity=cfg.cqt_sparsity,
                   bins_per_octave=cfg.cqt_bins_per_octave, fmin=cfg.cqt_fmin,
                   filter_scale=cfg.cqt_filter_scale)
        merged = jnp.concatenate([s, c], axis=2)  # (2, T, F)
        clip_mean = merged.mean(axis=1)           # (2, F)
        clip_var = merged.var(axis=1, ddof=1)     # (2, F), torch.std default
        return clip_mean, clip_var

    return moments


def compute_stats(file_list: List[str], cfg: AudioConfig = AudioConfig(),
                  label: str = "", log=print) -> Tuple[np.ndarray, np.ndarray]:
    """-> (mean (2, F), std (2, F)) over the concatenated STFT+CQT feature."""
    log(f"Compute stats for: {label or 'dataset'}")
    moments = _clip_moments(cfg)
    sum_mean, sum_var, count = None, None, 0
    for path in file_list:
        try:
            wav, _ = load_audio(path, cfg.sample_rate, cfg.clip_seconds)
            m, v = moments(jnp.asarray(wav[0]))
            m, v = np.asarray(m), np.asarray(v)
            if sum_mean is None:
                sum_mean, sum_var = m.copy(), v.copy()
            else:
                sum_mean += m
                sum_var += v
            count += 1
        except Exception as e:
            log(f"[Error] {path}: {e}")
    if count == 0:
        raise ValueError("no readable audio files")
    return sum_mean / count, np.sqrt(sum_var / count)


def _split_and_pack(mean: np.ndarray, std: np.ndarray,
                    cfg: AudioConfig, min_std: float = 0.0) -> FeatureStats:
    # min_std floors near-zero stds. The reference's formula has no floor
    # (real recordings never produce an all-silent bin across a corpus), but
    # synthetic corpora do — z-scoring then divides ~0 by ~0 and amplifies
    # numerical noise into huge feature values. 1e-2 is the validated value
    # from the round-3 fixed-configuration run (docs/TRAINING.md).
    if min_std > 0.0:
        std = np.maximum(std, min_std)
    f = cfg.stft_bins
    return FeatureStats(
        stft_mean=mean[:, :f].astype(np.float32),
        stft_std=std[:, :f].astype(np.float32),
        cqt_mean=mean[:, f:].astype(np.float32),
        cqt_std=std[:, f:].astype(np.float32),
    )


def compute_separated_stats(piano_dir: str, violin_dir: str, output_dir: str,
                            cfg: AudioConfig = AudioConfig(), log=print,
                            min_std: float = 0.0) -> dict:
    """Per-instrument stats -> stats_stft_cqt_{piano,violin}.npz (the files
    dataloader.py:43-44 reads)."""
    os.makedirs(output_dir, exist_ok=True)
    out = {}
    for name, directory in (("piano", piano_dir), ("violin", violin_dir)):
        mean, std = compute_stats(list_audio_files(directory), cfg, name, log)
        stats = _split_and_pack(mean, std, cfg, min_std)
        path = os.path.join(output_dir, f"stats_stft_cqt_{name}.npz")
        stats.save_npz(path)
        out[name] = path
        log(f"Saved {path}")
    return out


def compute_unified_stats(piano_dir: str, violin_dir: str, output_dir: str,
                          cfg: AudioConfig = AudioConfig(), log=print,
                          min_std: float = 0.0) -> str:
    """Whole-train-set stats -> stats_unified_stft_cqt.npz
    (compute_unified_stats.py)."""
    os.makedirs(output_dir, exist_ok=True)
    files = list_audio_files(piano_dir) + list_audio_files(violin_dir)
    mean, std = compute_stats(files, cfg, "unified", log)
    stats = _split_and_pack(mean, std, cfg, min_std)
    path = os.path.join(output_dir, "stats_unified_stft_cqt.npz")
    stats.save_npz(path)
    log(f"Saved {path}")
    return path
