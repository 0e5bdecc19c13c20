"""Dataset inspection & analysis tools.

Capability-parity rebuild of the reference inspection scripts:
read_separated_npz.py / read_unified_npz.py (stats inspection + comparison
plots), dataset_tracks_analysis.py (duration/RMS/sr/MFCC summary),
dataset_variety.py (t-SNE of MFCC means), silent_tracks_dataset.py (silence
flagging) — librosa replaced by the framework's native feature code."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ast_tpu.data.audio_io import read_wav
from ast_tpu.data.dataset import list_audio_files
from ast_tpu.dsp.norm import FeatureStats
from ast_tpu.eval.audio_metrics import mfcc


def read_stats_npz(path: str, log=print) -> FeatureStats:
    """Print + return the contents of a stats npz (read_*_npz.py)."""
    stats = FeatureStats.from_npz(path)
    log(f"{os.path.basename(path)}:")
    for name, arr in (("stft_mean", stats.stft_mean), ("stft_std", stats.stft_std),
                      ("cqt_mean", stats.cqt_mean), ("cqt_std", stats.cqt_std)):
        log(f"  {name}: shape={arr.shape} min={arr.min():.4f} "
            f"max={arr.max():.4f} mean={arr.mean():.4f}")
    return stats


def plot_stats_comparison(piano_path: str, violin_path: str,
                          save_path: Optional[str] = None):
    """2x2 mean/std comparison plot (read_separated_npz.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = FeatureStats.from_npz(piano_path)
    v = FeatureStats.from_npz(violin_path)
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for col, (name, pa, va) in enumerate(
            (("stft", p.stft_mean, v.stft_mean), ("cqt", p.cqt_mean, v.cqt_mean))):
        axes[0, col].plot(pa[0], label="piano")
        axes[0, col].plot(va[0], label="violin")
        axes[0, col].set_title(f"{name} mean (real)")
        axes[0, col].legend()
    for col, (name, pa, va) in enumerate(
            (("stft", p.stft_std, v.stft_std), ("cqt", p.cqt_std, v.cqt_std))):
        axes[1, col].plot(pa[0], label="piano")
        axes[1, col].plot(va[0], label="violin")
        axes[1, col].set_title(f"{name} std (real)")
        axes[1, col].legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
    return fig


def analyze_dataset(path: str, log=print) -> Dict[str, list]:
    """Duration/RMS/sr/MFCC-mean per track (dataset_tracks_analysis.py)."""
    data: Dict[str, list] = {"filenames": [], "durations": [], "rms_levels": [],
                             "sample_rates": [], "mfcc_means": []}
    for fpath in list_audio_files(path):
        try:
            audio, sr = read_wav(fpath)
            y = audio.mean(axis=0)
            data["filenames"].append(os.path.basename(fpath))
            data["durations"].append(len(y) / sr)
            data["rms_levels"].append(float(np.sqrt(np.mean(y ** 2))))
            data["sample_rates"].append(sr)
            data["mfcc_means"].append(np.mean(mfcc(y, sr, 13), axis=1))
        except Exception as e:
            log(f"Error with {fpath}: {e}")
    return data


def summarize_statistics(name: str, stats: Dict[str, list], log=print) -> None:
    """(dataset_tracks_analysis.py:47-55)."""
    log(f"{name}")
    log(f"- Files analyzed: {len(stats['filenames'])}")
    log(f"- Average duration: {np.mean(stats['durations']):.2f} sec")
    log(f"- Average RMS: {np.mean(stats['rms_levels']):.4f}")
    log(f"- Unique sample rates: {set(stats['sample_rates'])}")
    log(f"- Global average MFCC (first coefficient): "
        f"{np.mean([m[0] for m in stats['mfcc_means']]):.2f}")


def dataset_variety_embedding(dirs_with_colors, perplexity: float = 30.0,
                              seed: int = 42, log=print):
    """t-SNE of 13-dim MFCC means over one or more datasets
    (dataset_variety.py); returns (embedding (N,2), labels, colors)."""
    from sklearn.manifold import TSNE

    feats, labels, colors = [], [], []
    for directory, color in dirs_with_colors:
        for fpath in list_audio_files(directory):
            try:
                audio, sr = read_wav(fpath)
                feats.append(np.mean(mfcc(audio.mean(axis=0), sr, 13), axis=1))
                labels.append(os.path.basename(fpath))
                colors.append(color)
            except Exception as e:
                log(f"[Error] {fpath}: {e}")
    feats = np.asarray(feats)
    perp = min(perplexity, max(1.0, len(feats) - 1.0))
    emb = TSNE(n_components=2, perplexity=perp,
               random_state=seed).fit_transform(feats)
    return emb, labels, colors


def frame_rms(y: np.ndarray, frame_length: int = 2048,
              hop_length: int = 512) -> np.ndarray:
    """Per-frame RMS (librosa.feature.rms analog, centered)."""
    pad = frame_length // 2
    yp = np.pad(y, (pad, pad))
    n = 1 + (len(yp) - frame_length) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return np.sqrt(np.mean(yp[idx] ** 2, axis=1))


def find_silent_tracks(directory: str, rms_threshold: float = 0.005,
                       silence_ratio_threshold: float = 0.3,
                       log=print) -> List[Tuple[str, float]]:
    """Flag tracks with >= 30% frames under RMS 0.005
    (silent_tracks_dataset.py)."""
    flagged = []
    for fpath in list_audio_files(directory):
        try:
            audio, _ = read_wav(fpath)
            rms = frame_rms(audio.mean(axis=0))
            ratio = float(np.sum(rms < rms_threshold)) / len(rms)
            if ratio >= silence_ratio_threshold:
                flagged.append((os.path.basename(fpath), ratio))
        except Exception as e:
            log(f"[Error] Failed to process {fpath}: {e}")
    return flagged
