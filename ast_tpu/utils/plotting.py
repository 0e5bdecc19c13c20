"""Spectrogram visualization.

Capability-parity rebuild of plot_stft / plot_cqt
(reference: utilityFunctions.py:124-238): magnitude (optionally dB) and phase
panels, handling both single (2, T, F) tensors and stacked (S, 2, T, F)
sections. Figures are returned (Agg backend) instead of plt.show()'d so they
work headless."""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _sections_of(spectrogram) -> List[np.ndarray]:
    arr = np.asarray(spectrogram)
    if arr.ndim == 3:
        return [arr]
    if arr.ndim == 4:
        return [arr[i] for i in range(arr.shape[0])]
    raise ValueError(f"Expected 3D or 4D tensor, got shape {arr.shape}")


def _plot(sections, sr, hop_length, log_scale, freq_extent, ylabel, title_base,
          save_path: Optional[str]):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figs = []
    for idx, sec in enumerate(sections):
        real, imag = sec[0], sec[1]
        mag = np.hypot(real, imag)
        if log_scale:
            mag = 20 * np.log10(mag + 1e-8)
        phase = np.arctan2(imag, real)
        prefix = f"Section {idx}: " if len(sections) > 1 else ""
        extent = [0, sec.shape[1] * hop_length / sr, 0,
                  freq_extent if freq_extent else sec.shape[2]]

        fig, axes = plt.subplots(1, 2, figsize=(14, 4))
        im0 = axes[0].imshow(mag.T, origin="lower", aspect="auto", extent=extent)
        fig.colorbar(im0, ax=axes[0], label="Magnitude (dB)" if log_scale else "Magnitude")
        axes[0].set_xlabel("Time (s)")
        axes[0].set_ylabel(ylabel)
        axes[0].set_title(f"{prefix}{title_base} Magnitude")

        im1 = axes[1].imshow(phase.T, origin="lower", cmap="hsv", aspect="auto",
                             extent=extent)
        fig.colorbar(im1, ax=axes[1], label="Phase (rad)")
        axes[1].set_xlabel("Time (s)")
        axes[1].set_ylabel(ylabel)
        axes[1].set_title(f"{prefix}{title_base} Phase")
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path if len(sections) == 1
                        else save_path.replace(".png", f"_{idx}.png"))
        figs.append(fig)
    return figs


def plot_stft(spectrogram, sr: int = 22050, hop_length: int = 256,
              log_scale: bool = True, save_path: Optional[str] = None):
    """(utilityFunctions.py:124-175)."""
    return _plot(_sections_of(spectrogram), sr, hop_length, log_scale,
                 sr / 2, "Frequency (Hz)", "STFT", save_path)


def plot_cqt(spectrogram, sr: int = 22050, hop_length: int = 256,
             log_scale: bool = True, save_path: Optional[str] = None):
    """(utilityFunctions.py:177-238)."""
    return _plot(_sections_of(spectrogram), sr, hop_length, log_scale,
                 None, "CQT bins", "CQT", save_path)
