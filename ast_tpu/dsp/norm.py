"""Per-bin z-score normalization and stats handling.

Reference behavior: dataloader.py:9-13 (`normalize`: broadcast a (2, F)
mean/std over time with eps=1e-8) and dataloader.py:41-89 (separate
per-instrument stats npz with unified / dummy fallbacks).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def normalize(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray,
              eps: float = 1e-8) -> jnp.ndarray:
    """z-score a (2, T, F) feature with (2, F) stats (dataloader.py:9-13)."""
    return (x - mean[:, None, :]) / (std[:, None, :] + eps)


def denormalize(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray,
                eps: float = 1e-8) -> jnp.ndarray:
    return x * (std[:, None, :] + eps) + mean[:, None, :]


def normalize_cl(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray,
                 eps: float = 1e-8) -> jnp.ndarray:
    """Channels-last normalize: (T, F, 2) feature with the same (2, F) stats
    (identical arithmetic to normalize; layout for the fused NHWC path)."""
    return (x - mean.T[None, :, :]) / (std.T[None, :, :] + eps)


@dataclasses.dataclass(frozen=True)
class FeatureStats:
    """Normalization stats for one instrument: (2, F_stft) + (2, F_cqt)."""

    stft_mean: np.ndarray
    stft_std: np.ndarray
    cqt_mean: np.ndarray
    cqt_std: np.ndarray

    @property
    def concat_mean(self) -> np.ndarray:
        return np.concatenate([self.stft_mean, self.cqt_mean], axis=1)

    @property
    def concat_std(self) -> np.ndarray:
        return np.concatenate([self.stft_std, self.cqt_std], axis=1)

    @classmethod
    def identity(cls, stft_bins: int = 513, cqt_bins: int = 84) -> "FeatureStats":
        """Dummy zero-mean/unit-std stats (dataloader.py:80-89 fallback)."""
        return cls(
            stft_mean=np.zeros((2, stft_bins), np.float32),
            stft_std=np.ones((2, stft_bins), np.float32),
            cqt_mean=np.zeros((2, cqt_bins), np.float32),
            cqt_std=np.ones((2, cqt_bins), np.float32),
        )

    @classmethod
    def from_npz(cls, path: str) -> "FeatureStats":
        data = np.load(path)
        return cls(
            stft_mean=np.asarray(data["stft_mean"], np.float32),
            stft_std=np.asarray(data["stft_std"], np.float32),
            cqt_mean=np.asarray(data["cqt_mean"], np.float32),
            cqt_std=np.asarray(data["cqt_std"], np.float32),
        )

    def save_npz(self, path: str) -> None:
        np.savez(path, stft_mean=self.stft_mean, stft_std=self.stft_std,
                 cqt_mean=self.cqt_mean, cqt_std=self.cqt_std)


def packaged_stats_dir() -> str:
    """Directory of the stats artifacts shipped with the package — converted
    copies of the reference's trained normalization statistics
    (reference: train_set_stats/stats_stft_cqt_{piano,violin}.npz +
    stats_unified_stft_cqt.npz), so default eval/training uses the
    reference's actual normalization out of the box."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "stats")


def load_instrument_stats(
    stats_dir: Optional[str],
    use_separate_stats: bool = True,
    unified_path: Optional[str] = None,
    stft_bins: int = 513,
    cqt_bins: int = 84,
    warn=print,
) -> dict:
    """Load {0: piano stats, 1: violin stats} with the reference's fallback
    chain (dataloader.py:41-89): separate npz files -> unified npz -> dummy —
    extended with a packaged-artifact fallback (the reference's shipped stats,
    re-saved under ast_tpu/stats/) tried before degrading to dummy."""
    dummy = lambda: {0: FeatureStats.identity(stft_bins, cqt_bins),
                     1: FeatureStats.identity(stft_bins, cqt_bins)}
    # packaged fallback only applies at the reference's full feature size and
    # only when the caller asked for stats (stats_dir=None means "none")
    packaged = (packaged_stats_dir()
                if stft_bins == 513 and cqt_bins == 84 else None)
    if use_separate_stats:
        if stats_dir is None:
            return dummy()
        for d in (stats_dir, packaged):
            if d is None:
                continue
            piano_p = os.path.join(d, "stats_stft_cqt_piano.npz")
            violin_p = os.path.join(d, "stats_stft_cqt_violin.npz")
            if os.path.exists(piano_p) and os.path.exists(violin_p):
                if d is not stats_dir:
                    warn(f"Warning: separate stats not found under {stats_dir}; "
                         f"using packaged reference stats from {d}.")
                return {0: FeatureStats.from_npz(piano_p),
                        1: FeatureStats.from_npz(violin_p)}
        warn(f"Warning: separate stats not found under {stats_dir}; using dummy normalization.")
        return dummy()

    path = unified_path
    if path is None and stats_dir is not None:
        path = os.path.join(stats_dir, "stats_unified_stft_cqt.npz")
    if path is not None and os.path.exists(path):
        s = FeatureStats.from_npz(path)
        return {0: s, 1: s}
    if path is not None and packaged is not None:
        packaged_uni = os.path.join(packaged, "stats_unified_stft_cqt.npz")
        if os.path.exists(packaged_uni):
            warn(f"Warning: combined stats file {path} not found; "
                 f"using packaged reference stats {packaged_uni}.")
            s = FeatureStats.from_npz(packaged_uni)
            return {0: s, 1: s}
    warn(f"Warning: combined stats file {path} not found; using dummy normalization.")
    return dummy()
