"""Synthetic data fixtures.

Capability parity with the reference's only synthetic backend
(Preprocessing_Dataset/dummy_dataloader.py:5-28: random (S, 2, 287, 597)
windows + random label), plus a wav-fixture generator the reference lacks so
the real decode->featurize->train path is testable without a dataset."""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np

from ast_tpu.config import AudioConfig
from ast_tpu.data.audio_io import write_wav


def dummy_batches(batch_size: int = 16, sections: int = 4,
                  window_size: int = 287, feat_bins: int = 597,
                  seed: int = 0, num_batches: int = 8,
                  ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Random balanced batches in the model input layout — the
    dummy_dataloader.py equivalent."""
    rng = np.random.default_rng(seed)
    half = batch_size // 2
    for _ in range(num_batches):
        x = rng.standard_normal(
            (batch_size, sections, 2, window_size, feat_bins)).astype(np.float32)
        labels = np.concatenate([np.zeros(half, np.int32), np.ones(half, np.int32)])
        yield x, labels


def make_wav_fixture(root: str, n_clips: int = 3,
                     cfg: AudioConfig = AudioConfig(), seed: int = 0,
                     seconds: float = None) -> Tuple[str, str]:
    """Write deterministic synthetic piano/ violin-ish wav trees under `root`;
    returns (piano_dir, violin_dir). Piano clips are decaying harmonic stacks,
    violin clips are vibrato-modulated saw-ish tones — enough spectral
    difference for smoke-level class separation."""
    rng = np.random.default_rng(seed)
    sr = cfg.sample_rate
    dur = cfg.clip_seconds if seconds is None else seconds
    n = int(dur * sr)
    t = np.arange(n) / sr

    piano_dir = os.path.join(root, "piano")
    violin_dir = os.path.join(root, "violin")
    os.makedirs(piano_dir, exist_ok=True)
    os.makedirs(violin_dir, exist_ok=True)

    for i in range(n_clips):
        f0 = 220.0 * 2 ** (rng.integers(0, 12) / 12)
        piano = np.zeros(n)
        for h in range(1, 6):
            piano += (0.5 / h) * np.sin(2 * np.pi * f0 * h * t) * np.exp(-2.5 * t * h)
        # re-strike some notes
        for strike in rng.uniform(0.2, dur * 0.9, 3):
            idx = int(strike * sr)
            seg_t = t[: n - idx]
            piano[idx:] += 0.4 * np.sin(2 * np.pi * f0 * 1.5 * seg_t) * np.exp(-3 * seg_t)
        write_wav(os.path.join(piano_dir, f"piano_{i:03d}.wav"),
                  0.8 * piano / (np.max(np.abs(piano)) + 1e-9), sr)

        f1 = 330.0 * 2 ** (rng.integers(0, 12) / 12)
        vib = f1 * (1 + 0.008 * np.sin(2 * np.pi * 5.5 * t))
        phase = 2 * np.pi * np.cumsum(vib) / sr
        violin = np.zeros(n)
        for h in range(1, 9):
            violin += (0.6 / h) * np.sin(h * phase)
        env = np.minimum(1.0, t * 8) * np.minimum(1.0, (dur - t) * 4)
        violin *= env
        write_wav(os.path.join(violin_dir, f"violin_{i:03d}.wav"),
                  0.8 * violin / (np.max(np.abs(violin)) + 1e-9), sr)

    return piano_dir, violin_dir
