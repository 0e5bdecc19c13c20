"""Dual-instrument dataset and balanced batch pipeline.

Capability-parity rebuild of the reference data layer (dataloader.py):

* `DualInstrumentDataset` — pairs sorted piano/violin files, len = min of the
  two (dataloader.py:20-32), per-instrument stats npz with
  unified/dummy fallbacks (dataloader.py:41-89 via dsp.norm).
* `balanced_batches` — batches are (B, S, 2, W, F) with the first half piano
  (label 0) and second half violin (label 1), paired by item, exactly the
  collate contract (dataloader.py:123-147).
* `get_dataloader` — the reference entry point (dataloader.py:149-172),
  including odd-batch round-down and drop_last.

TPU-first redesign of the hot path: the reference runs the whole feature
chain per item on the host (librosa CQT pinned to CPU, SURVEY.md §3.1) and
its collate silently discards the SECOND half of every item batch (items
B/2..B are fully decoded + transformed, then never used —
dataloader.py:133-141). Here the host only decodes waveforms (C++ decoder);
STFT/CQT/normalize/window run batched on-device in one jit, and only the
B/2 items a batch actually needs are touched."""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.config import AudioConfig
from ast_tpu.data.audio_io import load_audio
from ast_tpu.dsp.features import extract_features
from ast_tpu.dsp.norm import load_instrument_stats

AUDIO_EXTS = (".wav", ".mp3")


def list_audio_files(directory: str) -> List[str]:
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith(AUDIO_EXTS)
    )


@dataclasses.dataclass
class DualInstrumentDataset:
    piano_files: List[str]
    violin_files: List[str]
    stats: dict  # {0: FeatureStats, 1: FeatureStats}
    cfg: AudioConfig = dataclasses.field(default_factory=AudioConfig)

    @classmethod
    def from_dirs(cls, piano_dir: str, violin_dir: str,
                  stats_path: Optional[str] = None,
                  use_separate_stats: bool = True,
                  stats_dir: Optional[str] = "train_set_stats",
                  cfg: AudioConfig = AudioConfig()) -> "DualInstrumentDataset":
        stats = load_instrument_stats(stats_dir, use_separate_stats,
                                      unified_path=stats_path,
                                      stft_bins=cfg.stft_bins,
                                      cqt_bins=cfg.cqt_bins)
        return cls(list_audio_files(piano_dir), list_audio_files(violin_dir),
                   stats, cfg)

    def __len__(self) -> int:
        return min(len(self.piano_files), len(self.violin_files))

    def load_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Decode one piano/violin waveform pair -> two (n_samples,) arrays."""
        cfg = self.cfg
        piano, _ = load_audio(self.piano_files[idx], cfg.sample_rate,
                              cfg.clip_seconds)
        violin, _ = load_audio(self.violin_files[idx], cfg.sample_rate,
                               cfg.clip_seconds)
        n = cfg.clip_samples
        return _fix_len(piano[0], n), _fix_len(violin[0], n)


def _fix_len(x: np.ndarray, n: int) -> np.ndarray:
    if len(x) < n:
        x = np.pad(x, (0, n - len(x)))
    return x[:n].astype(np.float32)


def _featurize_impl(piano_wavs, violin_wavs, piano_stats, violin_stats,
                    cfg: AudioConfig) -> jnp.ndarray:
    outs = []
    for wavs, st in ((piano_wavs, piano_stats), (violin_wavs, violin_stats)):
        f = jax.vmap(
            lambda w, s=st: extract_features(w, s[0], s[1], s[2], s[3], cfg=cfg)
        )(wavs)
        outs.append(f)
    return jnp.concatenate(outs, axis=0)  # (B, S, 2, W, F)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _featurize_core(piano_wavs, violin_wavs, piano_stats, violin_stats,
                    cfg: AudioConfig) -> jnp.ndarray:
    """On-device batched featurization with per-instrument stats — ONE jitted
    program per (batch, cfg) bucket (eager dispatch per-op is both slow and
    unsupported on some backends)."""
    return _featurize_impl(piano_wavs, violin_wavs, piano_stats, violin_stats,
                           cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _featurize_resident(piano_all, violin_all, idxs, piano_stats,
                        violin_stats, cfg: AudioConfig) -> jnp.ndarray:
    """Gather a batch out of the device-resident waveform banks and featurize
    it — one jitted program, no host->device waveform transfer per step."""
    piano = jnp.take(piano_all, idxs, axis=0)
    violin = jnp.take(violin_all, idxs, axis=0)
    return _featurize_impl(piano, violin, piano_stats, violin_stats, cfg)


def _featurize_batch(dataset: DualInstrumentDataset,
                     piano_wavs: jnp.ndarray,
                     violin_wavs: jnp.ndarray) -> jnp.ndarray:
    def pack(stats):
        return (jnp.asarray(stats.stft_mean), jnp.asarray(stats.stft_std),
                jnp.asarray(stats.cqt_mean), jnp.asarray(stats.cqt_std))

    return _featurize_core(piano_wavs, violin_wavs, pack(dataset.stats[0]),
                           pack(dataset.stats[1]), dataset.cfg)


def balanced_batches(
    dataset: DualInstrumentDataset,
    batch_size: int = 8,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epoch: int = 0,
) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Yield ((B, S, 2, W, F) windows, (B,) labels): first half piano
    (label 0), second half violin (label 1), paired by item."""
    if batch_size % 2 != 0:
        print(f"Warning: batch_size={batch_size} is odd. Rounding down to "
              f"{batch_size - 1} for balanced batches.")
        batch_size -= 1
    half = batch_size // 2
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)

    for start in range(0, len(order), half):
        idxs = order[start : start + half]
        if len(idxs) < half and drop_last:
            break
        pw, vw = [], []
        for i in idxs:
            p, v = dataset.load_pair(int(i))
            pw.append(p)
            vw.append(v)
        piano = jnp.asarray(np.stack(pw))
        violin = jnp.asarray(np.stack(vw))
        x = _featurize_batch(dataset, piano, violin)
        labels = jnp.asarray(
            np.concatenate([np.zeros(len(idxs), np.int32),
                            np.ones(len(idxs), np.int32)]))
        yield x, labels


class ResidentBatches:
    """Device-resident balanced batches: decode + upload every waveform ONCE,
    then every epoch's batches gather + featurize on device in one jitted
    program per step.

    `balanced_batches` re-reads and re-uploads each batch's waveforms every
    epoch — on a relay-attached chip that transfer dominates the step (run1
    measured ~0.6-1.5 steps/s at B=64 against a 4 steps/s compute bound).
    Here the (N, n_samples) waveform banks live in HBM for the whole run
    (10 s clips: ~1.8 MB/pair — 768 pairs ≈ 1.35 GB), so long training runs
    iterate at device speed. Yields the identical (x, labels) contract as
    `balanced_batches` for the same seed/epoch (tested)."""

    def __init__(self, dataset: DualInstrumentDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, log=print):
        if batch_size % 2 != 0:
            batch_size -= 1
        self.half = batch_size // 2
        self.shuffle, self.seed, self.drop_last = shuffle, seed, drop_last
        self.dataset = dataset
        n = len(dataset)
        pw, vw = [], []
        for i in range(n):
            p, v = dataset.load_pair(i)
            pw.append(p)
            vw.append(v)
        self.piano = jnp.asarray(np.stack(pw))
        self.violin = jnp.asarray(np.stack(vw))
        self._stats = (
            tuple(jnp.asarray(a) for a in (
                dataset.stats[0].stft_mean, dataset.stats[0].stft_std,
                dataset.stats[0].cqt_mean, dataset.stats[0].cqt_std)),
            tuple(jnp.asarray(a) for a in (
                dataset.stats[1].stft_mean, dataset.stats[1].stft_std,
                dataset.stats[1].cqt_mean, dataset.stats[1].cqt_std)))
        log(f"resident dataset: {n} pairs "
            f"({self.piano.nbytes * 2 / 1e6:.0f} MB on device)")

    def __call__(self, epoch: int) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        half = self.half
        labels = jnp.asarray(np.concatenate([
            np.zeros(half, np.int32), np.ones(half, np.int32)]))
        for start in range(0, len(order), half):
            idxs = order[start:start + half]
            if len(idxs) < half and self.drop_last:
                break
            x = _featurize_resident(self.piano, self.violin,
                                    jnp.asarray(idxs, jnp.int32),
                                    self._stats[0], self._stats[1],
                                    self.dataset.cfg)
            yield x, (labels if len(idxs) == half else jnp.asarray(
                np.concatenate([np.zeros(len(idxs), np.int32),
                                np.ones(len(idxs), np.int32)])))


def get_dataloader(piano_dir: str, violin_dir: str, batch_size: int = 8,
                   shuffle: bool = True, stats_path: Optional[str] = None,
                   use_separate_stats: bool = True,
                   stats_dir: Optional[str] = "train_set_stats",
                   cfg: AudioConfig = AudioConfig(), seed: int = 0):
    """Reference-compatible entry point (dataloader.py:149-172). Returns
    (dataset, make_epoch_iterator(epoch))."""
    dataset = DualInstrumentDataset.from_dirs(
        piano_dir, violin_dir, stats_path, use_separate_stats, stats_dir, cfg)

    def epoch_iter(epoch: int = 0):
        return balanced_batches(dataset, batch_size, shuffle, seed,
                                drop_last=True, epoch=epoch)

    return dataset, epoch_iter


def diagnose_window_counts(piano_dir: str, violin_dir: str,
                           max_files: int = 10,
                           cfg: AudioConfig = AudioConfig()) -> None:
    """Window-count diagnostics (dataloader.py:174-211)."""
    from ast_tpu.dsp.windows import num_windows

    if not os.path.isdir(piano_dir) or not os.path.isdir(violin_dir):
        print("Warning: Directories not found:")
        print(f"  Piano: {piano_dir}")
        print(f"  Violin: {violin_dir}")
        return

    piano_files = list_audio_files(piano_dir)[:max_files]
    violin_files = list_audio_files(violin_dir)[:max_files]
    for p_path, v_path in zip(piano_files, violin_files):
        for name, path in (("Piano", p_path), ("Violin", v_path)):
            wav, sr = load_audio(path, cfg.sample_rate, cfg.clip_seconds)
            t = 1 + wav.shape[-1] // cfg.hop_length
            w = num_windows(t, cfg.window_size, cfg.overlap_frames)
            print(f"{name}: {os.path.basename(path):<35} | "
                  f"Duration: {wav.shape[-1] / sr:.2f}s | T: {t} | Windows: {w}")
        print("-" * 80)
