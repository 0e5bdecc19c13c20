"""Dataset segmentation tools.

Capability-parity rebuild of the reference's one-shot segmenters
(Preprocessing_Dataset/split_BachViolinDataset.py, split_ViolinEtudes.py,
split_PianoMotion10M.py), operating on wav files via the framework's own
decoder instead of pydub/ffmpeg (no ffmpeg exists in this environment — mp3
sources must be converted upstream). The segment-count ladders, silence
filter, retry/slide logic and spacing rules match the reference scripts."""

from __future__ import annotations

import os
import random
from typing import List

import numpy as np

from ast_tpu.data.audio_io import read_wav, write_wav


def _dbfs(x: np.ndarray) -> float:
    """Mean-power dBFS of a float [-1,1] clip (pydub's segment.dBFS analog)."""
    rms = np.sqrt(np.mean(x ** 2) + 1e-20)
    return 20.0 * np.log10(rms + 1e-20)


def is_mostly_sound(clip: np.ndarray, sr: int, frame_ms: int = 100,
                    silence_threshold_db: float = -45.0,
                    min_sound_ratio: float = 0.6) -> bool:
    """>= 60% of 100 ms frames above -45 dBFS
    (split_BachViolinDataset.py:24-30)."""
    frame = int(sr * frame_ms / 1000)
    n = len(clip) // frame
    if n == 0:
        return False
    sound = sum(_dbfs(clip[i * frame : (i + 1) * frame]) > silence_threshold_db
                for i in range(n))
    return (sound / n) >= min_sound_ratio


def bach_num_segments(duration_ms: float) -> int:
    """(split_BachViolinDataset.py:33-41)."""
    if duration_ms < 120_000:
        return 2
    if duration_ms < 300_000:
        return 4
    if duration_ms < 1_020_000:
        return 8
    return 10


def etudes_num_segments(duration_ms: float) -> int:
    """(split_ViolinEtudes.py:23-33)."""
    if duration_ms < 40_000:
        return 1
    if duration_ms < 70_000:
        return 2
    if duration_ms < 200_000:
        return 3
    if duration_ms < 300_000:
        return 4
    return int(5 + duration_ms // 120_000)


def split_evenly_spaced(input_dir: str, output_dir: str,
                        segment_ms: int = 10_000, skip_ms: int = 15_000,
                        max_attempts: int = 20, log=print) -> List[str]:
    """Bach-style segmentation: evenly spaced segments skipping intro/outro,
    silence filter with +1 s slide retries (split_BachViolinDataset.py:44-77)."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    count = 1
    for filename in sorted(os.listdir(input_dir)):
        if not filename.lower().endswith(".wav"):
            continue
        audio, sr = read_wav(os.path.join(input_dir, filename))
        mono = audio.mean(axis=0)
        duration_ms = len(mono) / sr * 1000
        num_segments = bach_num_segments(duration_ms)
        effective = duration_ms - 2 * skip_ms
        interval = ((effective - segment_ms) // (num_segments - 1)
                    if num_segments > 1 else 0)
        seg_len = int(segment_ms / 1000 * sr)
        valid = 0
        attempts = 0
        for i in range(num_segments):
            start_ms = skip_ms + i * interval
            success = False
            while attempts < max_attempts:
                start = int(start_ms / 1000 * sr)
                clip = mono[start : start + seg_len]
                if len(clip) == seg_len and is_mostly_sound(clip, sr):
                    out = os.path.join(output_dir, f"{count}_{i + 1}.wav")
                    write_wav(out, clip, sr)
                    written.append(out)
                    valid += 1
                    success = True
                    break
                start_ms += 1000
                attempts += 1
            if not success:
                log(f"Silent segment detected and skipped at index {i + 1} "
                    f"in {filename}")
        log(f"Valid segments extracted from {filename}: {valid}")
        count += 1
    return written


def split_random_spaced(input_dir: str, output_dir: str,
                        segment_ms: int = 10_000, min_distance_ms: int = 25_000,
                        seed: int = 0, log=print) -> List[str]:
    """Etudes-style segmentation: random starts at least min_distance apart,
    up to 4x extra attempts (split_ViolinEtudes.py:36-67)."""
    os.makedirs(output_dir, exist_ok=True)
    rng = random.Random(seed)
    written = []
    track_idx = 1
    for filename in sorted(os.listdir(input_dir)):
        if not filename.lower().endswith(".wav"):
            continue
        audio, sr = read_wav(os.path.join(input_dir, filename))
        mono = audio.mean(axis=0)
        duration_ms = len(mono) / sr * 1000
        num_segments = etudes_num_segments(duration_ms)
        seg_len = int(segment_ms / 1000 * sr)
        available = max(0, int(duration_ms - segment_ms))
        used: List[int] = []
        extracted = 0
        attempts = 0
        while extracted < num_segments and attempts < num_segments * 4:
            start_ms = rng.randint(0, available) if available > 0 else 0
            if all(abs(start_ms - s) >= min_distance_ms for s in used):
                start = int(start_ms / 1000 * sr)
                clip = mono[start : start + seg_len]
                if len(clip) == seg_len:
                    out = os.path.join(output_dir,
                                       f"{track_idx}_{extracted + 1}.wav")
                    write_wav(out, clip, sr)
                    written.append(out)
                    used.append(start_ms)
                    extracted += 1
            attempts += 1
        track_idx += 1
    return written


def split_center(input_dir: str, output_dir: str, segment_ms: int = 10_000,
                 max_tracks: int = 768, log=print) -> List[str]:
    """Center-10s extraction, capped at max_tracks
    (split_PianoMotion10M.py:23-46)."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    idx = 1
    for filename in sorted(os.listdir(input_dir)):
        if not filename.lower().endswith(".wav") or idx > max_tracks:
            continue
        audio, sr = read_wav(os.path.join(input_dir, filename))
        mono = audio.mean(axis=0)
        seg_len = int(segment_ms / 1000 * sr)
        center = len(mono) // 2
        start = max(0, center - seg_len // 2)
        clip = mono[start : start + seg_len]
        out = os.path.join(output_dir, f"{idx}.wav")
        write_wav(out, clip, sr)
        written.append(out)
        idx += 1
    return written


def rms_normalize(y: np.ndarray, target_rms: float = 0.07) -> np.ndarray:
    """(unifies_violin_datasets.py:24-30)."""
    current = float(np.sqrt(np.mean(y ** 2)))
    if current == 0:
        return y
    return y * (target_rms / current)


def unify_datasets(dirs_with_prefixes, output_dir: str, target_sr: int = 44100,
                   target_rms: float = 0.07, log=print) -> List[str]:
    """Merge datasets: mono, resample, RMS-normalize, re-export with a name
    prefix (unifies_violin_datasets.py:33-69)."""
    from ast_tpu.dsp.resample import resample_np

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for directory, prefix in dirs_with_prefixes:
        for file in sorted(os.listdir(directory)):
            if not file.lower().endswith(".wav"):
                continue
            try:
                audio, sr = read_wav(os.path.join(directory, file))
                y = audio.mean(axis=0)
                if sr != target_sr:
                    y = resample_np(y, sr, target_sr)
                y = rms_normalize(y, target_rms)
                out = os.path.join(output_dir, f"{prefix}_{file}")
                write_wav(out, np.clip(y, -1.0, 1.0), target_sr)
                written.append(out)
            except Exception as e:
                log(f"[Error] Processing failed for {file}: {e}")
    return written
