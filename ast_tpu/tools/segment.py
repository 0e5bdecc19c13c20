"""Dataset segmentation tools.

Capability-parity rebuild of the reference's one-shot segmenters
(Preprocessing_Dataset/split_BachViolinDataset.py, split_ViolinEtudes.py,
split_PianoMotion10M.py), via the framework's own native decoders/encoders
instead of pydub/ffmpeg: wav AND mp3 inputs decode natively (dlopen'd system
libmpg123), and segments export as mp3 like the reference (libmp3lame;
PianoMotion/unify at 192k), degrading to wav with a log line when the
encoder library is absent. The segment-count ladders, silence filter,
retry/slide logic and spacing rules match the reference scripts."""

from __future__ import annotations

import os
import random
from typing import List

import numpy as np

from ast_tpu.data.audio_io import read_audio, write_mp3, write_wav

AUDIO_EXTS = (".wav", ".mp3")


def _mp3_encode_ok() -> bool:
    from ast_tpu.data.audio_io import _native

    lib = _native()
    return lib is not None and lib.ast_mp3_encode_available() == 0


# the MPEG-1/2/2.5 Layer III grid; other rates would make lame resample
# internally (silently changing sr/length), so they fall back to wav
MP3_SAMPLE_RATES = frozenset(
    {8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000})


def write_clip(out_base: str, clip, sr: int, out_format: str = "mp3",
               bitrate_kbps: int = 128, log=print) -> str:
    """Export one segment. out_base carries no extension; the format decides
    it (mp3 like the reference's AudioSegment.export, wav as fallback)."""
    if out_format == "mp3" and (not _mp3_encode_ok()
                                or sr not in MP3_SAMPLE_RATES):
        log(f"[warn] mp3 export unavailable at sr={sr}; "
            f"writing {out_base}.wav instead")
        out_format = "wav"
    out = f"{out_base}.{out_format}"
    if out_format == "mp3":
        write_mp3(out, clip, sr, bitrate_kbps=bitrate_kbps)
    else:
        write_wav(out, clip, sr)
    return out


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
                        max_attempts: int = 20, out_format: str = "mp3",
                        bitrate_kbps: int = 128, log=print) -> List[str]:
    """Bach-style segmentation: evenly spaced segments skipping intro/outro,
    silence filter with +1 s slide retries (split_BachViolinDataset.py:44-77)."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    count = 1
    for filename in sorted(os.listdir(input_dir)):
        if not filename.lower().endswith(AUDIO_EXTS):
            continue
        audio, sr = read_audio(os.path.join(input_dir, filename))
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
                    out = write_clip(os.path.join(output_dir, f"{count}_{i + 1}"),
                                     clip, sr, out_format, bitrate_kbps, log)
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
                        seed: int = 0, out_format: str = "mp3",
                        bitrate_kbps: int = 128, log=print) -> List[str]:
    """Etudes-style segmentation: random starts at least min_distance apart,
    up to 4x extra attempts (split_ViolinEtudes.py:36-67)."""
    os.makedirs(output_dir, exist_ok=True)
    rng = random.Random(seed)
    written = []
    track_idx = 1
    for filename in sorted(os.listdir(input_dir)):
        if not filename.lower().endswith(AUDIO_EXTS):
            continue
        audio, sr = read_audio(os.path.join(input_dir, filename))
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
                    out = write_clip(
                        os.path.join(output_dir, f"{track_idx}_{extracted + 1}"),
                        clip, sr, out_format, bitrate_kbps, log)
                    written.append(out)
                    used.append(start_ms)
                    extracted += 1
            attempts += 1
        track_idx += 1
    return written


def split_center(input_dir: str, output_dir: str, segment_ms: int = 10_000,
                 max_tracks: int = 768, out_format: str = "mp3",
                 bitrate_kbps: int = 192, log=print) -> List[str]:
    """Center-10s extraction, capped at max_tracks; mp3-192k export
    (split_PianoMotion10M.py:23-46)."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    idx = 1
    for filename in sorted(os.listdir(input_dir)):
        if not filename.lower().endswith(AUDIO_EXTS) or idx > max_tracks:
            continue
        audio, sr = read_audio(os.path.join(input_dir, filename))
        mono = audio.mean(axis=0)
        seg_len = int(segment_ms / 1000 * sr)
        center = len(mono) // 2
        start = max(0, center - seg_len // 2)
        clip = mono[start : start + seg_len]
        out = write_clip(os.path.join(output_dir, f"{idx}"), clip, sr,
                         out_format, bitrate_kbps, log)
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
                   target_rms: float = 0.07, out_format: str = "mp3",
                   bitrate_kbps: int = 192, log=print) -> List[str]:
    """Merge datasets: mono, resample, RMS-normalize, re-export with a name
    prefix as mp3-192k like the reference (unifies_violin_datasets.py:33-69;
    `audio.export(destination, format="mp3", bitrate="192k")`)."""
    from ast_tpu.dsp.resample import resample_np

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for directory, prefix in dirs_with_prefixes:
        for file in sorted(os.listdir(directory)):
            if not file.lower().endswith(AUDIO_EXTS):
                continue
            try:
                audio, sr = read_audio(os.path.join(directory, file))
                y = audio.mean(axis=0)
                if sr != target_sr:
                    y = resample_np(y, sr, target_sr)
                y = rms_normalize(y, target_rms)
                stem = os.path.splitext(file)[0]
                out = write_clip(os.path.join(output_dir, f"{prefix}_{stem}"),
                                 np.clip(y, -1.0, 1.0), target_sr,
                                 out_format, bitrate_kbps, log)
                written.append(out)
            except Exception as e:
                log(f"[Error] Processing failed for {file}: {e}")
    return written
