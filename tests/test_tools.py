"""Tests for the dataset tooling (segmenters, stats, analysis, plotting)."""

import os

import numpy as np
import pytest

from ast_tpu.config import AudioConfig
from ast_tpu.data.audio_io import read_wav, write_wav
from ast_tpu.tools import (
    bach_num_segments,
    compute_separated_stats,
    etudes_num_segments,
    find_silent_tracks,
    is_mostly_sound,
    read_stats_npz,
    rms_normalize,
    split_center,
    split_evenly_spaced,
    split_random_spaced,
    unify_datasets,
)

TINY_AUDIO = AudioConfig(
    sample_rate=4000, clip_seconds=0.5, n_fft=64, hop_length=64,
    cqt_bins=12, cqt_fmin=200.0, window_size=16,
    overlap_frames=5, eval_overlap_frames=5,
)


def _write_tone(path, seconds, sr=4000, freq=440.0, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    write_wav(path, (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32), sr)


def test_segment_count_ladders():
    assert bach_num_segments(60_000) == 2
    assert bach_num_segments(200_000) == 4
    assert bach_num_segments(500_000) == 8
    assert bach_num_segments(2_000_000) == 10
    assert etudes_num_segments(30_000) == 1
    assert etudes_num_segments(250_000) == 4
    assert etudes_num_segments(600_000) == 5 + 600_000 // 120_000


def test_is_mostly_sound():
    sr = 4000
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    assert is_mostly_sound(tone.astype(np.float32), sr)
    assert not is_mostly_sound(np.zeros(sr, np.float32), sr)


def test_split_evenly_spaced(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    _write_tone(str(src / "track.wav"), seconds=60.0)
    out = split_evenly_spaced(str(src), str(dst), segment_ms=10_000,
                              skip_ms=15_000)
    assert len(out) == 2  # 60s track -> bach ladder gives 2 segments
    wav, sr = read_wav(out[0])
    assert wav.shape[1] == 10 * sr


def test_split_random_spaced(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    _write_tone(str(src / "track.wav"), seconds=45.0)
    out = split_random_spaced(str(src), str(dst), segment_ms=10_000, seed=1)
    assert len(out) >= 1
    wav, sr = read_wav(out[0])
    assert wav.shape[1] == 10 * sr


def test_split_center(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    _write_tone(str(src / "a.wav"), seconds=30.0)
    out = split_center(str(src), str(dst), segment_ms=10_000)
    assert len(out) == 1
    wav, sr = read_wav(out[0])
    assert wav.shape[1] == 10 * sr


def test_unify_and_rms(tmp_path):
    from ast_tpu.data.audio_io import mp3_supported, read_audio

    src = tmp_path / "src"
    src.mkdir()
    _write_tone(str(src / "x.wav"), seconds=1.0, amp=0.9)
    out = unify_datasets([(str(src), "Bach")], str(tmp_path / "merged"),
                         target_sr=8000, target_rms=0.07)
    assert len(out) == 1 and os.path.basename(out[0]).startswith("Bach_")
    if mp3_supported():  # reference format: mp3-192k
        assert out[0].endswith(".mp3")
    wav, sr = read_audio(out[0])
    assert sr == 8000
    rms = float(np.sqrt(np.mean(wav ** 2)))
    assert abs(rms - 0.07) < 0.005
    y = rms_normalize(np.zeros(10))
    np.testing.assert_array_equal(y, np.zeros(10))


def test_segmenters_accept_and_emit_mp3(tmp_path):
    """The reference segmenters read mp3 sources and export mp3
    (split_BachViolinDataset.py:49,67) — full mp3-in/mp3-out path."""
    from ast_tpu.data.audio_io import mp3_supported, read_audio, write_mp3

    if not mp3_supported():
        pytest.skip("system libmpg123/libmp3lame unavailable")
    sr = 22050
    t = np.arange(40 * sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    write_mp3(str(src / "track.mp3"), tone, sr)

    out = split_random_spaced(str(src), str(dst), segment_ms=10_000, seed=1)
    assert len(out) >= 1 and out[0].endswith(".mp3")
    clip, sr2 = read_audio(out[0])
    assert sr2 == sr and clip.shape[1] == 10 * sr


def test_compute_separated_stats(tmp_path):
    piano = tmp_path / "piano"
    violin = tmp_path / "violin"
    piano.mkdir()
    violin.mkdir()
    for i in range(2):
        _write_tone(str(piano / f"p{i}.wav"), seconds=0.5, freq=300 + 50 * i)
        _write_tone(str(violin / f"v{i}.wav"), seconds=0.5, freq=500 + 50 * i)
    out = compute_separated_stats(str(piano), str(violin),
                                  str(tmp_path / "stats"), cfg=TINY_AUDIO)
    stats = read_stats_npz(out["piano"])
    assert stats.stft_mean.shape == (2, TINY_AUDIO.stft_bins)
    assert stats.cqt_std.shape == (2, TINY_AUDIO.cqt_bins)
    assert (stats.stft_std >= 0).all()
    # different instruments -> different stats files with different content
    v = read_stats_npz(out["violin"])
    assert not np.allclose(stats.stft_mean, v.stft_mean)


def test_find_silent_tracks(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    _write_tone(str(d / "loud.wav"), seconds=1.0)
    half = np.concatenate([0.5 * np.ones(8000), np.zeros(8000)]).astype(np.float32)
    write_wav(str(d / "halfsilent.wav"), half, 4000)
    flagged = find_silent_tracks(str(d))
    names = [f for f, _ in flagged]
    assert "halfsilent.wav" in names
    assert "loud.wav" not in names


def test_plotting_smoke(tmp_path, rng):
    from ast_tpu.utils.plotting import plot_cqt, plot_stft

    spec = rng.standard_normal((2, 20, 33)).astype(np.float32)
    figs = plot_stft(spec, save_path=str(tmp_path / "stft.png"))
    assert len(figs) == 1 and os.path.exists(tmp_path / "stft.png")
    stacked = rng.standard_normal((2, 2, 20, 12)).astype(np.float32)
    figs = plot_cqt(stacked, save_path=str(tmp_path / "cqt.png"))
    assert len(figs) == 2
    import matplotlib.pyplot as plt
    plt.close("all")


def test_compute_unified_stats(tmp_path):
    from ast_tpu.tools import compute_unified_stats

    piano = tmp_path / "p"
    violin = tmp_path / "v"
    piano.mkdir(), violin.mkdir()
    _write_tone(str(piano / "a.wav"), 0.5, freq=300)
    _write_tone(str(violin / "b.wav"), 0.5, freq=500)
    path = compute_unified_stats(str(piano), str(violin), str(tmp_path / "s"),
                                 cfg=TINY_AUDIO)
    st = read_stats_npz(path)
    assert st.stft_mean.shape == (2, TINY_AUDIO.stft_bins)


def test_analyze_and_summarize(tmp_path, capsys):
    from ast_tpu.tools import analyze_dataset, summarize_statistics

    d = tmp_path / "ds"
    d.mkdir()
    _write_tone(str(d / "a.wav"), 1.0)
    _write_tone(str(d / "b.wav"), 1.0, freq=660)
    stats = analyze_dataset(str(d))
    assert len(stats["filenames"]) == 2
    assert abs(stats["durations"][0] - 1.0) < 0.01
    summarize_statistics("DS", stats)
    out = capsys.readouterr().out
    assert "Files analyzed: 2" in out


def test_dataset_variety_embedding(tmp_path):
    from ast_tpu.tools import dataset_variety_embedding

    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    for i in range(3):
        _write_tone(str(d1 / f"{i}.wav"), 0.5, freq=200 + 20 * i)
        _write_tone(str(d2 / f"{i}.wav"), 0.5, freq=800 + 20 * i)
    emb, labels, colors = dataset_variety_embedding(
        [(str(d1), "blue"), (str(d2), "red")], perplexity=2.0)
    assert emb.shape == (6, 2)
    assert colors == ["blue"] * 3 + ["red"] * 3
