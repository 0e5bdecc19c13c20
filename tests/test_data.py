"""Data layer tests: native wav decode == stdlib decode, load_audio
reference semantics, resample correctness, balanced batch contract, stats
fallbacks, prefetcher."""

import dataclasses
import os

import numpy as np
import pytest
import jax.numpy as jnp

from ast_tpu.config import AudioConfig
from ast_tpu.data import (
    DualInstrumentDataset,
    balanced_batches,
    dummy_batches,
    load_audio,
    make_wav_fixture,
    prefetch,
    read_wav,
    write_wav,
)
from ast_tpu.data.audio_io import _native
from ast_tpu.dsp.norm import load_instrument_stats
from ast_tpu.dsp.resample import resample, resample_np

TINY_AUDIO = AudioConfig(
    sample_rate=4000, clip_seconds=0.5, n_fft=64, hop_length=64,
    cqt_bins=12, cqt_fmin=200.0, window_size=16,
    overlap_frames=5, eval_overlap_frames=5,
)


def test_native_library_builds():
    assert _native() is not None, "C++ audio runtime failed to build"


def test_wav_roundtrip(tmp_path, rng):
    x = np.clip(0.3 * rng.standard_normal(4000), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 4000)
    y, sr = read_wav(p)
    assert sr == 4000 and y.shape == (1, 4000)
    np.testing.assert_allclose(y[0], x, atol=1.5 / 32768)


def test_native_decode_matches_stdlib(tmp_path, rng):
    x = np.clip(0.3 * rng.standard_normal(2000), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 8000)
    y_native, _ = read_wav(p)  # native path (library available per test above)
    import wave as wv
    with wv.open(p, "rb") as w:
        raw = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    y_std = (raw.astype(np.float32) / 32768.0)[None]
    np.testing.assert_allclose(y_native, y_std, atol=1e-6)


def test_load_audio_pad_and_cut(tmp_path, rng):
    sr = 4000
    # short clip gets zero-padded to cut length
    short = np.clip(0.3 * rng.standard_normal(sr // 2), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "short.wav")
    write_wav(p, short, sr)
    wav, out_sr = load_audio(p, sample_rate=sr, cut_time_seconds=1.0)
    assert out_sr == sr and wav.shape == (1, sr)
    np.testing.assert_allclose(wav[0, : sr // 2], short, atol=1.5 / 32768)
    np.testing.assert_allclose(wav[0, sr // 2 :], 0.0, atol=1e-7)
    # long clip gets cut
    long = np.clip(0.3 * rng.standard_normal(2 * sr), -0.99, 0.99).astype(np.float32)
    p2 = str(tmp_path / "long.wav")
    write_wav(p2, long, sr)
    wav2, _ = load_audio(p2, sample_rate=sr, cut_time_seconds=1.0)
    assert wav2.shape == (1, sr)


def test_resample_tone_fidelity():
    """440 Hz tone resampled 44100 -> 22050: frequency preserved, amplitude
    within 2%, and jnp == numpy == native paths."""
    sr_in, sr_out, f0 = 44100, 22050, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)

    y_np = resample_np(x, sr_in, sr_out)
    assert len(y_np) == sr_out
    y_jnp = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    np.testing.assert_allclose(y_jnp, y_np, atol=1e-4)

    seg = y_np[2000:-2000]
    spec = np.abs(np.fft.rfft(seg))
    peak = np.argmax(spec)
    freq = peak * sr_out / len(seg)
    assert abs(freq - f0) < 2.0
    assert abs(np.max(np.abs(seg)) - 1.0) < 0.02

    lib = _native()
    import ctypes
    out = np.zeros(sr_out + 16, np.float32)
    got = lib.ast_resample(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           len(x), sr_in, sr_out,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           len(out))
    assert got == sr_out
    np.testing.assert_allclose(out[:got], y_np, atol=1e-4)


def test_load_audio_resamples(tmp_path, rng):
    sr_in, sr_out = 8000, 4000
    x = np.sin(2 * np.pi * 440 * np.arange(sr_in) / sr_in).astype(np.float32)
    p = str(tmp_path / "hi.wav")
    write_wav(p, x, sr_in)
    wav, sr = load_audio(p, sample_rate=sr_out, cut_time_seconds=1.0)
    assert sr == sr_out and wav.shape == (1, sr_out)
    # native path must match the python fallback path
    wav_py, _ = load_audio(p, sample_rate=sr_out, cut_time_seconds=1.0,
                           use_native=False)
    np.testing.assert_allclose(wav, wav_py, atol=2e-4)


def test_balanced_batches_contract(tmp_path):
    piano_dir, violin_dir = make_wav_fixture(str(tmp_path), n_clips=3,
                                             cfg=TINY_AUDIO)
    ds = DualInstrumentDataset.from_dirs(piano_dir, violin_dir,
                                         stats_dir=None, cfg=TINY_AUDIO)
    assert len(ds) == 3
    batches = list(balanced_batches(ds, batch_size=4, shuffle=False))
    assert len(batches) == 1  # 3 pairs, half=2, drop_last
    x, labels = batches[0]
    T = TINY_AUDIO.frames_per_clip
    S = TINY_AUDIO.num_windows(T)
    assert x.shape == (4, S, 2, TINY_AUDIO.window_size, TINY_AUDIO.feat_bins)
    np.testing.assert_array_equal(np.asarray(labels), [0, 0, 1, 1])
    assert np.isfinite(np.asarray(x)).all()


def test_wav_fixture_class_separation(tmp_path):
    """The physically-flavored fixture must separate the two instrument
    classes under the project's own transfer metrics
    (evaluation_style_transfer.py:99-119 semantics): within-class
    instrumentation similarity above cross-class, within-class MFCC distance
    below cross-class. This is what makes transfer-metric numbers on the
    synthetic corpus directionally meaningful."""
    from itertools import combinations, product

    from ast_tpu.data.audio_io import load_audio
    from ast_tpu.eval.metrics import instrumentation_similarity, mfcc_distance

    piano_dir, violin_dir = make_wav_fixture(str(tmp_path), n_clips=3,
                                             seconds=4.0)
    load = lambda d, n: np.asarray(load_audio(os.path.join(d, n))[0]).reshape(-1)
    P = [load(piano_dir, f"piano_{i:03d}.wav") for i in range(3)]
    V = [load(violin_dir, f"violin_{i:03d}.wav") for i in range(3)]

    within = [instrumentation_similarity(a, b)
              for grp in (P, V) for a, b in combinations(grp, 2)]
    cross = [instrumentation_similarity(a, b) for a, b in product(P, V)]
    assert np.mean(within) > np.mean(cross) + 0.05, (np.mean(within), np.mean(cross))

    mfcc_within_v = np.mean([mfcc_distance(a, b) for a, b in combinations(V, 2)])
    mfcc_cross = np.mean([mfcc_distance(a, b) for a, b in product(P, V)])
    assert mfcc_within_v < mfcc_cross, (mfcc_within_v, mfcc_cross)


def test_stats_fallback_chain(tmp_path, capsys):
    # at full feature size a missing dir now falls back to the PACKAGED
    # reference stats (ast_tpu/stats/) before degrading to dummy
    stats = load_instrument_stats(str(tmp_path), use_separate_stats=True)
    out = capsys.readouterr().out
    assert "packaged reference stats" in out
    assert stats[0].stft_mean.shape == (2, 513)
    assert not np.allclose(stats[0].stft_std, np.ones((2, 513)))
    # at non-reference feature sizes the dummy fallback is unchanged
    tiny = load_instrument_stats(str(tmp_path), use_separate_stats=True,
                                 stft_bins=24, cqt_bins=8)
    out = capsys.readouterr().out
    assert "dummy normalization" in out
    np.testing.assert_array_equal(tiny[0].stft_std, np.ones((2, 24)))


def test_dummy_batches():
    b = list(dummy_batches(batch_size=4, sections=2, window_size=8,
                           feat_bins=12, num_batches=2))
    assert len(b) == 2
    x, labels = b[0]
    assert x.shape == (4, 2, 2, 8, 12)
    np.testing.assert_array_equal(labels, [0, 0, 1, 1])


def test_prefetcher_yields_everything_and_propagates_errors():
    items = list(prefetch(lambda: iter(range(10)), depth=3))
    assert items == list(range(10))

    def bad():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch(bad))


def test_native_decodes_float32_wav(tmp_path, rng):
    """The native decoder handles IEEE-float wavs (format 3), which the
    stdlib `wave` fallback cannot."""
    import struct

    x = np.clip(0.4 * rng.standard_normal(500), -1, 1).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    data = x.tobytes()
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000,
                                      8000 * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    lib = _native()
    if lib is None:
        pytest.skip("native library unavailable")
    y, sr = read_wav(p)
    assert sr == 8000 and y.shape == (1, 500)
    np.testing.assert_allclose(y[0], x, atol=1e-6)


def test_extract_features_jit_matches_eager(rng):
    import jax.numpy as jnp

    from ast_tpu.dsp.features import extract_features, extract_features_jit
    from ast_tpu.dsp.norm import FeatureStats

    cfg = TINY_AUDIO
    st = FeatureStats.identity(cfg.stft_bins, cfg.cqt_bins)
    wav = jnp.asarray(rng.standard_normal(cfg.clip_samples).astype(np.float32))
    args = (wav, jnp.asarray(st.stft_mean), jnp.asarray(st.stft_std),
            jnp.asarray(st.cqt_mean), jnp.asarray(st.cqt_std))
    a = np.asarray(extract_features(*args, cfg=cfg))
    b = np.asarray(extract_features_jit(*args, cfg=cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mp3_roundtrip_and_sniff(tmp_path):
    """Native mp3 encode/decode (system libmpg123/libmp3lame via the C++
    runtime): sample-accurate gapless length, content sniffing, and the
    reference load_audio semantics on an mp3 source
    (utilityFunctions.py:105-122 — torchaudio.load handles mp3 there)."""
    from ast_tpu.data.audio_io import (audio_info, load_audio, mp3_supported,
                                       read_audio, read_mp3, write_mp3)

    if not mp3_supported():
        pytest.skip("system libmpg123/libmp3lame unavailable")

    sr = 22050
    t = np.arange(2 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "tone.mp3")
    write_mp3(path, x, sr)

    sr2, ch, n, kind = audio_info(path)
    assert (sr2, ch, kind) == (sr, 1, "mp3")
    assert n == len(x)  # gapless LAME tag: sample-accurate length

    y, sr3 = read_mp3(path)
    assert sr3 == sr and y.shape == (1, len(x))
    m = min(y.shape[1], len(x))
    corr = np.corrcoef(y[0, :m], x[:m])[0, 1]
    assert corr > 0.99  # lossy but highly correlated

    # sniff-based generic reader agrees
    y2, _ = read_audio(path)
    np.testing.assert_array_equal(y, y2)

    # reference load_audio semantics on mp3: cut to 1s @ native rate, resample
    wav, out_sr = load_audio(path, sample_rate=16000, cut_time_seconds=1.0)
    assert out_sr == 16000 and wav.shape == (1, 16000)
    mid = wav[0, 4000:12000]
    freq = np.abs(np.fft.rfft(mid * np.hanning(8000))).argmax() * 16000 / 8000
    assert abs(freq - 440.0) < 5.0


def test_mp3_stereo_and_bitrates(tmp_path):
    from ast_tpu.data.audio_io import mp3_supported, read_mp3, write_mp3

    if not mp3_supported():
        pytest.skip("system libmpg123/libmp3lame unavailable")
    sr = 44100
    t = np.arange(sr) / sr
    stereo = np.stack([0.4 * np.sin(2 * np.pi * 440 * t),
                       0.4 * np.sin(2 * np.pi * 660 * t)]).astype(np.float32)
    path = str(tmp_path / "st.mp3")
    write_mp3(path, stereo, sr, bitrate_kbps=192)
    y, sr2 = read_mp3(path)
    assert sr2 == sr and y.shape == (2, sr)
    # channel identity preserved (left=440Hz, right=660Hz)
    for c, f_expect in [(0, 440.0), (1, 660.0)]:
        spec = np.abs(np.fft.rfft(y[c] * np.hanning(sr)))
        assert abs(spec.argmax() * sr / sr - f_expect) < 5.0


def test_resident_batches_match_balanced(tmp_path):
    """ResidentBatches (device-resident waveform banks, one gather+featurize
    program per step) must yield exactly what balanced_batches yields for the
    same seed/epoch — same shuffle, same features, same labels."""
    from ast_tpu.data.dataset import ResidentBatches

    piano_dir, violin_dir = make_wav_fixture(str(tmp_path), n_clips=4,
                                             cfg=TINY_AUDIO)
    ds = DualInstrumentDataset.from_dirs(piano_dir, violin_dir,
                                         stats_dir=None, cfg=TINY_AUDIO)
    factory = ResidentBatches(ds, batch_size=4, seed=3, log=lambda *_: None)
    for epoch in (0, 1):
        want = list(balanced_batches(ds, batch_size=4, seed=3, epoch=epoch))
        got = list(factory(epoch))
        assert len(got) == len(want) == 2
        for (xg, lg), (xw, lw) in zip(got, want):
            np.testing.assert_array_equal(np.asarray(lg), np.asarray(lw))
            np.testing.assert_allclose(np.asarray(xg), np.asarray(xw),
                                       atol=1e-6, rtol=1e-6)


def test_chorale_fixture_atoms_and_determinism(tmp_path):
    """Phase-locked chorale corpus invariants (scripts/pca_ceiling.py
    rationale): (a) same seed reproduces files bit-for-bit, (b) note atoms
    are deterministic per pitch (two calls produce identical waveforms, the
    property that bounds the corpus's linear rank), (c) onsets land exactly
    on window-step boundaries (step = (287-96)*256 samples)."""
    from ast_tpu.data.synthetic import (_chorale_clip, _chorale_piano_note,
                                        _chorale_violin_note)

    p1, v1 = make_wav_fixture(str(tmp_path / "a"), n_clips=2, seed=3,
                              mode="chorale")
    p2, _ = make_wav_fixture(str(tmp_path / "b"), n_clips=2, seed=3,
                             mode="chorale")
    a = open(os.path.join(p1, "piano_000.wav"), "rb").read()
    b = open(os.path.join(p2, "piano_000.wav"), "rb").read()
    assert a == b, "same seed must reproduce the corpus bit-for-bit"

    n1 = _chorale_piano_note(220.0, 4000, 22050)
    n2 = _chorale_piano_note(220.0, 4000, 22050)
    np.testing.assert_array_equal(n1, n2)
    m1 = _chorale_violin_note(440.0, 4000, 22050)
    m2 = _chorale_violin_note(440.0, 4000, 22050)
    np.testing.assert_array_equal(m1, m2)

    # onset quantization: a violin chorale clip (no ring-past-note-end) is
    # exactly the sum of per-step segments + the fixed resonance layer, so
    # subtracting note k's atom at offset k*step leaves only resonance there
    cfg = AudioConfig()
    step = (cfg.window_size - cfg.overlap_frames) * cfg.hop_length
    assert step == 191 * 256
    rng = np.random.default_rng(5)
    clip = _chorale_clip(rng, step * 2, 22050, "violin", cfg)
    rng2 = np.random.default_rng(5)
    from ast_tpu.data.synthetic import _CHORALE_DEGREES, _chorale_melody
    notes = _chorale_melody(rng2, 2)
    for k, (deg, octave, vel) in enumerate(notes):
        f0 = 440.0 * octave * 2.0 ** (deg / 12)
        atom = _chorale_violin_note(f0, step, 22050)
        clip[k * step:(k + 1) * step] -= 0.8 * vel * atom
    # residue == the fixed-phase resonance layer (note sum cancels exactly
    # up to fp addition order), proving onsets sit on the step grid
    n = step * 2
    tfull = np.arange(n) / 22050
    wobble = 1 + 0.15 * np.sin(2 * np.pi * 0.4 * tfull)
    from ast_tpu.data.synthetic import _FORMANTS
    reso = np.zeros(n)
    for fo in (440.0, 659.26):
        for h in range(1, 8):
            fh = fo * h
            if fh > 0.45 * 22050:
                break
            w = max(0.08, max(g * np.exp(-((fh - fc) / fc) ** 2)
                              for fc, g in _FORMANTS))
            reso += 0.10 * (w / h) * np.sin(2 * np.pi * fh * tfull) * wobble
    np.testing.assert_allclose(clip, reso, atol=1e-9)
