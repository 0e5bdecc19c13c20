"""Sanity tests for the native metric implementations: analytic signals land
where the published algorithms say they should, and identity comparisons give
perfect scores (mirroring how the reference metrics behave)."""

import numpy as np

from ast_tpu.eval.audio_metrics import (
    chroma_stft,
    mel_filterbank,
    mfcc,
    onset_detect,
    piptrack,
    recurrence_matrix,
)
from ast_tpu.eval.metrics import (
    calculate_reconstruction_metrics,
    chroma_distance,
    chroma_similarity,
    eval_style_transfer_metrics,
    instrumentation_similarity,
    mfcc_distance,
    mse_spectrogram,
    onset_accuracy,
    pitch_correlation,
    self_similarity_distance,
)

SR = 22050


def _tone(freq, seconds=1.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _clicks(times, seconds=2.0, sr=SR):
    y = 0.005 * np.random.default_rng(0).standard_normal(int(seconds * sr)).astype(np.float32)
    for tt in times:
        i = int(tt * sr)
        n = min(800, len(y) - i)
        y[i : i + n] += (np.sin(2 * np.pi * 880 * np.arange(n) / sr)
                         * np.exp(-np.arange(n) / 400)).astype(np.float32)
    return y


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(SR, 2048, 128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()  # every filter is non-empty


def test_chroma_pure_tones_land_in_right_class():
    # A440 -> class index 9 (A) with base-C row ordering
    for freq, cls in [(440.0, 9), (261.63, 0), (329.63, 4)]:  # A, C, E
        c = chroma_stft(_tone(freq), SR)
        mean_profile = c.mean(axis=1)
        assert np.argmax(mean_profile) == cls, (freq, int(np.argmax(mean_profile)))


def test_mfcc_shape_and_determinism():
    y = _tone(440.0)
    m = mfcc(y, SR)
    assert m.shape[0] == 20  # librosa.feature.mfcc default n_mfcc=20
    assert mfcc(y, SR, n_mfcc=13).shape[0] == 13
    np.testing.assert_array_equal(m, mfcc(y, SR))


def test_onset_detect_finds_clicks():
    times = [0.3, 0.8, 1.4]
    y = _clicks(times)
    frames = onset_detect(y, SR)
    assert len(frames) >= 2
    onset_times = frames * 512 / SR
    for tt in times:
        assert np.min(np.abs(onset_times - tt)) < 0.12, (tt, onset_times)


def test_piptrack_finds_tone():
    pitches, mags = piptrack(_tone(440.0), SR)
    mid = pitches.shape[1] // 2
    dominant = pitches[mags[:, mid].argmax(), mid]
    assert abs(dominant - 440.0) < 8.0


def test_recurrence_matrix_basic():
    # observations along the LAST axis (librosa convention): (d=3, t=20)
    data = np.concatenate([np.zeros((10, 3)), np.ones((10, 3))]).T
    rec = recurrence_matrix(data)
    assert rec.shape == (20, 20)
    assert not rec.diagonal().any()
    # frames cluster with their own kind
    assert rec[:10, :10].sum() > rec[:10, 10:].sum()


def test_recurrence_matrix_librosa_semantics():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((5, 24))  # d=5 features, t=24 observations
    rec = recurrence_matrix(data)
    t = 24
    k = 2 * int(np.ceil(np.sqrt(t - 1)))  # width=1 default
    # every observation links to exactly k neighbors (marked down its column)
    np.testing.assert_array_equal(rec.sum(axis=0), np.full(t, k))
    # reference quirk: recurrence over mfcc.T is (n_mfcc, n_mfcc)
    m = mfcc(_tone(440.0), SR, n_mfcc=20)
    assert recurrence_matrix(m.T).shape == (20, 20)


def _peak_pick_direct(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
    """Brute-force transcription of librosa.util.peak_pick's documented
    window semantics: max over [i-pre_max, i+post_max), truncated mean over
    [i-pre_avg, i+post_avg), threshold delta, greedy strict wait gap."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    peaks, last = [], -np.inf
    for i in range(n):
        w_max = x[max(0, i - pre_max): min(n, i + post_max)]
        w_avg = x[max(0, i - pre_avg): min(n, i + post_avg)]
        if x[i] != w_max.max() or x[i] == 0.0:
            continue
        if x[i] < w_avg.mean() + delta:
            continue
        if not i > last + wait:
            continue
        peaks.append(i)
        last = i
    return np.asarray(peaks, dtype=np.int64)


def test_peak_pick_matches_direct_windows():
    from ast_tpu.eval.audio_metrics import peak_pick

    rng = np.random.default_rng(7)
    for trial in range(20):
        env = np.abs(rng.standard_normal(200))
        env -= env.min()
        env /= env.max()
        got = peak_pick(env, pre_max=1, post_max=1, pre_avg=4, post_avg=5,
                        delta=0.07, wait=1)
        want = _peak_pick_direct(env, 1, 1, 4, 5, 0.07, 1)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_tuning_estimation_recovers_detuning():
    from ast_tpu.eval.audio_metrics import estimate_tuning

    for cents in (-0.3, 0.0, 0.25):
        f = 440.0 * 2.0 ** (cents / 12)
        tuning = estimate_tuning(y=_tone(f, seconds=1.0), sr=SR)
        assert abs(tuning - cents) < 0.05, (cents, tuning)


def test_chroma_tuning_robust_to_detuned_tone():
    # a quarter-tone-flat A is still classified as A thanks to tuning estimation
    f = 440.0 * 2.0 ** (-0.4 / 12)
    c = chroma_stft(_tone(f), SR)
    assert np.argmax(c.mean(axis=1)) == 9


def test_piptrack_thresholded_localmax():
    # sub-threshold bins are zeroed before local-max detection: a frame whose
    # max is huge suppresses small secondary peaks entirely
    y = _tone(440.0) + 0.01 * _tone(2217.46)  # -40dB secondary tone
    pitches, mags = piptrack(y, SR, threshold=0.1)
    mid = pitches.shape[1] // 2
    voiced = pitches[:, mid][pitches[:, mid] > 0]
    assert np.all((voiced > 150.0) & (voiced < 4000.0))
    assert np.any(np.abs(voiced - 440.0) < 8.0)
    assert not np.any(np.abs(voiced - 2217.46) < 30.0)


def test_identity_reconstruction_metrics():
    y = _clicks([0.3, 0.9])
    m = calculate_reconstruction_metrics(y, y.copy(), SR)
    assert m["chroma_distance"] < 1e-5
    assert m["onset_accuracy"] == 1.0
    assert m["pitch_correlation"] > 0.99
    assert m["mse_spectrogram"] < 1e-10


def test_identity_transfer_metrics():
    y = _clicks([0.3, 0.9])
    m = eval_style_transfer_metrics(y, y.copy(), y.copy(), SR)
    assert m["chroma_similarity"] > 0.99
    assert m["mfcc_distance"] < 1e-4
    assert m["instrumentation_similarity"] > 0.999
    assert m["self_similarity_distance"] == 0.0


def test_transfer_metrics_without_reference():
    y = _tone(440.0)
    m = eval_style_transfer_metrics(y, y, None, SR)
    assert m["mfcc_distance"] is None
    assert m["instrumentation_similarity"] is None
    assert m["self_similarity_distance"] is None
    assert m["chroma_similarity"] > 0.99


def test_metric_sentinels_on_garbage():
    # tiny/empty inputs degrade to sentinels instead of raising
    assert chroma_distance(np.zeros(10), np.zeros(10)) != None  # noqa: E711
    m = calculate_reconstruction_metrics(np.zeros(0), np.zeros(0), SR)
    assert m["chroma_distance"] == float("inf")
    assert m["onset_accuracy"] == 0.0


def test_different_instruments_have_lower_similarity():
    """Smoke-level discriminative power: a distorted copy scores worse than
    the original against itself."""
    y = _clicks([0.3, 0.9])
    rng = np.random.default_rng(1)
    noisy = (0.3 * y[::-1] + 0.5 * rng.standard_normal(len(y))).astype(np.float32)
    assert chroma_distance(y, noisy) > chroma_distance(y, y)
    assert mse_spectrogram(y, noisy) > mse_spectrogram(y, y)
