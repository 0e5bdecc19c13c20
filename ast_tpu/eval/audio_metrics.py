"""Audio feature extraction for evaluation metrics.

The reference leans on librosa for every metric feature (chroma_stft, mfcc,
onset_detect, piptrack, recurrence_matrix — evaluation_reconstruction.py:39-118
and evaluation_style_transfer.py:80-133). librosa does not exist in this
environment, so these are from-scratch reimplementations of librosa's (>=0.10)
published algorithms with librosa's defaults, matched at the algorithm level:

- STFT: hann, center=True with zero padding (librosa>=0.10 default
  pad_mode="constant"; 0.9.x used "reflect").
- mel/MFCC: Slaney mel scale, 128 mels, power_to_db top_db=80, DCT-II ortho.
- chroma_stft: per-clip tuning estimation (estimate_tuning -> pitch_tuning
  histogram) feeding librosa.filters.chroma's Gaussian bank (column-L2
  normalize, octave weighting, base-C roll), inf-norm per frame.
- onset: spectral-flux onset_strength (lag=1, mean aggregate, center pad),
  onset_detect min-shift/max-normalization and sr-derived peak_pick windows,
  peak_pick with librosa's exact moving-filter origins and boundary handling.
- piptrack: parabolic interpolation with localmax computed on the
  THRESHOLDED spectrogram, half-open [fmin, fmax) band, mags = S + dskew.
- recurrence_matrix: kNN connectivity over the LAST axis of the input
  (so the reference's `recurrence_matrix(mfcc.T)` yields an
  n_mfcc x n_mfcc matrix — a reference quirk, reproduced faithfully),
  k = 2*ceil(sqrt(t - 2*width + 1)), diagonal band excluded.

Known remaining deviations from literal librosa are enumerated in PARITY.md
(golden tests are impossible in-image: librosa is not installed). Everything
is numpy on the host — metric evaluation is not a hot path — with the filter
banks cached."""

from __future__ import annotations

import functools

import numpy as np
import scipy.ndimage
from scipy.fft import dct

from ast_tpu.dsp.stft import hann_window_np

_TINY32 = float(np.finfo(np.float32).tiny)


# ---------------------------------------------------------------- STFT (np)

def stft_mag(y: np.ndarray, n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """|STFT| (freq, frames), center zero padding (librosa>=0.10
    pad_mode="constant"), hann — librosa layout."""
    pad = n_fft // 2
    yp = np.pad(np.asarray(y), (pad, pad))
    n_frames = 1 + (len(yp) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = yp[idx] * hann_window_np(n_fft)
    return np.abs(np.fft.rfft(frames, axis=1)).T.astype(np.float32)


def fft_frequencies(sr: int, n_fft: int) -> np.ndarray:
    return np.fft.rfftfreq(n_fft, 1.0 / sr)


# ---------------------------------------------------------------- mel / MFCC

def hz_to_mel(f):
    """Slaney mel scale (librosa default htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mel)


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    m * f_sp)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128,
                   fmin: float = 0.0, fmax: float = None) -> np.ndarray:
    """(n_mels, 1 + n_fft/2) triangular filters, Slaney-normalized."""
    fmax = sr / 2 if fmax is None else fmax
    freqs = fft_frequencies(sr, n_fft)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fb = np.zeros((n_mels, len(freqs)))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def power_to_db(S: np.ndarray, ref: float = 1.0, amin: float = 1e-10,
                top_db: float = 80.0) -> np.ndarray:
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def melspectrogram(y: np.ndarray, sr: int, n_fft: int = 2048,
                   hop: int = 512, n_mels: int = 128) -> np.ndarray:
    S = stft_mag(y, n_fft, hop) ** 2
    return mel_filterbank(sr, n_fft, n_mels) @ S


def mfcc(y: np.ndarray, sr: int, n_mfcc: int = 20, n_fft: int = 2048,
         hop: int = 512, n_mels: int = 128) -> np.ndarray:
    """(n_mfcc, frames) — librosa.feature.mfcc defaults (n_mfcc=20)."""
    S_db = power_to_db(melspectrogram(y, sr, n_fft, hop, n_mels))
    return dct(S_db, type=2, axis=0, norm="ortho")[:n_mfcc].astype(np.float32)


# ---------------------------------------------------------------- chroma

def hz_to_octs(frequencies, tuning: float = 0.0, bins_per_octave: int = 12):
    """librosa.core.hz_to_octs: octaves relative to A440*2**(tuning/bpo)/16."""
    a440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return np.log2(np.asarray(frequencies, dtype=np.float64) / (a440 / 16))


def pitch_tuning(frequencies, resolution: float = 0.01,
                 bins_per_octave: int = 12) -> float:
    """librosa.pitch_tuning: histogram mode of semitone residuals in
    [-0.5, 0.5) at `resolution` bins; 0.0 when no voiced frequencies."""
    frequencies = np.atleast_1d(frequencies)
    frequencies = frequencies[frequencies > 0]
    if not np.any(frequencies):
        return 0.0
    residual = np.mod(bins_per_octave * hz_to_octs(frequencies), 1.0)
    residual[residual >= 0.5] -= 1.0
    bins = np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
    counts, edges = np.histogram(residual, bins)
    return float(edges[np.argmax(counts)])


def estimate_tuning(y: np.ndarray = None, sr: int = 22050,
                    S: np.ndarray = None, n_fft: int = 2048,
                    resolution: float = 0.01, bins_per_octave: int = 12,
                    **kwargs) -> float:
    """librosa.estimate_tuning: piptrack, keep pitches whose magnitude is at
    or above the median voiced magnitude, histogram the residuals."""
    pitch, mag = piptrack(y=y, sr=sr, S=S, n_fft=n_fft, **kwargs)
    pitch_mask = pitch > 0
    threshold = np.median(mag[pitch_mask]) if pitch_mask.any() else 0.0
    return pitch_tuning(pitch[(mag >= threshold) & pitch_mask],
                        resolution=resolution, bins_per_octave=bins_per_octave)


@functools.lru_cache(maxsize=64)
def chroma_filterbank(sr: int, n_fft: int, n_chroma: int = 12,
                      tuning: float = 0.0, ctroct: float = 5.0,
                      octwidth: float = 2.0) -> np.ndarray:
    """(n_chroma, 1 + n_fft/2) Gaussian chroma filters
    (librosa.filters.chroma, base_c=True): built over the full FFT grid
    minus DC plus one dummy low bin, column-L2 normalized BEFORE octave
    weighting, rolled so row 0 = C, then truncated to the rfft bins."""
    freqs = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * hz_to_octs(freqs, tuning=tuning, bins_per_octave=n_chroma)
    frqbins = np.concatenate([[frqbins[0] - 1.5 * n_chroma], frqbins])
    binwidth = np.concatenate([np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]])

    D = np.subtract.outer(frqbins, np.arange(n_chroma, dtype=np.float64)).T
    half = np.round(n_chroma / 2.0)
    D = np.remainder(D + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2 * D / binwidth[None, :]) ** 2)
    # per-column L2 normalization (librosa util.normalize: columns whose norm
    # is below float tiny are left unscaled)
    length = np.sqrt((wts ** 2).sum(axis=0, keepdims=True))
    wts = wts / np.where(length < _TINY32, 1.0, length)
    # octave weighting
    wts *= np.exp(-0.5 * ((frqbins[None, :] / n_chroma - ctroct) / octwidth) ** 2)
    # rotate so row 0 = C (librosa base_c=True)
    wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, : 1 + n_fft // 2]).astype(np.float32)


def chroma_stft(y: np.ndarray, sr: int, n_fft: int = 2048,
                hop: int = 512, n_chroma: int = 12,
                tuning: float = None) -> np.ndarray:
    """(12, frames) chromagram, per-frame inf-norm normalized
    (librosa.feature.chroma_stft defaults: power=2 spectrogram, per-clip
    tuning estimated from that same power spectrogram when tuning=None)."""
    S = stft_mag(y, n_fft, hop) ** 2
    if tuning is None:
        tuning = estimate_tuning(S=S, sr=sr, bins_per_octave=n_chroma)
    raw = chroma_filterbank(sr, n_fft, n_chroma, float(tuning)) @ S
    peak = np.abs(raw).max(axis=0, keepdims=True)
    return (raw / np.where(peak < _TINY32, 1.0, peak)).astype(np.float32)


# ---------------------------------------------------------------- onsets

def onset_strength(y: np.ndarray, sr: int, n_fft: int = 2048,
                   hop: int = 512, n_mels: int = 128) -> np.ndarray:
    """Spectral-flux onset envelope on the dB mel spectrogram
    (librosa.onset.onset_strength: lag=1 rectified difference, mean over
    bands, front-padded by lag + n_fft//(2*hop) frames, truncated to the
    spectrogram frame count)."""
    S = power_to_db(melspectrogram(y, sr, n_fft, hop, n_mels))
    diff = np.maximum(0.0, S[:, 1:] - S[:, :-1])
    env = diff.mean(axis=0)
    pad = 1 + n_fft // (2 * hop)
    env = np.concatenate([np.zeros(pad), env])[: S.shape[1]]
    return env.astype(np.float32)


def peak_pick(x: np.ndarray, pre_max, post_max, pre_avg, post_avg,
              delta: float, wait) -> np.ndarray:
    """librosa.util.peak_pick, exact: moving max over [i-pre_max, i+post_max)
    (constant boundary at x.min()), moving mean over [i-pre_avg, i+post_avg)
    with librosa's explicit truncated-window boundary correction; peaks are
    nonzero entries equal to the moving max and >= moving mean + delta, kept
    greedily with a strict `wait`-frame gap."""
    x = np.asarray(x, dtype=np.float64)
    pre_max = int(np.ceil(pre_max))
    post_max = int(np.ceil(post_max))
    pre_avg = int(np.ceil(pre_avg))
    post_avg = int(np.ceil(post_avg))
    wait = int(np.ceil(wait))
    if post_max < 1 or post_avg < 1:
        raise ValueError("post_max and post_avg must be >= 1")

    max_length = pre_max + post_max
    max_origin = int(np.ceil(0.5 * (pre_max - post_max)))
    mov_max = scipy.ndimage.maximum_filter1d(
        x, max_length, mode="constant", origin=max_origin, cval=x.min())

    avg_length = pre_avg + post_avg
    avg_origin = int(np.ceil(0.5 * (pre_avg - post_avg)))
    mov_avg = scipy.ndimage.uniform_filter1d(
        x, avg_length, mode="nearest", origin=avg_origin)

    # librosa's boundary corrections: true truncated-window means at both ends
    n = 0
    while n - pre_avg < 0 and n < x.shape[0]:
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start: n + post_avg])
        n += 1
    n = max(x.shape[0] - post_avg, 0)
    while n < x.shape[0]:
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start: n + post_avg])
        n += 1

    detections = x * (x == mov_max)
    detections = detections * (detections >= mov_avg + delta)

    peaks = []
    last = -np.inf
    for i in np.nonzero(detections)[0]:
        if i > last + wait:
            peaks.append(i)
            last = i
    return np.asarray(peaks, dtype=np.int64)


def onset_detect(y: np.ndarray, sr: int = 22050, n_fft: int = 2048,
                 hop: int = 512) -> np.ndarray:
    """Onset frame indices (librosa.onset.onset_detect defaults): envelope
    shifted/max-normalized to [0, 1], peak-picked with the sr-derived window
    sizes (30ms max / 100ms mean / 30ms wait, delta=0.07)."""
    env = onset_strength(y, sr, n_fft, hop)
    env = env - env.min()
    m = env.max()
    if m > 0:
        env = env / m
    if not env.any() or not np.all(np.isfinite(env)):
        return np.array([], dtype=np.int64)
    return peak_pick(
        env,
        pre_max=0.03 * sr // hop,
        post_max=0.00 * sr // hop + 1,
        pre_avg=0.10 * sr // hop,
        post_avg=0.10 * sr // hop + 1,
        wait=0.03 * sr // hop,
        delta=0.07,
    )


# ---------------------------------------------------------------- pitch

def _localmax(x: np.ndarray) -> np.ndarray:
    """librosa.util.localmax along axis 0: strictly greater than the previous
    element and >= the next, with edge padding (first row never a max)."""
    xp = np.pad(x, ((1, 1), (0, 0)), mode="edge")
    return (x > xp[:-2]) & (x >= xp[2:])


def piptrack(y: np.ndarray = None, sr: int = 22050, S: np.ndarray = None,
             n_fft: int = 2048, hop: int = 512,
             fmin: float = 150.0, fmax: float = 4000.0,
             threshold: float = 0.1):
    """Parabolic-interpolation pitch tracking (librosa.piptrack, exact):
    local maxima are computed on the THRESHOLDED spectrogram
    S * (S > threshold * frame_max), restricted to [fmin, fmax); returns
    (pitches, magnitudes) with magnitudes = S + 0.5*avg*shift at peaks."""
    if S is None:
        S = stft_mag(y, n_fft, hop)
    else:
        S = np.asarray(S)
        n_fft = 2 * (S.shape[0] - 1)
    fmin = max(fmin, 0.0)
    fmax = min(fmax, sr / 2.0)
    freqs = fft_frequencies(sr, n_fft)

    avg = 0.5 * (S[2:] - S[:-2])
    shift_den = 2 * S[1:-1] - S[2:] - S[:-2]
    tiny = np.finfo(S.dtype).tiny if np.issubdtype(S.dtype, np.floating) else _TINY32
    shift = avg / (shift_den + (np.abs(shift_den) < tiny))
    avg = np.pad(avg, ((1, 1), (0, 0)))
    shift = np.pad(shift, ((1, 1), (0, 0)))
    dskew = 0.5 * avg * shift

    ref = threshold * S.max(axis=0, keepdims=True)
    band = ((fmin <= freqs) & (freqs < fmax))[:, None]
    mask = band & _localmax(S * (S > ref))

    bins = np.arange(S.shape[0])[:, None]
    pitches = np.where(mask, (bins + shift) * sr / n_fft, 0.0)
    mags = np.where(mask, S + dskew, 0.0)
    return pitches.astype(np.float32), mags.astype(np.float32)


def dominant_pitch_track(y: np.ndarray, sr: int, **kw) -> np.ndarray:
    """Per-frame pitch of the strongest peak (the reference's usage,
    evaluation_reconstruction.py:83-103)."""
    pitches, mags = piptrack(y=y, sr=sr, **kw)
    idx = mags.argmax(axis=0)
    return pitches[idx, np.arange(pitches.shape[1])]


# ---------------------------------------------------------------- recurrence

def recurrence_matrix(data: np.ndarray, k: int = None, width: int = 1,
                      sym: bool = False) -> np.ndarray:
    """Boolean kNN connectivity matrix (librosa.segment.recurrence_matrix
    semantics, euclidean): observations are the columns of `data` (the LAST
    axis), so the reference's `recurrence_matrix(mfcc.T)` with mfcc (20, T)
    produces a 20x20 matrix over MFCC *coefficient* indices — a reference
    quirk reproduced faithfully (evaluation_style_transfer.py:121-133).

    rec[i, j] is True iff observation i is among the k nearest neighbors of
    observation j, where k defaults to 2*ceil(sqrt(t - 2*width + 1)) (or 2
    when t <= 2*width + 1); the diagonal band |i-j| < width is excluded, and
    candidates are drawn from the min(t-1, k + 2*width) nearest, mirroring
    librosa's sklearn pipeline."""
    data = np.atleast_2d(np.asarray(data, dtype=np.float64))
    t = data.shape[-1]
    if t < 2:
        return np.zeros((t, t), dtype=bool)
    if k is None:
        k = 2 * int(np.ceil(np.sqrt(t - 2 * width + 1))) if t > 2 * width + 1 else 2
    k = int(k)

    obs = data.T  # (t, d)
    d2 = ((obs[:, None, :] - obs[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)  # sklearn kneighbors excludes self
    n_neighbors = min(t - 1, k + 2 * width)

    rec = np.zeros((t, t), dtype=bool)
    offsets = np.arange(t)
    for q in range(t):
        cand = np.argsort(d2[q], kind="stable")[:n_neighbors]
        cand = cand[np.abs(cand - offsets[q]) >= width][:k]
        rec[cand, q] = True
    if sym:
        rec &= rec.T
    return rec
