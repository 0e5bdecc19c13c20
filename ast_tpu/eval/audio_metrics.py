"""Audio feature extraction for evaluation metrics.

The reference leans on librosa for every metric feature (chroma_stft, mfcc,
onset_detect, piptrack, recurrence_matrix — evaluation_reconstruction.py:39-118
and evaluation_style_transfer.py:80-133). librosa does not exist in this
environment, so these are from-scratch implementations of the same published
algorithms with librosa's default parameters (Slaney mel scale, 128 mels,
power-to-dB with top_db=80, DCT-II ortho MFCCs, Gaussian chroma filter bank
with octave weighting, spectral-flux onset strength with adaptive peak
picking, parabolic-interpolation pitch tracking, kNN recurrence matrix).
Everything is numpy on the host — metric evaluation is not a hot path — with
the filter banks cached."""

from __future__ import annotations

import functools

import numpy as np
from scipy.fft import dct

from ast_tpu.dsp.stft import hann_window_np


# ---------------------------------------------------------------- STFT (np)

def stft_mag(y: np.ndarray, n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """|STFT| (freq, frames), center reflect padding, hann — librosa layout."""
    pad = n_fft // 2
    if len(y) < pad + 1:
        y = np.pad(y, (0, pad + 1 - len(y)))
    yp = np.pad(y, (pad, pad), mode="reflect")
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


def mfcc(y: np.ndarray, sr: int, n_mfcc: int = 13, n_fft: int = 2048,
         hop: int = 512, n_mels: int = 128) -> np.ndarray:
    """(n_mfcc, frames) — librosa.feature.mfcc defaults."""
    S_db = power_to_db(melspectrogram(y, sr, n_fft, hop, n_mels))
    return dct(S_db, type=2, axis=0, norm="ortho")[:n_mfcc].astype(np.float32)


# ---------------------------------------------------------------- chroma

@functools.lru_cache(maxsize=8)
def chroma_filterbank(sr: int, n_fft: int, n_chroma: int = 12,
                      ctroct: float = 5.0, octwidth: float = 2.0) -> np.ndarray:
    """(n_chroma, 1 + n_fft/2) Gaussian chroma filters with octave weighting
    and base-C rotation (librosa.filters.chroma defaults)."""
    freqs = fft_frequencies(sr, n_fft)[1:]  # skip DC
    # fractional chroma bin of each fft bin (A440/16 = 27.5 Hz reference)
    frqbins = n_chroma * np.log2(freqs / (440.0 / 16))
    frqbins = np.concatenate([[frqbins[0] - 1.5 * n_chroma], frqbins])
    binwidth = np.concatenate([np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]])

    D = frqbins[None, :] - np.arange(n_chroma)[:, None]
    half = round(n_chroma / 2)
    D = np.remainder(D + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2 * D / binwidth[None, :]) ** 2)
    # per-column L2 normalization
    wts = wts / np.maximum(np.linalg.norm(wts, axis=0, keepdims=True), 1e-10)
    # octave weighting
    wts *= np.exp(-0.5 * ((frqbins[None, :] / n_chroma - ctroct) / octwidth) ** 2)
    # rotate so row 0 = C (librosa base_c=True)
    wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    out = np.zeros((n_chroma, len(freqs) + 1), dtype=np.float32)
    out[:, 1:] = wts[:, 1:]
    out[:, 0] = 0.0
    return out


def chroma_stft(y: np.ndarray, sr: int, n_fft: int = 2048,
                hop: int = 512, n_chroma: int = 12) -> np.ndarray:
    """(12, frames) chromagram, per-frame inf-norm normalized
    (librosa.feature.chroma_stft defaults)."""
    S = stft_mag(y, n_fft, hop) ** 2
    raw = chroma_filterbank(sr, n_fft, n_chroma) @ S
    peak = np.maximum(raw.max(axis=0, keepdims=True), 1e-10)
    return (raw / peak).astype(np.float32)


# ---------------------------------------------------------------- onsets

def onset_strength(y: np.ndarray, sr: int, n_fft: int = 2048,
                   hop: int = 512, n_mels: int = 128) -> np.ndarray:
    """Spectral-flux onset envelope on the dB mel spectrogram
    (librosa.onset.onset_strength: rectified first difference, mean over
    bands, centered by n_fft//(2*hop) frames)."""
    S = power_to_db(melspectrogram(y, sr, n_fft, hop, n_mels))
    diff = np.maximum(0.0, S[:, 1:] - S[:, :-1])
    env = diff.mean(axis=0)
    # center compensation: pad so envelope aligns with frame times
    lag = 1 + n_fft // (2 * hop)
    env = np.concatenate([np.zeros(lag), env])[: S.shape[1]]
    return env.astype(np.float32)


def peak_pick(env: np.ndarray, pre_max: int = 3, post_max: int = 3,
              pre_avg: int = 3, post_avg: int = 5, delta: float = 0.07,
              wait: int = 3) -> np.ndarray:
    """librosa.util.peak_pick algorithm: local max over [i-pre_max, i+post_max],
    above local mean + delta, at least `wait` frames since last peak."""
    n = len(env)
    peaks = []
    last = -1 - wait
    for i in range(n):
        lo_m, hi_m = max(0, i - pre_max), min(n, i + post_max + 1)
        lo_a, hi_a = max(0, i - pre_avg), min(n, i + post_avg + 1)
        if env[i] != env[lo_m:hi_m].max():
            continue
        if env[i] < env[lo_a:hi_a].mean() + delta:
            continue
        if i - last <= wait:
            continue
        peaks.append(i)
        last = i
    return np.asarray(peaks, dtype=np.int64)


def onset_detect(y: np.ndarray, sr: int, n_fft: int = 2048,
                 hop: int = 512) -> np.ndarray:
    """Onset frame indices (librosa.onset.onset_detect defaults)."""
    env = onset_strength(y, sr, n_fft, hop)
    if env.max() > 0:
        env = env / env.max() * 10.0  # scale-stabilize delta like librosa's
    return peak_pick(env)


# ---------------------------------------------------------------- pitch

def piptrack(y: np.ndarray, sr: int, n_fft: int = 2048, hop: int = 512,
             fmin: float = 150.0, fmax: float = 4000.0,
             threshold: float = 0.1):
    """Parabolic-interpolation pitch tracking (librosa.piptrack):
    returns (pitches, magnitudes), each (freq_bins, frames); entries are
    nonzero at magnitude peaks above threshold * frame max."""
    S = stft_mag(y, n_fft, hop)
    n_bins, n_frames = S.shape
    freqs = fft_frequencies(sr, n_fft)

    # parabolic interpolation around each interior bin
    Sp = np.pad(S, ((1, 1), (0, 0)))
    num = 0.5 * (Sp[:-2] - Sp[2:])
    den = Sp[:-2] - 2 * Sp[1:-1] + Sp[2:]
    shift = np.where(np.abs(den) > 1e-10, num / np.where(np.abs(den) > 1e-10, den, 1.0), 0.0)

    is_peak = (S >= Sp[:-2]) & (S >= Sp[2:])
    ref = threshold * S.max(axis=0, keepdims=True)
    mask = is_peak & (S > ref)
    band = ((freqs >= fmin) & (freqs <= fmax))[:, None]
    mask &= band

    bin_idx = np.arange(n_bins)[:, None] + shift
    pitches = np.where(mask, bin_idx * sr / n_fft, 0.0)
    mags = np.where(mask, S + 0.5 * num * shift, 0.0)
    return pitches.astype(np.float32), mags.astype(np.float32)


def dominant_pitch_track(y: np.ndarray, sr: int, **kw) -> np.ndarray:
    """Per-frame pitch of the strongest peak (the reference's usage,
    evaluation_reconstruction.py:83-103)."""
    pitches, mags = piptrack(y, sr, **kw)
    idx = mags.argmax(axis=0)
    return pitches[idx, np.arange(pitches.shape[1])]


# ---------------------------------------------------------------- recurrence

def recurrence_matrix(data: np.ndarray, k: int = None, sym: bool = False) -> np.ndarray:
    """Boolean kNN self-similarity matrix over frames (rows = observations),
    librosa.segment.recurrence_matrix semantics: k defaults to
    ceil(sqrt(t)) nearest neighbors per frame, no self-links."""
    t = data.shape[0]
    if t < 2:
        return np.zeros((t, t), dtype=bool)
    if k is None:
        k = int(np.ceil(np.sqrt(t)))
    k = min(k, t - 1)
    d2 = ((data[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.argsort(d2, axis=1)[:, :k]
    rec = np.zeros((t, t), dtype=bool)
    rows = np.repeat(np.arange(t), k)
    rec[rows, nn.reshape(-1)] = True
    if sym:
        rec &= rec.T
    return rec
