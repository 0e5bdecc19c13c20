"""Evaluation metrics, reference-faithful.

Reconstruction metrics (reference: evaluation_reconstruction.py:39-118) and
style-transfer metrics (reference: evaluation_style_transfer.py:80-133),
including the per-metric try/except sentinel semantics (inf / 0.0 / None)
that keep batch evaluation alive on per-sample failures. Feature extraction
comes from ast_tpu.eval.audio_metrics (native, librosa-free)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.stats import pearsonr

from ast_tpu.eval.audio_metrics import (
    chroma_stft,
    mfcc,
    onset_detect,
    piptrack,
    recurrence_matrix,
    stft_mag,
)

N_FFT = 1024
HOP_LENGTH = 256


def _f1_binary(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    tp = float(np.sum((y_true == 1) & (y_pred == 1)))
    fp = float(np.sum((y_true == 0) & (y_pred == 1)))
    fn = float(np.sum((y_true == 1) & (y_pred == 0)))
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


# ------------------------------------------------------------ reconstruction

def chroma_distance(original_audio, generated_audio, sr=22050) -> float:
    """Mean per-frame euclidean distance between chromagrams
    (evaluation_reconstruction.py:39-52)."""
    try:
        c_orig = chroma_stft(np.asarray(original_audio), sr)
        c_gen = chroma_stft(np.asarray(generated_audio), sr)
        m = min(c_orig.shape[1], c_gen.shape[1])
        return float(np.mean(np.sqrt(np.sum(
            (c_orig[:, :m] - c_gen[:, :m]) ** 2, axis=0))))
    except Exception as e:
        print(f"Error in chroma_distance: {e}")
        return float("inf")


def onset_accuracy(original_audio, generated_audio, sr=22050) -> float:
    """Binary frame-level onset F1 (evaluation_reconstruction.py:54-81)."""
    try:
        on_orig = onset_detect(np.asarray(original_audio), sr)
        on_gen = onset_detect(np.asarray(generated_audio), sr)
        if len(on_orig) == 0 and len(on_gen) == 0:
            return 1.0
        if len(on_orig) == 0 or len(on_gen) == 0:
            return 0.0
        max_frame = max(on_orig.max(initial=0), on_gen.max(initial=0))
        total = max(int(len(original_audio) / HOP_LENGTH) + 1, int(max_frame) + 1)
        y_true = np.zeros(total)
        y_pred = np.zeros(total)
        y_true[on_orig] = 1
        y_pred[on_gen] = 1
        return float(_f1_binary(y_true, y_pred))
    except Exception as e:
        print(f"Error in onset_accuracy: {e}")
        return 0.0


def pitch_correlation(original_audio, generated_audio, sr=22050) -> float:
    """Pearson correlation of frame-wise MEAN piptrack pitch (the reference
    averages over the frequency axis, evaluation_reconstruction.py:83-103)."""
    try:
        p_orig, _ = piptrack(np.asarray(original_audio), sr)
        p_gen, _ = piptrack(np.asarray(generated_audio), sr)
        m_orig = p_orig.mean(axis=0)
        m_gen = p_gen.mean(axis=0)
        m = min(len(m_orig), len(m_gen))
        if m == 0:
            return 0.0
        corr, _ = pearsonr(m_orig[:m], m_gen[:m])
        return float(corr) if not np.isnan(corr) else 0.0
    except Exception as e:
        print(f"Error in pitch_correlation: {e}")
        return 0.0


def mse_spectrogram(original_audio, generated_audio, sr=22050) -> float:
    """MSE between magnitude spectrograms (evaluation_reconstruction.py:105-118)."""
    try:
        s_orig = stft_mag(np.asarray(original_audio), N_FFT, HOP_LENGTH)
        s_gen = stft_mag(np.asarray(generated_audio), N_FFT, HOP_LENGTH)
        m = min(s_orig.shape[1], s_gen.shape[1])
        return float(np.mean((s_orig[:, :m] - s_gen[:, :m]) ** 2))
    except Exception as e:
        print(f"Error in mse_spectrogram: {e}")
        return float("inf")


def calculate_reconstruction_metrics(original_audio, reconstructed_audio,
                                     sr=22050) -> Dict[str, float]:
    """(evaluation_reconstruction.py:191-224), sentinels included."""
    try:
        m = min(len(original_audio), len(reconstructed_audio))
        if m == 0:
            raise ValueError("empty audio")
        a, b = np.asarray(original_audio[:m]), np.asarray(reconstructed_audio[:m])
        corr = pitch_correlation(a, b, sr)
        return {
            "chroma_distance": chroma_distance(a, b, sr),
            "onset_accuracy": onset_accuracy(a, b, sr),
            "pitch_correlation": corr if not np.isnan(corr) else 0.0,
            "mse_spectrogram": mse_spectrogram(a, b, sr),
        }
    except Exception as e:
        print(f"Error calculating metrics: {e}")
        return {
            "chroma_distance": float("inf"),
            "onset_accuracy": 0.0,
            "pitch_correlation": 0.0,
            "mse_spectrogram": float("inf"),
        }


# ------------------------------------------------------------ style transfer

def chroma_similarity(generated_audio, original_audio, sr=22050) -> float:
    """Mean per-pitch-class Pearson correlation vs the ORIGINAL
    (evaluation_style_transfer.py:80-96)."""
    try:
        c_gen = chroma_stft(np.asarray(generated_audio), sr, N_FFT, HOP_LENGTH)
        c_orig = chroma_stft(np.asarray(original_audio), sr, N_FFT, HOP_LENGTH)
        m = min(c_gen.shape[1], c_orig.shape[1])
        sims = []
        for i in range(c_gen.shape[0]):
            # constant rows make corrcoef 0/0 -> NaN; that case is handled
            # below, so silence numpy's divide warnings (value-identical)
            with np.errstate(invalid="ignore", divide="ignore"):
                v = np.corrcoef(c_gen[i, :m], c_orig[i, :m])[0, 1]
            if not np.isnan(v):
                sims.append(v)
        if sims:
            return float(np.mean(sims))
        print("Warning: No valid chroma similarities computed for audio "
              "(all NaN). Returning 0.0")
        return 0.0
    except Exception as e:
        print(f"Error computing chroma similarity: {e}. Returning 0.0")
        return 0.0


def mfcc_distance(generated_audio, reference_audio, sr=22050,
                  n_mfcc=13) -> Optional[float]:
    """Mean per-frame euclidean MFCC distance vs a reference clip of the
    target class (evaluation_style_transfer.py:99-109)."""
    try:
        m_gen = mfcc(np.asarray(generated_audio), sr, n_mfcc, hop=HOP_LENGTH)
        m_ref = mfcc(np.asarray(reference_audio), sr, n_mfcc, hop=HOP_LENGTH)
        m = min(m_gen.shape[1], m_ref.shape[1])
        return float(np.mean(np.sqrt(np.sum(
            (m_gen[:, :m] - m_ref[:, :m]) ** 2, axis=0))))
    except Exception as e:
        print(f"Error computing MFCC distance: {e}. Returning None")
        return None


def instrumentation_similarity(audio1, audio2, sr=22050) -> float:
    """Pearson correlation of frequency energy profiles
    (evaluation_style_transfer.py:111-119)."""
    s1 = stft_mag(np.asarray(audio1))
    s2 = stft_mag(np.asarray(audio2))
    e1 = s1.sum(axis=1)
    e2 = s2.sum(axis=1)
    m = min(len(e1), len(e2))
    corr, _ = pearsonr(e1[:m], e2[:m])
    return float(corr) if not np.isnan(corr) else 0.0


def self_similarity_distance(audio1, audio2, sr=22050) -> float:
    """L1 distance between MFCC recurrence matrices
    (evaluation_style_transfer.py:121-133). Note the reference passes mfcc.T
    (frames, 20) to librosa.segment.recurrence_matrix, whose observations run
    along the LAST axis — so both SSMs are 20x20 over MFCC *coefficient*
    indices, not frames. Reproduced faithfully (see audio_metrics
    .recurrence_matrix)."""
    m1 = mfcc(np.asarray(audio1), sr, n_mfcc=20)
    m2 = mfcc(np.asarray(audio2), sr, n_mfcc=20)
    ssm1 = recurrence_matrix(m1.T)
    ssm2 = recurrence_matrix(m2.T)
    m = min(ssm1.shape[0], ssm2.shape[0])
    return float(np.mean(np.abs(ssm1[:m, :m].astype(int) - ssm2[:m, :m].astype(int))))


def eval_style_transfer_metrics(generated_audio, original_audio,
                                reference_audio, sr=22050) -> Dict[str, Optional[float]]:
    """(evaluation_style_transfer.py:193-211): chroma vs original, the rest
    vs a reference clip of the target class (None when absent)."""
    has_ref = reference_audio is not None
    return {
        "chroma_similarity": chroma_similarity(generated_audio, original_audio, sr),
        "mfcc_distance": mfcc_distance(generated_audio, reference_audio, sr)
        if has_ref else None,
        "instrumentation_similarity": instrumentation_similarity(
            generated_audio, reference_audio, sr) if has_ref else None,
        "self_similarity_distance": self_similarity_distance(
            generated_audio, reference_audio, sr) if has_ref else None,
    }
