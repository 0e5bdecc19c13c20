"""TPU-native DSP layer (L0): STFT/ISTFT, CQT, windowing, normalization,
resampling — all pure jnp, jittable, no host dependencies.

Capability parity with the reference's utilityFunctions.py, redesigned for
XLA: loops become gathers/scatters, librosa's CPU CQT becomes an on-device
filterbank matmul.
"""

from ast_tpu.dsp.stft import stft, istft, stft_ri, istft_ri, hann_window, frame_signal
from ast_tpu.dsp.cqt import cqt, cqt_ri, icqt, icqt_ri, cqt_kernel, cqt_frequencies
from ast_tpu.dsp.windows import (
    get_overlap_windows,
    sections2spectrogram,
    concat_stft_cqt,
    num_windows,
    window_starts,
)
from ast_tpu.dsp.norm import normalize, denormalize, FeatureStats, load_instrument_stats
from ast_tpu.dsp.features import extract_features, extract_features_jit, extract_features_batch
from ast_tpu.dsp.resample import resample, resample_np

__all__ = [
    "stft", "istft", "stft_ri", "istft_ri", "hann_window", "frame_signal",
    "cqt", "cqt_ri", "icqt", "icqt_ri", "cqt_kernel", "cqt_frequencies",
    "get_overlap_windows", "sections2spectrogram", "concat_stft_cqt",
    "num_windows", "window_starts",
    "normalize", "denormalize", "FeatureStats", "load_instrument_stats",
    "extract_features", "extract_features_jit", "extract_features_batch",
    "resample", "resample_np",
]
