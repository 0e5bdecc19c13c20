"""Polyphase windowed-sinc resampling.

TPU-native replacement for `torchaudio.functional.resample` used by the
reference's audio loader (reference: utilityFunctions.py:116-117). Same
algorithm family (Kaiser-free hann-windowed sinc lowpass, polyphase
decimation/interpolation), implemented as a single strided conv so it jits and
runs on device; a numpy path is provided for host-side preprocessing tools.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _polyphase_filter(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                      rolloff: float = 0.99) -> tuple:
    """Build the (gcd-reduced) polyphase filterbank.

    Returns (kernel (L, width), up L, down M) where row p is the filter for
    output phase p."""
    g = math.gcd(orig_freq, new_freq)
    up, down = new_freq // g, orig_freq // g
    base_freq = min(orig_freq, new_freq) / g * rolloff  # cutoff in "per-up-sample" units

    # windowed-sinc filter at the upsampled rate (orig*up)
    width = int(lowpass_filter_width * up / base_freq) if base_freq > 0 else lowpass_filter_width
    idx = np.arange(-width, width + up, dtype=np.float64)[None, :] / up  # in orig samples
    t = (-idx + np.arange(up, dtype=np.float64)[:, None] / up) * base_freq / 1.0
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / up
    kernel = np.where(t == 0, 1.0, np.sin(t * np.pi) / np.where(t == 0, 1.0, t * np.pi))
    kernel *= window * scale
    # cache numpy (jnp under a jit trace would leak a tracer into the cache)
    return kernel.astype(np.float32), up, down, width


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample a (..., n) signal from orig_freq to new_freq.

    Output length = ceil(n * new/orig), matching torchaudio."""
    if orig_freq == new_freq:
        return x
    kernel, up, down, width = _polyphase_filter(orig_freq, new_freq)
    n = x.shape[-1]
    target_len = int(math.ceil(new_freq * n / orig_freq))

    lead = x.shape[:-1]
    xf = x.reshape((-1, 1, n))
    pad = width // 1
    xf = jnp.pad(xf, ((0, 0), (0, 0), (pad, pad + up)))
    # conv with stride=down for each phase
    k = jnp.asarray(kernel)[:, None, :]  # (up, 1, taps)
    import jax.lax as lax

    out = lax.conv_general_dilated(
        xf, k[..., ::-1],
        window_strides=(down,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (batch, up, frames)
    out = jnp.transpose(out, (0, 2, 1)).reshape(out.shape[0], -1)
    out = out[:, :target_len]
    if out.shape[1] < target_len:
        out = jnp.pad(out, ((0, 0), (0, target_len - out.shape[1])))
    return out.reshape(lead + (target_len,))


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host-side resampling via scipy polyphase (for preprocessing tools)."""
    if orig_freq == new_freq:
        return x
    from scipy.signal import resample_poly

    g = math.gcd(orig_freq, new_freq)
    return resample_poly(x, new_freq // g, orig_freq // g, axis=-1).astype(np.float32)
