"""Polyphase windowed-sinc resampling.

TPU-native replacement for `torchaudio.functional.resample` used by the
reference's audio loader (reference: utilityFunctions.py:116-117). Implements
the same kernel construction (hann^2-windowed sinc, lowpass_filter_width=6,
rolloff=0.99) so resampled audio matches the reference's to filter precision:
after gcd reduction to (up, down),

    kernel[p, i] = sinc(t) * cos(t*pi/(2*W))^2 * base/down,
    t = clamp(((i - width)/down - p/up) * base, -W, W),
    base = min(up, down) * rolloff,  width = ceil(W * down / base),

applied as a strided conv (stride=down) on the width-padded signal, phases
interleaved. Jittable on device; a scipy-based numpy path serves host tools.
"""

from __future__ import annotations

import functools
import math

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

LOWPASS_WIDTH = 6
ROLLOFF = 0.99
# torchaudio's "sinc_interp_kaiser" preset (an approximation of resampy's
# kaiser_best): much higher stopband rejection than hann^2 at width 6 —
# used where aliasing matters (the CQT octave decimation chain)
KAISER_WIDTH = 16
KAISER_ROLLOFF = 0.9475937167399596
KAISER_BETA = 14.769656459379492


@functools.lru_cache(maxsize=32)
def _kernel(up: int, down: int, lowpass_filter_width: int = LOWPASS_WIDTH,
            rolloff: float = ROLLOFF, window: str = "hann",
            beta: float = KAISER_BETA) -> tuple:
    """Polyphase kernel (up, 2*width + down) and the pad width."""
    W = lowpass_filter_width
    base = min(up, down) * rolloff
    width = int(math.ceil(W * down / base))
    i = np.arange(-width, width + down, dtype=np.float64)  # taps, in down units
    p = np.arange(up, dtype=np.float64)
    t = (i[None, :] / down - p[:, None] / up) * base
    t = np.clip(t, -W, W)
    if window == "kaiser":
        win = np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - (t / W) ** 2))) / np.i0(beta)
    elif window == "hann":
        win = np.cos(t * np.pi / W / 2.0) ** 2
    else:
        raise ValueError(f"unknown window {window!r}")
    sinc = np.where(t == 0, 1.0, np.sin(t * np.pi) / np.where(t == 0, 1.0, t * np.pi))
    kernel = (sinc * win * (base / down)).astype(np.float32)
    # cache numpy (jnp under a jit trace would leak a tracer into the cache)
    return kernel, width


def _reduce(orig_freq: int, new_freq: int) -> tuple:
    g = math.gcd(int(orig_freq), int(new_freq))
    return new_freq // g, orig_freq // g


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = LOWPASS_WIDTH,
             rolloff: float = ROLLOFF, window: str = "hann") -> jnp.ndarray:
    """Resample a (..., n) signal. Output length = ceil(n * new/orig).

    The default kernel matches torchaudio's sinc_interp_hann (the reference
    loader's path); window="kaiser" with the KAISER_* preset gives the
    high-rejection decimator used inside the recursive CQT."""
    if orig_freq == new_freq:
        return x
    up, down = _reduce(orig_freq, new_freq)
    kernel, width = _kernel(up, down, lowpass_filter_width, rolloff, window)
    n = x.shape[-1]
    target_len = int(math.ceil(n * up / down))

    lead = x.shape[:-1]
    xf = x.reshape((-1, 1, n))
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + down)))
    k = jnp.asarray(kernel)[:, None, :]  # (up, 1, taps) -> OIH
    out = lax.conv_general_dilated(
        xf, k,
        window_strides=(down,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (batch, up, blocks)
    out = jnp.transpose(out, (0, 2, 1)).reshape(out.shape[0], -1)
    out = out[:, :target_len]
    if out.shape[1] < target_len:
        out = jnp.pad(out, ((0, 0), (0, target_len - out.shape[1])))
    return out.reshape(lead + (target_len,))


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host-side reference implementation (same kernel, plain numpy)."""
    if orig_freq == new_freq:
        return np.asarray(x, np.float32)
    up, down = _reduce(orig_freq, new_freq)
    kernel, width = _kernel(up, down)
    n = x.shape[-1]
    target_len = int(math.ceil(n * up / down))
    xp = np.pad(np.asarray(x, np.float64), (width, width + down))
    taps = kernel.shape[1]
    blocks = (len(xp) - taps) // down + 1
    out = np.zeros((blocks, up), np.float64)
    for b in range(blocks):
        seg = xp[b * down : b * down + taps]
        out[b] = kernel @ seg
    return out.reshape(-1)[:target_len].astype(np.float32)
