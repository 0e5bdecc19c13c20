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


@functools.lru_cache(maxsize=32)
def _block_mats(up: int, down: int, lowpass_filter_width: int,
                rolloff: float, window: str, beta: float) -> tuple:
    """Block-Toeplitz matmul form of the polyphase filter.

    A strided FIR is a terrible fit for the MXU as a conv (C_in=1, ~70-tap
    contraction, measured ~1.2 ms per 2:1 stage as lax.conv = pure dispatch
    and layout overhead for <0.2 GFLOP). Reformulated: tile the padded
    signal into C-sample chunks (C = Bb*down); the Bb*up outputs of chunk m
    depend only on chunks m and m+1, so the whole resample is TWO dense
    (C, Bb*up) matmuls — full 128-lane contraction, fuses with neighbors.

    Returns (W1, W2, width, Bb, C) with
      out[m*Bb + b, p] = sum_i chunk_m[i] W1[i, b*up+p]
                       + sum_i chunk_{m+1}[i] W2[i, b*up+p].
    """
    kernel, width = _kernel(up, down, lowpass_filter_width, rolloff, window,
                            beta)
    taps = kernel.shape[1]
    # Bb*down >= ~128 for full MXU contraction; also need the Bb-block's
    # input span (Bb-1)*down + taps to fit in two chunks: taps <= C + down
    Bb = max(-(-128 // down), -(-(taps - down) // down), 1)
    C = Bb * down
    W = np.zeros((2 * C, Bb * up), np.float32)
    for b in range(Bb):
        W[b * down : b * down + taps, b * up : (b + 1) * up] = kernel.T
    return W[:C], W[C:], width, Bb, C


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = LOWPASS_WIDTH,
             rolloff: float = ROLLOFF, window: str = "hann",
             method: str = "matmul") -> jnp.ndarray:
    """Resample a (..., n) signal. Output length = ceil(n * new/orig).

    The default kernel matches torchaudio's sinc_interp_hann (the reference
    loader's path); window="kaiser" with the KAISER_* preset gives the
    high-rejection decimator used inside the recursive CQT.

    method="matmul" (default) evaluates the polyphase filter as two dense
    block-Toeplitz MXU matmuls (see _block_mats) — identical summands per
    output sample as the strided conv, ~6x faster on TPU for the CQT's 2:1
    decimation chain; method="conv" keeps the lax.conv evaluation."""
    if orig_freq == new_freq:
        return x
    up, down = _reduce(orig_freq, new_freq)
    kernel, width = _kernel(up, down, lowpass_filter_width, rolloff, window)
    n = x.shape[-1]
    target_len = int(math.ceil(n * up / down))

    lead = x.shape[:-1]
    if method == "matmul":
        w1_np, w2_np, width, Bb, Cb = _block_mats(
            up, down, lowpass_filter_width, rolloff, window, KAISER_BETA)
        w1, w2 = jnp.asarray(w1_np), jnp.asarray(w2_np)
        xf = x.reshape((-1, n))
        m_chunks = -(-target_len // (Bb * up))
        total = (m_chunks + 1) * Cb  # chunk m+1 must exist for the last m
        xf = jnp.pad(xf, ((0, 0), (width, total - n - width)))
        chunks = xf.reshape(xf.shape[0], m_chunks + 1, Cb)
        out = chunks[:, :-1] @ w1 + chunks[:, 1:] @ w2
        out = out.reshape(out.shape[0], -1)[:, :target_len]
        return out.reshape(lead + (target_len,))
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
