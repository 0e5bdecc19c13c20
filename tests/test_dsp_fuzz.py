"""Property-style DSP tests over randomized shapes: framing identities,
stft/istft round trips, and window/OLA inverses must hold for arbitrary
lengths, hops, and overlap combinations — not just the production constants."""

import numpy as np
import pytest
import jax.numpy as jnp

import sys
import ast_tpu.dsp  # noqa: F401
S = sys.modules["ast_tpu.dsp.stft"]
W = sys.modules["ast_tpu.dsp.windows"]


@pytest.mark.parametrize("n_fft,hop", [(64, 16), (64, 64), (128, 32),
                                       (96, 24), (100, 30)])
def test_frame_signal_identity(rng, n_fft, hop):
    """Both framing paths (reshape-concat when hop|n_fft, iota gather
    otherwise) must produce exactly x[t*hop : t*hop+n_fft]."""
    n = 1000
    x = rng.standard_normal(n).astype(np.float32)
    frames = np.asarray(S.frame_signal(jnp.asarray(x), n_fft, hop, center=False))
    n_frames = 1 + (n - n_fft) // hop
    assert frames.shape == (n_frames, n_fft)
    for t in (0, n_frames // 2, n_frames - 1):
        np.testing.assert_array_equal(frames[t], x[t * hop : t * hop + n_fft])


@pytest.mark.parametrize("n,n_fft,hop", [(3000, 256, 64), (2048, 128, 32),
                                         (5000, 512, 128)])
def test_stft_istft_roundtrip_shapes(rng, n, n_fft, hop):
    x = rng.standard_normal(n).astype(np.float32)
    spec = S.stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop)
    assert spec.shape == (1 + n // hop, n_fft // 2 + 1)
    y = np.asarray(S.istft(spec, n_fft=n_fft, hop_length=hop))
    assert y.shape == (hop * (n // hop),)
    np.testing.assert_allclose(y[hop : len(y) - hop],
                               x[hop : len(y) - hop], atol=1e-4)


def test_windows_roundtrip_random_configs(rng):
    for _ in range(8):
        window = int(rng.integers(8, 40))
        overlap = int(rng.integers(0, window - 1))
        n_time = int(rng.integers(window, 6 * window))
        spec = rng.standard_normal((2, n_time, 5)).astype(np.float32)
        secs = W.get_overlap_windows(jnp.asarray(spec), window, overlap)
        n_secs = secs.shape[0]
        covered = min(n_time, (window - overlap) * (n_secs - 1) + window)
        rec = np.asarray(W.sections2spectrogram(secs, n_time, overlap))
        np.testing.assert_allclose(rec[:, :covered], spec[:, :covered],
                                   atol=1e-5,
                                   err_msg=f"w={window} o={overlap} T={n_time}")


def test_istft_pallas_random_shapes(rng):
    """Pallas OLA (interpreter) vs scatter across random frame/hop configs."""
    from ast_tpu.ops import overlap_add_reference, overlap_add_waveform

    for _ in range(6):
        hop = int(rng.integers(8, 64))
        w = int(rng.integers(hop, 4 * hop))
        s = int(rng.integers(2, 20))
        frames = jnp.asarray(rng.standard_normal((s, w)).astype(np.float32))
        ref = np.asarray(overlap_add_reference(frames[:, :, None], hop))[:, 0]
        out = np.asarray(overlap_add_waveform(frames, hop, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5,
                                   err_msg=f"s={s} w={w} hop={hop}")
