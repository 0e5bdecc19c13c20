"""Pallas kernel tests (interpreter mode on CPU; the same kernels compile on
TPU where bench.py exercises them)."""

import numpy as np
import jax.numpy as jnp

from ast_tpu.ops import overlap_add, overlap_add_reference, overlap_add_waveform


def test_overlap_add_matches_scatter(rng):
    for S, W, F, hop in [(4, 287, 5, 191), (4, 287, 5, 201), (6, 64, 3, 16),
                         (1, 32, 2, 8), (5, 100, 1, 100)]:
        frames = jnp.asarray(rng.standard_normal((S, W, F)).astype(np.float32))
        ref = np.asarray(overlap_add_reference(frames, hop))
        out = np.asarray(overlap_add(frames, hop, interpret=True))
        assert out.shape == ref.shape, (S, W, F, hop)
        np.testing.assert_allclose(out, ref, atol=1e-5), (S, W, F, hop)


def test_overlap_add_waveform(rng):
    frames = jnp.asarray(rng.standard_normal((8, 1024)).astype(np.float32))
    out = np.asarray(overlap_add_waveform(frames, 256, interpret=True))
    ref = np.asarray(overlap_add_reference(frames[:, :, None], 256))[:, 0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_overlap_add_istft_shapes(rng):
    """The exact istft configuration: 862 frames of 1024 samples, hop 256."""
    frames = jnp.asarray(rng.standard_normal((86, 1024, 1)).astype(np.float32))
    out = np.asarray(overlap_add(frames, 256, interpret=True))
    ref = np.asarray(overlap_add_reference(frames, 256))
    assert out.shape == (256 * 85 + 1024, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_istft_pallas_path_matches_scatter(rng):
    """istft(use_pallas=True, interpreter) == istft scatter path."""
    import sys

    import jax.numpy as jnp
    import ast_tpu.dsp  # noqa: F401
    S = sys.modules["ast_tpu.dsp.stft"]

    x = rng.standard_normal(22050).astype(np.float32)
    spec = S.stft(jnp.asarray(x), n_fft=1024, hop_length=256)
    ref = np.asarray(S.istft(spec, 1024, 256, use_pallas=False))
    # interpret-mode pallas on CPU
    import ast_tpu.ops.pallas_ola as P
    orig = P._should_interpret
    P._should_interpret = lambda: True
    try:
        out = np.asarray(S.istft(spec, 1024, 256, use_pallas=True))
    finally:
        P._should_interpret = orig
    np.testing.assert_allclose(out, ref, atol=1e-5)
