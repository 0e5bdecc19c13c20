"""Tests for overlap windowing / OLA reconstruction
(reference semantics: utilityFunctions.py:240-283)."""

import numpy as np
import jax.numpy as jnp

import sys
import ast_tpu.dsp  # noqa: F401  (registers submodules)
W = sys.modules["ast_tpu.dsp.windows"]


def loop_windows(spec, window_size, overlap):
    """Reference loop semantics re-stated independently for testing."""
    channels, n_time, n_freq = spec.shape
    step = window_size - overlap
    sections = []
    for start in range(0, n_time, step):
        end = min(start + window_size, n_time)
        if end - start < window_size * 0.5:
            break
        sec = spec[:, start:end, :]
        if end - start < window_size:
            sec = np.concatenate(
                [sec, np.zeros((channels, window_size - (end - start), n_freq), spec.dtype)],
                axis=1,
            )
        sections.append(sec)
        if end == n_time:
            break
    return np.stack(sections, axis=0)


def loop_reconstruct(sections, original_size, overlap):
    n_sections, ch, wind, n_freq = sections.shape
    hop = wind - overlap
    n_time = hop * (n_sections - 1) + wind
    full = np.zeros((ch, n_time, n_freq), np.float64)
    count = np.zeros((1, n_time, 1), np.float64)
    for i in range(n_sections):
        full[:, i * hop : i * hop + wind, :] += sections[i]
        count[:, i * hop : i * hop + wind, :] += 1.0
    full = full / np.clip(count, 1.0, None)
    return full[:, :original_size, :].astype(np.float32)


def test_window_count_862_frames():
    # 10s @ 22050 with hop 256 -> 862 frames -> 4 windows + tail behavior
    assert W.num_windows(862, 287, 96) == len(loop_windows(np.zeros((2, 862, 5), np.float32), 287, 96))


def test_windows_match_reference_loop(rng):
    for n_time, overlap in [(862, 96), (862, 86), (500, 96), (287, 96), (400, 86)]:
        spec = rng.standard_normal((2, n_time, 7)).astype(np.float32)
        ref = loop_windows(spec, 287, overlap)
        ours = np.asarray(W.get_overlap_windows(jnp.asarray(spec), 287, overlap))
        assert ours.shape == ref.shape, (n_time, overlap)
        np.testing.assert_allclose(ours, ref, atol=0)


def test_reconstruct_matches_reference_loop(rng):
    for n_sections, overlap in [(4, 96), (5, 86), (1, 96)]:
        secs = rng.standard_normal((n_sections, 2, 287, 7)).astype(np.float32)
        original = 191 * (n_sections - 1) + 287 - 10
        ref = loop_reconstruct(secs, original, overlap)
        ours = np.asarray(W.sections2spectrogram(jnp.asarray(secs), original, overlap))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_window_ola_roundtrip(rng):
    """windows -> reconstruct is the identity on the covered region."""
    spec = rng.standard_normal((2, 862, 9)).astype(np.float32)
    secs = W.get_overlap_windows(jnp.asarray(spec), 287, 96)
    rec = np.asarray(W.sections2spectrogram(secs, 862, 96))
    # windows cover frames [0, 860) for T=862 (tail shorter than window/2 is
    # dropped, exactly as in the reference); identity holds on the covered part
    covered = 191 * (secs.shape[0] - 1) + 287
    np.testing.assert_allclose(rec[:, :covered], spec[:, :covered], atol=1e-5)
    np.testing.assert_allclose(rec[:, covered:], 0.0, atol=0)


def test_concat_stft_cqt(rng):
    s = jnp.asarray(rng.standard_normal((2, 10, 513)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 10, 84)).astype(np.float32))
    out = W.concat_stft_cqt(s, c)
    assert out.shape == (2, 10, 597)
    import pytest
    with pytest.raises(ValueError):
        W.concat_stft_cqt(s, c[:, :5])


def test_overlap_windows_cl_matches_cf(rng):
    """Channels-last windowing is the transpose of the packed-layout one
    (the fused cores rely on this equivalence to skip the NHWC transpose)."""
    spec = rng.standard_normal((2, 862, 9)).astype(np.float32)
    cf = np.asarray(W.get_overlap_windows(jnp.asarray(spec), 287, 96))
    cl = np.asarray(W.get_overlap_windows_cl(
        jnp.asarray(spec.transpose(1, 2, 0)), 287, 96))
    np.testing.assert_array_equal(cl, cf.transpose(0, 2, 3, 1))
