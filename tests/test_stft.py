"""Golden-value parity tests: ast_tpu.dsp.stft vs torch.stft/istft (CPU).

Pins the DSP layer to the reference's exact numerics
(reference: utilityFunctions.py:12-37, 62-82)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ast_tpu.dsp import stft as _dsp
import sys
S = sys.modules['ast_tpu.dsp.stft']

N_FFT, HOP = 1024, 256


def torch_stft_ri(x: np.ndarray) -> np.ndarray:
    """The reference get_STFT pipeline on a raw numpy signal -> (2, T, F)."""
    w = torch.from_numpy(x)
    win = torch.hann_window(N_FFT)
    st = torch.stft(w.unsqueeze(0), n_fft=N_FFT, hop_length=HOP, window=win,
                    return_complex=True).squeeze(0)
    out = torch.stack([st.real, st.imag], dim=-1).permute(2, 1, 0)
    return out.numpy()


def test_stft_matches_torch(audio_clip):
    ours = np.asarray(S.stft_ri(jnp.asarray(audio_clip), n_fft=N_FFT, hop_length=HOP))
    ref = torch_stft_ri(audio_clip)
    assert ours.shape == ref.shape
    assert ours.shape[0] == 2 and ours.shape[2] == 513
    # frames = 1 + n//hop
    assert ours.shape[1] == 1 + len(audio_clip) // HOP
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_stft_window_function():
    ours = np.asarray(S.hann_window(N_FFT))
    ref = torch.hann_window(N_FFT).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_istft_matches_torch(audio_clip):
    ref_spec = torch_stft_ri(audio_clip)
    # torch istft of the same spectrogram
    st = torch.complex(torch.from_numpy(ref_spec[0]), torch.from_numpy(ref_spec[1]))
    st = st.permute(1, 0).unsqueeze(0)  # (1, F, T)
    win = torch.hann_window(N_FFT)
    ref_wav = torch.istft(st, n_fft=N_FFT, hop_length=HOP, window=win).squeeze(0).numpy()

    ours = np.asarray(S.istft_ri(jnp.asarray(ref_spec), n_fft=N_FFT, hop_length=HOP))
    assert ours.shape == ref_wav.shape
    np.testing.assert_allclose(ours, ref_wav, atol=2e-4, rtol=1e-4)


def test_roundtrip_reconstruction(audio_clip):
    """stft -> istft must reproduce the interior of the signal to ~fp32."""
    spec = S.stft_ri(jnp.asarray(audio_clip), n_fft=N_FFT, hop_length=HOP)
    wav = np.asarray(S.istft_ri(spec, n_fft=N_FFT, hop_length=HOP))
    n = len(wav)
    np.testing.assert_allclose(wav[HOP:n - HOP], audio_clip[HOP:n - HOP], atol=1e-4)


def test_istft_length_arg(audio_clip):
    spec = S.stft_ri(jnp.asarray(audio_clip), n_fft=N_FFT, hop_length=HOP)
    wav = S.istft_ri(spec, n_fft=N_FFT, hop_length=HOP, length=len(audio_clip))
    assert wav.shape[-1] == len(audio_clip)


def test_batched_stft(audio_clip):
    batch = jnp.stack([jnp.asarray(audio_clip), jnp.asarray(audio_clip[::-1].copy())])
    spec = S.stft(batch, n_fft=N_FFT, hop_length=HOP)
    assert spec.shape == (2, 1 + len(audio_clip) // HOP, 513)
    single = S.stft(jnp.asarray(audio_clip), n_fft=N_FFT, hop_length=HOP)
    np.testing.assert_allclose(np.asarray(spec[0]), np.asarray(single), atol=1e-5)


def test_matmul_dft_matches_fft():
    """The MXU-matmul DFT path (method="matmul") must agree with the FFT
    path to fp32-matmul accuracy on both forward and inverse."""
    import numpy as np

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal(22050).astype(np.float32))
    a = S.stft(x, method="fft")
    b = S.stft(x, method="matmul")
    assert float(jnp.abs(a - b).max() / jnp.abs(a).max()) < 5e-4
    wa = S.istft(a, method="fft")
    wb = S.istft(a, method="matmul")
    assert float(jnp.abs(wa - wb).max() / (jnp.abs(wa).max() + 1e-12)) < 5e-4


def test_matmul_precision_levels():
    """precision="high" must hold fp32-grade accuracy on the DFT matmuls
    (the on-chip sweep measured ~6e-5 maxrel at "high"; CPU runs them in
    fp32 so all levels agree, but the plumbing must accept every level and
    stay faithful)."""
    import numpy as np

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(22050).astype(np.float32))
    a = S.stft(x, method="fft")
    for prec in ("default", "high", "highest"):
        b = S.stft(x, method="matmul", precision=prec)
        assert float(jnp.abs(a - b).max() / jnp.abs(a).max()) < 5e-3, prec
    wa = S.istft(a, method="fft")
    wb = S.istft(a, method="matmul", precision="high")
    assert float(jnp.abs(wa - wb).max() / (jnp.abs(wa).max() + 1e-12)) < 5e-4


def test_conv_dft_matches_fft():
    """The fused-conv path (method="conv": framing+window+DFT as one strided
    conv; inverse irfft+window+OLA as its conv_transpose adjoint) must agree
    with the FFT path on forward AND inverse, batched."""
    import numpy as np

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
    a = S.stft(x, method="fft")
    b = S.stft(x, method="conv")
    assert b.shape == a.shape
    assert float(jnp.abs(a - b).max() / jnp.abs(a).max()) < 5e-4
    wa = S.istft(a, method="fft", length=22050)
    wb = S.istft(a, method="conv", length=22050)
    assert wb.shape == wa.shape
    assert float(jnp.abs(wa - wb).max() / (jnp.abs(wa).max() + 1e-12)) < 5e-4
    # full roundtrip through the conv pair reconstructs the interior
    wrt = S.istft(b, method="conv", length=22050)
    interior = slice(1024, -1024)
    num = float(jnp.linalg.norm(wrt[:, interior] - x[:, interior]))
    den = float(jnp.linalg.norm(x[:, interior]))
    assert num / den < 1e-3


def test_resolve_dft_method_auto():
    """"auto" picks the MXU matmul on TPU and the FFT elsewhere (these
    tests run on forced-CPU, so auto → fft here); explicit choices pass
    through untouched."""
    import jax

    expected = "matmul" if jax.default_backend() == "tpu" else "fft"
    assert S.resolve_dft_method("auto") == expected
    for m in ("fft", "matmul", "ct"):
        assert S.resolve_dft_method(m) == m
    # the stft entrypoint accepts auto end-to-end
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(8192).astype(np.float32))
    a = S.stft(x, method="fft")
    b = S.stft(x, method="auto")
    assert float(jnp.abs(a - b).max() / jnp.abs(a).max()) < 5e-4


def test_channels_last_layout_matches_packed():
    """layout="cl" is exactly the (1,2,0) transpose of the packed (2,T,F)
    output, for both stft_ri and cqt_ri, and normalize_cl matches normalize
    through the same transpose."""
    import numpy as np

    from ast_tpu.dsp.cqt import cqt_ri
    from ast_tpu.dsp.norm import normalize, normalize_cl

    rng = np.random.default_rng(7)
    x = jnp.asarray((0.1 * rng.standard_normal(22050)).astype(np.float32))
    cf = np.asarray(S.stft_ri(x))
    cl = np.asarray(S.stft_ri(x, layout="cl"))
    np.testing.assert_array_equal(cl, cf.transpose(1, 2, 0))

    ccf = np.asarray(cqt_ri(x, algorithm="recursive"))
    ccl = np.asarray(cqt_ri(x, algorithm="recursive", layout="cl"))
    np.testing.assert_array_equal(ccl, ccf.transpose(1, 2, 0))

    mean = rng.standard_normal((2, cf.shape[2])).astype(np.float32)
    std = np.abs(rng.standard_normal((2, cf.shape[2]))).astype(np.float32)
    ncf = np.asarray(normalize(jnp.asarray(cf), jnp.asarray(mean),
                               jnp.asarray(std)))
    ncl = np.asarray(normalize_cl(jnp.asarray(cl), jnp.asarray(mean),
                                  jnp.asarray(std)))
    np.testing.assert_allclose(ncl, ncf.transpose(1, 2, 0), atol=1e-6)
