#!/usr/bin/env python
"""Featurize-path experiments on the real chip.

1. stft fft vs DFT-matmul at DEFAULT precision (the round-2 dead end was
   measured at HIGHEST = bf16x6 passes; DEFAULT is one bf16 pass).
2. batched-octave CQT: rfft+one-sided-basis matmul vs the algebraically
   identical TIME-domain matmul G = ifft-side collapse of basis @ DFT
   (response_k = <frame, G_k>, G_k[n] = sum_f B[k,f] e^{-2pi i f n / N}).
3. istft irfft vs inverse-DFT matmul at DEFAULT + chunked OLA.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _force(out):
    import jax

    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _force(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.dsp.cqt import cqt_ri as _cqt_ri
    from ast_tpu.dsp.stft import (frame_signal, hann_window, istft_ri,
                                  overlap_add_chunked, stft_ri)

    cfg = Config().audio
    B = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray((0.1 * rng.standard_normal(
        (B, cfg.clip_samples))).astype(np.float32))

    # --- 1. STFT variants --------------------------------------------------
    n_fft, hop = cfg.n_fft, cfg.hop_length

    @jax.jit
    def stft_fft(x):
        return stft_ri(x, n_fft=n_fft, hop_length=hop)

    def _rdft_default(n):
        k = jnp.arange(n // 2 + 1, dtype=jnp.float32)
        t = jnp.arange(n, dtype=jnp.float32)
        ang = (2.0 * np.pi / n) * t[:, None] * k[None, :]
        return jnp.cos(ang), -jnp.sin(ang)

    @jax.jit
    def stft_mm(x):
        w = hann_window(n_fft)
        fr = frame_signal(x, n_fft, hop) * w
        c, s = _rdft_default(n_fft)
        re = fr @ c
        im = fr @ s
        return jnp.stack([re, im], axis=0)

    a = np.asarray(stft_fft(x))
    b = np.asarray(stft_mm(x))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"stft   fft {timeit(lambda: stft_fft(x)):7.2f} ms   "
          f"mm-default {timeit(lambda: stft_mm(x)):7.2f} ms   rel_err {err:.2e}")

    # --- 2. CQT: one-sided-rfft matmul vs time-domain matmul ---------------
    @jax.jit
    def cqt_rfft(x):
        return _cqt_ri(x, algorithm="recursive")

    # time-domain collapsed basis for the shared octave kernel
    from ast_tpu.dsp.cqt import (_octave_kernel, cqt_alpha, cqt_frequencies)

    n_bins, bpo = cfg.cqt_bins, cfg.cqt_bins_per_octave
    freqs_all = cqt_frequencies(n_bins, cfg.cqt_fmin, bpo)
    Q = cfg.cqt_filter_scale / cqt_alpha(bpo, "librosa")
    fft_basis, _, nf_cq = _octave_kernel(
        float(cfg.sample_rate), tuple(freqs_all[n_bins - bpo:]), Q,
        cfg.cqt_sparsity)
    full = np.zeros((fft_basis.shape[0], nf_cq), np.complex128)
    full[:, : fft_basis.shape[1]] = fft_basis
    G = np.fft.fft(full, axis=1)  # G_k[n] = sum_f B[k,f] e^{-2pi i fn/N}
    G_mat = np.concatenate([G.real.T, G.imag.T], axis=1).astype(np.float32)
    G_j = jnp.asarray(G_mat)  # (nf_cq, 2*bpo)

    from ast_tpu.dsp.resample import KAISER_ROLLOFF, KAISER_WIDTH, resample

    n_oct = n_bins // bpo

    @jax.jit
    def cqt_td(x):
        my = x
        sigs = [my]
        hops = [hop]
        for i in range(1, n_oct):
            my = resample(my, 2, 1, lowpass_filter_width=KAISER_WIDTH,
                          rolloff=KAISER_ROLLOFF,
                          window="kaiser") * np.float32(np.sqrt(2.0))
            sigs.append(my)
            hops.append(hop // (2 ** i))
        frames = [frame_signal(s, nf_cq, h, center=True, pad_mode="constant")
                  for s, h in zip(sigs, hops)]
        T = min(f.shape[-2] for f in frames)
        stack = jnp.stack([f[:, :T] for f in frames])  # (O, B, T, nf)
        resp = stack @ G_j  # (O, B, T, 2*bpo)
        comp = jnp.sqrt(2.0 ** jnp.arange(n_oct, dtype=jnp.float32))
        resp = resp * comp[:, None, None, None]
        re = jnp.concatenate([resp[i, ..., :bpo]
                              for i in range(n_oct - 1, -1, -1)], axis=-1)
        im = jnp.concatenate([resp[i, ..., bpo:]
                              for i in range(n_oct - 1, -1, -1)], axis=-1)
        lengths = Q * cfg.sample_rate / freqs_all
        scale = jnp.sqrt(jnp.asarray(lengths, np.float32))
        return jnp.stack([re / scale, im / scale], axis=0)

    a = np.asarray(cqt_rfft(x))
    b = np.asarray(cqt_td(x))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"cqt   rfft {timeit(lambda: cqt_rfft(x)):7.2f} ms   "
          f"td-matmul {timeit(lambda: cqt_td(x)):7.2f} ms   rel_err {err:.2e}")

    # --- 3. ISTFT variants -------------------------------------------------
    spec = stft_ri(x, n_fft=n_fft, hop_length=hop)

    @jax.jit
    def istft_fft(s):
        return istft_ri(s, n_fft=n_fft, hop_length=hop)

    def _irdft_default(n):
        n_binsf = n // 2 + 1
        k = jnp.arange(n_binsf, dtype=jnp.float32)
        t = jnp.arange(n, dtype=jnp.float32)
        w = jnp.where((k == 0) | (k == n // 2), 1.0, 2.0) / n
        ang = (2.0 * np.pi / n) * k[:, None] * t[None, :]
        return w[:, None] * jnp.cos(ang), -w[:, None] * jnp.sin(ang)

    from ast_tpu.dsp.stft import _ola_envelope

    @jax.jit
    def istft_mm(s):
        a_m, b_m = _irdft_default(n_fft)
        frames = (s[0] @ a_m + s[1] @ b_m) * hann_window(n_fft)
        out = overlap_add_chunked(frames, hop)
        n_frames = frames.shape[-2]
        env = jnp.asarray(_ola_envelope(n_frames, n_fft, hop))
        out = out / jnp.where(env > 1e-11, env, 1.0)
        pad = n_fft // 2
        total = n_fft + hop * (n_frames - 1)
        return out[:, pad : total - pad]

    a = np.asarray(istft_fft(spec))
    b = np.asarray(istft_mm(spec))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"istft  fft {timeit(lambda: istft_fft(spec)):7.2f} ms   "
          f"mm-default {timeit(lambda: istft_mm(spec)):7.2f} ms   rel_err {err:.2e}")


if __name__ == "__main__":
    main()
