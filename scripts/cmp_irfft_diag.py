#!/usr/bin/env python
"""Diagnose TPU irfft accuracy: isolate jnp.fft.irfft against a fp64 numpy
oracle (no OLA/envelope), then profile WHERE the full istft-fft error lives.

Round-3 sweep finding: istft-fft maxrel 2.87e-01 vs oracle at B=32 while
forward rfft is 3.4e-07 — suspect XLA TPU IRFFT precision, not the OLA."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.dsp.stft import istft

    cfg = Config().audio
    n_fft, hop = cfg.n_fft, cfg.hop_length
    B = 4
    rng = np.random.default_rng(0)
    xh = (0.1 * rng.standard_normal((B, cfg.clip_samples))).astype(np.float32)

    # fp64 oracle STFT
    xp = np.pad(xh.astype(np.float64), ((0, 0), (n_fft // 2, n_fft // 2)),
                mode="reflect")
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    T = 1 + (xp.shape[1] - n_fft) // hop
    fr = np.stack([xp[:, t * hop : t * hop + n_fft] for t in range(T)], 1)
    spec = np.fft.rfft(fr * w, axis=-1)

    # 1. bare irfft: jnp vs numpy on the same float32 spec
    s32 = np.stack([spec.real, spec.imag]).astype(np.float32)
    sj = jnp.asarray(s32)

    @jax.jit
    def bare_irfft(s):
        return jnp.fft.irfft(jax.lax.complex(s[0], s[1]), n=n_fft, axis=-1)

    got = np.asarray(bare_irfft(sj))
    want = np.fft.irfft((s32[0] + 1j * s32[1]).astype(np.complex128),
                        n=n_fft, axis=-1)
    sc = np.abs(want).max()
    err = np.abs(got - want)
    print(f"bare irfft: maxrel {err.max() / sc:.2e}  "
          f"meanrel {err.mean() / sc:.2e}  "
          f"frac>1e-4 {np.mean(err / sc > 1e-4):.4f}", flush=True)
    # per-frame worst: is it specific frames or uniform?
    per_frame = err.max(axis=(0, 2)) / sc
    print(f"bare irfft per-frame maxrel: p50 {np.percentile(per_frame, 50):.2e}"
          f"  p99 {np.percentile(per_frame, 99):.2e}"
          f"  max {per_frame.max():.2e} at frame {per_frame.argmax()}",
          flush=True)

    # 2. full istft-fft error profile over output samples
    @jax.jit
    def istft_fft(s):
        return istft(jax.lax.complex(s[0], s[1]), n_fft, hop)

    got_w = np.asarray(istft_fft(sj))
    # fp64 oracle istft
    frames = np.fft.irfft(spec, n=n_fft, axis=-1) * w
    total = n_fft + hop * (T - 1)
    out = np.zeros((B, total))
    env = np.zeros(total)
    for t in range(T):
        out[:, t * hop : t * hop + n_fft] += frames[:, t]
        env[t * hop : t * hop + n_fft] += w * w
    out = out / np.where(env > 1e-11, env, 1.0)
    want_w = out[:, n_fft // 2 : total - n_fft // 2]
    wsc = np.abs(want_w).max()
    e = np.abs(got_w - want_w) / wsc
    print(f"istft-fft: maxrel {e.max():.2e}  meanrel {e.mean():.2e}  "
          f"frac>1e-3 {np.mean(e > 1e-3):.5f}", flush=True)
    prof = e.max(axis=0)
    n = prof.shape[0]
    for lo, hi, tag in ((0, 512, "head"), (512, n - 512, "interior"),
                        (n - 512, n, "tail")):
        print(f"  {tag:9s} maxrel {prof[lo:hi].max():.2e}", flush=True)
    print(f"  argmax sample {prof.argmax()} of {n}", flush=True)


if __name__ == "__main__":
    main()
