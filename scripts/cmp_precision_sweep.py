#!/usr/bin/env python
"""On-chip sweep for the fast featurize path: time AND accuracy (vs fp64
numpy oracles) of stft/istft DFT-matmul variants at each TPU matmul
precision, plus the DeepCNN block0 conv formulations from cmp_block0.py.

Decides the composition of the fast-inference preset (round 3)."""

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


def np_stft_oracle(x, n_fft, hop):
    """fp64 center-padded hann STFT, (B, T, F) complex."""
    B, n = x.shape
    xp = np.pad(x.astype(np.float64), ((0, 0), (n_fft // 2, n_fft // 2)),
                mode="reflect")
    T = 1 + (xp.shape[1] - n_fft) // hop
    w = np.hanning(n_fft + 1)[:-1] * 0 + (
        0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    fr = np.stack([xp[:, t * hop : t * hop + n_fft] for t in range(T)], 1)
    return np.fft.rfft(fr * w, axis=-1)


def np_istft_oracle(spec, n_fft, hop):
    """fp64 torch-semantics istft (windowed OLA / squared-window envelope,
    center trim)."""
    B, T, F = spec.shape
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    fr = np.fft.irfft(spec.astype(np.complex128), n=n_fft, axis=-1) * w
    total = n_fft + hop * (T - 1)
    out = np.zeros((B, total))
    env = np.zeros(total)
    for t in range(T):
        out[:, t * hop : t * hop + n_fft] += fr[:, t]
        env[t * hop : t * hop + n_fft] += w * w
    out = out / np.where(env > 1e-11, env, 1.0)
    pad = n_fft // 2
    return out[:, pad : total - pad]


def main():
    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.dsp.stft import istft, stft

    cfg = Config().audio
    n_fft, hop = cfg.n_fft, cfg.hop_length
    B = 32
    rng = np.random.default_rng(0)
    xh = (0.1 * rng.standard_normal((B, cfg.clip_samples))).astype(np.float32)
    x = jnp.asarray(xh)

    P = jax.lax.Precision

    # --- STFT ---------------------------------------------------------------
    # packed (re, im) stacks throughout: complex arrays cannot be fetched
    # through the axon relay (UNIMPLEMENTED)
    oc = np_stft_oracle(xh, n_fft, hop)
    oracle = np.stack([oc.real, oc.imag])
    sc = np.abs(oracle).max()

    def run_stft(name, fn):
        out = np.asarray(jax.jit(fn)(x))
        err = np.abs(out - oracle).max() / sc
        ms = timeit(lambda: jax.jit(fn)(x))
        print(f"stft  {name:16s} {ms:7.2f} ms   maxrel {err:.2e}", flush=True)

    def pack(s):
        return jnp.stack([jnp.real(s), jnp.imag(s)])

    run_stft("fft", lambda x: pack(stft(x, n_fft, hop)))
    for pname, p in (("default", P.DEFAULT), ("high", P.HIGH),
                     ("highest", P.HIGHEST)):
        from ast_tpu.dsp.stft import frame_signal, hann_window

        def mk(p=p):
            def f(x):
                from ast_tpu.dsp.stft import _rdft_mats

                c, s = _rdft_mats(n_fft)
                fr = frame_signal(x, n_fft, hop) * hann_window(n_fft)
                return jnp.stack([jnp.matmul(fr, c, precision=p),
                                  jnp.matmul(fr, s, precision=p)])
            return f

        run_stft(f"matmul@{pname}", mk())

    # --- ISTFT --------------------------------------------------------------
    spec_h = np_stft_oracle(xh, n_fft, hop)
    spec_ri = jnp.asarray(np.stack([spec_h.real, spec_h.imag])
                          .astype(np.float32))
    w_oracle = np_istft_oracle(spec_h, n_fft, hop)
    wsc = np.abs(w_oracle).max()

    def run_istft(name, fn):
        out = np.asarray(jax.jit(fn)(spec_ri))
        err = np.abs(out - w_oracle).max() / wsc
        ms = timeit(lambda: jax.jit(fn)(spec_ri))
        print(f"istft {name:16s} {ms:7.2f} ms   maxrel {err:.2e}", flush=True)

    run_istft("fft", lambda s: istft(jax.lax.complex(s[0], s[1]), n_fft, hop))
    from ast_tpu.dsp.stft import (_irdft_mats, _ola_envelope, hann_window,
                                  overlap_add_chunked)

    for pname, p in (("default", P.DEFAULT), ("high", P.HIGH),
                     ("highest", P.HIGHEST)):
        def mk(p=p):
            def f(s):
                a, b = _irdft_mats(n_fft)
                fr = (jnp.matmul(s[0], a, precision=p)
                      + jnp.matmul(s[1], b, precision=p))
                fr = fr * hann_window(n_fft)
                T = fr.shape[-2]
                out = overlap_add_chunked(fr, hop)
                env = jnp.asarray(_ola_envelope(T, n_fft, hop))
                out = out / jnp.where(env > 1e-11, env, 1.0)
                total = n_fft + hop * (T - 1)
                return out[..., n_fft // 2 : total - n_fft // 2]
            return f

        run_istft(f"matmul@{pname}", mk())

    # --- block0 conv variants (from cmp_block0.py) --------------------------
    N, H, W, C, CO = 128, 287, 597, 2, 32
    key = jax.random.PRNGKey(0)
    xc = jax.jit(lambda k: 0.3 * jax.random.normal(k, (N, H, W, C)))(key)
    wc = jax.jit(lambda k: 0.1 * jax.random.normal(k, (3, 3, C, CO)))(key)
    dn = jax.lax.conv_dimension_numbers(xc.shape, wc.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)

    @jax.jit
    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Ho, Wo = (H + 1) // 2, (W + 1) // 2
        cols = [xp[:, di : di + 2 * Ho - 1 : 2, dj : dj + 2 * Wo - 1 : 2, :]
                for di in range(3) for dj in range(3)]
        patches = jnp.concatenate(cols, axis=-1)
        return patches @ w.reshape(9 * C, CO)

    @jax.jit
    def s2d(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        Hp, Wp = xp.shape[1] // 2, xp.shape[2] // 2
        z = xp.reshape(N, Hp, 2, Wp, 2, C).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(N, Hp, Wp, 4 * C)
        w4 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w2 = w4.reshape(2, 2, 2, 2, C, CO).transpose(0, 2, 1, 3, 4, 5)
        w2 = w2.reshape(2, 2, 4 * C, CO)
        dn2 = jax.lax.conv_dimension_numbers(z.shape, w2.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            z, w2, (1, 1), "VALID", dimension_numbers=dn2)
        return out[:, : (H + 1) // 2, : (W + 1) // 2, :]

    ref = np.asarray(conv(xc, wc))
    for name, fn in (("conv", conv), ("s2d", s2d), ("im2col", im2col)):
        out = np.asarray(fn(xc, wc))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        ms = timeit(lambda fn=fn: fn(xc, wc))
        print(f"block0 {name:8s} {ms:7.2f} ms   rel_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
