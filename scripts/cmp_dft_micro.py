#!/usr/bin/env python
"""Micro-profile of the DFT-matmul stft/istft pieces on the real chip at the
serving shape (B=32, 10 s clips): framing, the raw GEMMs (batched-free-dims
vs explicitly flattened M), windowing, OLA, envelope — to find where the
stft's measured ~7 ms (vs ~1 ms roofline) actually goes."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _force(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def timeit(fn, iters=20, warmup=3):
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
    from ast_tpu.dsp.stft import (_irdft_mats, _ola_envelope, _rdft_mats,
                                  frame_signal, hann_window,
                                  overlap_add_chunked)

    a = Config().audio
    n_fft, hop = a.n_fft, a.hop_length
    B = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray((0.1 * rng.standard_normal(
        (B, a.clip_samples))).astype(np.float32))

    P = jax.lax.Precision

    def run(name, fn, *args):
        f = jax.jit(fn)
        ms = timeit(lambda: f(*args))
        print(f"{name:40s} {ms:7.2f} ms", flush=True)

    run("frame_signal only", lambda x: frame_signal(x, n_fft, hop), x)
    run("frame+window", lambda x: frame_signal(x, n_fft, hop)
        * hann_window(n_fft), x)

    frames = jax.jit(lambda x: frame_signal(x, n_fft, hop)
                     * hann_window(n_fft))(x)  # (B, T, n_fft)
    T = frames.shape[1]
    print(f"frames shape {frames.shape}")

    for pname, p in (("default", P.DEFAULT), ("high", P.HIGH)):
        run(f"gemm (B,T,K)@(K,N) x2 @{pname}",
            lambda fr, p=p: jnp.stack([
                jnp.matmul(fr, _rdft_mats(n_fft)[0], precision=p),
                jnp.matmul(fr, _rdft_mats(n_fft)[1], precision=p)]), frames)
        run(f"gemm flat (BT,K)@(K,N) x2 @{pname}",
            lambda fr, p=p: jnp.stack([
                (jnp.matmul(fr.reshape(-1, n_fft), _rdft_mats(n_fft)[0],
                            precision=p)).reshape(B, T, -1),
                (jnp.matmul(fr.reshape(-1, n_fft), _rdft_mats(n_fft)[1],
                            precision=p)).reshape(B, T, -1)]), frames)
        run(f"gemm bf16-in flat x2 @{pname}",
            lambda fr, p=p: jnp.stack([
                (jnp.matmul(fr.reshape(-1, n_fft).astype(jnp.bfloat16),
                            _rdft_mats(n_fft)[0].astype(jnp.bfloat16),
                            precision=p,
                            preferred_element_type=jnp.float32)
                 ).reshape(B, T, -1),
                (jnp.matmul(fr.reshape(-1, n_fft).astype(jnp.bfloat16),
                            _rdft_mats(n_fft)[1].astype(jnp.bfloat16),
                            precision=p,
                            preferred_element_type=jnp.float32)
                 ).reshape(B, T, -1)]), frames)

    # istft pieces: spec -> frames -> OLA -> envelope
    spec_ri = jax.jit(lambda fr: jnp.stack(
        [jnp.matmul(fr, _rdft_mats(n_fft)[0], precision=P.HIGH),
         jnp.matmul(fr, _rdft_mats(n_fft)[1], precision=P.HIGH)]))(frames)

    def inv_gemm(s, p):
        A, Bm = _irdft_mats(n_fft)
        return (jnp.matmul(s[0], A, precision=p)
                + jnp.matmul(s[1], Bm, precision=p))

    run("inv gemm @default", lambda s: inv_gemm(s, P.DEFAULT), spec_ri)
    run("inv gemm @high", lambda s: inv_gemm(s, P.HIGH), spec_ri)

    ifr = jax.jit(lambda s: inv_gemm(s, P.HIGH) * hann_window(n_fft))(spec_ri)
    run("ola chunked only", lambda f: overlap_add_chunked(f, hop), ifr)

    def full_inv(s):
        fr = inv_gemm(s, P.HIGH) * hann_window(n_fft)
        out = overlap_add_chunked(fr, hop)
        env = jnp.asarray(_ola_envelope(T, n_fft, hop))
        out = out / jnp.where(env > 1e-11, env, 1.0)
        total = n_fft + hop * (T - 1)
        return out[..., n_fft // 2: total - n_fft // 2]

    run("full istft (gemm+ola+env)", full_inv, spec_ri)


if __name__ == "__main__":
    main()
