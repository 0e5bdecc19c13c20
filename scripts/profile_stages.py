#!/usr/bin/env python
"""Stage-by-stage device timing of the transfer pipeline on the real chip.

Times each jitted stage with resident inputs (block_until_ready + np fetch of
a scalar to force through the relay), for both the single-clip and the
batched serving path. Guides kernel-level optimization: optimize the stage
that actually dominates.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timeit(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.dsp.cqt import cqt_ri
    from ast_tpu.dsp.stft import istft_ri, stft_ri
    from ast_tpu.dsp.windows import (concat_stft_cqt, get_overlap_windows,
                                     sections2spectrogram)
    from ast_tpu.eval.inference import StyleTransferPipeline
    from ast_tpu.models.decoder import autoregressive_decode

    cfg = Config()
    a = cfg.audio
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)
    rng = np.random.default_rng(0)
    overlap = a.eval_overlap_frames

    wav = jnp.asarray((0.1 * rng.standard_normal(a.clip_samples)).astype(np.float32))

    # ---- single clip stages ----
    @jax.jit
    def featurize(w):
        s = stft_ri(w, n_fft=a.n_fft, hop_length=a.hop_length)
        c = cqt_ri(w, sr=a.sample_rate, n_bins=a.cqt_bins, hop_length=a.hop_length)
        feats = concat_stft_cqt(s, c)
        return feats, get_overlap_windows(feats, window_size=a.window_size,
                                          overlap_frames=overlap)

    feats, sections = featurize(wav)
    print(f"featurize (stft+cqt+windows): {timeit(featurize, wav):8.3f} ms "
          f"sections={sections.shape}")

    content_fn = jax.jit(lambda v, s: pipe.content.apply(v, s[None]))
    content_emb = content_fn(pipe.content_vars, sections)
    print(f"content encoder:              "
          f"{timeit(content_fn, pipe.content_vars, sections):8.3f} ms")

    S = sections.shape[0]
    class_emb = pipe.class_embeddings[1][None]
    ar_fn = jax.jit(lambda v, c, e: autoregressive_decode(
        pipe.decoder, v, c, e, S))
    out = ar_fn(pipe.decoder_vars, content_emb, class_emb)
    print(f"AR decode (S={S}):             "
          f"{timeit(ar_fn, pipe.decoder_vars, content_emb, class_emb):8.3f} ms")

    T = feats.shape[1]
    inv_fn = jax.jit(lambda o: istft_ri(
        sections2spectrogram(o[0], T, overlap),
        n_fft=a.n_fft, hop_length=a.hop_length))
    wav_out = inv_fn(out)
    print(f"OLA + istft:                  {timeit(inv_fn, out):8.3f} ms")

    core = pipe._jitted_core
    one = lambda x: core(x, pipe.class_embeddings, jnp.asarray(1),
                         pipe.content_vars_infer, pipe.decoder_vars,
                         n_samples=a.clip_samples, overlap=overlap)
    print(f"fused single-clip core:       {timeit(one, wav):8.3f} ms")

    # ---- host-path breakdown (single clip) ----
    host = np.asarray(wav)
    t0 = time.perf_counter()
    for _ in range(10):
        d = jnp.asarray(host)
        d.block_until_ready()
    print(f"H2D float32 (353KB):          "
          f"{(time.perf_counter()-t0)/10*1000:8.3f} ms")
    res = one(wav)
    t0 = time.perf_counter()
    for _ in range(10):
        _ = np.asarray(res)
    print(f"D2H float32 (344KB):          "
          f"{(time.perf_counter()-t0)/10*1000:8.3f} ms")

    @jax.jit
    def nop(x):
        return x + 1.0

    small = jnp.zeros((8,), jnp.float32)
    nop(small).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        _ = np.asarray(nop(small))
    print(f"dispatch+fetch RTT (tiny):    "
          f"{(time.perf_counter()-t0)/20*1000:8.3f} ms")

    # ---- batched path ----
    B = args.batch
    wavs = jnp.asarray((0.1 * rng.standard_normal(
        (B, a.clip_samples))).astype(np.float32))
    tids = jnp.ones(B, jnp.int32)
    bcore = pipe._jitted_batch_core
    bfn = lambda x: bcore(x, pipe.class_embeddings, tids,
                          pipe.content_vars_infer, pipe.decoder_vars, n_samples=a.clip_samples,
                          overlap=overlap, out_wire="f32")
    ms = timeit(bfn, wavs, iters=8)
    print(f"fused batch core (B={B}):      {ms:8.3f} ms  "
          f"= {ms/B:6.3f} ms/clip  ({B/(ms/1000):.1f} clips/s device-only)")

    bfeat = jax.jit(jax.vmap(lambda w: featurize(w)))
    bf, bs = bfeat(wavs)
    print(f"  batch featurize:            {timeit(bfeat, wavs, iters=8):8.3f} ms")
    bcontent = jax.jit(lambda v, s: pipe.content.apply(v, s))
    bc = bcontent(pipe.content_vars, bs)
    print(f"  batch content:              "
          f"{timeit(bcontent, pipe.content_vars, bs, iters=8):8.3f} ms")
    bclass = pipe.class_embeddings[tids]
    bar = jax.jit(lambda v, c, e: autoregressive_decode(pipe.decoder, v, c, e, S))
    bo = bar(pipe.decoder_vars, bc, bclass)
    print(f"  batch AR decode:            "
          f"{timeit(bar, pipe.decoder_vars, bc, bclass, iters=8):8.3f} ms")
    binv = jax.jit(jax.vmap(lambda o: istft_ri(
        sections2spectrogram(o, T, overlap),
        n_fft=a.n_fft, hop_length=a.hop_length)))
    _ = binv(bo)
    print(f"  batch OLA+istft:            {timeit(binv, bo, iters=8):8.3f} ms")


if __name__ == "__main__":
    main()
