#!/usr/bin/env python
"""Ablation timing of the fused batch transfer core on the real chip.

Stage-standalone timings mislead (a stage jitted alone compiles differently
than inside the fused program), so this measures the FUSED program with
stages knocked out one at a time; the delta to the full program is that
stage's true in-context cost.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _force(out):
    """Force execution through the relay: block_until_ready alone can no-op
    remotely; fetching one scalar of the result cannot."""
    import jax
    import numpy as _np

    leaf = jax.tree_util.tree_leaves(out)[0]
    _np.asarray(leaf.ravel()[0])


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
    import functools

    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.dsp.cqt import cqt_ri
    from ast_tpu.dsp.stft import istft_ri, stft_ri
    from ast_tpu.dsp.windows import (concat_stft_cqt, get_overlap_windows,
                                     sections2spectrogram)
    from ast_tpu.eval.inference import StyleTransferPipeline
    from ast_tpu.models.decoder import autoregressive_decode

    B = int(os.environ.get("B", "32"))
    cfg = Config()
    a = cfg.audio
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)
    rng = np.random.default_rng(0)
    overlap = a.eval_overlap_frames

    wavs = jnp.asarray((0.1 * rng.standard_normal(
        (B, a.clip_samples))).astype(np.float32))
    tids = np.ones(B, np.int32)  # host constant: avoids device->host
    # materialization at trace time (closure jnp arrays become HLO constants)

    def build(skip):
        # NB: params must be ARGUMENTS, not closure constants — closed-over
        # arrays are embedded in the compile payload (HTTP 413 on the relay)
        @jax.jit
        def core(waveforms, content_vars, decoder_vars, class_embeddings):
            def featurize(w):
                s = stft_ri(w, n_fft=a.n_fft, hop_length=a.hop_length,
                            method=a.stft_method, precision=a.dft_precision)
                if "cqt" in skip:
                    c = jnp.zeros((2, s.shape[1], a.cqt_bins), s.dtype)
                else:
                    c = cqt_ri(w, sr=a.sample_rate, n_bins=a.cqt_bins,
                               hop_length=a.hop_length,
                               algorithm=a.cqt_algorithm,
                               sparsity=a.cqt_sparsity,
                               transform=a.cqt_transform,
                               precision=a.dft_precision)
                feats = concat_stft_cqt(s, c)
                return feats, get_overlap_windows(
                    feats, window_size=a.window_size, overlap_frames=overlap)

            feats, sections = jax.vmap(featurize)(waveforms)
            S = sections.shape[1]
            if "content" in skip:
                content_emb = jnp.zeros((B, S, cfg.model.d_model), jnp.float32)
            else:
                content_emb = pipe.content.apply(content_vars, sections)
            class_emb = class_embeddings[tids]
            if "ar" in skip:
                out = jnp.zeros((B, S, 2, a.window_size, a.stft_bins),
                                jnp.float32) + content_emb.sum() * 1e-9
            else:
                out = autoregressive_decode(pipe.decoder, decoder_vars,
                                            content_emb, class_emb, S)
            T = feats.shape[2]
            if "istft" in skip:
                return out.sum(axis=(1, 2, 3, 4))

            def invert(windows):
                full = sections2spectrogram(windows, T, overlap)
                return istft_ri(full, n_fft=a.n_fft, hop_length=a.hop_length,
                                method=a.stft_method,
                                precision=a.dft_precision)

            return jax.vmap(invert)(out)

        return core

    variants = [
        ("full", frozenset()),
        ("no-cqt", frozenset({"cqt"})),
        ("no-content", frozenset({"content"})),
        ("no-ar", frozenset({"ar"})),
        ("no-istft", frozenset({"istft"})),
        ("stft-only (all model off)", frozenset({"cqt", "content", "ar", "istft"})),
    ]
    base = None
    for name, skip in variants:
        core = build(skip)
        ms = timeit(lambda: core(wavs, pipe.content_vars, pipe.decoder_vars,
                                 pipe.class_embeddings))
        if base is None:
            base = ms
            print(f"{name:28s} {ms:8.2f} ms  ({ms / B:.3f} ms/clip)")
        else:
            print(f"{name:28s} {ms:8.2f} ms  (stage cost ~{base - ms:6.2f} ms)")


if __name__ == "__main__":
    main()
