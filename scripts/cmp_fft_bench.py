#!/usr/bin/env python
"""A/B the fused batch transfer core: jnp.fft STFT/ISTFT vs the
DFT-as-MXU-matmul path (AudioConfig.stft_method="matmul"), on the real chip.

Also reports the waveform delta between the two paths (same inputs) so the
speed/accuracy tradeoff is pinned in one place.
"""

import dataclasses
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
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.eval.inference import StyleTransferPipeline

    B = int(os.environ.get("B", "32"))
    rng = np.random.default_rng(0)

    results = {}
    out_ref = None
    methods = tuple(os.environ.get("METHODS", "fft,ct").split(","))
    for method in methods:
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, audio=dataclasses.replace(cfg.audio, stft_method=method))
        pipe = StyleTransferPipeline.init_random(cfg, seed=0)
        a = cfg.audio
        wavs = jnp.asarray((0.1 * rng.standard_normal(
            (B, a.clip_samples))).astype(np.float32))
        tids = np.ones(B, np.int32)
        core = pipe._jitted_batch_core
        fn = lambda: core(wavs, pipe.class_embeddings, jnp.asarray(tids),
                          pipe.content_vars_infer, pipe.decoder_vars,
                          n_samples=a.clip_samples,
                          overlap=a.eval_overlap_frames, out_wire="f32")
        ms = timeit(fn)
        out = np.asarray(fn())
        if out_ref is None:
            out_ref = out
        else:
            delta = np.abs(out - out_ref).mean() / (np.abs(out_ref).mean() + 1e-12)
            print(f"waveform rel-L1 delta vs {methods[0]} path: {delta:.2e}")
        results[method] = ms
        print(f"stft_method={method:7s}: {ms:8.2f} ms  ({ms / B:.3f} ms/clip)")

    keys = list(results)
    if len(keys) == 2:
        print(f"speedup: {results[keys[0]] / results[keys[1]]:.2f}x")


if __name__ == "__main__":
    main()
