#!/usr/bin/env python
"""On-chip A/B of block0 modes through the REAL batched inference core:
"off" (flax convs) vs "xla" (folded-weight rewrite: BN-folded s2d conv1 +
per-sample-affine InstanceNorm shortcut). Correctness (waveform delta) and
speed (B=32 batch core, scalar-fetch-forced timing)."""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.eval.inference import StyleTransferPipeline

    B = 32
    rng = np.random.default_rng(0)
    outs = {}
    times = {}
    for mode in ("off", "xla"):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fused_block0=mode))
        pipe = StyleTransferPipeline.init_random(cfg, seed=0)
        clips = (0.1 * rng.standard_normal(
            (B, cfg.audio.clip_samples))).astype(np.float32)
        ids = np.ones(B, np.int64)
        wavs = jnp.asarray(clips)
        tids = jnp.asarray(ids)
        core = pipe._jitted_batch_core

        def call(core=core, pipe=pipe, cfg=cfg):
            return core(wavs, pipe.class_embeddings, tids,
                        pipe.content_vars_infer, pipe.decoder_vars,
                        n_samples=cfg.audio.clip_samples,
                        overlap=cfg.audio.eval_overlap_frames)

        t0 = time.perf_counter()
        out = np.asarray(call())
        print(f"{mode}: first call {time.perf_counter()-t0:.1f}s "
              f"(compile)", flush=True)
        outs[mode] = out
        times[mode] = timeit(call)
        print(f"{mode}: {times[mode]:.2f} ms / B={B} "
              f"= {times[mode]/B:.3f} ms/clip", flush=True)

    rel = (np.abs(outs["off"] - outs["xla"]).max()
           / (np.abs(outs["off"]).max() + 1e-9))
    print(f"waveform max rel delta off-vs-xla: {rel:.2e}", flush=True)
    print(f"speedup: {times['off']/times['xla']:.3f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
