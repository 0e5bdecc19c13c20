#!/usr/bin/env python
"""A/B the batched serving core under direct vs recursive CQT on the real
chip, plus raw link timing, to separate relay variance from algorithm cost."""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.eval.inference import StyleTransferPipeline

    B = 32
    rng = np.random.default_rng(0)

    for algo in ("direct", "recursive"):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, audio=dataclasses.replace(cfg.audio, cqt_algorithm=algo))
        pipe = StyleTransferPipeline.init_random(cfg, seed=0, sections=4)
        clips_np = (0.1 * rng.standard_normal(
            (B, cfg.audio.clip_samples))).astype(np.float32)
        targets = np.ones(B, np.int64)
        pcm = np.clip(np.round(clips_np * 32768.0), -32768, 32767).astype(np.int16)

        t0 = time.perf_counter()
        out = pipe.process_audio_batch(pcm, targets, pcm16_wire=True)
        compile_s = time.perf_counter() - t0
        assert np.isfinite(out).all()

        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                out = pipe.process_audio_batch(pcm, targets, pcm16_wire=True)
            windows.append(3 * B / (time.perf_counter() - t0))
        thr = sorted(windows)[1]

        # device-only batch core
        wavs_dev = jnp.asarray(pcm)
        tids = jnp.asarray(targets)
        bcore = pipe._jitted_batch_core
        bfn = lambda: bcore(wavs_dev, pipe.class_embeddings, tids,
                            pipe.content_vars_infer, pipe.decoder_vars,
                            n_samples=cfg.audio.clip_samples,
                            overlap=cfg.audio.eval_overlap_frames,
                            out_wire="pcm16")
        jax.block_until_ready(bfn())
        t0 = time.perf_counter()
        outs = [bfn() for _ in range(8)]
        jax.block_until_ready(outs)
        dev_ms = (time.perf_counter() - t0) / 8 * 1000
        print(f"{algo:9s}: compile {compile_s:6.1f}s  e2e {thr:6.2f} clips/s  "
              f"device batch {dev_ms:7.2f} ms ({B / (dev_ms / 1000):6.1f} clips/s)",
              flush=True)

    # raw link: H2D of one pcm batch + D2H of result-sized buffer
    t0 = time.perf_counter()
    for _ in range(5):
        d = jnp.asarray(pcm)
        d.block_until_ready()
    print(f"H2D int16 {pcm.nbytes/1e6:.1f}MB: {(time.perf_counter()-t0)/5*1000:.1f} ms")
    res = jnp.zeros((B, 220160), jnp.int16) + 1
    res.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(res)
    print(f"D2H int16 {res.nbytes/1e6:.1f}MB: {(time.perf_counter()-t0)/5*1000:.1f} ms")


if __name__ == "__main__":
    main()
