#!/usr/bin/env python
"""A/B fp32 vs bf16 compute dtype for the batched serving core on the real
chip: device time + output waveform delta (params stay fp32 either way)."""

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
    base = Config()
    clips = (0.1 * rng.standard_normal(
        (B, base.audio.clip_samples))).astype(np.float32)
    pcm = np.clip(np.round(clips * 32768.0), -32768, 32767).astype(np.int16)
    targets = np.ones(B, np.int64)

    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, dtype=dt))
        pipe = StyleTransferPipeline.init_random(cfg, seed=0, sections=4)
        t0 = time.perf_counter()
        out = pipe.process_audio_batch(pcm, targets, pcm16_wire=True)
        print(f"{dt}: first call (compile) {time.perf_counter()-t0:6.1f}s",
              flush=True)
        outs[dt] = out

        wavs_dev = jnp.asarray(pcm)
        tids = jnp.asarray(targets)
        bcore = pipe._jitted_batch_core
        bfn = lambda: bcore(wavs_dev, pipe.class_embeddings, tids,
                            pipe.content_vars_infer, pipe.decoder_vars,
                            n_samples=cfg.audio.clip_samples,
                            overlap=cfg.audio.eval_overlap_frames,
                            out_wire="pcm16")
        np.asarray(bfn()[0, 0])  # scalar fetch: forces through the relay
        t0 = time.perf_counter()
        res = None
        for _ in range(10):
            res = bfn()
        np.asarray(res[0, 0])
        ms = (time.perf_counter() - t0) / 10
        print(f"{dt}: device batch {ms*1000:7.2f} ms = "
              f"{ms/B*1000:6.3f} ms/clip ({B/ms:6.1f} clips/s)", flush=True)

    a, b = outs["float32"], outs["bfloat16"]
    # same random init in both (seeded); outputs comparable
    denom = np.abs(a).mean() + 1e-12
    print(f"waveform delta bf16 vs fp32: rel L1 {np.abs(a-b).mean()/denom:.4f}  "
          f"corr {np.corrcoef(a.ravel(), b.ravel())[0,1]:.6f}")


if __name__ == "__main__":
    main()
