#!/usr/bin/env python
"""On-chip A/B of the fused Pallas block0 vs the XLA conv path: correctness
(full-size windows, fused-vs-unfused content encoder outputs) and speed
(standalone block0 and the full B=32 batch core)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _force(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


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
    from ast_tpu.eval.inference import StyleTransferPipeline
    from ast_tpu.ops.pallas_block0 import content_block0

    cfg = Config()
    m = cfg.model
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)
    N = 128

    sections = jax.jit(lambda k: 0.3 * jax.random.normal(
        k, (32, 4, 2, m.window_size, m.feat_bins)))(jax.random.PRNGKey(0))

    # correctness: fused vs unfused content encoder output
    @jax.jit
    def enc_unfused(v, s):
        return pipe.content_infer.apply(v, s)

    @jax.jit
    def enc_fused(v, s):
        return pipe.content_infer.apply(v, s, block0_out=content_block0(v, s))

    a = np.asarray(enc_unfused(pipe.content_vars_infer, sections))
    b = np.asarray(enc_fused(pipe.content_vars_infer, sections))
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"content encoder fused-vs-xla max rel: {rel:.3e}", flush=True)

    # speed: block0 alone
    @jax.jit
    def b0_pallas(v, s):
        return content_block0(v, s)

    from ast_tpu.models.blocks import ResBlock

    blk = ResBlock(m.cnn_channels[0], downsample=True)
    b0_vars = {
        "params": pipe.content_vars_infer["params"]["cnn"]["block0"],
        "batch_stats": pipe.content_vars_infer["batch_stats"]["cnn"]["block0"],
        "spectral": pipe.content_vars_infer["spectral"]["cnn"]["block0"],
    }
    xw = jax.jit(lambda s: s.reshape(N, 2, m.window_size, m.feat_bins)
                 .transpose(0, 2, 3, 1))(sections)

    @jax.jit
    def b0_xla(v, x):
        # sn unfolded module here would double-divide; use folded-as-plain:
        return ResBlock(m.cnn_channels[0], downsample=True,
                        sn_folded=True).apply(v, x, train=False)

    print(f"block0 XLA   : {timeit(lambda: b0_xla(b0_vars, xw)):7.2f} ms",
          flush=True)
    print(f"block0 pallas: {timeit(lambda: b0_pallas(pipe.content_vars_infer, sections)):7.2f} ms",
          flush=True)
    print(f"content unfused: {timeit(lambda: enc_unfused(pipe.content_vars_infer, sections)):7.2f} ms",
          flush=True)
    print(f"content fused  : {timeit(lambda: enc_fused(pipe.content_vars_infer, sections)):7.2f} ms",
          flush=True)

    # full batch core (pipeline defaults pick the fused path on TPU)
    rng = np.random.default_rng(0)
    wavs = (0.1 * rng.standard_normal((32, cfg.audio.clip_samples))
            ).astype(np.float32)
    tids = np.ones(32, np.int64)
    out = pipe.process_audio_batch(wavs, tids)
    assert np.isfinite(out).all()
    pcm = jnp.asarray(np.clip(np.round(wavs * 32768.0), -32768, 32767)
                      .astype(np.int16))
    td = jnp.asarray(tids)
    bcore = pipe._jitted_batch_core
    bfn = lambda: bcore(pcm, pipe.class_embeddings, td,
                        pipe.content_vars_infer, pipe.decoder_vars,
                        n_samples=cfg.audio.clip_samples,
                        overlap=cfg.audio.eval_overlap_frames,
                        out_wire="pcm16")
    ms = timeit(bfn)
    print(f"batch core B=32 (fused default): {ms:7.2f} ms = {ms/32:.3f} ms/clip",
          flush=True)


if __name__ == "__main__":
    main()
