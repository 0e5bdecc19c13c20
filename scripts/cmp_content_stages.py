#!/usr/bin/env python
"""Sub-stage profile of the content encoder on the real chip: where do the
~18 ms in-context go? Cumulative prefixes: windows->transpose, +CNN blocks,
+proj/PE/norm, +transformer — measured as standalone jitted programs over the
same (B*S, 2, T, F) input the fused core produces."""

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

    cfg = Config()
    m = cfg.model
    B, S = 32, 4
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)

    x = jax.jit(lambda k: 0.3 * jax.random.normal(
        k, (B, S, 2, m.window_size, m.feat_bins)))(jax.random.PRNGKey(0))

    content = pipe.content

    def run(name, fn):
        f = jax.jit(fn)
        ms = timeit(lambda: f(pipe.content_vars, x))
        print(f"{name:34s} {ms:8.2f} ms", flush=True)
        return ms

    # full apply
    run("full content.apply", lambda v, xx: content.apply(v, xx))

    # transpose only (the NHWC prep inside __call__)
    def transpose_only(v, xx):
        Bx, Sx, C, T, F = xx.shape
        return xx.reshape(Bx * Sx, C, T, F).transpose(0, 2, 3, 1) + 0.0

    run("reshape+transpose only", transpose_only)

    # CNN only (transpose + DeepCNN, no transformer tail)
    from ast_tpu.models.blocks import DeepCNN

    cnn = DeepCNN(m.cnn_channels, m.cnn_out_dim, dtype=m.jnp_dtype)

    def cnn_only(v, xx):
        Bx, Sx, C, T, F = xx.shape
        xw = xx.reshape(Bx * Sx, C, T, F).transpose(0, 2, 3, 1)
        sub = {k: v[k]["cnn"] for k in v if "cnn" in v[k]}
        return cnn.apply(sub, xw)

    run("transpose + DeepCNN", cnn_only)


if __name__ == "__main__":
    main()
