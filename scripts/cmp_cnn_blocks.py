#!/usr/bin/env python
"""Per-block timing of the DeepCNN stack on the real chip (B*S=128 windows).

Finds where the content encoder's ~30 ms (2/3 of fused device time) goes:
cumulative prefixes of the block stack, so block i's cost = prefix(i) -
prefix(i-1) in-context.
"""

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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.models.blocks import ResBlock

    cfg = Config().model
    N = 128  # B*S windows

    class Stack(nn.Module):
        n_blocks: int

        @nn.compact
        def __call__(self, x):
            cin_channels = cfg.cnn_channels[: self.n_blocks]
            for i, ch in enumerate(cin_channels):
                x = ResBlock(ch, downsample=True, dtype=jnp.float32,
                             name=f"block{i}")(x)
            return x

    x = jax.jit(lambda k: 0.3 * jax.random.normal(
        k, (N, cfg.window_size, cfg.feat_bins, cfg.in_channels)))(
        jax.random.PRNGKey(0))

    prev = 0.0
    for nb in range(1, len(cfg.cnn_channels) + 1):
        stack = Stack(nb)
        var = jax.jit(stack.init)(jax.random.PRNGKey(1), x[:1])
        fwd = jax.jit(lambda v, xx: stack.apply(v, xx))
        ms = timeit(lambda: fwd(var, x))
        print(f"blocks 0..{nb - 1}: {ms:8.2f} ms   (block{nb - 1} ~ "
              f"{ms - prev:6.2f} ms)", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
