#!/usr/bin/env python
"""Layout experiments for the CNN input path on the real chip.

The explicit NCHW->NHWC transpose of the (128, 2, 287, 597) window tensor
costs ~9 ms — comparable to the whole 6-block conv stack (13 ms). Variants:
  A) explicit transpose + NHWC conv   (current)
  B) NCHW input via conv dimension_numbers (XLA does the relayout)
  C) windows built channels-last from separate re/im planes (no transpose)
Each runs conv1 of block0 only (the consumer that dictates the layout).
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
    import jax
    import jax.numpy as jnp

    N, H, W = 128, 287, 597
    key = jax.random.PRNGKey(0)
    x_nchw = jax.jit(lambda k: jax.random.normal(k, (N, 2, H, W)))(key)
    planes = jax.jit(lambda k: jax.random.normal(k, (2, N, H, W)))(key)
    kern = jax.jit(lambda k: 0.1 * jax.random.normal(k, (3, 3, 2, 32)))(
        jax.random.PRNGKey(1))

    def conv_nhwc(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    a = jax.jit(lambda x, k: conv_nhwc(
        jnp.transpose(x, (0, 2, 3, 1)), k))
    print(f"A transpose+NHWC conv:   {timeit(lambda: a(x_nchw, kern)):8.2f} ms",
          flush=True)

    b = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NHWC")))
    print(f"B NCHW dimension_numbers:{timeit(lambda: b(x_nchw, kern)):8.2f} ms",
          flush=True)

    c = jax.jit(lambda p, k: conv_nhwc(
        jnp.stack([p[0], p[1]], axis=-1), k))
    print(f"C stack planes last:     {timeit(lambda: c(planes, kern)):8.2f} ms",
          flush=True)

    # D: two single-channel convs summed (no channel interleave at all)
    def conv1ch(x, k):
        return jax.lax.conv_general_dilated(
            x[..., None], k, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    d = jax.jit(lambda p, k: conv1ch(p[0], k[:, :, 0:1, :])
                + conv1ch(p[1], k[:, :, 1:2, :]))
    print(f"D per-plane convs summed:{timeit(lambda: d(planes, kern)):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
