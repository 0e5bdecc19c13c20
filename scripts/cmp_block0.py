#!/usr/bin/env python
"""Variants for DeepCNN block0's first conv (3x3, stride 2, C_in=2 -> 32).

The per-block profile (scripts/cmp_cnn_blocks.py) shows block0 at ~8 of the
CNN stack's ~13 ms; conv2 (32->32, 102 GFLOP) accounts for ~1.5 ms at the
measured MXU rate, so conv1 (6.35 GFLOP but a 2-channel input = an 18-wide
contraction) is the pathology. Candidates, all mathematically exact:

  conv      the current lax conv on (N, 287, 597, 2) NHWC
  s2d       space-to-depth 2x2 on the padded input -> one 2x2 stride-1 conv
            with rearranged weights (K = 2*2*8 = 32)
  im2col    9 shifted strided slices stacked -> (N*144*299, 18) @ (18, 32)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _force(out):
    import jax

    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


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

    N, H, W, C, CO = 128, 287, 597, 2, 32
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: 0.3 * jax.random.normal(k, (N, H, W, C)))(key)
    w = jax.jit(lambda k: 0.1 * jax.random.normal(k, (3, 3, C, CO)))(key)

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)

    @jax.jit
    def s2d(x, w):
        # pad like the conv (1,1), then to even dims for 2x2 blocks
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))  # (N, 290, 600, C)
        Hp, Wp = xp.shape[1] // 2, xp.shape[2] // 2
        z = xp.reshape(N, Hp, 2, Wp, 2, C).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(N, Hp, Wp, 4 * C)  # (a, b, c) channel order
        # w2[u, v, (a, b, c), co] = w[2u+a, 2v+b, c, co], zero past 3
        w4 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (4, 4, C, CO)
        w2 = w4.reshape(2, 2, 2, 2, C, CO).transpose(0, 2, 1, 3, 4, 5)
        w2 = w2.reshape(2, 2, 4 * C, CO)
        dn2 = jax.lax.conv_dimension_numbers(z.shape, w2.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            z, w2, (1, 1), "VALID", dimension_numbers=dn2)
        return out[:, : (H + 1) // 2, : (W + 1) // 2, :]

    @jax.jit
    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Ho, Wo = (H + 1) // 2, (W + 1) // 2
        cols = [xp[:, di : di + 2 * Ho - 1 : 2, dj : dj + 2 * Wo - 1 : 2, :]
                for di in range(3) for dj in range(3)]
        patches = jnp.concatenate(cols, axis=-1)  # (N, Ho, Wo, 9*C)
        return patches @ w.reshape(9 * C, CO)

    ref = np.asarray(conv(x, w))
    for name, fn in (("conv", conv), ("s2d", s2d), ("im2col", im2col)):
        out = np.asarray(fn(x, w))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        ms = timeit(lambda fn=fn: fn(x, w))
        print(f"{name:8s} {ms:7.2f} ms   rel_err {err:.2e}")


if __name__ == "__main__":
    main()
