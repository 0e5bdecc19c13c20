#!/usr/bin/env python
"""Content-encoder precision sweep on the real chip.

The ablation profile shows the ContentEncoder CNN is ~2/3 of fused device
time (30.5 of 45.6 ms at B=32). fp32 convs on TPU run as multi-pass bf16
(precision-dependent); this sweeps jax.default_matmul_precision to find the
passes/accuracy point, reporting time + output delta vs the HIGHEST run.
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

    from ast_tpu.config import Config
    from ast_tpu.models import ContentEncoder

    B, S = 32, 4
    cfg = Config()
    m = cfg.model
    enc = ContentEncoder(m)

    @jax.jit
    def init(key):
        x0 = jnp.zeros((1, 1, 2, m.window_size, m.feat_bins))
        return enc.init(key, x0)

    variables = init(jax.random.PRNGKey(0))

    @jax.jit
    def make_x(key):
        return 0.3 * jax.random.normal(
            key, (B, S, 2, m.window_size, m.feat_bins))

    x = make_x(jax.random.PRNGKey(1))

    ref = None
    for prec in ("highest", "float32", "tensorfloat32", "bfloat16"):
        try:
            with jax.default_matmul_precision(prec):
                fwd = jax.jit(lambda v, xx: enc.apply(v, xx))
                ms = timeit(lambda: fwd(variables, x))
                out = np.asarray(fwd(variables, x))
        except Exception as e:
            print(f"precision={prec}: unsupported ({e})")
            continue
        if ref is None:
            ref = out
            print(f"precision={prec:14s}: {ms:8.2f} ms  (reference)")
        else:
            d = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-12)
            print(f"precision={prec:14s}: {ms:8.2f} ms  rel-L1 vs ref {d:.2e}")


if __name__ == "__main__":
    main()
