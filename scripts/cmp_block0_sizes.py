#!/usr/bin/env python
"""Standalone on-chip block0_fused probe over increasing batch sizes.

The full-size kernel (N=128 grid) faulted the TPU worker at runtime after
the 3-GEMM conv2 rewrite; this walks N = 1, 8, 32, 128 with a correctness
check against block0_reference at each step so the failing size (and
whether it's size-dependent at all) is pinned in one run."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.models.blocks import fold_spectral_norms
    from ast_tpu.ops.pallas_block0 import (block0_fused, block0_reference,
                                           fold_block0)
    from ast_tpu.models.content_encoder import ContentEncoder

    cfg = Config()
    m = cfg.model
    enc = ContentEncoder(m, sn_folded=True)
    var = jax.jit(enc.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, 1, 2, m.window_size, m.feat_bins)))
    folded = jax.jit(fold_spectral_norms)(var)

    @jax.jit
    def fb_of(v):
        return fold_block0(v["params"]["cnn"]["block0"],
                           v["batch_stats"]["cnn"]["block0"])

    fb = fb_of(folded)

    ref_fn = jax.jit(block0_reference)
    fused_fn = jax.jit(lambda x, f: block0_fused(x, f, interpret=False))

    for n in (1, 8, 32, 128):
        x = jax.jit(lambda k: 0.3 * jax.random.normal(
            k, (n, 2, m.window_size, m.feat_bins)))(jax.random.PRNGKey(n))
        t0 = time.perf_counter()
        want = np.asarray(ref_fn(x, fb))
        t_ref = time.perf_counter() - t0
        print(f"N={n}: reference ok ({t_ref:.1f}s incl compile)", flush=True)
        t0 = time.perf_counter()
        got = np.asarray(fused_fn(x, fb))
        t_fused = time.perf_counter() - t0
        rel = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
        print(f"N={n}: fused ok ({t_fused:.1f}s incl compile), max rel {rel:.2e}",
              flush=True)
        if rel > 2e-2:
            print(f"N={n}: MISMATCH", flush=True)
            return 1
    print("ALL SIZES PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
