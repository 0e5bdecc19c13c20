#!/usr/bin/env python
"""Bisect the block0_fused TPU worker fault by running staged sub-kernels.

The full kernel compiles but faults the worker at run time even at N=1.
Stages (cumulative, same inputs/BlockSpecs as the real kernel at N=1):

  A  conv1 GEMM only: concat(l, cur, r) on lanes -> dot(w1n) -> +bias,
     write the (2C, Mt) center slice
  B  A + validity mask + relu(t1) + shortcut slice at offset `halo`
  C  B + conv2 as 3 accumulated GEMMs on offset slices of t1
  D  C + the +-1/+-2 lane-offset adds + bias + shortcut add + relu
  E  D + in-kernel transpose to (Mt, C) = the full kernel's store layout

First stage to fault names the construct; stages after a fault cannot run
(the lease wedges ~10 min) so re-run after recovery with --start <stage>."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", default="A", choices=list("ABCDE"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ast_tpu.config import Config
    from ast_tpu.models.blocks import fold_spectral_norms
    from ast_tpu.models.content_encoder import ContentEncoder
    from ast_tpu.ops.pallas_block0 import (_build_w1n_b64, _choose_tile,
                                           _im2col_p1t,
                                           _instance_folded_shortcut,
                                           fold_block0)

    cfg = Config()
    m = cfg.model
    enc = ContentEncoder(m, sn_folded=True)
    var = jax.jit(enc.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, 1, 2, m.window_size, m.feat_bins)))
    folded = jax.jit(fold_spectral_norms)(var)

    n = 1
    h, w = m.window_size, m.feat_bins
    h1, w1 = (h + 1) // 2, (w + 1) // 2
    m1 = h1 * w1
    th = _choose_tile(h1, w1)
    nt = h1 // th
    mt = th * w1
    halo = w1 + 1
    c = 32
    print(f"h1={h1} w1={w1} th={th} nt={nt} mt={mt} halo={halo}", flush=True)

    @jax.jit
    def prep(v, key):
        fb = fold_block0(v["params"]["cnn"]["block0"],
                         v["batch_stats"]["cnn"]["block0"])
        x = 0.3 * jax.random.normal(key, (n, 2, h, w))
        p1t = _im2col_p1t(x)
        cur = p1t.reshape(n, 32, nt, mt).transpose(0, 2, 1, 3)
        pad_l = jnp.pad(p1t, ((0, 0), (0, 0), (halo, 0)))
        lefts = jnp.stack([pad_l[:, :, t * mt: t * mt + halo]
                           for t in range(nt)], axis=1)
        pad_r = jnp.pad(p1t, ((0, 0), (0, 0), (0, halo)))
        rights = jnp.stack([pad_r[:, :, (t + 1) * mt: (t + 1) * mt + halo]
                            for t in range(nt)], axis=1)
        wsc_n, bsc_n = _instance_folded_shortcut(x, fb)
        w1n, b64 = _build_w1n_b64(fb, wsc_n, bsc_n)
        v3 = jnp.stack([fb.v96[:, dh * c: (dh + 1) * c]
                        for dh in range(3)]).astype(jnp.bfloat16)
        return lefts, cur, rights, w1n, b64[:, :, None], v3, fb.b2.reshape(c, 1)

    lefts, cur, rights, w1n, b64, v3, b2 = prep(folded, jax.random.PRNGKey(1))

    in_specs = [
        pl.BlockSpec((1, 1, 32, halo), lambda ni, ti: (ni, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 32, mt), lambda ni, ti: (ni, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 32, halo), lambda ni, ti: (ni, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 32, 2 * c), lambda ni, ti: (ni, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * c, 1), lambda ni, ti: (ni, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * c, c), lambda ni, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 1), lambda ni, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid = (n, nt)

    def conv1(l_ref, cur_ref, r_ref, w1_ref, b64_ref):
        a = jnp.concatenate([l_ref[0, 0], cur_ref[0, 0], r_ref[0, 0]], axis=1)
        o1 = jax.lax.dot_general(w1_ref[0], a, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return o1 + b64_ref[0]

    def stage_A():
        def k(l, cu, r, w1r, b64r, vr, b2r, out):
            o1 = conv1(l, cu, r, w1r, b64r)
            out[0, 0] = o1[:, halo: halo + mt]

        return k, (2 * c, )

    def t1_sc(l, cu, r, w1r, b64r, t):
        o1 = conv1(l, cu, r, w1r, b64r)
        mc = mt + 2 * halo
        col = jax.lax.broadcasted_iota(jnp.int32, (1, mc), 1)
        valid = jnp.logical_and(
            jnp.logical_or(t > 0, col >= halo),
            jnp.logical_or(t < nt - 1, col < halo + mt))
        t1 = jnp.where(valid, jax.nn.relu(o1[:c]), 0.0)
        sc = o1[c:, halo: halo + mt]
        return t1, sc

    def stage_B():
        def k(l, cu, r, w1r, b64r, vr, b2r, out):
            t = pl.program_id(1)
            t1, sc = t1_sc(l, cu, r, w1r, b64r, t)
            out[0, 0] = t1[:, halo: halo + mt] + sc

        return k, (c, )

    def conv2_tt(vr, t1):
        tt = jax.lax.dot_general(
            vr[0], t1[:, 0: mt + 2].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for dh in (1, 2):
            tt = tt + jax.lax.dot_general(
                vr[dh], t1[:, dh * w1: dh * w1 + mt + 2].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return tt

    def stage_C():
        def k(l, cu, r, w1r, b64r, vr, b2r, out):
            t = pl.program_id(1)
            t1, sc = t1_sc(l, cu, r, w1r, b64r, t)
            tt = conv2_tt(vr, t1)
            out[0, 0] = tt[:c, 0:mt] + sc

        return k, (c, )

    def o2_of(vr, b2r, t1, sc):
        tt = conv2_tt(vr, t1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, mt), 1)
        mask0 = (j % w1) != 0
        mask2 = (j % w1) != (w1 - 1)
        o2 = (jnp.where(mask0, tt[:c, 0:mt], 0.0)
              + tt[c:2 * c, 1: mt + 1]
              + jnp.where(mask2, tt[2 * c:, 2: mt + 2], 0.0))
        return jax.nn.relu(o2 + b2r[...] + sc)

    def stage_D():
        def k(l, cu, r, w1r, b64r, vr, b2r, out):
            t = pl.program_id(1)
            t1, sc = t1_sc(l, cu, r, w1r, b64r, t)
            out[0, 0] = o2_of(vr, b2r, t1, sc)

        return k, (c, )

    def stage_E():
        def k(l, cu, r, w1r, b64r, vr, b2r, out):
            t = pl.program_id(1)
            t1, sc = t1_sc(l, cu, r, w1r, b64r, t)
            out[0] = o2_of(vr, b2r, t1, sc).T

        return k, None  # (mt, c) layout

    stages = {"A": stage_A, "B": stage_B, "C": stage_C, "D": stage_D,
              "E": stage_E}
    order = "ABCDE"
    for name in order[order.index(args.start):]:
        k, rows = stages[name]()
        if rows is None:
            out_shape = jax.ShapeDtypeStruct((n, m1, c), jnp.float32)
            out_spec = pl.BlockSpec((1, mt, c), lambda ni, ti: (ni, ti, 0),
                                    memory_space=pltpu.VMEM)
        else:
            # pre-tiled (n, nt, rows, Mt): the block's trailing dim spans the
            # whole axis (same trick as the real kernel's inputs)
            out_shape = jax.ShapeDtypeStruct((n, nt, rows[0], mt), jnp.float32)
            out_spec = pl.BlockSpec((1, 1, rows[0], mt),
                                    lambda ni, ti: (ni, ti, 0, 0),
                                    memory_space=pltpu.VMEM)
        fn = pl.pallas_call(k, grid=grid, in_specs=in_specs,
                            out_specs=out_spec, out_shape=out_shape,
                            interpret=False)
        t0 = time.perf_counter()
        try:
            res = np.asarray(fn(lefts, cur, rights, w1n, b64, v3, b2))
            print(f"stage {name}: OK ({time.perf_counter()-t0:.1f}s) "
                  f"|out|max={np.abs(res).max():.3e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"stage {name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
            return 1
    print("ALL STAGES PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
