#!/usr/bin/env python
"""On-chip probes: which Mosaic lowerings accept a lane-offset (non-aligned
slice) vector operand? Used to pick a legal formulation for the fused block0
kernel's conv2 stage (concat of offset slices is Not Implemented)."""

import sys

import numpy as np


def run(name, build):
    import jax

    try:
        out = build()
        np.asarray(out)
        print(f"PROBE {name}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 2992          # like mc in block0
    W = 2394          # like mt+2
    SH = 299          # like w1
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, M), jnp.float32)
    v = jax.random.normal(key, (96, 32), jnp.float32)

    # (a) dot_general with an offset-sliced operand
    def dot_offset():
        def k(x_ref, v_ref, o_ref):
            t = x_ref[...][:, SH: SH + W].astype(jnp.bfloat16)
            o_ref[...] = jax.lax.dot_general(
                v_ref[...].astype(jnp.bfloat16), t,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((96, W), jnp.float32),
            interpret=False)(x, v)

    # (b) add of two vectors with different lane offsets
    def add_offsets():
        def k(x_ref, o_ref):
            a = x_ref[...][:, 0:W]
            b = x_ref[...][:, SH: SH + W]
            o_ref[...] = a + b

        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((32, W), jnp.float32),
            interpret=False)(x)

    # (c) store an offset-sliced vector into a scratch ref, read it back
    def store_offset():
        def k(x_ref, o_ref, s_ref):
            s_ref[...] = x_ref[...][:, SH: SH + W]
            o_ref[...] = s_ref[...] * 2.0

        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((32, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((32, W), jnp.float32)],
            interpret=False)(x)

    # (d) sublane concat of offset-0 slices ONLY (sanity: this shape concat
    # works when offsets match)
    def concat_aligned():
        def k(x_ref, o_ref):
            a = x_ref[...][:, 0:W]
            o_ref[...] = jnp.concatenate([a, a, a], axis=0)

        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((96, W), jnp.float32),
            interpret=False)(x)

    results = {
        "dot_offset_operand": run("dot_offset_operand", dot_offset),
        "add_mixed_offsets": run("add_mixed_offsets", add_offsets),
        "store_offset_to_scratch": run("store_offset_to_scratch", store_offset),
        "concat_aligned": run("concat_aligned", concat_aligned),
    }
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
