#!/usr/bin/env python
"""Per-stage roofline for the fused B=32 transfer core (VERDICT r3 #6).

Method: compile (AOT, no execution needed) the same stage-knockout variants
scripts/ablate_stages.py times, and read XLA's post-fusion cost model
(`compiled.cost_analysis()`: total FLOPs and HBM bytes accessed). Each
stage's cost = full-program minus knocked-out-program, the same subtraction
the measured ablation uses, so analytic floors and measured deltas line up
1:1. Floors:

    compute floor = FLOPs / peak          (v5e bf16 MXU peak 197 TFLOP/s)
    memory  floor = bytes / bandwidth     (v5e HBM 819 GB/s)
    roofline floor = max(compute, memory)

`--measure` additionally times each variant in-context (relay-safe scalar
fetch); without it, pass round-3 measured deltas via --measured-json or just
read the table next to docs/PERFORMANCE.md's stage budget.

Run on the TPU (`python scripts/roofline.py`) for the real post-fusion HLO;
`JAX_PLATFORMS=cpu` gives structurally-identical FLOPs but CPU fusion/byte
counts — fine for smoke-testing the script, not for the doc table.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PEAK_FLOPS_BF16 = 197e12   # v5e MXU peak, bf16
HBM_GBPS = 819e9           # v5e HBM bandwidth


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
    p = argparse.ArgumentParser()
    p.add_argument("-B", type=int, default=32)
    p.add_argument("--measure", action="store_true",
                   help="also run/time each variant (uses the chip)")
    p.add_argument("--out", default=None, help="write JSON here")
    args = p.parse_args()
    B = args.B

    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.dsp.cqt import cqt_ri
    from ast_tpu.dsp.stft import istft_ri, stft_ri
    from ast_tpu.dsp.windows import (concat_stft_cqt, get_overlap_windows,
                                     sections2spectrogram)
    from ast_tpu.eval.inference import StyleTransferPipeline
    from ast_tpu.models.decoder import autoregressive_decode

    cfg = Config()
    a = cfg.audio
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)
    rng = np.random.default_rng(0)
    overlap = a.eval_overlap_frames
    wavs = jnp.asarray((0.1 * rng.standard_normal(
        (B, a.clip_samples))).astype(np.float32))
    tids = np.ones(B, np.int32)

    def build(skip):
        @jax.jit
        def core(waveforms, content_vars, decoder_vars, class_embeddings):
            def featurize(w):
                s = stft_ri(w, n_fft=a.n_fft, hop_length=a.hop_length,
                            method=a.stft_method, precision=a.dft_precision)
                if "cqt" in skip:
                    c = jnp.zeros((2, s.shape[1], a.cqt_bins), s.dtype)
                else:
                    c = cqt_ri(w, sr=a.sample_rate, n_bins=a.cqt_bins,
                               hop_length=a.hop_length,
                               algorithm=a.cqt_algorithm,
                               sparsity=a.cqt_sparsity,
                               transform=a.cqt_transform,
                               precision=a.dft_precision)
                feats = concat_stft_cqt(s, c)
                return feats, get_overlap_windows(
                    feats, window_size=a.window_size, overlap_frames=overlap)

            feats, sections = jax.vmap(featurize)(waveforms)
            S = sections.shape[1]
            if "content" in skip:
                content_emb = jnp.zeros((B, S, cfg.model.d_model), jnp.float32)
            else:
                content_emb = pipe.content.apply(content_vars, sections)
            class_emb = class_embeddings[tids]
            if "ar" in skip:
                out = jnp.zeros((B, S, 2, a.window_size, a.stft_bins),
                                jnp.float32) + content_emb.sum() * 1e-9
            else:
                out = autoregressive_decode(pipe.decoder, decoder_vars,
                                            content_emb, class_emb, S)
            T = feats.shape[2]
            if "istft" in skip:
                # + feats.sum keeps featurize alive under DCE when the model
                # stages are also skipped (out would otherwise be constant)
                return out.sum(axis=(1, 2, 3, 4)) + feats.sum(axis=(1, 2, 3))

            def invert(windows):
                full = sections2spectrogram(windows, T, overlap)
                return istft_ri(full, n_fft=a.n_fft, hop_length=a.hop_length,
                                method=a.stft_method,
                                precision=a.dft_precision)

            return jax.vmap(invert)(out)

        return core

    variants = [
        ("full", frozenset()),
        ("no-cqt", frozenset({"cqt"})),
        ("no-content", frozenset({"content"})),
        ("no-ar", frozenset({"ar"})),
        ("no-istft", frozenset({"istft"})),
        ("stft-only", frozenset({"cqt", "content", "ar", "istft"})),
    ]

    ex_args = (wavs, pipe.content_vars, pipe.decoder_vars,
               pipe.class_embeddings)
    costs = {}
    for name, skip in variants:
        core = build(skip)
        t0 = time.perf_counter()
        compiled = core.lower(*ex_args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        entry = {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
            "compile_s": round(time.perf_counter() - t0, 1),
        }
        if args.measure:
            fn = lambda c=compiled: c(*ex_args)
            entry["measured_ms"] = timeit(fn)
        costs[name] = entry
        print(f"[roofline] {name:12s} flops={entry['flops']/1e12:8.3f} T  "
              f"bytes={entry['bytes']/1e9:7.3f} GB"
              + (f"  {entry['measured_ms']:7.2f} ms" if args.measure else "")
              + f"  (compile {entry['compile_s']}s)", flush=True)

    full = costs["full"]
    stages = {
        "CQT": "no-cqt",
        "content encoder": "no-content",
        "AR decode": "no-ar",
        "OLA+ISTFT": "no-istft",
    }
    rows = []
    for label, variant in stages.items():
        dflops = full["flops"] - costs[variant]["flops"]
        dbytes = full["bytes"] - costs[variant]["bytes"]
        row = {"stage": label, "flops": dflops, "bytes": dbytes}
        if args.measure:
            row["measured_ms"] = full["measured_ms"] - costs[variant]["measured_ms"]
        rows.append(row)
    rows.append({"stage": "STFT+windows (residual)",
                 "flops": costs["stft-only"]["flops"],
                 "bytes": costs["stft-only"]["bytes"],
                 **({"measured_ms": costs["stft-only"]["measured_ms"]}
                    if args.measure else {})})
    rows.append({"stage": "TOTAL (full program)", "flops": full["flops"],
                 "bytes": full["bytes"],
                 **({"measured_ms": full["measured_ms"]}
                    if args.measure else {})})

    print(f"\nPer-stage roofline, B={B} (per-batch figures; divide ms by {B} "
          f"for per-clip):")
    hdr = (f"{'stage':26s} {'GFLOP':>9s} {'GB':>8s} {'comp ms':>8s} "
           f"{'mem ms':>8s} {'floor ms':>9s}")
    if args.measure:
        hdr += f" {'meas ms':>8s} {'x floor':>8s}"
    print(hdr)
    for r in rows:
        comp_ms = r["flops"] / PEAK_FLOPS_BF16 * 1e3
        mem_ms = r["bytes"] / HBM_GBPS * 1e3
        floor = max(comp_ms, mem_ms)
        r["compute_floor_ms"] = comp_ms
        r["memory_floor_ms"] = mem_ms
        r["roofline_floor_ms"] = floor
        line = (f"{r['stage']:26s} {r['flops']/1e9:9.1f} {r['bytes']/1e9:8.3f} "
                f"{comp_ms:8.3f} {mem_ms:8.3f} {floor:9.3f}")
        if args.measure:
            line += (f" {r['measured_ms']:8.2f} "
                     f"{r['measured_ms']/max(floor,1e-9):8.2f}")
        print(line)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"B": B, "peak_flops_bf16": PEAK_FLOPS_BF16,
                       "hbm_gbps": HBM_GBPS, "variants": costs,
                       "stages": rows}, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
