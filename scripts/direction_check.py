#!/usr/bin/env python
"""Transfer direction check: does generated audio move TOWARD the target
class under the paper's own instrumentation-similarity metric
(evaluation_style_transfer.py:111-119)?

For each test clip, transfer to the opposite class and compare the
generated audio's instrumentation similarity against BOTH classes'
reference clips. A working transfer should score higher against the target
class than the source class. Writes <out>/direction_check.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-dir", required=True,
                   help="dir with piano/ and violin/ subdirs")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--out", default="demo/direction_check")
    p.add_argument("--max-clips", type=int, default=4)
    p.add_argument("--unfaithful", action="store_true",
                   help="run with Config().unfaithful(): unified overlap, "
                        "normalized inference features, reencode AR feedback")
    p.add_argument("--stats-dir", default=None,
                   help="with --unfaithful: normalize inference features "
                        "with this corpus's stats_unified_stft_cqt.npz "
                        "instead of the packaged reference stats")
    args = p.parse_args()

    from ast_tpu.config import Config
    from ast_tpu.data.audio_io import load_audio
    from ast_tpu.data.dataset import list_audio_files
    from ast_tpu.eval.metrics import instrumentation_similarity, mfcc_distance
    from ast_tpu.eval.model_loading import load_eval_bundle
    from ast_tpu.eval.inference import StyleTransferPipeline

    cfg = Config().unfaithful() if args.unfaithful else Config()
    bundle = load_eval_bundle(cfg, checkpoint_dir=args.checkpoint_dir)
    pipe_stats = None
    if args.stats_dir and not cfg.faithful:
        unified = os.path.join(args.stats_dir, "stats_unified_stft_cqt.npz")
        if os.path.exists(unified):
            from ast_tpu.dsp.norm import FeatureStats

            pipe_stats = FeatureStats.from_npz(unified)
    pipe = StyleTransferPipeline.from_variables(
        cfg, bundle.state.content, bundle.state.decoder,
        bundle.class_prototypes, stats=pipe_stats)

    clips = {}
    for name in ("piano", "violin"):
        files = list_audio_files(os.path.join(args.test_dir, name))
        clips[name] = [np.asarray(load_audio(f, cfg.audio.sample_rate)[0][0])
                       for f in files[: args.max_clips]]

    results = {}
    for src, tgt in (("piano", "violin"), ("violin", "piano")):
        sims_t, sims_s, mfcc_t, mfcc_s = [], [], [], []
        for clip in clips[src]:
            gen = pipe.transfer(clip, tgt)
            sims_t += [instrumentation_similarity(gen, r) for r in clips[tgt]]
            sims_s += [instrumentation_similarity(gen, r) for r in clips[src]]
            mfcc_t += [mfcc_distance(gen, r) for r in clips[tgt]]
            mfcc_s += [mfcc_distance(gen, r) for r in clips[src]]
        results[f"{src}_to_{tgt}"] = {
            "instr_sim_vs_target": float(np.mean(sims_t)),
            "instr_sim_vs_source": float(np.mean(sims_s)),
            "target_beats_source": bool(np.mean(sims_t) > np.mean(sims_s)),
            "mfcc_dist_vs_target": float(np.mean(mfcc_t)),
            "mfcc_dist_vs_source": float(np.mean(mfcc_s)),
        }
        r = results[f"{src}_to_{tgt}"]
        print(f"{src}->{tgt}: instr-sim target {r['instr_sim_vs_target']:.3f} "
              f"vs source {r['instr_sim_vs_source']:.3f}  "
              f"({'TOWARD target' if r['target_beats_source'] else 'toward source'})")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "direction_check.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
