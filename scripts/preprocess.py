#!/usr/bin/env python
"""Dataset preprocessing CLI: segmentation, unification, statistics,
analysis — the Preprocessing_Dataset/ script suite behind one entry point
(the reference used ten separate hardcoded-path scripts)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Dataset preprocessing tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("split-even", help="evenly spaced segments w/ silence "
                       "filter (Bach recipe)")
    s.add_argument("input_dir")
    s.add_argument("output_dir")
    s.add_argument("--segment-ms", type=int, default=10_000)
    s.add_argument("--skip-ms", type=int, default=15_000)

    s = sub.add_parser("split-random", help="random spaced segments (Etudes recipe)")
    s.add_argument("input_dir")
    s.add_argument("output_dir")
    s.add_argument("--segment-ms", type=int, default=10_000)
    s.add_argument("--min-distance-ms", type=int, default=25_000)
    s.add_argument("--seed", type=int, default=0)

    s = sub.add_parser("split-center", help="center clip per track (PianoMotion recipe)")
    s.add_argument("input_dir")
    s.add_argument("output_dir")
    s.add_argument("--segment-ms", type=int, default=10_000)
    s.add_argument("--max-tracks", type=int, default=768)

    s = sub.add_parser("unify", help="merge datasets: mono/resample/RMS-normalize")
    s.add_argument("output_dir")
    s.add_argument("--input", nargs=2, action="append", metavar=("DIR", "PREFIX"),
                   required=True)
    s.add_argument("--target-sr", type=int, default=44100)
    s.add_argument("--target-rms", type=float, default=0.07)

    s = sub.add_parser("stats", help="compute normalization statistics")
    s.add_argument("piano_dir")
    s.add_argument("violin_dir")
    s.add_argument("output_dir")
    s.add_argument("--unified", action="store_true",
                   help="single combined npz instead of per-instrument")
    s.add_argument("--min-std", type=float, default=0.0,
                   help="floor for per-bin std (synthetic corpora have "
                        "all-silent bins the reference's formula divides "
                        "by zero on; 1e-2 is the validated value)")

    s = sub.add_parser("synth", help="generate a synthetic piano/violin "
                       "corpus (Karplus-Strong / bowed-string fixtures)")
    s.add_argument("output_dir")
    s.add_argument("--clips", type=int, default=16)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--seconds", type=float, default=None)
    s.add_argument("--variety", type=float, default=0.0,
                   help="0 = the fixed round-3 instrument pair; 1 = per-clip "
                        "random register/tempo/scale/timbre")
    s.add_argument("--mode", choices=["free", "chorale"], default="free",
                   help="chorale = phase-locked window-step-quantized corpus "
                        "(finite atom dictionary; the generalization corpus "
                        "the rank-256 output codec can cover — see "
                        "scripts/pca_ceiling.py)")

    s = sub.add_parser("analyze", help="duration/RMS/sr/MFCC summary")
    s.add_argument("dirs", nargs="+")

    s = sub.add_parser("silent", help="flag mostly-silent tracks")
    s.add_argument("directory")

    s = sub.add_parser("inspect-stats", help="print a stats npz")
    s.add_argument("path")

    args = p.parse_args()
    from ast_tpu import tools

    if args.cmd == "split-even":
        out = tools.split_evenly_spaced(args.input_dir, args.output_dir,
                                        args.segment_ms, args.skip_ms)
        print(f"{len(out)} segments written")
    elif args.cmd == "split-random":
        out = tools.split_random_spaced(args.input_dir, args.output_dir,
                                        args.segment_ms, args.min_distance_ms,
                                        args.seed)
        print(f"{len(out)} segments written")
    elif args.cmd == "split-center":
        out = tools.split_center(args.input_dir, args.output_dir,
                                 args.segment_ms, args.max_tracks)
        print(f"{len(out)} segments written")
    elif args.cmd == "unify":
        out = tools.unify_datasets([(d, pre) for d, pre in args.input],
                                   args.output_dir, args.target_sr,
                                   args.target_rms)
        print(f"{len(out)} files written")
    elif args.cmd == "stats":
        if args.unified:
            tools.compute_unified_stats(args.piano_dir, args.violin_dir,
                                        args.output_dir, min_std=args.min_std)
        else:
            tools.compute_separated_stats(args.piano_dir, args.violin_dir,
                                          args.output_dir,
                                          min_std=args.min_std)
    elif args.cmd == "synth":
        from ast_tpu.data.synthetic import make_wav_fixture
        p_dir, v_dir = make_wav_fixture(args.output_dir, n_clips=args.clips,
                                        seed=args.seed, seconds=args.seconds,
                                        variety=args.variety, mode=args.mode)
        print(f"{args.clips} clips per class written to {p_dir} and {v_dir}")
    elif args.cmd == "analyze":
        for i, d in enumerate(args.dirs):
            stats = tools.analyze_dataset(d)
            tools.summarize_statistics(f"Dataset {i + 1} ({d})", stats)
    elif args.cmd == "silent":
        flagged = tools.find_silent_tracks(args.directory)
        print("Critical tracks found:")
        print(flagged)
    elif args.cmd == "inspect-stats":
        tools.read_stats_npz(args.path)


if __name__ == "__main__":
    main()
