#!/usr/bin/env python
"""Evaluation CLI: runs the reconstruction and/or style-transfer drivers
(reference entry points: evaluation_reconstruction.py __main__,
evaluation_style_transfer.py __main__)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Run evaluation drivers")
    p.add_argument("--test-dir", default="dataset/test")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--mode", choices=["reconstruction", "transfer", "both"],
                   default="both")
    p.add_argument("--recon-out", default="result_evaluation_reconstruction")
    p.add_argument("--transfer-out", default="result_evaluation_style_transfer")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--stats-dir", default="train_set_stats",
                   help="directory with per-instrument stats npz files")
    p.add_argument("--unfaithful", action="store_true",
                   help="evaluate with Config().unfaithful(): unified 96/96 "
                        "overlap, normalized inference features, reencode AR "
                        "feedback (the demonstrated-working configuration)")
    args = p.parse_args()

    from ast_tpu.config import Config

    cfg = Config().unfaithful() if args.unfaithful else Config()
    if args.mode in ("reconstruction", "both"):
        from ast_tpu.eval.reconstruction import (
            process_test_set_with_dataloader, save_results_json)

        metrics = process_test_set_with_dataloader(
            args.test_dir, args.recon_out, cfg,
            checkpoint_dir=args.checkpoint_dir, stats_dir=args.stats_dir)
        path = save_results_json(metrics, args.recon_out)
        print(f"Results saved to: {path}")

    if args.mode in ("transfer", "both"):
        from ast_tpu.eval.style_transfer import (
            process_test_set, save_global_statistics)

        metrics = process_test_set(
            args.test_dir, args.transfer_out, args.batch_size, cfg,
            checkpoint_dir=args.checkpoint_dir, stats_dir=args.stats_dir)
        save_global_statistics(metrics, args.transfer_out)


if __name__ == "__main__":
    main()
