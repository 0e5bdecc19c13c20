#!/usr/bin/env python
"""Training CLI (the reference's train loop lived in a lost notebook,
train2.ipynb; this is the scripted equivalent of the reconstructed recipe)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Curriculum GAN training")
    p.add_argument("--piano-dir", default="dataset/train/piano")
    p.add_argument("--violin-dir", default="dataset/train/violin")
    p.add_argument("--stats-dir", default="train_set_stats")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--checkpoint-every", type=int, default=10,
                   help="epochs between orbax saves; on relay-attached "
                        "chips each save fetches the full param+optimizer "
                        "tree from device (~minutes), so sparse saves cut "
                        "wall time substantially for short runs")
    p.add_argument("--codec", choices=["linear", "conv"], default="linear")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward compute (losses stay f32); ~2-3x "
                        "training throughput")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--sync-checkpoint", action="store_true",
                   help="block training during orbax saves (default: the "
                        "device->host fetch + write run on a background "
                        "thread while training keeps stepping)")
    args = p.parse_args()

    import dataclasses

    from ast_tpu.config import Config, TrainConfig
    from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches
    from ast_tpu.train.loop import train

    cfg = Config()
    model_cfg = (dataclasses.replace(cfg.model, dtype="bfloat16")
                 if args.bf16 else cfg.model)
    cfg = dataclasses.replace(
        cfg, model=model_cfg,
        train=TrainConfig(batch_size=args.batch_size, learning_rate=args.lr,
                          num_epochs=args.epochs,
                          checkpoint_every=args.checkpoint_every))
    ds = DualInstrumentDataset.from_dirs(
        args.piano_dir, args.violin_dir, stats_dir=args.stats_dir,
        cfg=cfg.audio)
    print(f"dataset: {len(ds)} piano/violin pairs")
    S = cfg.audio.num_windows(cfg.audio.frames_per_clip)
    train(cfg,
          lambda epoch: balanced_batches(ds, args.batch_size, epoch=epoch),
          checkpoint_dir=args.checkpoint_dir,
          resume=not args.no_resume,
          codec=args.codec,
          sections_per_clip=S,
          async_checkpoint=not args.sync_checkpoint)


if __name__ == "__main__":
    main()
