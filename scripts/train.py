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
    p.add_argument("--warmup", type=int, default=500,
                   help="LR warmup steps (TrainConfig.warmup_steps)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dropout", type=float, default=None,
                   help="override ModelConfig.dropout (default 0.1)")
    p.add_argument("--phase-epochs", type=int, nargs=3, default=None,
                   metavar=("CONTRASTIVE", "HSIC", "ADV"),
                   help="curriculum phase boundaries (default 10 20 30)")
    p.add_argument("--scheduled-sampling", type=float, default=0.0,
                   help="max probability of feeding the decoder its own "
                        "reencoded prediction instead of the teacher frame "
                        "(trains the AR rollout to track TF; 0 = faithful "
                        "pure teacher forcing)")
    p.add_argument("--ss-ramp", type=int, default=100,
                   help="epochs to ramp scheduled sampling from 0 to max")
    p.add_argument("--ss-iterations", type=int, default=1,
                   help="feedback iterations for scheduled sampling; "
                        ">= S-1 with --scheduled-sampling 1.0 trains the "
                        "EXACT reencode autoregressive rollout (the train "
                        "step then mixes TF and rollout losses 50/50)")
    p.add_argument("--ss-rollout-weight", type=float, default=0.5,
                   help="weight of the rollout loss in iterated-sampling "
                        "mode: recon = (1-w)*TF + w*rollout (default 0.5)")
    p.add_argument("--ss-consistency-weight", type=float, default=0.0,
                   help="rollout->TF distillation: adds w * mse(rollout, "
                        "stop_grad(TF)) — trains the AR-vs-TF tracking "
                        "quantity directly without perturbing the TF fit "
                        "(iterated-sampling mode only; 0 = off)")
    p.add_argument("--lr-decay", action="store_true",
                   help="cosine-decay the generator LR to lr/10 over the "
                        "run (after warmup); default: constant after warmup")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward compute (losses stay f32); ~2-3x "
                        "training throughput")
    p.add_argument("--resident", action="store_true",
                   help="decode + upload all waveforms to device ONCE and "
                        "gather batches in HBM (long runs on relay-attached "
                        "chips: per-epoch waveform re-upload dominates the "
                        "step otherwise)")
    p.add_argument("--metrics-dir", default=None,
                   help="write per-epoch loss-component JSONL here")
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
    model_cfg = cfg.model
    if args.bf16:
        model_cfg = dataclasses.replace(model_cfg, dtype="bfloat16")
    if args.dropout is not None:
        model_cfg = dataclasses.replace(model_cfg, dropout=args.dropout)
    curriculum = cfg.curriculum
    if args.phase_epochs is not None:
        curriculum = dataclasses.replace(
            curriculum, phase_epochs=tuple(args.phase_epochs))
    ds = DualInstrumentDataset.from_dirs(
        args.piano_dir, args.violin_dir, stats_dir=args.stats_dir,
        cfg=cfg.audio)
    print(f"dataset: {len(ds)} piano/violin pairs")
    steps_per_epoch = max(1, len(ds) // max(1, args.batch_size // 2))
    decay_steps = (args.epochs * steps_per_epoch - args.warmup
                   if args.lr_decay else 0)
    cfg = dataclasses.replace(
        cfg, model=model_cfg, curriculum=curriculum,
        train=TrainConfig(batch_size=args.batch_size, learning_rate=args.lr,
                          num_epochs=args.epochs,
                          warmup_steps=args.warmup, seed=args.seed,
                          checkpoint_every=args.checkpoint_every,
                          lr_decay_steps=max(0, decay_steps),
                          scheduled_sampling=args.scheduled_sampling,
                          scheduled_sampling_ramp_epochs=args.ss_ramp,
                          scheduled_sampling_iterations=args.ss_iterations,
                          rollout_weight=args.ss_rollout_weight,
                          rollout_consistency_weight=(
                              args.ss_consistency_weight)))
    S = cfg.audio.num_windows(cfg.audio.frames_per_clip)
    if args.resident:
        from ast_tpu.data.dataset import ResidentBatches

        factory = ResidentBatches(ds, args.batch_size)
    else:
        factory = lambda epoch: balanced_batches(ds, args.batch_size,
                                                 epoch=epoch)
    train(cfg, factory,
          checkpoint_dir=args.checkpoint_dir,
          resume=not args.no_resume,
          codec=args.codec,
          sections_per_clip=S,
          metrics_dir=args.metrics_dir,
          async_checkpoint=not args.sync_checkpoint)


if __name__ == "__main__":
    main()
