#!/usr/bin/env python
"""Style-transfer CLI: wav in -> transferred wav out.

Scripted equivalent of the reference's style_transfer_inference_test.ipynb
(batch style transfer + .wav export via soundfile, cells 0-5) — the reference
has no CLI at all; this is the user-facing entry point."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Piano<->violin style transfer")
    p.add_argument("inputs", nargs="+", help="input .wav files")
    p.add_argument("--target", choices=["piano", "violin"], required=True)
    p.add_argument("--output-dir", default="transferred")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--reconstruct", action="store_true",
                   help="same-class reconstruction instead of transfer "
                        "(notebook cell 5 behavior)")
    p.add_argument("--normalize", metavar="STATS_DIR", default=None,
                   help="normalize inference features with training stats "
                        "from this directory (the reference never does; see "
                        "PARITY.md quirks)")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="forward-compute dtype; auto = bfloat16 on TPU "
                        "(accuracy-gated, see docs/PERFORMANCE.md), "
                        "float32 elsewhere")
    args = p.parse_args()

    import numpy as np

    from ast_tpu.config import Config
    from ast_tpu.data.audio_io import load_audio, write_wav
    from ast_tpu.eval.inference import NAME_TO_ID, StyleTransferPipeline
    from ast_tpu.eval.model_loading import load_eval_bundle

    cfg = Config()
    bundle = load_eval_bundle(cfg, checkpoint_dir=args.checkpoint_dir,
                              dtype=args.dtype)
    cfg = bundle.cfg  # dtype-resolved
    protos = bundle.class_prototypes
    if protos is None:
        print("No class prototypes in checkpoint; using random prototypes "
              "(untrained-model smoke mode)")
        import jax

        protos = jax.random.normal(jax.random.PRNGKey(0),
                                   (2, cfg.model.d_model))
    stats = None
    if args.normalize:
        from ast_tpu.dsp.norm import load_instrument_stats

        stats = load_instrument_stats(args.normalize, use_separate_stats=False)[0]
    pipe = StyleTransferPipeline.from_variables(
        cfg, bundle.state.content, bundle.state.decoder, protos, stats=stats)

    os.makedirs(args.output_dir, exist_ok=True)
    target_id = NAME_TO_ID[args.target]
    for path in args.inputs:
        wav, sr = load_audio(path, cfg.audio.sample_rate, cfg.audio.clip_seconds)
        out = pipe.process_audio(wav[0], target_id)
        name = os.path.splitext(os.path.basename(path))[0]
        suffix = "recon" if args.reconstruct else f"to_{args.target}"
        out_path = os.path.join(args.output_dir, f"{name}_{suffix}.wav")
        write_wav(out_path, np.clip(out, -1.0, 1.0), cfg.audio.sample_rate)
        print(f"{path} -> {out_path}")


if __name__ == "__main__":
    main()
