#!/usr/bin/env python
"""Export CLI: checkpoint -> self-contained jax.export deployment artifact.

The reference has no deployment story — inference requires its full model
source tree plus hand-wired checkpoint loading in every driver
(evaluation_style_transfer.py:214-252). This produces a directory of
serialized StableHLO programs + folded params that a model-code-free host
serves with `ast-tpu-serve --artifact DIR` or runs via
`ast_tpu.export.load_exported(DIR).transfer(wav, "violin")`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(
        description="Export the transfer pipeline as an AOT artifact")
    p.add_argument("output_dir", help="artifact directory to create")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--torch-checkpoint", default=None, metavar="PTH",
                   help="export straight from a reference-format torch "
                        "checkpoint (dict of 4 state_dicts, e.g. "
                        "SIMPLEDECODERcheckpoint_epoch_100.pth) via the "
                        "compat importer, instead of an orbax checkpoint")
    p.add_argument("--codec", default="linear", choices=["linear", "conv"],
                   help="decoder variant in the checkpoint: linear = "
                        "SimpleDecoder_TransformerOnly (primary), conv = "
                        "new_decoder")
    p.add_argument("--prototype-data", default=None, metavar="DIR",
                   help="bootstrap class prototypes from DIR/piano + "
                        "DIR/violin (the reference's first-test-batch "
                        "behavior — prototypes are not stored in torch "
                        "checkpoints, SURVEY.md quirk #5)")
    p.add_argument("--buckets", default=None, metavar="SECONDS[,SECONDS...]",
                   help="clip-length buckets to compile (default: the "
                        "config clip length, e.g. 10s)")
    p.add_argument("--batch-sizes", default="1", metavar="B[,B...]",
                   help="batch rungs to compile per bucket (e.g. 1,4,16 to "
                        "match the serving daemon's dynamic-batch ladder)")
    p.add_argument("--wire", default="f32", choices=["f32", "pcm16", "mulaw8"],
                   help="host<->device waveform transport baked into the "
                        "programs (pcm16 halves upload bytes losslessly vs "
                        "16-bit PCM bodies)")
    p.add_argument("--stream-context", default=None, metavar="K[,K...]",
                   help="also export the LIVE-streaming per-window step for "
                        "these model-context sizes (e.g. 8), so the artifact "
                        "serves /stream on a model-code-free host")
    p.add_argument("--stream-margin", type=int, default=None,
                   help="featurization margin frames baked into the stream "
                        "programs (default: the exact analytic CQT/STFT "
                        "receptive-field bound)")
    p.add_argument("--platforms", default=None, metavar="P[,P...]",
                   help="lowering platforms (e.g. tpu or cpu,tpu); default: "
                        "the current backend")
    p.add_argument("--normalize", metavar="STATS_DIR", default=None,
                   help="bake feature normalization with training stats from "
                        "this directory into the programs")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="forward-compute dtype baked into the exported "
                        "programs; auto = bfloat16 when exporting on/for a "
                        "TPU backend (accuracy-gated, docs/PERFORMANCE.md), "
                        "float32 elsewhere")
    args = p.parse_args()

    import dataclasses as _dc

    import jax

    from ast_tpu.config import Config, resolve_dtype
    from ast_tpu.eval.inference import StyleTransferPipeline
    from ast_tpu.export import export_pipeline

    cfg = Config()
    cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                             dtype=resolve_dtype(args.dtype)))
    protos = None
    if args.torch_checkpoint:
        from ast_tpu.compat.torch_import import load_torch_checkpoint

        print(f"Converting torch checkpoint: {args.torch_checkpoint}")
        converted = load_torch_checkpoint(args.torch_checkpoint,
                                          decoder_codec=args.codec)
        content_vars = converted["content"]
        decoder_vars = converted["decoder"]
        style_vars = converted["style"]
    else:
        from ast_tpu.eval.model_loading import load_eval_bundle

        bundle = load_eval_bundle(cfg, checkpoint_dir=args.checkpoint_dir,
                                  codec=args.codec)
        content_vars = bundle.state.content
        decoder_vars = bundle.state.decoder
        style_vars = bundle.state.style
        protos = bundle.class_prototypes
    if args.prototype_data:
        import os as _os

        from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches
        from ast_tpu.eval.inference import generate_class_embeddings

        ds = DualInstrumentDataset.from_dirs(
            _os.path.join(args.prototype_data, "piano"),
            _os.path.join(args.prototype_data, "violin"), cfg=cfg.audio)
        sections, _ = next(iter(balanced_batches(ds, 2, shuffle=False)))
        protos = generate_class_embeddings(cfg, style_vars,
                                           sections[0], sections[1])
        print(f"Bootstrapped class prototypes from {args.prototype_data} "
              f"(batch shape {tuple(sections.shape)})")
    if protos is None:
        print("No class prototypes available; using random prototypes "
              "(untrained-model smoke mode; pass --prototype-data for the "
              "reference's bootstrap)")
        protos = jax.random.normal(jax.random.PRNGKey(0),
                                   (2, cfg.model.d_model))
    stats = None
    if args.normalize:
        from ast_tpu.dsp.norm import load_instrument_stats

        stats = load_instrument_stats(args.normalize,
                                      use_separate_stats=False)[0]
    pipe = StyleTransferPipeline.from_variables(
        cfg, content_vars, decoder_vars, protos, codec=args.codec,
        stats=stats)

    buckets = ([float(s) for s in args.buckets.split(",") if s]
               if args.buckets else None)
    batch_sizes = tuple(int(b) for b in args.batch_sizes.split(",") if b)
    platforms = (tuple(s for s in args.platforms.split(",") if s)
                 if args.platforms else None)
    stream_contexts = (tuple(int(k) for k in args.stream_context.split(",")
                             if k) if args.stream_context else ())
    export_pipeline(pipe, args.output_dir, bucket_seconds=buckets,
                    platforms=platforms, batch_sizes=batch_sizes,
                    wire=args.wire, stream_contexts=stream_contexts,
                    stream_margin=args.stream_margin)
    total = sum(os.path.getsize(os.path.join(args.output_dir, f))
                for f in os.listdir(args.output_dir))
    n_prog = len([f for f in os.listdir(args.output_dir)
                  if f.endswith(".jaxexp")])
    print(f"exported {n_prog} program(s) + params to {args.output_dir} "
          f"({total / 1e6:.1f} MB); serve with: "
          f"ast-tpu-serve --artifact {args.output_dir}")


if __name__ == "__main__":
    main()
