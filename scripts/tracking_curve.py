#!/usr/bin/env python
"""TF-fidelity / AR-tracking curve across every checkpoint of a training run.

Answers the question a single-checkpoint tracking check can't: where along
the run does the recipe trade teacher-forced fidelity for rollout tracking
(reference AR path: SimpleDecoder_TransformerOnly.py:102-125). One process,
one compile: the jitted encode/decode programs take params as ARGUMENTS
(like scripts/ar_tracking_check.py), so each additional checkpoint costs
only its host->device load, not a recompile.

Writes <out>/tracking_curve.json:
  {"epochs": [...], "points": {epoch: {tf_vs_target_rel_l2,
   reencode: {ar_vs_tf_corr, min_window_corr, ar_vs_target_rel_l2}}}}
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-dir", required=True)
    p.add_argument("--run-dir", required=True,
                   help="dir containing checkpoint_epoch_N subdirs")
    p.add_argument("--out", default="demo/tracking_curve")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--stats-dir", default="train_set_stats")
    p.add_argument("--unfaithful", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches
    from ast_tpu.eval.model_loading import load_eval_bundle
    from ast_tpu.models.decoder import autoregressive_decode
    from ast_tpu.train.checkpoint import CHECKPOINT_PREFIX, load_checkpoint

    epochs = sorted(
        int(n[len(CHECKPOINT_PREFIX):]) for n in os.listdir(args.run_dir)
        if n.startswith(CHECKPOINT_PREFIX)
        and n[len(CHECKPOINT_PREFIX):].isdigit())
    if not epochs:
        print(f"no {CHECKPOINT_PREFIX}* in {args.run_dir}")
        return 1

    cfg = Config().unfaithful() if args.unfaithful else Config()
    # template bundle (random init); per-epoch params are swapped in below
    bundle = load_eval_bundle(cfg, log=lambda *a: None)
    models, template = bundle.models, bundle.state

    ds = DualInstrumentDataset.from_dirs(
        os.path.join(args.test_dir, "piano"),
        os.path.join(args.test_dir, "violin"),
        stats_dir=args.stats_dir, cfg=cfg.audio)
    x, labels = next(balanced_batches(ds, args.batch_size, shuffle=False))
    stft_bins = cfg.model.stft_bins
    y = np.asarray(x[..., :stft_bins])
    S = y.shape[1]
    labels_dev = jnp.asarray(labels)

    @jax.jit
    def encode(sv, cv, x, labels):
        _, class_emb = models.style.apply(sv, x, labels, False)
        content_emb = models.content.apply(cv, x, False)
        return content_emb, class_emb

    @jax.jit
    def tf_decode(dv, c, e, x):
        return models.decoder.apply(dv, c, e, x[..., :stft_bins], None, False)

    @jax.jit
    def ar_decode(dv, c, e):
        return autoregressive_decode(models.decoder, dv, c, e, S,
                                     feedback="reencode")

    def rel_l2(a, b):
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))

    points = {}
    for ep in epochs:
        path = os.path.join(args.run_dir, f"{CHECKPOINT_PREFIX}{ep}")
        state, _ = load_checkpoint(
            path, template, class_prototypes_shape=(2, cfg.model.d_model))
        content_emb, class_emb = encode(state.style, state.content, x,
                                        labels_dev)
        y_tf = np.asarray(tf_decode(state.decoder, content_emb,
                                    class_emb[labels], x))
        y_ar = np.asarray(ar_decode(state.decoder, content_emb,
                                    class_emb[labels]))
        win_corr = [float(np.corrcoef(y_ar[:, i].ravel(),
                                      y_tf[:, i].ravel())[0, 1])
                    for i in range(S)]
        points[ep] = {
            "tf_vs_target_rel_l2": rel_l2(y_tf, y),
            "reencode": {
                "ar_vs_tf_corr": float(np.corrcoef(y_ar.ravel(),
                                                   y_tf.ravel())[0, 1]),
                "min_window_corr": min(win_corr),
                "per_window_corr": win_corr,
                "ar_vs_target_rel_l2": rel_l2(y_ar, y),
            },
        }
        print(f"epoch {ep}: tf={points[ep]['tf_vs_target_rel_l2']:.4f} "
              f"corr={points[ep]['reencode']['ar_vs_tf_corr']:.4f} "
              f"min_win={points[ep]['reencode']['min_window_corr']:.4f} "
              f"ar_vs_target={points[ep]['reencode']['ar_vs_target_rel_l2']:.4f}",
              flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "tracking_curve.json"), "w") as f:
        json.dump({"epochs": epochs, "run_dir": args.run_dir,
                   "n_clips": int(y.shape[0]), "points": points}, f, indent=2)
    print(f"wrote {args.out}/tracking_curve.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
