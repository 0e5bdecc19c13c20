#!/usr/bin/env python
"""Decoder overfit sanity check (reconstruction-grade convergence evidence).

Trains the tiny-config model on ONE fixed batch with a reconstruction-only
curriculum until the teacher-forced reconstruction loss drops below 1% of its
initial value, then verifies the autoregressive (KV-cache lax.scan) decode
tracks the teacher-forced output on the memorized batch. This is the cheap
sanity the reference training recipe never demonstrated: that
compute_comprehensive_loss (reference SimpleDecoder_TransformerOnly.py:138-210)
can actually be driven toward zero by the decoder, not merely decreased.

Note the reference's own train/inference mismatch is preserved: teacher
forcing feeds encoded ground-truth frames, while AR decode feeds raw
transformer outputs back (SimpleDecoder_TransformerOnly.py:107-122), so AR
tracks TF approximately, not bit-exactly; both relative errors are reported.

Writes demo/overfit/loss_curve.jsonl and demo/overfit/summary.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def smooth_batch(seed: int, cfg, B: int = 2, S: int = 3) -> np.ndarray:
    """A structured (band-limited) random batch: smooth along time and
    frequency like real spectrogram windows, standardized like the
    normalized training features."""
    import scipy.ndimage

    m = cfg.model
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, S, 2, m.window_size, m.feat_bins))
    x = scipy.ndimage.gaussian_filter1d(x, sigma=1.5, axis=-1)
    x = scipy.ndimage.gaussian_filter1d(x, sigma=1.5, axis=-2)
    x = (x - x.mean()) / (x.std() + 1e-8)
    return x.astype(np.float32)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--max-steps", type=int, default=4000)
    p.add_argument("--target-ratio", type=float, default=0.01,
                   help="stop when recon < ratio * initial recon")
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--out-dir", default="demo/overfit")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (tiny config; avoids TPU relay RTT "
                        "dominating thousands of small steps)")
    p.add_argument("--feedback", choices=["raw", "reencode"], default="raw",
                   help="AR feedback mode: 'raw' = reference-faithful (AR "
                        "diverges after window 0 by construction), "
                        "'reencode' = quirk fix (feeds back the exact "
                        "teacher-forcing input transform; AR must track TF "
                        "on ALL windows of the memorized batch)")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ast_tpu.config import Config, ModelConfig, TrainConfig
    from ast_tpu.models.decoder import autoregressive_decode
    from ast_tpu.train import Models, init_state, make_train_step

    cfg = dataclasses.replace(
        Config(),
        model=ModelConfig().tiny(),
        train=dataclasses.replace(TrainConfig(), learning_rate=args.lr,
                                  warmup_steps=100),
    )
    models = Models.create(cfg)
    step = make_train_step(cfg, models)
    state = init_state(cfg, models, jax.random.PRNGKey(args.seed),
                       sections_per_clip=3)

    x = jnp.asarray(smooth_batch(args.seed, cfg))
    labels = jnp.asarray([0, 1])
    curr = {k: jnp.asarray(0.0) for k in ("contrastive", "hsic", "adversarial")}

    os.makedirs(args.out_dir, exist_ok=True)
    curve_path = os.path.join(args.out_dir, "loss_curve.jsonl")
    curve = open(curve_path, "w")

    initial = None
    final = None
    for i in range(args.max_steps):
        state, metrics = step(state, x, labels, curr)
        if i == 0:
            initial = float(metrics["loss/recon"])
        if i % args.log_every == 0 or i == args.max_steps - 1:
            rec = {"step": i,
                   "recon": float(metrics["loss/recon"]),
                   "mse": float(metrics["loss/mse"])}
            curve.write(json.dumps(rec) + "\n")
            curve.flush()
            print(f"step {i:5d}  recon {rec['recon']:.5f}  mse {rec['mse']:.5f}")
        final = float(metrics["loss/recon"])
        if final < args.target_ratio * initial:
            print(f"reached {args.target_ratio:.0%} of initial at step {i}")
            break
    curve.close()

    # --- teacher-forced vs autoregressive on the memorized batch ----------
    stft_bins = cfg.model.stft_bins
    y = np.asarray(x[..., :stft_bins])
    style_emb, class_emb = models.style.apply(state.style, x, labels, False)
    content_emb = models.content.apply(state.content, x, False)

    y_tf = np.asarray(models.decoder.apply(
        state.decoder, content_emb, class_emb[labels], x[..., :stft_bins],
        None, False))
    y_ar = np.asarray(jax.jit(
        lambda c, e: autoregressive_decode(models.decoder, state.decoder,
                                           c, e, y.shape[1],
                                           feedback=args.feedback)
    )(content_emb, class_emb[labels]))

    def rel_l2(a, b):
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))

    # Per-window drift: AR window 0 is conditioned identically to TF (start
    # token + same memory), so it must match almost exactly; later windows
    # drift because AR feeds raw transformer outputs back where TF feeds
    # encoded ground truth (the reference's own train/inference mismatch,
    # SimpleDecoder_TransformerOnly.py:107-122).
    per_window = {
        f"window{i}": {
            "ar_vs_tf_rel_l2": rel_l2(y_ar[:, i], y_tf[:, i]),
            "ar_vs_tf_corr": float(np.corrcoef(
                y_ar[:, i].ravel(), y_tf[:, i].ravel())[0, 1]),
        }
        for i in range(y.shape[1])
    }

    summary = {
        "feedback": args.feedback,
        "initial_recon": initial,
        "final_recon": final,
        "ratio": final / initial,
        "steps": int(state.step),
        "tf_vs_target_rel_l2": rel_l2(y_tf, y),
        "ar_vs_target_rel_l2": rel_l2(y_ar, y),
        "ar_vs_tf_rel_l2": rel_l2(y_ar, y_tf),
        "ar_vs_tf_corr": float(np.corrcoef(y_ar.ravel(), y_tf.ravel())[0, 1]),
        "per_window": per_window,
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))

    # Pass criteria: (1) teacher-forced reconstruction reached the target
    # ratio — the decoder CAN drive compute_comprehensive_loss toward zero;
    # (2) feedback="raw" (faithful): the first AR window matches the TF
    # window it is identically conditioned on (the strongest AR==TF
    # statement the reference's feedback mismatch permits; later windows
    # drift by construction); feedback="reencode" (quirk fix): EVERY AR
    # window must track TF — this is the demonstrated-working configuration.
    if args.feedback == "reencode":
        ar_ok = all(w["ar_vs_tf_corr"] > 0.9 for w in per_window.values())
    else:
        ar_ok = per_window["window0"]["ar_vs_tf_corr"] > 0.99
    ok = summary["ratio"] < args.target_ratio and ar_ok
    print("overfit check:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
