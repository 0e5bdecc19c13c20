#!/usr/bin/env python
"""Rank-K PCA ceiling for the decoder's per-window reconstruction.

The decoder emits every window through output_linear(d_model -> 2*287*513)
from ONE 256-dim token (reference: SimpleDecoder_TransformerOnly.py:63-67),
so per-window outputs live on a (d_model+1)-dim affine manifold. The best
any training can do on held-out windows is therefore bounded by the rank-K
PCA residual of the z-scored STFT window distribution. This script measures
that bound: fit PCA on train windows, report held-out rel-L2 residual at
several ranks. Use it to size corpus variety so the VERDICT target
(held-out teacher-forced rel-L2 <= 0.7) is information-theoretically
reachable before spending TPU-hours training toward it.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def windows_for(ds, idxs, cfg):
    """Featurize clip pairs -> z-scored STFT windows (n, 2*287*513)."""
    from ast_tpu.data.dataset import balanced_batches

    out = []
    B = 8
    it = balanced_batches(ds, B, shuffle=False)
    want = set(idxs)
    seen = 0
    for x, labels in it:
        x = np.asarray(x[..., :513], np.float32)  # (B,S,2,287,513)
        for b in range(x.shape[0]):
            if seen in want:
                out.append(x[b].reshape(x.shape[1], -1))
            seen += 1
        if seen > max(want):
            break
    return np.concatenate(out, 0)


def pca_residual(train_w, test_w, ranks):
    mu = train_w.mean(0)
    Xc = train_w - mu
    # economy PCA via the Gram matrix (M x M), M = n train windows
    G = Xc @ Xc.T
    evals, evecs = np.linalg.eigh(G)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    results = {}
    Yc = test_w - mu
    total = float((Yc ** 2).sum())
    norm_y = float((test_w ** 2).sum())
    for K in ranks:
        k = min(K, len(evals) - 1)
        keep = evals[:k] > 1e-6 * evals[0]
        V = Xc.T @ (evecs[:, :k][:, keep] / np.sqrt(evals[:k][keep]))  # (D,k) orthonormal
        proj = (Yc @ V) @ V.T
        resid = float(((Yc - proj) ** 2).sum())
        results[K] = {
            "relL2_vs_target": float(np.sqrt(resid / norm_y)),
            "relL2_vs_centered": float(np.sqrt(resid / total)),
        }
    results["mean_only"] = {"relL2_vs_target": float(np.sqrt(total / norm_y))}
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-dir", required=True)
    p.add_argument("--test-dir", required=True)
    p.add_argument("--stats-dir", required=True)
    p.add_argument("--n-train-clips", type=int, default=192,
                   help="clip PAIRS to featurize for the PCA fit")
    p.add_argument("--n-test-clips", type=int, default=16)
    p.add_argument("--ranks", type=int, nargs="+", default=[64, 256, 512, 1024])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from ast_tpu.config import Config
    from ast_tpu.data.dataset import DualInstrumentDataset

    cfg = Config()
    tr = DualInstrumentDataset.from_dirs(
        os.path.join(args.train_dir, "piano"),
        os.path.join(args.train_dir, "violin"),
        stats_dir=args.stats_dir, cfg=cfg.audio)
    te = DualInstrumentDataset.from_dirs(
        os.path.join(args.test_dir, "piano"),
        os.path.join(args.test_dir, "violin"),
        stats_dir=args.stats_dir, cfg=cfg.audio)
    n_tr = min(args.n_train_clips, 2 * len(tr))
    n_te = min(args.n_test_clips, 2 * len(te))
    print(f"featurizing {n_tr} train + {n_te} test clips...", flush=True)
    train_w = windows_for(tr, range(n_tr), cfg)
    test_w = windows_for(te, range(n_te), cfg)
    print(f"train windows {train_w.shape}, test windows {test_w.shape}",
          flush=True)
    res = pca_residual(train_w, test_w, args.ranks)
    print(json.dumps(res, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"train_windows": int(train_w.shape[0]),
                       "test_windows": int(test_w.shape[0]),
                       "residuals": res}, f, indent=2)


if __name__ == "__main__":
    main()
