#!/usr/bin/env python
"""Interactive correctness smoke-check.

Scripted equivalent of the reference's test_correctness.ipynb (cells 0-11):
DSP shape invariants on real audio, encoder forwards on random tensors with
NaN/Inf + moment checks, loss unit asserts, and a data-pipeline round trip
with wav export. The pytest suite covers all of this with golden values; this
script reproduces the notebook's human-readable walkthrough."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ast_tpu.config import Config
    from ast_tpu.data.audio_io import write_wav
    from ast_tpu.data.synthetic import make_wav_fixture
    from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches
    from ast_tpu.dsp.cqt import cqt_ri
    from ast_tpu.dsp.stft import istft_ri, stft_ri
    from ast_tpu.dsp.windows import concat_stft_cqt, get_overlap_windows
    from ast_tpu.losses import (adversarial_loss, disentanglement_loss,
                                infonce_loss, margin_loss)
    from ast_tpu.models import ContentEncoder, StyleEncoder

    cfg = Config()
    a = cfg.audio
    sr = a.sample_rate

    print("== DSP invariants on a synthetic clip ==")
    t = np.arange(a.clip_samples) / sr
    wav = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    @jax.jit
    def dsp_chain(w):
        s = stft_ri(w)
        c = cqt_ri(w)
        feats = concat_stft_cqt(s, c)
        return s, c, feats, get_overlap_windows(feats)

    s, c, feats, windows = dsp_chain(jnp.asarray(wav))
    print(f"STFT {s.shape}  CQT {c.shape}  concat {feats.shape}  "
          f"windows {windows.shape}")
    assert s.shape == (2, 862, 513) and c.shape == (2, 862, 84)
    assert feats.shape == (2, 862, 597) and windows.shape[1:] == (2, 287, 597)

    print("== Encoder forwards on random tensors ==")
    m = cfg.model
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 2, 287, 597)).astype(np.float32))
    labels = jnp.asarray([0, 1])
    style = StyleEncoder(m)
    svars = style.init(jax.random.PRNGKey(0), x, labels)
    style_emb, class_emb = jax.jit(style.apply)(svars, x, labels)
    print(f"style_emb {style_emb.shape} mean={float(style_emb.mean()):+.4f} "
          f"std={float(style_emb.std()):.4f} finite={bool(jnp.isfinite(style_emb).all())}")
    content = ContentEncoder(m)
    cvars = content.init(jax.random.PRNGKey(1), x)
    content_emb = jax.jit(content.apply)(cvars, x)
    print(f"content_emb {content_emb.shape} mean={float(content_emb.mean()):+.4f} "
          f"std={float(content_emb.std()):.4f} finite={bool(jnp.isfinite(content_emb).all())}")
    assert bool(jnp.isfinite(style_emb).all()) and bool(jnp.isfinite(content_emb).all())

    print("== Loss unit checks ==")
    se = jnp.asarray(rng.standard_normal((8, m.d_model)).astype(np.float32))
    ce = jnp.asarray(rng.standard_normal((2, m.d_model)).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((8, m.d_model)).astype(np.float32))
    lab8 = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    nce = float(infonce_loss(se, lab8))
    marg = float(margin_loss(ce))
    hsic = float(disentanglement_loss(se, co))
    xcov = float(disentanglement_loss(se, co, use_hsic=False))
    disc = lambda e: e @ jnp.ones((m.d_model, 2)) * 0.01
    d_l, g_l = adversarial_loss(se, ce, co, disc, lab8, False)
    print(f"infonce={nce:.4f} margin={marg:.4f} hsic={hsic:.6f} "
          f"xcov={xcov:.4f} disc={float(d_l):.4f} gen={float(g_l):.4f}")
    assert all(np.isfinite(v) for v in (nce, marg, hsic, xcov, float(d_l), float(g_l)))
    assert marg >= 0 and nce >= 0

    print("== Data pipeline round trip ==")
    with tempfile.TemporaryDirectory() as root:
        make_wav_fixture(root, n_clips=2, cfg=a, seconds=10.0)
        ds = DualInstrumentDataset.from_dirs(
            os.path.join(root, "piano"), os.path.join(root, "violin"),
            stats_dir=None, cfg=a)
        xb, lb = next(iter(balanced_batches(ds, 2, shuffle=False)))
        print(f"batch {xb.shape} labels {np.asarray(lb)}")
        recon = jax.jit(istft_ri)(jnp.asarray(xb[0, 0, :, :, :513]))
        out = os.path.join(root, "roundtrip.wav")
        write_wav(out, np.clip(np.asarray(recon), -1, 1), sr)
        print(f"inverted first window -> {out} ({len(recon)} samples)")

    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
