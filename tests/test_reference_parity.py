"""End-to-end numerical parity against the ACTUAL reference code.

Unlike tests/test_compat.py (whose torch oracles are hand-assembled from torch
built-ins with the reference's parameter names), these tests import the real
modules from /root/reference — style_encoder.py, content_encoder.py,
SimpleDecoder_TransformerOnly.py, discriminator.py, losses.py — instantiate
them at FULL size, export their state_dicts, convert via
ast_tpu.compat.torch_import, and assert forward parity on fixed inputs in
eval mode. This retires the oracle-drift risk: if the converter or any of our
modules diverge from the reference's math, these fail.

The reference's shipped normalization stats artifacts
(train_set_stats/stats_stft_cqt_{piano,violin}.npz) are also loaded and
checked against the reference's `normalize` semantics (dataloader.py:9-13).
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import content_encoder as ref_content_mod  # noqa: E402
import discriminator as ref_disc_mod  # noqa: E402
import losses as ref_losses  # noqa: E402
import SimpleDecoder_TransformerOnly as ref_decoder_mod  # noqa: E402
import style_encoder as ref_style_mod  # noqa: E402

from ast_tpu.compat.torch_import import (  # noqa: E402
    convert_content_encoder,
    convert_conv_decoder,
    convert_discriminator,
    convert_simple_decoder,
    convert_style_encoder,
)
from ast_tpu.config import LossWeights, ModelConfig  # noqa: E402
from ast_tpu.dsp.norm import FeatureStats, load_instrument_stats, normalize  # noqa: E402
from ast_tpu.losses.adversarial import adversarial_loss  # noqa: E402
from ast_tpu.losses.contrastive import infonce_loss, margin_loss  # noqa: E402
from ast_tpu.losses.hsic import disentanglement_loss  # noqa: E402
from ast_tpu.losses.reconstruction import compute_comprehensive_loss  # noqa: E402
from ast_tpu.models import ContentEncoder, Decoder, Discriminator, StyleEncoder  # noqa: E402
from ast_tpu.models.decoder import autoregressive_decode  # noqa: E402

FULL = ModelConfig()  # full reference size: d=256, 6 CNN blocks, 4 layers


def _converge_spectral(model: torch.nn.Module, iters: int = 80) -> None:
    """Run torch's spectral-norm power iteration to convergence in place.

    torch stores (weight_u, weight_v) and in eval mode uses them as-is; our
    SNConv does one Rayleigh refinement from the imported u. The two agree
    exactly at the power-iteration fixed point, so converge torch first
    (same recipe torch itself applies once per train-mode forward). torch
    unfolds along dim=1 for ConvTranspose modules (its spectral_norm
    default), dim=0 otherwise — mirror that here."""
    with torch.no_grad():
        for m in model.modules():
            if hasattr(m, "weight_orig"):
                w = m.weight_orig
                if isinstance(m, (torch.nn.ConvTranspose1d,
                                  torch.nn.ConvTranspose2d,
                                  torch.nn.ConvTranspose3d)):
                    w = w.permute(1, 0, *range(2, w.dim()))
                mat = w.reshape(w.shape[0], -1)
                u, v = m.weight_u.clone(), m.weight_v.clone()
                for _ in range(iters):
                    v = tF.normalize(mat.t() @ u, dim=0)
                    u = tF.normalize(mat @ v, dim=0)
                m.weight_u.copy_(u)
                m.weight_v.copy_(v)


def _sd_numpy(model: torch.nn.Module):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _randomize_reference_module(model: torch.nn.Module, seed: int) -> None:
    """Give every parameter and BN running stat a non-degenerate random value.

    The reference decoders' own _init_weights zero every 1-D weight —
    including all LayerNorm/BatchNorm scales
    (SimpleDecoder_TransformerOnly.py:47-55, new_decoder.py:134-143) — which
    collapses the transformer to an identity map and the module output to
    exactly 0 at fresh init. Parity tests against that degenerate point are
    vacuous; randomize to realistic magnitudes first (norm scales ~1, biases
    small, matrices xavier)."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.dim() > 1:
                torch.nn.init.xavier_uniform_(p, gain=1.0)
            elif name.endswith("weight"):  # LN/BN scales
                p.uniform_(0.8, 1.2)
            else:
                p.normal_(0.0, 0.02)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.normal_(0.0, 0.1)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 1.5)


# ---------------------------------------------------------------------------
# module-level parity (the BASELINE "forward-pass parity" milestone)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_style_encoder_full_parity(rng):
    torch.manual_seed(10)
    ref = ref_style_mod.StyleEncoder()  # defaults = full size
    _converge_spectral(ref)
    ref.eval()

    x = rng.standard_normal((2, 2, 2, 287, 597)).astype(np.float32)
    labels = np.array([0, 1])
    with torch.no_grad():
        style_ref, class_ref = ref(torch.from_numpy(x), torch.from_numpy(labels))

    variables = convert_style_encoder(_sd_numpy(ref))
    ours = StyleEncoder(FULL)
    style, cls = ours.apply(variables, jnp.asarray(x), jnp.asarray(labels))

    np.testing.assert_allclose(np.asarray(style), style_ref.numpy(),
                               atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(cls), class_ref.numpy(),
                               atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_content_encoder_full_parity(rng):
    torch.manual_seed(11)
    ref = ref_content_mod.ContentEncoder()
    _converge_spectral(ref)
    ref.eval()

    x = rng.standard_normal((2, 2, 2, 287, 597)).astype(np.float32)
    with torch.no_grad():
        content_ref = ref(torch.from_numpy(x))

    variables = convert_content_encoder(_sd_numpy(ref))
    ours = ContentEncoder(FULL)
    content = ours.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(content), content_ref.numpy(),
                               atol=5e-4, rtol=5e-3)


@pytest.fixture(scope="module")
def decoder_pair():
    """One full-size reference Decoder (dropout=0 so train-mode teacher
    forcing is deterministic) + the converted variables, shared across the
    two decoder tests (the 151M-param module is expensive to build)."""
    torch.manual_seed(12)
    ref = ref_decoder_mod.Decoder(dropout=0.0)
    _randomize_reference_module(ref, seed=98)
    variables = convert_simple_decoder(_sd_numpy(ref))
    ours = Decoder(FULL, codec="linear")
    return ref, ours, variables


@pytest.mark.slow
def test_simple_decoder_teacher_forced_parity(decoder_pair, rng):
    ref, ours, variables = decoder_pair
    B, S = 2, 3
    content = rng.standard_normal((B, S, 256)).astype(np.float32)
    class_emb = rng.standard_normal((B, 256)).astype(np.float32)
    y = rng.standard_normal((B, S, 2, 287, 513)).astype(np.float32)

    ref.train()  # reference routes to forward_training only when training
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(content), torch.from_numpy(class_emb),
                      y=torch.from_numpy(y))
    ref.eval()

    out = ours.apply(variables, jnp.asarray(content), jnp.asarray(class_emb),
                     jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_simple_decoder_autoregressive_parity(decoder_pair, rng):
    """Our lax.scan KV-cache decode vs the reference's O(S^2) re-run-the-
    prefix inference loop (SimpleDecoder_TransformerOnly.py:102-125) — the
    strongest equivalence claim for the TPU-native decode path."""
    ref, ours, variables = decoder_pair
    B, S = 2, 4
    content = rng.standard_normal((B, S, 256)).astype(np.float32)
    class_emb = rng.standard_normal((B, 256)).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(content), torch.from_numpy(class_emb),
                      target_length=S)

    out = autoregressive_decode(ours, variables, jnp.asarray(content),
                                jnp.asarray(class_emb), S)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=1e-3, rtol=5e-3)


@pytest.fixture(scope="module")
def conv_decoder_pair():
    """Full-size reference new_decoder.Decoder (the epoch-70 secondary
    checkpoint variant, checkpoints/read.txt:4) + converted variables.

    The reference's own _init_weights zeroes every 1-D weight — including all
    BatchNorm scales (new_decoder.py:134-143) — which would make most of the
    conv stack output constants and the parity test vacuous. Re-randomize all
    parameters and BN running stats first so every path carries signal."""
    import new_decoder as ref_new_decoder_mod

    torch.manual_seed(15)
    ref = ref_new_decoder_mod.Decoder(dropout=0.0)
    _randomize_reference_module(ref, seed=99)
    _converge_spectral(ref)
    variables = convert_conv_decoder(_sd_numpy(ref))
    ours = Decoder(FULL, codec="conv")
    return ref, ours, variables


@pytest.mark.slow
def test_conv_decoder_teacher_forced_parity(conv_decoder_pair, rng):
    """Teacher-forced forward vs the ACTUAL reference new_decoder.py
    (new_decoder.py:231-269) at full size — conv codec: SN convs + BN +
    AdaptiveAvgPool(32,16) encode, SN ConvTranspose + bilinear-upsample
    decode (new_decoder.py:27-100)."""
    ref, ours, variables = conv_decoder_pair
    B, S = 2, 3
    content = rng.standard_normal((B, S, 256)).astype(np.float32)
    class_emb = rng.standard_normal((B, 256)).astype(np.float32)
    y = (rng.standard_normal((B, S, 2, 287, 513)) * 0.5).astype(np.float32)

    # call forward_training directly with the module in eval() so BatchNorm
    # uses running stats on both sides (forward_training itself never
    # branches on self.training, new_decoder.py:231-269)
    ref.eval()
    with torch.no_grad():
        memory = ref.prepare_memory(torch.from_numpy(content),
                                    torch.from_numpy(class_emb))
        out_ref = ref.forward_training(torch.from_numpy(y), memory)

    out = ours.apply(variables, jnp.asarray(content), jnp.asarray(class_emb),
                     jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_conv_decoder_autoregressive_parity(conv_decoder_pair, rng):
    """Our lax.scan KV-cache decode vs the reference's O(S^2) inference loop
    (new_decoder.py:272-319) — full-size conv codec."""
    ref, ours, variables = conv_decoder_pair
    B, S = 2, 4
    content = rng.standard_normal((B, S, 256)).astype(np.float32)
    class_emb = rng.standard_normal((B, 256)).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(content), torch.from_numpy(class_emb),
                      target_length=S)

    out = autoregressive_decode(ours, variables, jnp.asarray(content),
                                jnp.asarray(class_emb), S)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=2e-3, rtol=1e-2)


def test_discriminator_full_parity(rng):
    torch.manual_seed(13)
    ref = ref_disc_mod.Discriminator()
    ref.eval()
    x = rng.standard_normal((6, 256)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    variables = convert_discriminator(_sd_numpy(ref))
    out = Discriminator(FULL).apply({"params": variables["params"]},
                                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# loss-level parity against the real losses.py / decoder loss
# ---------------------------------------------------------------------------


def test_infonce_loss_reference_parity(rng):
    emb = rng.standard_normal((6, 64)).astype(np.float32)
    labels = np.array([0, 0, 0, 1, 1, 1])
    ref = ref_losses.infoNCE_loss(torch.from_numpy(emb),
                                  torch.from_numpy(labels)).item()
    ours = float(infonce_loss(jnp.asarray(emb), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_margin_loss_reference_parity(rng):
    emb = rng.standard_normal((2, 64)).astype(np.float32)
    ref = ref_losses.margin_loss(torch.from_numpy(emb)).item()
    ours = float(margin_loss(jnp.asarray(emb)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
    # also the C>2 general case the reference was written for
    emb4 = rng.standard_normal((4, 16)).astype(np.float32)
    ref4 = ref_losses.margin_loss(torch.from_numpy(emb4)).item()
    ours4 = float(margin_loss(jnp.asarray(emb4)))
    np.testing.assert_allclose(ours4, ref4, atol=1e-5, rtol=1e-5)


def test_adversarial_loss_reference_parity(rng):
    torch.manual_seed(14)
    disc_ref = ref_disc_mod.Discriminator()
    disc_ref.eval()
    variables = convert_discriminator(_sd_numpy(disc_ref))
    disc_ours = Discriminator(FULL)
    discriminate = lambda e: disc_ours.apply(
        {"params": variables["params"]}, e)

    B, S, d = 6, 3, 256
    style = rng.standard_normal((B, d)).astype(np.float32)
    class_emb = rng.standard_normal((2, d)).astype(np.float32)
    content = rng.standard_normal((B, S, d)).astype(np.float32)
    labels = np.array([0, 0, 0, 1, 1, 1])

    for for_disc in (True, False):
        with torch.no_grad():
            dl_ref, gl_ref = ref_losses.adversarial_loss(
                torch.from_numpy(style), torch.from_numpy(class_emb),
                torch.from_numpy(content), disc_ref, torch.from_numpy(labels),
                compute_for_discriminator=for_disc)
        dl, gl = adversarial_loss(
            jnp.asarray(style), jnp.asarray(class_emb), jnp.asarray(content),
            discriminate, jnp.asarray(labels), compute_for_discriminator=for_disc)
        np.testing.assert_allclose(float(dl), dl_ref.item(), atol=1e-5, rtol=1e-4)
        if for_disc:
            assert gl_ref is None and gl is None
        else:
            np.testing.assert_allclose(float(gl), gl_ref.item(),
                                       atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("use_hsic", [True, False])
def test_disentanglement_loss_reference_parity(rng, use_hsic):
    B, d = 6, 32
    style = rng.standard_normal((B, d)).astype(np.float32)
    content = rng.standard_normal((B, d)).astype(np.float32)
    ref = ref_losses.disentanglement_loss(
        torch.from_numpy(style), torch.from_numpy(content),
        use_hsic=use_hsic).item()
    ours = float(disentanglement_loss(jnp.asarray(style), jnp.asarray(content),
                                      use_hsic=use_hsic))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_comprehensive_loss_reference_parity(rng):
    out = rng.standard_normal((2, 3, 2, 32, 24)).astype(np.float32)
    tgt = rng.standard_normal((2, 3, 2, 32, 24)).astype(np.float32)
    ref = ref_decoder_mod.compute_comprehensive_loss(
        torch.from_numpy(out), torch.from_numpy(tgt))
    ours = compute_comprehensive_loss(jnp.asarray(out), jnp.asarray(tgt),
                                      LossWeights())
    for key in ("total_loss", "mse_loss", "mag_loss", "phase_loss",
                "temporal_loss", "spectral_loss"):
        np.testing.assert_allclose(float(ours[key]), ref[key].item(),
                                   atol=1e-5, rtol=1e-4, err_msg=key)


# ---------------------------------------------------------------------------
# the reference's shipped normalization stats artifacts
# ---------------------------------------------------------------------------

REF_STATS_DIR = os.path.join(REFERENCE, "train_set_stats")


def test_reference_stats_artifacts_load():
    stats = load_instrument_stats(REF_STATS_DIR, use_separate_stats=True)
    for cid in (0, 1):
        s = stats[cid]
        assert s.stft_mean.shape == (2, 513) and s.cqt_mean.shape == (2, 84)
        assert np.isfinite(s.concat_mean).all()
        # std[1, 0] is exactly 0 in the real artifacts (imag part of the DC
        # bin is identically zero); the reference's eps=1e-8 covers it
        assert (s.concat_std >= 0).all()
        assert (s.concat_std > 0).mean() > 0.99
    # piano and violin stats are genuinely different artifacts
    assert not np.allclose(stats[0].stft_mean, stats[1].stft_mean)
    # unified fallback path reads the third artifact
    uni = load_instrument_stats(REF_STATS_DIR, use_separate_stats=False)
    assert np.allclose(uni[0].stft_mean, uni[1].stft_mean)


def test_packaged_stats_match_reference_artifacts():
    """The copies shipped under ast_tpu/stats/ must be bit-identical to the
    reference's train_set_stats artifacts, and the loader must fall back to
    them when the requested dir is missing (full feature size only)."""
    from ast_tpu.dsp.norm import packaged_stats_dir

    for name in ("stats_stft_cqt_piano.npz", "stats_stft_cqt_violin.npz",
                 "stats_unified_stft_cqt.npz"):
        ref = FeatureStats.from_npz(os.path.join(REF_STATS_DIR, name))
        ours = FeatureStats.from_npz(os.path.join(packaged_stats_dir(), name))
        np.testing.assert_array_equal(ours.concat_mean, ref.concat_mean)
        np.testing.assert_array_equal(ours.concat_std, ref.concat_std)

    got = load_instrument_stats("/nonexistent/dir", use_separate_stats=True,
                                warn=lambda *_: None)
    ref_piano = FeatureStats.from_npz(
        os.path.join(REF_STATS_DIR, "stats_stft_cqt_piano.npz"))
    np.testing.assert_array_equal(got[0].concat_mean, ref_piano.concat_mean)
    # tiny feature sizes must NOT pick up the packaged full-size artifacts
    tiny = load_instrument_stats("/nonexistent/dir", use_separate_stats=True,
                                 stft_bins=24, cqt_bins=8, warn=lambda *_: None)
    assert tiny[0].stft_mean.shape == (2, 24)
    # stats_dir=None still means "explicitly none" -> dummy
    none = load_instrument_stats(None, use_separate_stats=True,
                                 warn=lambda *_: None)
    assert (none[0].concat_mean == 0).all() and (none[0].concat_std == 1).all()


def test_normalize_matches_reference_on_real_stats(rng):
    """Golden check of `normalize` against the reference's 5-line torch
    implementation (dataloader.py:9-13) using the ACTUAL shipped piano
    stats npz — broadcast layout and eps placement must agree exactly."""
    stats = FeatureStats.from_npz(
        os.path.join(REF_STATS_DIR, "stats_stft_cqt_piano.npz"))
    mean = np.asarray(stats.concat_mean, np.float32)  # (2, 597)
    std = np.asarray(stats.concat_std, np.float32)

    x = rng.standard_normal((2, 50, 597)).astype(np.float32) * 3.0 + 0.5
    # reference normalize (dataloader.py:9-13): broadcast (2, F) over time
    xt = torch.from_numpy(x)
    ref = ((xt - torch.from_numpy(mean).unsqueeze(1))
           / (torch.from_numpy(std).unsqueeze(1) + 1e-8)).numpy()
    ours = np.asarray(normalize(jnp.asarray(x), jnp.asarray(mean),
                                jnp.asarray(std)))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# .pth FILE bridge round-trip (the user-facing migration path: a real
# torch.save'd checkpoint file in the reference's on-disk format,
# checkpoints/read.txt + evaluation_style_transfer.py:246-252)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def encoder_trio():
    """Full-size reference StyleEncoder/ContentEncoder/Discriminator shared
    by the two file-bridge tests (CNN stacks are expensive to build)."""
    torch.manual_seed(33)
    ref_content = ref_content_mod.ContentEncoder()
    ref_style = ref_style_mod.StyleEncoder()
    ref_disc = ref_disc_mod.Discriminator()
    return ref_content, ref_style, ref_disc


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    assert fa[1] == fb[1]
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def _save_reference_checkpoint(path, content, style, decoder, disc,
                               epoch=100):
    # the exact on-disk format the reference's eval drivers load
    # (evaluation_style_transfer.py:246-252: a dict of 4 state_dicts)
    torch.save({
        "content_encoder": content.state_dict(),
        "style_encoder": style.state_dict(),
        "decoder": decoder.state_dict(),
        "discriminator": disc.state_dict(),
        "epoch": epoch,
    }, str(path))


@pytest.mark.slow
def test_pth_file_bridge_roundtrip_linear(tmp_path, encoder_trio,
                                          decoder_pair, rng):
    """torch.save the four ACTUAL reference modules as the reference's
    checkpoint dict, reload through load_torch_checkpoint (the
    weights_only=True FILE path users hit first when migrating), and assert
    the loaded tree is leaf-for-leaf identical to the in-memory conversion
    AND drives the decoder to the identical output."""
    from ast_tpu.compat.torch_import import load_torch_checkpoint

    ref_content, ref_style, ref_disc = encoder_trio
    ref_dec, ours_dec, variables_mem = decoder_pair
    path = tmp_path / "SIMPLEDECODERcheckpoint_epoch_100.pth"
    _save_reference_checkpoint(path, ref_content, ref_style, ref_dec,
                               ref_disc)

    loaded = load_torch_checkpoint(str(path))
    mem = {
        "content": convert_content_encoder(_sd_numpy(ref_content)),
        "style": convert_style_encoder(_sd_numpy(ref_style)),
        "decoder": convert_simple_decoder(_sd_numpy(ref_dec)),
        "disc": convert_discriminator(_sd_numpy(ref_disc)),
    }
    _assert_tree_equal(loaded, mem)

    B, S = 1, 2
    content = jnp.asarray(rng.standard_normal((B, S, 256)).astype(np.float32))
    class_emb = jnp.asarray(rng.standard_normal((B, 256)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, S, 2, 287, 513)).astype(np.float32))
    out_mem = ours_dec.apply(variables_mem, content, class_emb, y)
    out_file = ours_dec.apply(loaded["decoder"], content, class_emb, y)
    np.testing.assert_array_equal(np.asarray(out_file), np.asarray(out_mem))


@pytest.mark.slow
def test_pth_file_bridge_roundtrip_conv(tmp_path, encoder_trio,
                                        conv_decoder_pair, rng):
    """Same FILE round-trip for the new_decoder (conv codec) checkpoint
    variant (checkpoints/read.txt:4, decoder_codec='conv')."""
    from ast_tpu.compat.torch_import import load_torch_checkpoint

    ref_content, ref_style, ref_disc = encoder_trio
    ref_dec, ours_dec, variables_mem = conv_decoder_pair
    path = tmp_path / "NEWDECODERcheckpoint_epoch_70.pth"
    _save_reference_checkpoint(path, ref_content, ref_style, ref_dec,
                               ref_disc, epoch=70)

    loaded = load_torch_checkpoint(str(path), decoder_codec="conv")
    _assert_tree_equal(loaded["decoder"],
                       convert_conv_decoder(_sd_numpy(ref_dec)))

    B, S = 1, 2
    content = jnp.asarray(rng.standard_normal((B, S, 256)).astype(np.float32))
    class_emb = jnp.asarray(rng.standard_normal((B, 256)).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((B, S, 2, 287, 513)) * 0.5)
                    .astype(np.float32))
    out_mem = ours_dec.apply(variables_mem, content, class_emb, y)
    out_file = ours_dec.apply(loaded["decoder"], content, class_emb, y)
    np.testing.assert_array_equal(np.asarray(out_file), np.asarray(out_mem))
