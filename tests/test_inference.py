"""End-to-end transfer pipeline test on a scaled-down config: the full chain
(waveform -> STFT+CQT -> windows -> content encoder -> AR decode -> OLA ->
ISTFT -> waveform) in one jitted call, mirroring the reference process_audio
(evaluation_style_transfer.py:135-159)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from ast_tpu.config import AudioConfig, Config, ModelConfig
from ast_tpu.eval import StyleTransferPipeline, generate_class_embeddings

TINY_AUDIO = AudioConfig(
    sample_rate=4000, clip_seconds=0.5, n_fft=64, hop_length=64,
    cqt_bins=12, cqt_fmin=200.0, window_size=16,
    overlap_frames=5, eval_overlap_frames=5,
)
TINY_MODEL = dataclasses.replace(
    ModelConfig().tiny(),
    window_size=16,
    stft_bins=TINY_AUDIO.stft_bins,   # 33
    feat_bins=TINY_AUDIO.feat_bins,   # 45
)
TINY = Config(audio=TINY_AUDIO, model=TINY_MODEL)


def test_end_to_end_transfer(audio_clip):
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    out = pipe.transfer(wav, "violin")
    # istft default length = hop * (T - 1)
    T = 1 + len(wav) // TINY_AUDIO.hop_length
    assert out.shape == (TINY_AUDIO.hop_length * (T - 1),)
    assert np.isfinite(out).all()
    # different target class must give a different output
    out2 = pipe.transfer(wav, "piano")
    assert not np.allclose(out, out2)


def test_transfer_is_deterministic(audio_clip):
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    a = pipe.transfer(wav, "violin")
    b = pipe.transfer(wav, "violin")
    np.testing.assert_array_equal(a, b)


def test_generate_class_embeddings(rng):
    import jax
    from ast_tpu.models import StyleEncoder

    m = TINY.model
    S = 3
    style = StyleEncoder(m)
    x = jnp.asarray(rng.standard_normal(
        (1, S, 2, m.window_size, m.feat_bins)).astype(np.float32))
    svars = style.init(jax.random.PRNGKey(0), x, jnp.asarray([0]))
    piano = x[0]
    violin = jnp.asarray(rng.standard_normal(piano.shape).astype(np.float32))
    ce = generate_class_embeddings(TINY, svars, piano, violin)
    assert ce.shape == (2, m.d_model)
    assert np.isfinite(np.asarray(ce)).all()
    assert not np.allclose(np.asarray(ce[0]), np.asarray(ce[1]))


def test_batched_transfer_matches_single(audio_clip):
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    import numpy as np
    batch = np.stack([wav, wav[::-1].copy()])
    outs = pipe.process_audio_batch(batch, np.array([1, 0]))
    single0 = pipe.process_audio(wav, 1)
    single1 = pipe.process_audio(wav[::-1].copy(), 0)
    assert outs.shape == (2, len(single0))
    np.testing.assert_allclose(outs[0], single0, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(outs[1], single1, atol=2e-4, rtol=1e-3)


def test_pcm16_wire_matches_float(audio_clip):
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    import numpy as np
    batch = np.stack([wav, wav])
    # reference: float pipeline fed the SAME quantized input
    q_in = np.clip(np.round(batch * 32768.0), -32768, 32767) / 32768.0
    f32 = pipe.process_audio_batch(q_in.astype(np.float32), np.array([1, 1]))
    pcm = pipe.process_audio_batch(batch, np.array([1, 1]), pcm16_wire=True)
    assert pcm.dtype == np.float32
    # PCM16 output clips to [-1, 1) and quantizes to 1/32768
    expected = np.clip(np.round(np.clip(f32, -1.0, 32767 / 32768) * 32768.0),
                       -32768, 32767) / 32768.0
    np.testing.assert_allclose(pcm, expected, atol=2e-4)


def test_mulaw8_wire_roundtrip_and_core(audio_clip):
    """mu-law companding: host codec SNR is ~38 dB on real audio, and the
    mulaw8 batch-core path stays close to the float pipeline (opt-in wire
    for link-bound serving)."""
    import numpy as np

    from ast_tpu.eval.inference import mulaw_decode_np, mulaw_encode_np

    wav = audio_clip[: TINY_AUDIO.clip_samples]
    dec = mulaw_decode_np(mulaw_encode_np(wav))
    err = dec - wav
    snr_db = 10 * np.log10((wav ** 2).mean() / (err ** 2).mean())
    assert snr_db > 30.0, snr_db

    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    batch = np.stack([wav, wav])
    f32 = pipe.process_audio_batch(batch, np.array([1, 1]))
    mu = pipe.process_audio_batch(batch, np.array([1, 1]), wire="mulaw8")
    assert mu.dtype == np.float32 and mu.shape == f32.shape
    # companding noise on input+output, but the same program in between;
    # mu-law egress clips to [-1, 1] (the wav response range), so compare
    # against the clipped float output (random weights overshoot +-1)
    ref = np.clip(f32, -1.0, 1.0)
    scale = np.abs(ref).mean() + 1e-9
    assert np.abs(mu - ref).mean() / scale < 0.05, (
        np.abs(mu - ref).mean() / scale)


def test_transfer_any_length(audio_clip):
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    import numpy as np
    hop = TINY_AUDIO.hop_length
    # a length that is NOT the configured clip length
    wav = audio_clip[: TINY_AUDIO.clip_samples + 3 * hop + 7]
    out = pipe.transfer_any_length(wav, "violin", bucket_seconds=0.25)
    assert out.shape == (hop * (len(wav) // hop),)
    assert np.isfinite(out).all()


def test_bfloat16_forward():
    import dataclasses
    import numpy as np
    cfg = dataclasses.replace(TINY, model=dataclasses.replace(TINY.model,
                                                              dtype="bfloat16"))
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(TINY_AUDIO.clip_samples)).astype(np.float32)
    out = pipe.transfer(wav, "violin")
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_bf16_pipeline_matches_f32():
    """The accuracy gate behind the dtype="auto" inference default: bfloat16
    forward compute on the SAME float32 params must stay within a few percent
    of the f32 waveform (full-size TPU measurement: 0.9% rel-L2,
    demo/roofline_b32_bf16.json; bench.py re-measures the delta every run and
    falls back to f32 past 3%)."""
    pipe32 = StyleTransferPipeline.init_random(TINY, seed=0)
    cfg16 = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY.model, dtype="bfloat16"))
    pipe16 = StyleTransferPipeline.from_variables(
        cfg16, pipe32.content_vars, pipe32.decoder_vars,
        pipe32.class_embeddings, stats=pipe32.stats)
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal(TINY_AUDIO.clip_samples)).astype(np.float32)
    a = np.asarray(pipe32.process_audio(wav, 1))
    b = np.asarray(pipe16.process_audio(wav, 1))
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel


def test_resolve_dtype():
    from ast_tpu.config import resolve_dtype

    assert resolve_dtype("float32") == "float32"
    assert resolve_dtype("bfloat16") == "bfloat16"
    # tests run on the CPU backend (conftest pins JAX_PLATFORMS=cpu), where
    # auto must stay f32 — the bf16 win/accuracy trade was measured on TPU
    assert resolve_dtype("auto") == "float32"


def test_pcm16_single_clip_input(audio_clip):
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    import numpy as np
    q = np.clip(np.round(wav * 32768.0), -32768, 32767) / 32768.0
    ref = pipe.process_audio(q.astype(np.float32), 1)
    out = pipe.process_audio(wav, 1, pcm16_in=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.slow
def test_inference_normalization_option(audio_clip):
    import dataclasses as dc

    from ast_tpu.dsp.norm import FeatureStats

    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    raw = pipe.transfer(wav, "violin")

    stats = FeatureStats.identity(TINY_AUDIO.stft_bins, TINY_AUDIO.cqt_bins)
    # identity stats (mean 0, std 1): output must differ only by the eps in
    # the z-score denominator (tiny)
    pipe_id = dc.replace(pipe, stats=stats)
    normed = pipe_id.transfer(wav, "violin")
    np.testing.assert_allclose(normed, raw, atol=1e-3, rtol=1e-3)

    # non-trivial stats must change the output
    stats2 = FeatureStats(
        stft_mean=np.full((2, TINY_AUDIO.stft_bins), 0.5, np.float32),
        stft_std=np.full((2, TINY_AUDIO.stft_bins), 2.0, np.float32),
        cqt_mean=np.zeros((2, TINY_AUDIO.cqt_bins), np.float32),
        cqt_std=np.ones((2, TINY_AUDIO.cqt_bins), np.float32))
    pipe2 = dc.replace(pipe, stats=stats2)
    changed = pipe2.transfer(wav, "violin")
    assert not np.allclose(changed, raw, atol=1e-3)


def test_unfaithful_preset():
    """Config().unfaithful() flips all config-level quirk fixes at once:
    unified overlap (96/96) and packaged-stats inference normalization."""
    from ast_tpu.eval.inference import _preset_stats

    cfg = Config()
    assert cfg.faithful and cfg.audio.eval_overlap_frames == 86
    assert _preset_stats(cfg) is None  # faithful: never normalize

    fixed = cfg.unfaithful()
    assert not fixed.faithful
    assert fixed.audio.eval_overlap_frames == fixed.audio.overlap_frames == 96
    stats = _preset_stats(fixed)
    assert stats is not None
    assert stats.stft_mean.shape == (2, fixed.audio.stft_bins)
    assert stats.cqt_mean.shape == (2, fixed.audio.cqt_bins)

    # non-default feature sizes can't use the packaged stats: stays None
    tiny_fixed = TINY.unfaithful()
    assert _preset_stats(tiny_fixed) is None

    # pipelines pick the preset stats up automatically
    pipe = StyleTransferPipeline.init_random(tiny_fixed, seed=0)
    assert pipe.stats is None  # tiny config: gated off


def test_transfer_stream_matches_batch(audio_clip):
    """Pipelined serving yields the same clips as the one-shot batch path,
    in order, including a padded partial final batch."""
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    rng = np.random.default_rng(3)
    B = 5
    wavs = rng.standard_normal((B, TINY_AUDIO.clip_samples)).astype(np.float32)
    ids = np.array([1, 0, 1, 1, 0])

    expected = pipe.process_audio_batch(wavs, ids, pcm16_wire=True)
    got = list(pipe.transfer_stream(wavs, ids, batch_size=2, depth=2,
                                    pcm16_wire=True))
    assert len(got) == B
    np.testing.assert_allclose(np.stack(got), expected, atol=1e-4)


@pytest.mark.slow
def test_fused_block0_pipeline_matches(audio_clip):
    """fused_block0="on" (Pallas kernel, interpret mode on CPU) must match
    the XLA conv path through the whole pipeline to bf16-conv accuracy."""
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    off = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY_MODEL, fused_block0="off"))
    on = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY_MODEL, fused_block0="on"))
    p_off = StyleTransferPipeline.init_random(off, seed=0)
    p_on = StyleTransferPipeline.init_random(on, seed=0)
    a = np.asarray(p_off.process_audio(wav, 1))
    b = np.asarray(p_on.process_audio(wav, 1))
    assert a.shape == b.shape
    scale = np.abs(a).max() + 1e-9
    assert np.abs(a - b).max() / scale < 2e-2, np.abs(a - b).max() / scale


@pytest.mark.slow
def test_block0_xla_pipeline_matches(audio_clip):
    """fused_block0="xla" (folded-weight XLA rewrite) must match the flax
    conv path through the whole pipeline at fp32 accuracy."""
    wav = audio_clip[: TINY_AUDIO.clip_samples]
    off = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY_MODEL, fused_block0="off"))
    xla = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY_MODEL, fused_block0="xla"))
    p_off = StyleTransferPipeline.init_random(off, seed=0)
    p_xla = StyleTransferPipeline.init_random(xla, seed=0)
    a = np.asarray(p_off.process_audio(wav, 1))
    b = np.asarray(p_xla.process_audio(wav, 1))
    assert a.shape == b.shape
    scale = np.abs(a).max() + 1e-9
    assert np.abs(a - b).max() / scale < 1e-4, np.abs(a - b).max() / scale


@pytest.mark.slow
def test_fused_block0_runtime_fallback(audio_clip, monkeypatch):
    """If the fused block0 kernel fails at run time (Mosaic lowering or a
    worker fault on some toolchains), the pipeline must self-disable it,
    warn, and produce the XLA-conv-path result instead of crashing."""
    import warnings

    import ast_tpu.ops.pallas_block0 as pb0

    wav = audio_clip[: TINY_AUDIO.clip_samples]
    on = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY_MODEL, fused_block0="on"))
    p_ref = StyleTransferPipeline.init_random(
        dataclasses.replace(
            TINY, model=dataclasses.replace(TINY_MODEL, fused_block0="off")),
        seed=0)
    want = np.asarray(p_ref.process_audio(wav, 1))

    def boom(*a, **k):
        raise RuntimeError("synthetic kernel fault")

    monkeypatch.setattr(pb0, "content_block0", boom)
    pipe = StyleTransferPipeline.init_random(on, seed=0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = np.asarray(pipe.process_audio(wav, 1))
    assert getattr(pipe, "_fb0_disabled", False) is True
    assert any("fused block0" in str(x.message) for x in w)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # subsequent calls stay on the fallback path without re-raising
    got2 = np.asarray(pipe.process_audio(wav, 1))
    np.testing.assert_allclose(got2, want, atol=1e-5)
