"""Streaming (live-audio) style transfer tests.

Verifies the three claims ast_tpu/eval/streaming.py makes:
  1. push-pattern invariance — any chunking of the input produces the exact
     same output stream (the state machine is a pure function of the stream);
  2. the streamed overlap-average + ISTFT equals the offline
     sections2spectrogram + istft of the same decoded windows;
  3. while the stream is shorter than the context ring, each decoded window
     equals a straightforward causal oracle built from the same modules
     (content transformer over the window prefix, decoder re-run per step).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ast_tpu.config import AudioConfig, Config, ModelConfig
from ast_tpu.dsp.cqt import cqt_ri
from ast_tpu.dsp.stft import istft_ri, stft_ri
from ast_tpu.dsp.windows import concat_stft_cqt, get_overlap_windows, sections2spectrogram
from ast_tpu.eval import StreamingTransfer, StyleTransferPipeline
from ast_tpu.eval.streaming import _subvars
from ast_tpu.models import Decoder
from ast_tpu.models.attention import TransformerEncoder, causal_mask
from ast_tpu.models.blocks import DeepCNN, sinusoidal_position_encoding

import flax.linen as nn

TINY_AUDIO = AudioConfig(
    sample_rate=4000, clip_seconds=0.5, n_fft=64, hop_length=64,
    cqt_bins=12, cqt_fmin=200.0, window_size=16,
    overlap_frames=5, eval_overlap_frames=5,
)
TINY_MODEL = dataclasses.replace(
    ModelConfig().tiny(), window_size=16,
    stft_bins=TINY_AUDIO.stft_bins, feat_bins=TINY_AUDIO.feat_bins)
TINY = Config(audio=TINY_AUDIO, model=TINY_MODEL)

MARGIN = 8  # frames; covers the tiny CQT filter support (336 samples)
HOP = TINY_AUDIO.hop_length
W, O = TINY_AUDIO.window_size, TINY_AUDIO.eval_overlap_frames
P = W - O


@pytest.fixture(scope="module")
def pipe():
    return StyleTransferPipeline.init_random(TINY, seed=0)


@pytest.fixture(scope="module")
def wav(rng):
    n = 3 * TINY_AUDIO.sample_rate
    t = np.arange(n) / TINY_AUDIO.sample_rate
    x = (0.4 * np.sin(2 * np.pi * 330 * t) + 0.2 * np.sin(2 * np.pi * 495 * t)
         + 0.02 * rng.standard_normal(n))
    return x.astype(np.float32)


def test_push_pattern_invariance(pipe, wav):
    outs = []
    for blocks in ([len(wav)], [997] * (len(wav) // 997 + 1), [1, 4096, 333, 10**6]):
        stream = StreamingTransfer(pipe, "violin", context_windows=4,
                                   margin_frames=MARGIN)
        parts, i = [], 0
        for b in blocks:
            parts.append(stream.push(wav[i:i + b]))
            i += b
        parts.append(stream.push(wav[i:]))
        parts.append(stream.flush())
        outs.append(np.concatenate(parts))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_output_length_matches_offline_istft_semantics(pipe, wav):
    for n in (len(wav), 48 * HOP, 44 * HOP + 13, (44 + 9) * HOP):
        stream = StreamingTransfer(pipe, "violin", context_windows=4,
                                   margin_frames=MARGIN)
        out = stream.process(wav[:n])
        T = 1 + n // HOP
        assert out.shape == (HOP * (T - 1),), (n, out.shape)
        assert np.isfinite(out).all()


def test_streamed_ola_istft_matches_offline(pipe, wav):
    """The streamed inversion of the decoded windows must equal the offline
    sections2spectrogram + istft of those same windows."""
    # exact multiple: T == P*(S-1) + W so no partial flush window exists
    S = 4
    T = P * (S - 1) + W
    n = (T - 1) * HOP
    stream = StreamingTransfer(pipe, "violin", context_windows=8,
                               margin_frames=MARGIN, collect_windows=True)
    out = stream.process(wav[:n], block=2048)
    assert len(stream.windows) == S
    secs = jnp.asarray(np.stack([w for w in stream.windows]))  # (S,2,W,F)
    full = sections2spectrogram(secs, T, O)
    ref = np.asarray(istft_ri(full, n_fft=TINY_AUDIO.n_fft, hop_length=HOP))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def _causal_oracle_windows(pipe, wav, K):
    """Slow reference implementation of the causal streaming decode: offline
    featurization of the whole signal, content transformer over the window
    PREFIX (capped at K), full decoder re-run per step. Mirrors the
    definition in ast_tpu/eval/streaming.py."""
    cfg = pipe.cfg
    a, m = cfg.audio, cfg.model
    x = jnp.asarray(wav)
    s = stft_ri(x, n_fft=a.n_fft, hop_length=a.hop_length,
                method=a.stft_method, precision=a.dft_precision)
    c = cqt_ri(x, sr=a.sample_rate, n_bins=a.cqt_bins, hop_length=a.hop_length,
               algorithm=a.cqt_algorithm, sparsity=a.cqt_sparsity,
               transform=a.cqt_transform, precision=a.dft_precision,
               bins_per_octave=a.cqt_bins_per_octave, fmin=a.cqt_fmin,
               filter_scale=a.cqt_filter_scale)
    secs = get_overlap_windows(concat_stft_cqt(s, c), a.window_size,
                               a.eval_overlap_frames)  # (S, 2, W, F)
    cvars, dvars = pipe.content_vars_infer, pipe.decoder_vars
    dec = pipe.decoder
    d = m.d_model

    cnn = DeepCNN(m.cnn_channels, m.cnn_out_dim, dtype=m.jnp_dtype,
                  sn_folded=True)
    toks = [cnn.apply(_subvars(cvars, "cnn"),
                      jnp.transpose(sec, (1, 2, 0))[None], train=False)[0]
            for sec in secs]
    enc = TransformerEncoder(d, m.num_heads, m.num_layers, m.ff_mult,
                             m.dropout, m.jnp_dtype)
    pe = sinusoidal_position_encoding(m.max_len, d)
    normed = getattr(m, "ar_feedback", "raw") == "reencode"

    start = dec.apply(dvars, 1, method=Decoder.start_tokens)[0, 0]
    inputs = [start]  # pre-PE decoder inputs, oldest first
    frames = []
    class_emb = pipe.class_embeddings[1][None]
    for w in range(len(toks)):
        ctx = jnp.stack(toks[max(0, w - K + 1): w + 1])[None]  # (1, L, d)
        L = ctx.shape[1]
        seq = ctx + jnp.asarray(pe[:L])[None]
        seq = nn.LayerNorm(epsilon=1e-5, dtype=m.jnp_dtype).apply(
            _subvars(cvars, "norm"), seq)
        content = enc.apply(_subvars(cvars, "transformer"), seq,
                            deterministic=True)
        memory = dec.apply(dvars, content, class_emb, False,
                           method=Decoder.prepare_memory)
        ins = jnp.stack(inputs[-L:])[None]  # (1, L, d) aligned with ctx
        xin = dec.apply(dvars, ins, normed,
                        method=Decoder.prepare_stream_inputs)
        out = dec.apply(dvars, xin, memory, causal_mask(L), None,
                        method=Decoder.core_forward)
        y_t = out[:, -1:, :]
        frame = dec.apply(dvars, y_t, False, method=Decoder.generate_output)
        frames.append(np.asarray(frame[0, 0]))
        if normed:
            fb = dec.apply(dvars, frame, method=Decoder.encode_frame)[0, 0]
        else:
            fb = y_t[0, 0]
        inputs.append(fb)
    return frames


@pytest.mark.parametrize("feedback", ["raw", "reencode"])
@pytest.mark.slow
def test_stream_matches_causal_oracle(wav, feedback):
    """Window-by-window equality with the causal oracle while the context
    ring has not slid. The signal is zero-padded at both ends by the
    featurization margin so chunked and whole-signal features coincide
    (one CQT octave -> no resampling; framing is then a pure slice)."""
    cfg = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY_MODEL, ar_feedback=feedback))
    pipe = StyleTransferPipeline.init_random(cfg, seed=1)
    K = 8
    S = 4
    pad = MARGIN * HOP
    n = (P * (S - 1) + W - 1) * HOP
    x = np.concatenate([np.zeros(pad, np.float32), wav[:n - 2 * pad],
                        np.zeros(pad, np.float32)])
    stream = StreamingTransfer(pipe, "violin", context_windows=K,
                               margin_frames=MARGIN, collect_windows=True)
    stream.process(x)
    oracle = _causal_oracle_windows(pipe, x, K)
    assert len(stream.windows) == len(oracle) == S
    # fp-order differences (chunked vs whole-signal featurization, ring
    # updates vs stacking) accumulate through CNN+transformer to ~1e-4 on
    # O(1) outputs; a real ring/mask bug would be O(1) off
    for got, want in zip(stream.windows, oracle):
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_stream_slides_past_context(pipe, wav):
    """Streams longer than the context ring keep running (sliding window)
    and stay finite; the first K windows still match a long-context run."""
    K = 3
    n = (P * 7 + W - 1) * HOP  # 8 windows > K
    a = StreamingTransfer(pipe, "violin", context_windows=K,
                          margin_frames=MARGIN, collect_windows=True)
    a.process(wav[:n])
    assert len(a.windows) == 8
    assert all(np.isfinite(w).all() for w in a.windows)
    b = StreamingTransfer(pipe, "violin", context_windows=16,
                          margin_frames=MARGIN, collect_windows=True)
    b.process(wav[:n])
    # identical until the small ring slides (first K windows)
    for i in range(K):
        np.testing.assert_allclose(a.windows[i], b.windows[i],
                                   atol=1e-5, rtol=1e-4)
    # and the slid context genuinely changes later windows
    assert not np.allclose(a.windows[-1], b.windows[-1])


def test_interior_features_match_offline(pipe, wav):
    """Chunked featurization with a sufficient margin reproduces the offline
    whole-signal features for interior windows."""
    stream = StreamingTransfer(pipe, "violin", context_windows=4,
                               margin_frames=MARGIN)
    a = TINY_AUDIO
    x = jnp.asarray(wav)
    s = stft_ri(x, n_fft=a.n_fft, hop_length=a.hop_length,
                method=a.stft_method, precision=a.dft_precision)
    c = cqt_ri(x, sr=a.sample_rate, n_bins=a.cqt_bins, hop_length=a.hop_length,
               algorithm=a.cqt_algorithm, sparsity=a.cqt_sparsity,
               transform=a.cqt_transform, precision=a.dft_precision,
               bins_per_octave=a.cqt_bins_per_octave, fmin=a.cqt_fmin,
               filter_scale=a.cqt_filter_scale)
    feats = np.asarray(concat_stft_cqt(s, c))
    w = 2  # interior window
    # assemble the chunk exactly as push() would
    stream._buf = wav.copy()
    stream._buf_start = 0
    stream._total_in = len(wav)
    chunk = stream._extract_chunk(stream._chunk_start(w))
    sc = stft_ri(jnp.asarray(chunk), n_fft=a.n_fft, hop_length=a.hop_length,
                 method=a.stft_method, precision=a.dft_precision)
    cc = cqt_ri(jnp.asarray(chunk), sr=a.sample_rate, n_bins=a.cqt_bins,
                hop_length=a.hop_length, algorithm=a.cqt_algorithm,
                sparsity=a.cqt_sparsity, transform=a.cqt_transform,
                precision=a.dft_precision,
                bins_per_octave=a.cqt_bins_per_octave, fmin=a.cqt_fmin,
                filter_scale=a.cqt_filter_scale)
    got = np.asarray(concat_stft_cqt(sc, cc))[:, MARGIN:MARGIN + W, :]
    want = feats[:, w * P: w * P + W, :]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_auto_margin_covers_cqt_support(pipe):
    """margin_frames=None derives the analytic CQT receptive-field bound
    (dsp/cqt.py cqt_context_frames) and that bound is EXACT: chunked
    featurization of an interior window equals the whole-signal one
    bit-for-bit, even at librosa's default fmin (C1), where the filter
    support is ~8x the tiny test margin."""
    from ast_tpu.dsp.cqt import cqt_context_frames

    a = TINY_AUDIO
    auto = StreamingTransfer(pipe, "violin", context_windows=4)
    want_margin = max(
        cqt_context_frames(a.sample_rate, a.cqt_bins, a.hop_length,
                           a.cqt_bins_per_octave, a.cqt_fmin,
                           a.cqt_filter_scale, a.cqt_algorithm),
        (a.n_fft // 2 + a.hop_length - 1) // a.hop_length)
    assert auto._margin == want_margin

    rng = np.random.default_rng(7)
    for fmin in (a.cqt_fmin, 32.70319566257483):  # tiny preset + librosa C1
        margin = max(
            cqt_context_frames(a.sample_rate, a.cqt_bins, a.hop_length,
                               a.cqt_bins_per_octave, fmin, 1.0, "recursive"),
            (a.n_fft // 2 + a.hop_length - 1) // a.hop_length)
        x = (0.3 * rng.standard_normal(6 * a.sample_rate)).astype(np.float32)

        def feats(sig):
            s = stft_ri(jnp.asarray(sig), n_fft=a.n_fft,
                        hop_length=a.hop_length, method=a.stft_method,
                        precision=a.dft_precision)
            c = cqt_ri(jnp.asarray(sig), sr=a.sample_rate, n_bins=a.cqt_bins,
                       hop_length=a.hop_length, algorithm="recursive",
                       sparsity=a.cqt_sparsity, transform=a.cqt_transform,
                       precision=a.dft_precision,
                       bins_per_octave=a.cqt_bins_per_octave, fmin=fmin)
            return np.asarray(concat_stft_cqt(s, c))

        full = feats(x)
        w = 3  # interior window with full margin coverage on both sides
        start = (w * P - margin) * HOP
        assert start >= 0, "test signal too short for this margin"
        chunk_len = (W + 2 * margin - 1) * HOP
        got = feats(x[start:start + chunk_len])[:, margin:margin + W, :]
        want = full[:, w * P: w * P + W, :]
        np.testing.assert_array_equal(got, want)


def test_stream_too_short_raises(pipe):
    stream = StreamingTransfer(pipe, "violin", context_windows=4,
                               margin_frames=MARGIN)
    stream.push(np.zeros(3 * HOP, np.float32))
    with pytest.raises(ValueError, match="too short"):
        stream.flush()


def test_stream_invalid_configs(pipe):
    with pytest.raises(ValueError, match="context_windows"):
        StreamingTransfer(pipe, "violin", context_windows=1)
    bad = dataclasses.replace(
        TINY, audio=dataclasses.replace(TINY_AUDIO, eval_overlap_frames=12))
    bad_pipe = StyleTransferPipeline.init_random(bad, seed=0)
    with pytest.raises(ValueError, match="overlap"):
        StreamingTransfer(bad_pipe, "violin")


@pytest.mark.slow
def test_stream_bf16_compute(pipe, wav):
    """The stream step must run under bfloat16 forward compute (the TPU
    serving default, config.resolve_dtype): regression for the f32 state
    rings vs bf16 CNN-token/feedback/output dtype mismatch that crashed
    POST /stream on the epoch-900 flagship daemon. The rings stay f32, the
    output is f32 and close to the f32-compute stream."""
    cfg16 = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY_MODEL, dtype="bfloat16"))
    pipe16 = StyleTransferPipeline.init_random(cfg16, seed=0)
    out16 = StreamingTransfer(pipe16, "violin", context_windows=4,
                              margin_frames=MARGIN).process(wav)
    assert out16.dtype == np.float32
    assert np.isfinite(out16).all()
    out32 = StreamingTransfer(pipe, "violin", context_windows=4,
                              margin_frames=MARGIN).process(wav)
    # same seed -> same f32 params; bf16 rounds the forward only
    rel = np.linalg.norm(out16 - out32) / (np.linalg.norm(out32) + 1e-12)
    assert rel < 0.2, rel
