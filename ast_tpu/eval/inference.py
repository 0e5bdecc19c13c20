"""End-to-end style-transfer inference: waveform in, waveform out.

TPU-native rebuild of the reference's north-star path
(reference: evaluation_style_transfer.py:135-159 `process_audio`): the whole
chain STFT -> CQT -> concat -> windows -> ContentEncoder -> prototype ->
autoregressive decode -> overlap-average -> ISTFT compiles into ONE XLA
program per clip-length bucket and never leaves the device. The reference
instead hops host->device->host twice (librosa CQT on CPU, final istft on
CPU) and re-runs its decoder O(S^2).

Faithful reference behaviors preserved:
  * inference features are NOT normalized with the training stats
    (process_audio applies no stats — quirk documented in SURVEY.md)
  * eval-side overlap is int(287*0.3)=86, not the training-side 96
    (evaluation_style_transfer.py:27)
  * conditioning uses the target-class prototype only (quirk #5)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.config import Config, DEFAULT_CONFIG
from ast_tpu.dsp.cqt import cqt_ri
from ast_tpu.dsp.stft import istft_ri, stft_ri
from ast_tpu.dsp.windows import concat_stft_cqt, get_overlap_windows, sections2spectrogram
from ast_tpu.models import ContentEncoder, Decoder, StyleEncoder, autoregressive_decode
from ast_tpu.ops.pallas_block0 import fused_block0_active

ID_TO_NAME = {0: "piano", 1: "violin"}
NAME_TO_ID = {"piano": 0, "violin": 1}

# ---------------------------------------------------------------------------
# wire formats for host<->device waveform transport. The relay link (not
# device compute) bounds serving throughput, so bytes on the wire ARE the
# latency: f32 = 4 B/sample (lossless), pcm16 = 2 B/sample (lossless when the
# endpoints are 16-bit PCM anyway — the serving default), mulaw8 = 1 B/sample
# (G.711-style companding, ~38 dB SNR: opt-in, quality tradeoff). The
# host-side numpy codecs live in ast_tpu/wire.py (shared with the
# model-code-free export path); only the device-side jnp twins live here.

from ast_tpu.wire import (MU as _MU,  # noqa: E402 — host codecs, re-exported
                          mulaw_decode_np, mulaw_encode_np,
                          wire_decode_np as _wire_decode_np,
                          wire_encode_np as _wire_encode_np)


def _wire_decode_jnp(w: jnp.ndarray) -> jnp.ndarray:
    """Device-side ingest: int16 pcm / uint8 mu-law / float32 passthrough."""
    if w.dtype == jnp.int16:
        return w.astype(jnp.float32) / 32768.0
    if w.dtype == jnp.uint8:
        v = w.astype(jnp.float32) / 127.5 - 1.0
        return jnp.sign(v) * (jnp.power(1.0 + _MU, jnp.abs(v)) - 1.0) / _MU
    return w


def _wire_encode_jnp(x: jnp.ndarray, wire: str) -> jnp.ndarray:
    """Device-side egress in the requested wire format."""
    if wire == "pcm16":
        return jnp.clip(jnp.round(x * 32768.0), -32768, 32767).astype(jnp.int16)
    if wire == "mulaw8":
        xc = jnp.clip(x, -1.0, 1.0)
        v = jnp.sign(xc) * jnp.log1p(_MU * jnp.abs(xc)) / jnp.log(1.0 + _MU)
        return jnp.clip(jnp.round((v + 1.0) * 127.5), 0, 255).astype(jnp.uint8)
    return x


def _preset_stats(cfg: Config):
    """Stats implied by the config preset: None when faithful (the reference
    never normalizes at inference); the packaged unified training stats when
    cfg.faithful is False (Config.unfaithful() — quirk-fix preset). Returns
    None with a warning when the feature size doesn't match the packaged
    artifacts (non-default AudioConfig)."""
    if cfg.faithful:
        return None
    import os

    from ast_tpu.dsp.norm import FeatureStats, packaged_stats_dir

    path = os.path.join(packaged_stats_dir(), "stats_unified_stft_cqt.npz")
    if not os.path.exists(path):
        return None
    stats = FeatureStats.from_npz(path)
    if (stats.stft_mean.shape[1] != cfg.audio.stft_bins
            or stats.cqt_mean.shape[1] != cfg.audio.cqt_bins):
        print("Warning: packaged stats do not match this AudioConfig; "
              "inference normalization disabled despite faithful=False.")
        return None
    return stats


@dataclasses.dataclass
class StyleTransferPipeline:
    """Bundles the modules + trained variables + class prototypes.

    `stats` (optional FeatureStats) enables z-score normalization of the
    inference features with the training statistics. The reference NEVER
    normalizes at inference (quirk: process_audio applies no stats even
    though training normalized, evaluation_style_transfer.py:135-140);
    default None preserves that. A model trained on normalized features
    performs better with matching inference normalization — pass the target
    instrument's stats (or unified stats) to enable it."""

    cfg: Config
    content: ContentEncoder
    decoder: Decoder
    content_vars: Dict
    decoder_vars: Dict
    class_embeddings: jnp.ndarray  # (num_classes, d)
    stats: Optional[object] = None  # FeatureStats

    @functools.cached_property
    def content_infer(self) -> ContentEncoder:
        """Inference-mode content encoder: spectral norms folded into the
        kernels (sn_folded=True). Bit-identical outputs, but the 18 serial
        power-iteration matvec chains leave the per-call device program."""
        return ContentEncoder(self.cfg.model, sn_folded=True)

    @functools.cached_property
    def content_vars_infer(self) -> Dict:
        from ast_tpu.models.blocks import fold_spectral_norms

        return jax.jit(fold_spectral_norms)(self.content_vars)

    @classmethod
    def from_variables(cls, cfg: Config, content_vars, decoder_vars,
                       class_embeddings, codec: str = "linear", stats=None):
        return cls(
            cfg=cfg,
            content=ContentEncoder(cfg.model),
            decoder=Decoder(cfg.model, codec=codec),
            content_vars=content_vars,
            decoder_vars=decoder_vars,
            class_embeddings=jnp.asarray(class_embeddings),
            stats=stats if stats is not None else _preset_stats(cfg),
        )

    @classmethod
    def init_random(cls, cfg: Config = DEFAULT_CONFIG, seed: int = 0,
                    codec: str = "linear", sections: int = 5):
        """Random-weight pipeline — mirrors the reference eval's fallback to
        random init when checkpoints are absent
        (evaluation_reconstruction.py:264-278). Param shapes are independent
        of S, so init traces with S=1 (fastest compile)."""
        del sections  # param shapes don't depend on it
        m = cfg.model
        content = ContentEncoder(m)
        decoder = Decoder(m, codec=codec)
        x = jnp.zeros((1, 1, 2, m.window_size, m.feat_bins), m.jnp_dtype)
        seq = jnp.zeros((1, 1, m.d_model), m.jnp_dtype)
        emb = jnp.zeros((1, m.d_model), m.jnp_dtype)
        y = jnp.zeros((1, 1, 2, m.window_size, m.stft_bins), m.jnp_dtype)

        # ONE jitted init program, ON the accelerator: weights materialize in
        # device HBM directly. Host-side init + upload moves ~620 MB of
        # params through the host link (measured 5 min through the relay —
        # dwarfing the compile it saves); params never need to exist on host.
        @jax.jit
        def _init(key):
            k1, k2, k3 = jax.random.split(key, 3)
            return (content.init(k1, x), decoder.init(k2, seq, emb, y),
                    jax.random.normal(k3, (m.num_classes, m.d_model)))

        if jax.default_backend() == "cpu":
            content_vars, decoder_vars, class_embeddings = _init(
                jax.random.PRNGKey(seed))
        else:
            content_vars, decoder_vars, class_embeddings = _init(
                jax.device_put(jax.random.PRNGKey(seed), jax.devices()[0]))
        return cls(cfg, content, decoder, content_vars, decoder_vars,
                   class_embeddings, stats=_preset_stats(cfg))

    # ------------------------------------------------------------------

    def _disable_fused_block0(self, err: Exception) -> None:
        """Runtime fallback: if the fused Pallas block0 fails to compile or
        run on this backend (Mosaic lowering regressions are toolchain-
        version-dependent), permanently drop to the XLA conv path for this
        pipeline and invalidate the cached cores so the next call retraces
        without the kernel. Keeps serving/bench alive at the cost of speed."""
        import warnings

        warnings.warn(
            "fused block0 kernel failed on this backend "
            f"({type(err).__name__}: {str(err).splitlines()[0][:200]}); "
            "falling back to XLA convs for block0.")
        self._fb0_disabled = True
        for k in ("_jitted_core", "_jitted_batch_core"):
            self.__dict__.pop(k, None)

    def _fused_block0_wanted(self) -> bool:
        return (not getattr(self, "_fb0_disabled", False)
                and fused_block0_active(self.cfg.model))

    def _block0_hook(self, content_vars, sections, mesh=None):
        """Trace-time block0 fast-path selection (None = flax convs inside
        the encoder): "xla" folded rewrite or the "pallas" kernel, per
        ModelConfig.fused_block0 / block0_impl. Respects the runtime
        self-disable flag for the Pallas kernel."""
        from ast_tpu.ops.pallas_block0 import block0_impl

        impl = block0_impl(self.cfg.model, mesh)
        if impl == "pallas" and getattr(self, "_fb0_disabled", False):
            impl = "none"  # runtime self-disable: back to the flax convs
        if impl == "pallas":
            from ast_tpu.ops.pallas_block0 import content_block0

            return content_block0(content_vars, sections)
        if impl == "xla":
            from ast_tpu.ops.pallas_block0 import content_block0_xla

            return content_block0_xla(content_vars, sections)
        return None

    def _call_with_fused_fallback(self, core_attr: str, *args, **kwargs):
        """Invoke a cached jitted core; on failure with the fused block0
        active, rebuild without it and retry once."""
        try:
            return getattr(self, core_attr)(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — compile errors vary by backend
            if not self._fused_block0_wanted():
                raise
            self._disable_fused_block0(e)
            return getattr(self, core_attr)(*args, **kwargs)

    def _build_core(self, mesh=None):
        """Single-clip fused core. With a mesh, the window axis S is sharded
        across the mesh's "data" axis between two GSPMD sharding constraints
        — sequence parallelism for long clips: the per-window CNN (the bulk
        of encoder FLOPs at minute scale) runs partitioned, XLA inserts the
        all-gather where the transformer attends over the full sequence, and
        the (tiny) AR decode + OLA run replicated."""
        cfg = self.cfg

        @functools.partial(jax.jit,
                           static_argnames=("n_samples", "overlap", "out_wire"))
        def core(waveform, class_embeddings, target_class_id, content_vars,
                 decoder_vars, n_samples: int, overlap: int,
                 out_wire: str = "f32"):
            a = cfg.audio
            waveform = _wire_decode_jnp(waveform)  # pcm16/mulaw8 wire (serving)
            s = stft_ri(waveform, n_fft=a.n_fft, hop_length=a.hop_length,
                        method=a.stft_method, precision=a.dft_precision)
            c = cqt_ri(waveform, sr=a.sample_rate, n_bins=a.cqt_bins,
                       hop_length=a.hop_length, algorithm=a.cqt_algorithm,
                       sparsity=a.cqt_sparsity, transform=a.cqt_transform,
                       precision=a.dft_precision,
                       bins_per_octave=a.cqt_bins_per_octave, fmin=a.cqt_fmin,
                       filter_scale=a.cqt_filter_scale)
            if self.stats is not None:  # opt-in; reference never normalizes
                from ast_tpu.dsp.norm import normalize

                s = normalize(s, jnp.asarray(self.stats.stft_mean),
                              jnp.asarray(self.stats.stft_std))
                c = normalize(c, jnp.asarray(self.stats.cqt_mean),
                              jnp.asarray(self.stats.cqt_std))
            feats = concat_stft_cqt(s, c)
            sections = get_overlap_windows(
                feats, window_size=a.window_size, overlap_frames=overlap)
            S = sections.shape[0]

            batched = sections[None]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batched = jax.lax.with_sharding_constraint(
                    batched, NamedSharding(mesh, P(None, "data")))
            b0 = self._block0_hook(content_vars, batched, mesh=mesh)
            content_emb = self.content_infer.apply(content_vars, batched,
                                                   block0_out=b0)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                content_emb = jax.lax.with_sharding_constraint(
                    content_emb, NamedSharding(mesh, P()))
            class_emb = class_embeddings[target_class_id][None]  # (1, d)
            out = autoregressive_decode(self.decoder, decoder_vars,
                                        content_emb, class_emb, S)  # (1,S,2,W,513)

            T = feats.shape[1]
            full = sections2spectrogram(out[0], T, overlap)
            wav_out = istft_ri(full, n_fft=a.n_fft, hop_length=a.hop_length,
                               method=a.stft_method,
                               precision=a.dft_precision)
            return _wire_encode_jnp(wav_out, out_wire)

        return core

    @functools.cached_property
    def _jitted_core(self):
        return self._build_core(mesh=None)

    @functools.cached_property
    def _sp_cores(self):
        return {}

    def _jitted_sp_core(self, mesh):
        if mesh not in self._sp_cores:
            self._sp_cores[mesh] = self._build_core(mesh=mesh)
        return self._sp_cores[mesh]

    def process_audio_sp(self, waveform, target_class_id: int, mesh=None,
                         overlap: Optional[int] = None) -> np.ndarray:
        """Sequence-parallel single-clip transfer over a device mesh.

        Shards the window axis S of one (long) clip across the mesh's "data"
        axis — the multi-chip path for minute-scale audio where S reaches
        the hundreds (the batch-parallel serving path shards clips, this
        shards WITHIN a clip). Numerically identical to process_audio
        (capability extension; the reference is strictly single-device,
        SURVEY.md §2.3)."""
        from ast_tpu.parallel import make_mesh

        mesh = make_mesh() if mesh is None else mesh
        wav = jnp.asarray(np.asarray(waveform, np.float32))
        out = self._jitted_sp_core(mesh)(
            wav, self.class_embeddings, jnp.asarray(target_class_id),
            self.content_vars_infer, self.decoder_vars,
            n_samples=int(wav.shape[-1]), overlap=int(
                self.cfg.audio.eval_overlap_frames if overlap is None
                else overlap))
        return np.asarray(out)

    @functools.cached_property
    def _jitted_batch_core(self):
        """Single-device batched transfer core (fused block0 eligible)."""
        return self._build_batch_core(allow_fused_block0=True)

    @functools.cached_property
    def _jitted_batch_core_sharded(self):
        """Batched core for GSPMD-sharded inputs: identical math, but the
        pallas block0 stays off (GSPMD cannot partition a custom kernel)."""
        return self._build_batch_core(allow_fused_block0=False)

    def _build_batch_core(self, allow_fused_block0: bool):
        """Batched transfer: (B, n) waveforms + (B,) target ids in ONE device
        program — amortizes host<->device round trips for serving.

        Waveforms may arrive as int16 PCM (the serving wire format — halves
        host<->device bytes); conversion to/from float happens on device."""
        cfg = self.cfg

        @functools.partial(jax.jit,
                           static_argnames=("n_samples", "overlap", "out_wire"))
        def batch_core(waveforms, class_embeddings, target_ids, content_vars,
                       decoder_vars, n_samples: int, overlap: int,
                       out_wire: str = "f32"):
            a = cfg.audio
            waveforms = _wire_decode_jnp(waveforms)

            def featurize(w):
                s = stft_ri(w, n_fft=a.n_fft, hop_length=a.hop_length,
                            method=a.stft_method, precision=a.dft_precision)
                c = cqt_ri(w, sr=a.sample_rate, n_bins=a.cqt_bins,
                           hop_length=a.hop_length, algorithm=a.cqt_algorithm,
                           sparsity=a.cqt_sparsity, transform=a.cqt_transform,
                           precision=a.dft_precision,
                           bins_per_octave=a.cqt_bins_per_octave,
                           fmin=a.cqt_fmin, filter_scale=a.cqt_filter_scale)
                if self.stats is not None:  # opt-in; reference never normalizes
                    from ast_tpu.dsp.norm import normalize

                    s = normalize(s, jnp.asarray(self.stats.stft_mean),
                                  jnp.asarray(self.stats.stft_std))
                    c = normalize(c, jnp.asarray(self.stats.cqt_mean),
                                  jnp.asarray(self.stats.cqt_std))
                feats = concat_stft_cqt(s, c)
                return feats, get_overlap_windows(
                    feats, window_size=a.window_size, overlap_frames=overlap)

            feats, sections = jax.vmap(featurize)(waveforms)  # (B,2,T,F), (B,S,...)
            S = sections.shape[1]
            b0 = (self._block0_hook(content_vars, sections)
                  if allow_fused_block0 else None)
            content_emb = self.content_infer.apply(content_vars, sections,
                                                   block0_out=b0)  # (B,S,d)
            class_emb = class_embeddings[target_ids]  # (B, d)
            out = autoregressive_decode(self.decoder, decoder_vars,
                                        content_emb, class_emb, S)

            T = feats.shape[2]

            def invert(windows):
                full = sections2spectrogram(windows, T, overlap)
                return istft_ri(full, n_fft=a.n_fft,
                                hop_length=a.hop_length,
                                method=a.stft_method,
                                precision=a.dft_precision)

            wavs_out = jax.vmap(invert)(out)
            return _wire_encode_jnp(wavs_out, out_wire)

        return batch_core

    def process_audio_batch(self, waveforms, target_class_ids,
                            overlap: Optional[int] = None,
                            pcm16_wire: bool = False,
                            wire: Optional[str] = None) -> np.ndarray:
        """Transfer a batch of equal-length clips in one device call.

        `wire` selects the host<->device transport: "f32" (default,
        lossless), "pcm16" (2 B/sample, lossless vs 16-bit PCM endpoints) or
        "mulaw8" (1 B/sample, ~38 dB SNR companding — opt-in quality
        tradeoff for link-bound serving). pcm16_wire=True is the legacy
        spelling of wire="pcm16". Accepts float [-1,1] or already-encoded
        int16/uint8 input either way; always returns float."""
        wire = wire or ("pcm16" if pcm16_wire else "f32")
        overlap = self.cfg.audio.eval_overlap_frames if overlap is None else overlap
        arr = _wire_encode_np(np.asarray(waveforms), wire)
        wavs = jnp.asarray(arr)
        out = self._call_with_fused_fallback(
            "_jitted_batch_core",
            wavs, self.class_embeddings, jnp.asarray(target_class_ids),
            self.content_vars_infer, self.decoder_vars,
            n_samples=int(wavs.shape[-1]), overlap=int(overlap),
            out_wire=wire)
        return _wire_decode_np(np.asarray(out))

    def process_audio_batch_sharded(self, waveforms, target_class_ids,
                                    mesh=None, overlap: Optional[int] = None,
                                    pcm16_wire: bool = False,
                                    wire: Optional[str] = None,
                                    tensor_parallel: bool = False) -> np.ndarray:
        """Data-parallel batched transfer over a device mesh.

        Shards the clip batch on the mesh's "data" axis and replicates the
        model (optionally sharding the decoder frame-codec projections on
        "model" with tensor_parallel=True); XLA partitions the whole fused
        transfer program across chips — the serving-side counterpart of the
        dp training path (capability extension of
        evaluation_style_transfer.py:135-159, SURVEY.md §2.3; the reference
        is strictly single-device). Batches that don't divide the data-axis
        size are zero-padded and trimmed back."""
        from ast_tpu.parallel import (batch_sharding, make_mesh, replicated,
                                      shard_variables)

        mesh = make_mesh() if mesh is None else mesh
        n_data = mesh.shape["data"]
        wire = wire or ("pcm16" if pcm16_wire else "f32")
        overlap = self.cfg.audio.eval_overlap_frames if overlap is None else overlap

        arr = np.asarray(waveforms)
        ids = np.asarray(target_class_ids)
        B = arr.shape[0]
        pad = (-B) % n_data
        if pad:
            arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
            ids = np.concatenate([ids, np.zeros(pad, ids.dtype)])
        arr = _wire_encode_np(arr, wire)

        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        wavs = jax.device_put(jnp.asarray(arr), bsh)
        tids = jax.device_put(jnp.asarray(ids), bsh)
        content_vars = jax.tree.map(lambda l: jax.device_put(l, rep),
                                    self.content_vars_infer)
        decoder_vars = (shard_variables(self.decoder_vars, mesh)
                        if tensor_parallel else
                        jax.tree.map(lambda l: jax.device_put(l, rep),
                                     self.decoder_vars))
        class_emb = jax.device_put(self.class_embeddings, rep)

        out = self._jitted_batch_core_sharded(
            wavs, class_emb, tids, content_vars, decoder_vars,
            n_samples=int(wavs.shape[-1]), overlap=int(overlap),
            out_wire=wire)
        return _wire_decode_np(np.asarray(out)[:B])

    def transfer_stream(self, waveforms, target_class_ids,
                        batch_size: int = 16, depth: int = 3,
                        overlap: Optional[int] = None,
                        pcm16_wire: bool = True,
                        wire: Optional[str] = None):
        """Pipelined batched serving: yields transferred clips in order while
        keeping up to `depth` batches in flight.

        jax dispatch is asynchronous, so enqueuing batch i+1..i+depth before
        fetching batch i overlaps the host->device upload (the measured
        bottleneck on relay-attached chips: ~17 MB/s up vs ~250 clips/s of
        device compute) with device execution and the result download. The
        serving-throughput counterpart of the reference's strictly sequential
        per-clip loop (evaluation_style_transfer.py:309-340)."""
        wire_fmt = wire or ("pcm16" if pcm16_wire else "f32")
        overlap = self.cfg.audio.eval_overlap_frames if overlap is None else overlap
        wavs = np.asarray(waveforms)
        ids = np.asarray(target_class_ids)
        B = wavs.shape[0]

        def dispatch(lo: int, hi: int):
            arr = wavs[lo:hi]
            t = ids[lo:hi]
            pad = 0
            if hi - lo < batch_size:  # last partial batch: pad to the compiled shape
                pad = batch_size - (hi - lo)
                arr = np.concatenate(
                    [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
                t = np.concatenate([t, np.zeros(pad, t.dtype)])
            arr = _wire_encode_np(arr, wire_fmt)
            out = self._call_with_fused_fallback(
                "_jitted_batch_core",
                jnp.asarray(arr), self.class_embeddings, jnp.asarray(t),
                self.content_vars_infer, self.decoder_vars,
                n_samples=int(arr.shape[-1]), overlap=int(overlap),
                out_wire=wire_fmt)
            return out, hi - lo

        import collections

        inflight = collections.deque()
        next_lo = 0
        while next_lo < B or inflight:
            while next_lo < B and len(inflight) < depth:
                hi = min(next_lo + batch_size, B)
                inflight.append(dispatch(next_lo, hi))
                next_lo = hi
            out, n_valid = inflight.popleft()
            host = _wire_decode_np(np.asarray(out)[:n_valid])
            for clip in host:
                yield clip

    def process_audio(self, waveform, target_class_id: int,
                      overlap: Optional[int] = None,
                      pcm16_in: bool = False,
                      wire: Optional[str] = None) -> np.ndarray:
        """The reference process_audio equivalent: one fused on-device call.

        `wire` ("pcm16"/"mulaw8") ships the waveform compressed BOTH ways
        (link-bound serving); pcm16_in is the legacy input-only spelling.
        Always returns float."""
        overlap = self.cfg.audio.eval_overlap_frames if overlap is None else overlap
        arr = np.asarray(waveform).reshape(-1)
        in_wire = wire or ("pcm16" if pcm16_in else "f32")
        arr = _wire_encode_np(arr, in_wire)
        wav = jnp.asarray(arr)
        out = self._call_with_fused_fallback(
            "_jitted_core",
            wav, self.class_embeddings, jnp.asarray(target_class_id),
            self.content_vars_infer, self.decoder_vars,
            n_samples=int(wav.shape[0]), overlap=int(overlap),
            out_wire=wire or "f32")
        return _wire_decode_np(np.asarray(out))

    def transfer(self, waveform, target: str) -> np.ndarray:
        """transfer(waveform, 'violin'|'piano') -> waveform."""
        return self.process_audio(waveform, NAME_TO_ID[target])

    def transfer_any_length(self, waveform, target: str,
                            bucket_seconds: float = 5.0) -> np.ndarray:
        """Arbitrary-length transfer with static-shape bucketing.

        The reference handles arbitrary clip lengths with Python-dynamic
        shapes (SURVEY.md §5 'dynamic sequence handling'); under jit every
        distinct length would recompile, so the waveform is zero-padded up to
        the next bucket boundary (multiples of `bucket_seconds`) and the
        output is trimmed back — one compiled program per bucket, any length
        served."""
        wav = np.asarray(waveform, np.float32).reshape(-1)
        sr = self.cfg.audio.sample_rate
        bucket = max(1, int(bucket_seconds * sr))
        n = len(wav)
        padded_len = max(bucket, -(-n // bucket) * bucket)
        padded = np.pad(wav, (0, padded_len - n))
        out = self.process_audio(padded, NAME_TO_ID[target])
        # istft output length = hop * (T - 1); trim to the same for n
        hop = self.cfg.audio.hop_length
        out_len = hop * (n // hop)
        return out[:out_len]


def generate_class_embeddings(
    cfg: Config,
    style_vars: Dict,
    piano_sections: jnp.ndarray,
    violin_sections: jnp.ndarray,
) -> jnp.ndarray:
    """Bootstrap class prototypes from one sample per class, as the reference
    does from its first test batch (evaluation_style_transfer.py:39-75 —
    prototypes are not checkpointed, quirk #5). Returns (2, d)."""
    style = StyleEncoder(cfg.model)

    @jax.jit
    def protos(sv, piano, violin):
        _, piano_emb = style.apply(sv, piano[None], jnp.asarray([0]))
        _, violin_emb = style.apply(sv, violin[None], jnp.asarray([1]))
        return jnp.stack([piano_emb[0], violin_emb[1]], axis=0)

    return protos(style_vars, piano_sections, violin_sections)
