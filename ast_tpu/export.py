"""AOT deployment artifacts: serialize the fused transfer program with
`jax.export`, run it without any model code.

The reference has no deployment story — inference requires the full model
source tree plus a torch checkpoint wired together by hand in each driver
(SURVEY.md §1 L5; evaluation_style_transfer.py:214-252). Here the whole
fused pipeline (STFT+CQT featurize -> content encoder -> AR decode -> OLA ->
ISTFT) is AOT-lowered to serialized StableHLO, one program per length
bucket, alongside a flat params archive:

    export_pipeline(pipe, "artifact/")          # on the build host
    exp = load_exported("artifact/")            # on the serving host
    out = exp.transfer(waveform, "violin")

The serving host needs jax + numpy only — no flax, no ast_tpu model modules
(`tests/test_export.py` asserts flax is never imported on the load path).
Normalization stats and all config constants are baked into the exported
program; the artifact is self-contained and versioned. With
`batch_sizes=(1, 4, 16)` the batched serving cores are exported too, and the
HTTP daemon serves the artifact directly (`ast-tpu-serve --artifact DIR`)
with dynamic request batching; `wire="pcm16"` bakes the compressed
host<->device transport into the program I/O. CLI: scripts/export.py.

Platform note: an exported program replays on the platform(s) it was lowered
for. By default the current backend is used (export on the TPU host for TPU
serving); pass `platforms=("cpu", "tpu")` for a dual-platform artifact —
platform-dependent fast-path choices (DFT-as-matmul vs FFT, Pallas OLA) are
resolved at trace time, so dual-platform artifacts bake the trace host's
choices for both platforms (numerics identical, speed tuned to the trace
host).
"""

from __future__ import annotations

import json
import os
import types
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ast_tpu.streamcore import (
    StreamGeometry,
    StreamSession,
    StreamState,
    initial_state_np,
)
from ast_tpu.wire import wire_decode_np, wire_dtype, wire_encode_np

FORMAT_VERSION = 1
_MANIFEST = "manifest.json"
_PARAMS = "params.npz"


# --------------------------------------------------------------------------
# pytree <-> flat-npz (flax variable collections are nested dicts of arrays)


def _flatten(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


# --------------------------------------------------------------------------
# export


def export_pipeline(
    pipe,
    path: str,
    bucket_seconds: Optional[Sequence[float]] = None,
    platforms: Optional[Sequence[str]] = None,
    batch_sizes: Sequence[int] = (1,),
    wire: str = "f32",
    stream_contexts: Sequence[int] = (),
    stream_margin: Optional[int] = None,
) -> str:
    """AOT-export `pipe`'s fused transfer cores.

    One serialized program per (length bucket, batch size) — waveforms are
    zero-padded up to the bucket at serve time, exactly like
    `transfer_any_length`, and batch sizes > 1 export the batched core so the
    HTTP daemon's dynamic batcher can coalesce requests against the artifact.
    `wire` bakes the host<->device transport ("f32"/"pcm16"/"mulaw8") into
    the programs' I/O dtypes. Also writes the folded inference params.

    `stream_contexts` additionally exports the LIVE-streaming per-window step
    (eval/streaming.py) for those model-context sizes K, making the artifact
    answer `/stream` on a model-code-free host (`ExportedPipeline.
    stream_session`). The streaming step is one fixed-shape program per
    window — exactly what jax.export is good at; wire does not apply to it
    (streams carry float PCM). Returns `path`.
    """
    import jax
    from jax import export as jexport

    from ast_tpu.eval.inference import NAME_TO_ID

    a = pipe.cfg.audio
    if bucket_seconds is None:
        bucket_seconds = (a.clip_seconds,)
    buckets = sorted({max(1, int(round(s * a.sample_rate)))
                      for s in bucket_seconds})
    rungs = sorted({int(b) for b in batch_sizes})
    if not rungs or rungs[0] < 1:
        raise ValueError(f"batch_sizes must be >= 1, got {batch_sizes}")
    wdt = wire_dtype(wire)
    overlap = int(a.eval_overlap_frames)

    content_vars = jax.tree.map(np.asarray, pipe.content_vars_infer)
    decoder_vars = jax.tree.map(np.asarray, pipe.decoder_vars)
    class_emb = np.asarray(pipe.class_embeddings)

    os.makedirs(path, exist_ok=True)
    core = pipe._build_core(mesh=None)
    # Pallas custom calls would serialize as opaque platform-pinned blobs;
    # the batched core is exported with the plain XLA block0 path.
    batch_core = (pipe._build_batch_core(allow_fused_block0=False)
                  if any(b > 1 for b in rungs) else None)

    def specs(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            tree)

    entries = []
    for n in buckets:
        for b in rungs:
            if b == 1:
                def fn(cv, dv, ce, waveform, target_id, _n=n):
                    return core(waveform, ce, target_id, cv, dv,
                                n_samples=_n, overlap=overlap, out_wire=wire)

                in_specs = (jax.ShapeDtypeStruct((n,), wdt),
                            jax.ShapeDtypeStruct((), np.int32))
                fname = f"transfer_{n}.jaxexp"
            else:
                def fn(cv, dv, ce, waveforms, target_ids, _n=n):
                    return batch_core(waveforms, ce, target_ids, cv, dv,
                                      n_samples=_n, overlap=overlap,
                                      out_wire=wire)

                in_specs = (jax.ShapeDtypeStruct((b, n), wdt),
                            jax.ShapeDtypeStruct((b,), np.int32))
                fname = f"transfer_{n}_b{b}.jaxexp"
            exp = jexport.export(
                jax.jit(fn),
                platforms=tuple(platforms) if platforms else None,
            )(specs(content_vars), specs(decoder_vars), specs(class_emb),
              *in_specs)
            with open(os.path.join(path, fname), "wb") as f:
                f.write(exp.serialize())
            entries.append({"n_samples": n, "batch": b, "file": fname})

    flat = {}
    flat.update({f"content/{k}": v
                 for k, v in _flatten(content_vars).items()})
    flat.update({f"decoder/{k}": v
                 for k, v in _flatten(decoder_vars).items()})
    flat["class_embeddings"] = class_emb

    stream_manifest = None
    if stream_contexts:
        from ast_tpu.eval.streaming import _build_stream_step_fn, resolve_margin
        from ast_tpu.models import Decoder

        m = pipe.cfg.model
        margin = resolve_margin(pipe.cfg, stream_margin)
        chunk_len = (a.window_size + 2 * margin - 1) * a.hop_length
        start = np.asarray(pipe.decoder.apply(
            pipe.decoder_vars, 1, method=Decoder.start_tokens))[0, 0]
        flat["stream_start_token"] = start

        programs = []
        for K in sorted({int(k) for k in stream_contexts}):
            fn = _build_stream_step_fn(pipe, K, margin)

            # state travels as a plain dict: jax.export treedefs for custom
            # NamedTuples don't survive deserialization on a host that never
            # registered them
            def sfn(cv, dv, ce, chunk, state, target_id, n_valid, _fn=fn):
                st = StreamState(**state)
                new_state, emit = _fn(chunk, st, ce, target_id, cv, dv,
                                      n_valid)
                return dict(new_state._asdict()), emit

            init = initial_state_np(K, m.d_model, overlap, a.stft_bins,
                                    a.n_fft, a.hop_length, start)
            exp = jexport.export(
                jax.jit(sfn),
                platforms=tuple(platforms) if platforms else None,
            )(specs(content_vars), specs(decoder_vars), specs(class_emb),
              jax.ShapeDtypeStruct((chunk_len,), np.float32),
              specs(dict(init._asdict())),
              jax.ShapeDtypeStruct((), np.int32),
              jax.ShapeDtypeStruct((), np.int32))
            fname = f"stream_K{K}.jaxexp"
            with open(os.path.join(path, fname), "wb") as f:
                f.write(exp.serialize())
            programs.append({"context_windows": K, "file": fname})
        stream_manifest = {
            "margin": margin,
            "window_size": a.window_size,
            "overlap": overlap,
            "n_fft": a.n_fft,
            "stft_bins": a.stft_bins,
            "d_model": m.d_model,
            "max_len": m.max_len,
            "programs": programs,
        }

    np.savez(os.path.join(path, _PARAMS), **flat)

    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "sample_rate": a.sample_rate,
        "hop_length": a.hop_length,
        "overlap_frames": overlap,
        "wire": wire,
        "targets": dict(NAME_TO_ID),
        "buckets": entries,
    }
    if stream_manifest is not None:
        manifest["stream"] = stream_manifest
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


# --------------------------------------------------------------------------
# load + run (jax + numpy only; no flax, no model code)


class ExportedPipeline:
    """Run an exported transfer artifact. Deserialized programs are cached
    per (bucket, batch); `transfer` pads the waveform to the smallest fitting
    bucket and trims the output back (same semantics as
    StyleTransferPipeline.transfer_any_length).

    Duck-types the narrow interface `ast_tpu.serve.TransferServer` needs
    (`cfg.audio.{sample_rate,hop_length}`, `process_audio`,
    `process_audio_batch`, `targets`) so the HTTP daemon can serve straight
    from the artifact on a model-code-free host (`ast-tpu-serve --artifact`).
    Artifacts exported with `stream_contexts` also carry the incremental
    per-window step and answer live PCM streaming via `stream_session`;
    artifacts without it report `supports_streaming = False` (the daemon's
    501 path)."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} is newer "
                f"than supported {FORMAT_VERSION}")
        with np.load(os.path.join(path, _PARAMS)) as z:
            flat = {k: z[k] for k in z.files}
        self._content = _unflatten(
            {k[len("content/"):]: v for k, v in flat.items()
             if k.startswith("content/")})
        self._decoder = _unflatten(
            {k[len("decoder/"):]: v for k, v in flat.items()
             if k.startswith("decoder/")})
        self._class_emb = flat["class_embeddings"]
        self._stream_start = flat.get("stream_start_token")
        self.targets: Dict[str, int] = self.manifest["targets"]
        self.wire: str = self.manifest.get("wire", "f32")
        self._files = {(e["n_samples"], e.get("batch", 1)): e["file"]
                       for e in self.manifest["buckets"]}
        self.buckets: Tuple[int, ...] = tuple(sorted(
            {n for n, b in self._files if b == 1}))
        # minimal cfg shim for the HTTP daemon (bucket padding + wav I/O)
        self.cfg = types.SimpleNamespace(audio=types.SimpleNamespace(
            sample_rate=self.manifest["sample_rate"],
            hop_length=self.manifest["hop_length"]))
        self._calls: dict = {}

    def batch_rungs(self, n_samples: Optional[int] = None) -> Tuple[int, ...]:
        """Exported batch sizes (for a bucket, or across the artifact)."""
        return tuple(sorted({b for n, b in self._files
                             if n_samples is None or n == n_samples}))

    def _call(self, n_samples: int, batch: int = 1):
        key = (n_samples, batch)
        if key not in self._calls:
            import jax
            from jax import export as jexport

            with open(os.path.join(self.path, self._files[key]), "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            self._calls[key] = jax.jit(exp.call)
        return self._calls[key]

    def _check_wire(self, wire: Optional[str]) -> str:
        if wire is not None and wire != self.wire:
            raise ValueError(
                f"artifact was exported with wire={self.wire!r}; cannot "
                f"serve wire={wire!r} (re-export with wire={wire!r})")
        return self.wire

    def process_audio(self, waveform: np.ndarray, target_class_id: int,
                      wire: Optional[str] = None) -> np.ndarray:
        """Transfer a waveform no longer than the largest bucket; returns the
        float istft-length output for the padded bucket (like process_audio
        on a padded clip)."""
        w = self._check_wire(wire)
        wav = wire_decode_np(np.asarray(waveform)).reshape(-1)
        fitting = [b for b in self.buckets if b >= len(wav)]
        if not fitting:
            raise ValueError(
                f"waveform of {len(wav)} samples exceeds the largest exported "
                f"bucket ({max(self.buckets)}); re-export with a larger one")
        n = min(fitting)
        padded = wire_encode_np(
            np.pad(wav.astype(np.float32), (0, n - len(wav))), w)
        out = self._call(n)(self._content, self._decoder, self._class_emb,
                            padded, np.int32(target_class_id))
        return wire_decode_np(np.asarray(out))

    def process_audio_batch(self, waveforms: np.ndarray, target_class_ids,
                            wire: Optional[str] = None) -> np.ndarray:
        """Transfer a (B, n) batch in one device call. n must be an exported
        bucket; B rounds up to the smallest exported batch rung (rows are
        zero-padded and trimmed back). Returns float waveforms."""
        w = self._check_wire(wire)
        arr = wire_encode_np(np.asarray(waveforms), w)
        if arr.ndim != 2:
            raise ValueError(f"expected (B, n) batch, got shape {arr.shape}")
        B, n = arr.shape
        rungs = [b for b in self.batch_rungs(n) if b >= B]
        if (n, 1) not in self._files and not rungs:
            raise ValueError(
                f"no exported program for bucket {n}; available buckets "
                f"{self.buckets}")
        if not rungs:
            raise ValueError(
                f"batch {B} exceeds the largest exported rung "
                f"{max(self.batch_rungs(n))} for bucket {n}; re-export with "
                f"a larger batch size")
        b = min(rungs)
        if b == 1 and B == 1:
            return self.process_audio(arr[0], int(np.asarray(
                target_class_ids).reshape(-1)[0]), wire=wire)[None]
        padded = np.zeros((b, n), arr.dtype)
        padded[:B] = arr
        ids = np.zeros(b, np.int32)
        ids[:B] = np.asarray(target_class_ids, np.int32).reshape(-1)
        out = self._call(n, b)(self._content, self._decoder, self._class_emb,
                               padded, ids)
        return wire_decode_np(np.asarray(out)[:B])

    # ---- live streaming from the artifact (stream_contexts exports) ----

    @property
    def supports_streaming(self) -> bool:
        return "stream" in self.manifest

    def stream_session(self, target, context: Optional[int] = None,
                       margin: Optional[int] = None) -> StreamSession:
        """A push/flush live-stream session backed by the artifact's
        jax.export'd per-window step (same host machinery as the pipeline-
        backed `eval.streaming.StreamingTransfer` — ast_tpu.streamcore)."""
        sm = self.manifest.get("stream")
        if not sm:
            raise NotImplementedError(
                "live streaming needs the incremental model step; this "
                "artifact was exported without one — re-export with "
                "stream contexts (scripts/export.py --stream-context) or "
                "serve from a checkpoint for /stream")
        if margin is not None and int(margin) != sm["margin"]:
            raise ValueError(
                f"artifact stream programs bake margin={sm['margin']}; "
                f"cannot stream margin={margin} (re-export with "
                f"--stream-margin {margin})")
        by_k = {e["context_windows"]: e["file"] for e in sm["programs"]}
        if context is None:
            k = 8 if 8 in by_k else sorted(by_k)[0]
        else:
            k = int(context)
        if k not in by_k:
            raise ValueError(
                f"no exported stream program for context {k}; available "
                f"{sorted(by_k)} (re-export with --stream-context {k})")

        key = ("stream", k)
        if key not in self._calls:
            import jax
            from jax import export as jexport

            with open(os.path.join(self.path, by_k[k]), "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            self._calls[key] = jax.jit(exp.call)
        call = self._calls[key]
        content, decoder, ce = self._content, self._decoder, self._class_emb

        def runner(chunk, state: StreamState, target_id, n_valid):
            new_state, emit = call(content, decoder, ce,
                                   np.asarray(chunk, np.float32),
                                   dict(state._asdict()),
                                   np.int32(target_id), np.int32(n_valid))
            return StreamState(**new_state), emit

        geometry = StreamGeometry(
            sample_rate=self.manifest["sample_rate"],
            hop=self.manifest["hop_length"], n_fft=sm["n_fft"],
            window_size=sm["window_size"], overlap=sm["overlap"],
            margin=sm["margin"], context_windows=k, max_len=sm["max_len"])
        init = initial_state_np(k, sm["d_model"], sm["overlap"],
                                sm["stft_bins"], sm["n_fft"],
                                self.manifest["hop_length"],
                                self._stream_start)
        tid = (self.targets[target] if isinstance(target, str)
               else int(target))
        return StreamSession(geometry, init, runner, tid)

    def transfer(self, waveform: np.ndarray, target: str) -> np.ndarray:
        """transfer(waveform, 'violin'|'piano') -> waveform, trimmed to the
        unpadded clip's istft length."""
        wav = np.asarray(waveform, np.float32).reshape(-1)
        out = self.process_audio(wav, self.targets[target])
        hop = self.manifest["hop_length"]
        return out[: hop * (len(wav) // hop)]


def load_exported(path: str) -> ExportedPipeline:
    return ExportedPipeline(path)
