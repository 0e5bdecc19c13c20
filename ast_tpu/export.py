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
program; the artifact is self-contained and versioned.

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
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

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
) -> str:
    """AOT-export `pipe`'s fused single-clip transfer core.

    One serialized program per length bucket (waveform zero-padded up to the
    bucket at serve time, exactly like `transfer_any_length`), plus the
    folded inference params. Returns `path`.
    """
    import jax
    from jax import export as jexport

    from ast_tpu.eval.inference import NAME_TO_ID

    a = pipe.cfg.audio
    if bucket_seconds is None:
        bucket_seconds = (a.clip_seconds,)
    buckets = sorted({max(1, int(round(s * a.sample_rate)))
                      for s in bucket_seconds})
    overlap = int(a.eval_overlap_frames)

    content_vars = jax.tree.map(np.asarray, pipe.content_vars_infer)
    decoder_vars = jax.tree.map(np.asarray, pipe.decoder_vars)
    class_emb = np.asarray(pipe.class_embeddings)

    os.makedirs(path, exist_ok=True)
    core = pipe._build_core(mesh=None)

    def specs(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            tree)

    entries = []
    for n in buckets:
        def fn(cv, dv, ce, waveform, target_id, _n=n):
            return core(waveform, ce, target_id, cv, dv,
                        n_samples=_n, overlap=overlap, out_wire="f32")

        exp = jexport.export(
            jax.jit(fn),
            platforms=tuple(platforms) if platforms else None,
        )(specs(content_vars), specs(decoder_vars), specs(class_emb),
          jax.ShapeDtypeStruct((n,), np.float32),
          jax.ShapeDtypeStruct((), np.int32))
        fname = f"transfer_{n}.jaxexp"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(exp.serialize())
        entries.append({"n_samples": n, "file": fname})

    flat = {}
    flat.update({f"content/{k}": v
                 for k, v in _flatten(content_vars).items()})
    flat.update({f"decoder/{k}": v
                 for k, v in _flatten(decoder_vars).items()})
    flat["class_embeddings"] = class_emb
    np.savez(os.path.join(path, _PARAMS), **flat)

    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "sample_rate": a.sample_rate,
        "hop_length": a.hop_length,
        "overlap_frames": overlap,
        "targets": dict(NAME_TO_ID),
        "buckets": entries,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


# --------------------------------------------------------------------------
# load + run (jax + numpy only; no flax, no model code)


class ExportedPipeline:
    """Run an exported transfer artifact. Deserialized programs are cached
    per bucket; `transfer` pads the waveform to the smallest fitting bucket
    and trims the output back (same semantics as
    StyleTransferPipeline.transfer_any_length)."""

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
        self.targets: Dict[str, int] = self.manifest["targets"]
        self.buckets: Tuple[int, ...] = tuple(
            e["n_samples"] for e in self.manifest["buckets"])
        self._files = {e["n_samples"]: e["file"]
                       for e in self.manifest["buckets"]}
        self._calls: dict = {}

    def _call(self, n_samples: int):
        if n_samples not in self._calls:
            import jax
            from jax import export as jexport

            with open(os.path.join(self.path, self._files[n_samples]),
                      "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            self._calls[n_samples] = jax.jit(exp.call)
        return self._calls[n_samples]

    def process_audio(self, waveform: np.ndarray,
                      target_class_id: int) -> np.ndarray:
        """Transfer a waveform no longer than the largest bucket; returns the
        istft-length output for the padded bucket (like process_audio on a
        padded clip)."""
        wav = np.asarray(waveform, np.float32).reshape(-1)
        fitting = [b for b in self.buckets if b >= len(wav)]
        if not fitting:
            raise ValueError(
                f"waveform of {len(wav)} samples exceeds the largest exported "
                f"bucket ({max(self.buckets)}); re-export with a larger one")
        n = min(fitting)
        padded = np.pad(wav, (0, n - len(wav)))
        out = self._call(n)(self._content, self._decoder, self._class_emb,
                            padded, np.int32(target_class_id))
        return np.asarray(out)

    def transfer(self, waveform: np.ndarray, target: str) -> np.ndarray:
        """transfer(waveform, 'violin'|'piano') -> waveform, trimmed to the
        unpadded clip's istft length."""
        wav = np.asarray(waveform, np.float32).reshape(-1)
        out = self.process_audio(wav, self.targets[target])
        hop = self.manifest["hop_length"]
        return out[: hop * (len(wav) // hop)]


def load_exported(path: str) -> ExportedPipeline:
    return ExportedPipeline(path)
