"""Host-side waveform wire codecs (numpy only).

The serving stack ships waveforms between host and device in a compact
"wire" format: "f32" (lossless float), "pcm16" (2 B/sample, lossless vs the
16-bit PCM request/response bodies) or "mulaw8" (1 B/sample, ~38 dB SNR
companding — an opt-in quality tradeoff for link-bound deployments). The
device-side jnp twins live in ast_tpu/eval/inference.py; this module is
deliberately dependency-light so the model-code-free deployment path
(ast_tpu/export.py) and the HTTP daemon can share one codec implementation.

Capability extension: the reference moves float tensors host<->device
implicitly via torch (SURVEY.md §2.3 — single-device, no serving stack).
"""

from __future__ import annotations

import numpy as np

MU = 255.0

WIRE_DTYPES = {"f32": np.float32, "pcm16": np.int16, "mulaw8": np.uint8}


def wire_dtype(wire: str) -> np.dtype:
    try:
        return np.dtype(WIRE_DTYPES[wire])
    except KeyError:
        raise ValueError(f"unknown wire format {wire!r}; "
                         f"expected one of {sorted(WIRE_DTYPES)}") from None


def mulaw_encode_np(x: np.ndarray) -> np.ndarray:
    """float [-1,1] -> uint8 mu-law code (G.711-style companding)."""
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    v = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
    return np.clip(np.round((v + 1.0) * 127.5), 0, 255).astype(np.uint8)


def mulaw_decode_np(u: np.ndarray) -> np.ndarray:
    """uint8 mu-law code -> float [-1,1]."""
    v = np.asarray(u, np.float32) / 127.5 - 1.0
    return (np.sign(v) * (np.power(1.0 + MU, np.abs(v)) - 1.0)
            / MU).astype(np.float32)


def wire_encode_np(x: np.ndarray, wire: str) -> np.ndarray:
    """Encode float samples into the wire format (already-encoded arrays of
    the right dtype pass through)."""
    if wire == "pcm16":
        if x.dtype == np.int16:
            return x
        return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    if wire == "mulaw8":
        return x if x.dtype == np.uint8 else mulaw_encode_np(x)
    return np.asarray(x, np.float32)


def wire_decode_np(x: np.ndarray) -> np.ndarray:
    """Decode a wire-format array back to float (floats pass through)."""
    if x.dtype == np.int16:
        return x.astype(np.float32) / 32768.0
    if x.dtype == np.uint8:
        return mulaw_decode_np(x)
    return x
