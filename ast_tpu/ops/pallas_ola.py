"""Pallas TPU kernel: overlap-add of framed data.

Overlap-add is the core of both inverse-STFT reconstruction
(ast_tpu/dsp/stft.py istft; reference torch.istft internals) and spectrogram
window reassembly (ast_tpu/dsp/windows.py sections2spectrogram; reference
utilityFunctions.py:265-283). The jnp implementation lowers to a generic
scatter-add; this kernel instead tiles the OUTPUT on a grid aligned to the
hop, which turns every contribution into a statically-sliced VMEM read:

    out[i*hop : (i+1)*hop] = sum_k frames[i-k, k*hop : (k+1)*hop]

for k in [0, K) with K = ceil(window / hop) — no scatter, no atomics, each
output tile written exactly once. Frames are zero-padded to K*hop rows so
the k-th slice is static; out-of-range frame indices are masked with
jnp.where. Runs compiled on TPU and in interpreter mode elsewhere (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only import guard (CPU test environments)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _should_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


# The kernels keep the whole padded frame array resident in VMEM (one block).
# Past this size the XLA scatter path wins by not needing residency; the
# istft shape for a 10 s clip is ~3.5 MB, a ~3 min clip is the crossover.
VMEM_FALLBACK_BYTES = 64 * 1024 * 1024


def _ola_kernel(frames_ref, out_ref, *, hop: int, taps: int, n_frames: int):
    i = pl.program_id(0)
    acc = jnp.zeros_like(out_ref)  # (1, hop, F)
    for k in range(taps):  # static unroll, taps is tiny (2-4)
        s = i - k
        valid = jnp.logical_and(s >= 0, s < n_frames)
        s_safe = jnp.clip(s, 0, n_frames - 1)
        chunk = frames_ref[s_safe, k * hop : (k + 1) * hop, :][None]
        acc = acc + jnp.where(valid, chunk, 0.0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def overlap_add(frames: jnp.ndarray, hop: int,
                interpret: bool | None = None) -> jnp.ndarray:
    """(S, W, F) frames -> (hop*(S-1)+W, F) overlap-added output.

    Output is produced as (num_tiles, hop, F) blocks — the trailing (hop, F)
    block dims equal the array dims, which satisfies the Mosaic tiling rule
    for arbitrary hop/F — then flattened."""
    if interpret is None:
        interpret = _should_interpret()
    S, W, F = frames.shape
    taps = -(-W // hop)  # ceil
    out_len = hop * (S - 1) + W
    if S * taps * hop * F * frames.dtype.itemsize > VMEM_FALLBACK_BYTES:
        return overlap_add_reference(frames, hop)

    # pad frame rows to taps*hop (static slices) and output to a tile multiple
    padded = jnp.pad(frames, ((0, 0), (0, taps * hop - W), (0, 0)))
    num_tiles = S - 1 + taps

    out = pl.pallas_call(
        functools.partial(_ola_kernel, hop=hop, taps=taps, n_frames=S),
        out_shape=jax.ShapeDtypeStruct((num_tiles, hop, F), frames.dtype),
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((S, taps * hop, F), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, hop, F), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(padded)
    return out.reshape(num_tiles * hop, F)[:out_len]


_ROWS_PER_STEP = 8  # TPU sublane granule for the output block


def _ola_kernel_1d(frames_ref, out_ref, *, hop: int, taps: int, n_frames: int):
    pid = pl.program_id(0)
    rows = []
    for j in range(_ROWS_PER_STEP):
        i = pid * _ROWS_PER_STEP + j
        row = jnp.zeros((1, hop), out_ref.dtype)
        for k in range(taps):
            s = i - k
            valid = jnp.logical_and(s >= 0, s < n_frames)
            s_safe = jnp.clip(s, 0, n_frames - 1)
            chunk = frames_ref[s_safe, k * hop : (k + 1) * hop][None, :]
            row = row + jnp.where(valid, chunk, 0.0)
        rows.append(row)
    out_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def overlap_add_waveform(frames: jnp.ndarray, hop: int,
                         interpret: bool | None = None) -> jnp.ndarray:
    """(S, W) 1-D frames (e.g. irfft output) -> (hop*(S-1)+W,).

    Dedicated 2-D layout: the window dimension sits on the TPU lane axis
    (a trailing singleton would be padded to 128 lanes and blow VMEM);
    8 hop-tiles per grid step satisfy the sublane granule."""
    if interpret is None:
        interpret = _should_interpret()
    S, W = frames.shape
    taps = -(-W // hop)
    out_len = hop * (S - 1) + W
    if S * taps * hop * frames.dtype.itemsize > VMEM_FALLBACK_BYTES:
        return overlap_add_reference(frames[:, :, None], hop)[:, 0]
    padded = jnp.pad(frames, ((0, 0), (0, taps * hop - W)))
    num_tiles = S - 1 + taps
    num_steps = -(-num_tiles // _ROWS_PER_STEP)

    out = pl.pallas_call(
        functools.partial(_ola_kernel_1d, hop=hop, taps=taps, n_frames=S),
        out_shape=jax.ShapeDtypeStruct((num_steps * _ROWS_PER_STEP, hop),
                                       frames.dtype),
        grid=(num_steps,),
        in_specs=[pl.BlockSpec((S, taps * hop), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((_ROWS_PER_STEP, hop), lambda i: (i, 0)),
        interpret=interpret,
    )(padded)
    return out.reshape(-1)[:out_len]


def overlap_add_reference(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """jnp scatter-add formulation (the XLA path), for testing/benchmarks and
    as the large-input fallback. Indices are built on-device (a numpy index
    matrix would be embedded in the HLO — 100MB+ for minute-long clips)."""
    S, W, F = frames.shape
    out_len = hop * (S - 1) + W
    idx = (jnp.arange(S)[:, None] * hop + jnp.arange(W)[None, :]).reshape(-1)
    out = jnp.zeros((out_len, F), frames.dtype)
    return out.at[idx, :].add(frames.reshape(S * W, F))
