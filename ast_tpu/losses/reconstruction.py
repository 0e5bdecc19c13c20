"""Five-term complex-spectrogram reconstruction loss.

Capability-parity rebuild of `compute_comprehensive_loss`, which the
reference duplicates in both decoder files
(reference: SimpleDecoder_TransformerOnly.py:138-210 == new_decoder.py:348-420
except mse weight 1.0 vs 2.0 — here a single implementation with the weight in
LossWeights). All five terms are elementwise/reduction ops that XLA fuses into
a handful of kernels."""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

from ast_tpu.config import LossWeights


def compute_comprehensive_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    weights: LossWeights = LossWeights(),
) -> Dict[str, jnp.ndarray]:
    """output/target: (B, S, 2, F, T) packed complex spectrogram windows.

    Returns a dict of total + components, mirroring the reference's return."""
    mse_loss = jnp.mean((output - target) ** 2)

    mag_out = jnp.sqrt(output[:, :, 0] ** 2 + output[:, :, 1] ** 2 + 1e-8)
    mag_tgt = jnp.sqrt(target[:, :, 0] ** 2 + target[:, :, 1] ** 2 + 1e-8)
    mag_loss = jnp.mean((mag_out - mag_tgt) ** 2)

    phase_out = jnp.arctan2(output[:, :, 1], output[:, :, 0])
    phase_tgt = jnp.arctan2(target[:, :, 1], target[:, :, 0])
    phase_diff = jnp.remainder(phase_out - phase_tgt + math.pi, 2 * math.pi) - math.pi
    phase_loss = jnp.mean(phase_diff ** 2)

    S = output.shape[1]
    if S > 1:
        temporal_loss = jnp.mean(
            ((output[:, 1:] - output[:, :-1]) - (target[:, 1:] - target[:, :-1])) ** 2)
    else:
        temporal_loss = jnp.asarray(0.0, output.dtype)

    spectral_loss = jnp.mean(
        ((output[:, :, :, 1:, :] - output[:, :, :, :-1, :])
         - (target[:, :, :, 1:, :] - target[:, :, :, :-1, :])) ** 2)

    total = (
        weights.mse * mse_loss
        + weights.magnitude * mag_loss
        + weights.phase * phase_loss
        + weights.temporal * temporal_loss
        + weights.spectral * spectral_loss
    )
    return {
        "total_loss": total,
        "mse_loss": mse_loss,
        "mag_loss": mag_loss,
        "phase_loss": phase_loss,
        "temporal_loss": temporal_loss,
        "spectral_loss": spectral_loss,
    }
