"""Content encoder: per-window DeepCNN -> transformer -> per-window content
sequence (no CLS token).

Capability-parity rebuild of the reference ContentEncoder
(reference: content_encoder.py:9-99): identical CNN recipe to the style
encoder (its own copy of the block stack in the reference; here the shared
DeepCNN module with its own parameters), Linear projection, sinusoidal PE,
LayerNorm, 4-layer post-norm transformer, returning the full (B, S, d)
sequence."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ast_tpu.config import ModelConfig
from ast_tpu.models.attention import TransformerEncoder
from ast_tpu.models.blocks import DeepCNN, SinusoidalPositionalEncoding


class ContentEncoder(nn.Module):
    cfg: ModelConfig
    # sn_folded=True: apply with fold_spectral_norms(variables) — skips the
    # per-forward power-iteration chains (inference fast path, bit-identical)
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 channels_last: bool = False,
                 block0_out: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (B, S, 2, T, F) -> content sequence (B, S, d_model).

        channels_last=True accepts (B, S, T, F, 2) instead (already NHWC per
        window): identical values, but skips the (2,T,F)->(T,F,2) transpose —
        a materialized-layout change XLA executes badly on TPU (8.2 ms at
        B*S=128 standalone). The fused inference cores build features
        channels-last at the DFT producers and use this path."""
        cfg = self.cfg
        if channels_last:
            B, S, T, F, C = x.shape
            xw = x.reshape(B * S, T, F, C)
        else:
            B, S, C, T, F = x.shape
            xw = x.reshape(B * S, C, T, F).transpose(0, 2, 3, 1)  # NHWC
        feats = DeepCNN(cfg.cnn_channels, cfg.cnn_out_dim, dtype=cfg.jnp_dtype,
                        remat=cfg.remat_cnn, sn_folded=self.sn_folded,
                        name="cnn")(xw, train=train, block0_out=block0_out)
        seq = feats.reshape(B, S, cfg.cnn_out_dim)

        if cfg.cnn_out_dim != cfg.d_model:
            seq = nn.Dense(cfg.d_model, dtype=cfg.jnp_dtype, name="input_proj")(seq)

        seq = SinusoidalPositionalEncoding(cfg.d_model, cfg.max_len, name="pos")(seq)
        seq = nn.LayerNorm(epsilon=1e-5, dtype=cfg.jnp_dtype, name="norm")(seq)
        return TransformerEncoder(
            cfg.d_model, cfg.num_heads, cfg.num_layers, cfg.ff_mult, cfg.dropout,
            cfg.jnp_dtype, name="transformer")(seq, deterministic=not train)
