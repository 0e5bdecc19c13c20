"""Style encoder: per-window DeepCNN -> CLS-token transformer -> per-clip
style embedding + per-class prototypes.

Capability-parity rebuild of the reference StyleEncoder
(reference: style_encoder.py:147-258): same topology (6 stride-2 spectral-norm
ResBlocks -> adaptive pools -> Linear -> optional proj -> CLS ⊕ sequence ->
sinusoidal PE -> LayerNorm -> 4-layer post-norm transformer -> CLS output),
with TPU-first differences: NHWC convs, the B and S axes fused into one big
CNN batch for MXU utilization, and class prototypes computed with a fixed
one-hot segment-mean (jit-safe, no data-dependent unique/sort — the reference
sorts unique labels ascending, style_encoder.py:242-256, which this
reproduces for the fixed {0,1} label set).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ast_tpu.config import ModelConfig
from ast_tpu.models.attention import TransformerEncoder
from ast_tpu.models.blocks import DeepCNN, SinusoidalPositionalEncoding


def class_prototypes(style_emb: jnp.ndarray, labels: jnp.ndarray,
                     num_classes: int = 2) -> jnp.ndarray:
    """Per-class mean of style embeddings, rows ordered by class id ascending
    (reference: style_encoder.py:242-256). Classes absent from the batch get a
    zero row, as in the reference's `torch.zeros_like` fallback."""
    onehot = jnp.asarray(labels[:, None] == jnp.arange(num_classes)[None, :],
                         style_emb.dtype)  # (B, C)
    counts = onehot.sum(axis=0)  # (C,)
    sums = onehot.T @ style_emb  # (C, d)
    return sums / jnp.maximum(counts[:, None], 1.0)


class StyleEncoder(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """x: (B, S, 2, T, F) feature windows (reference layout);
        returns (style_emb (B, d), class_emb (num_classes, d) or None)."""
        cfg = self.cfg
        B, S, C, T, F = x.shape
        # reference merges batch and sections before the CNN
        # (style_encoder.py:213); NHWC for TPU convs
        xw = x.reshape(B * S, C, T, F).transpose(0, 2, 3, 1)
        feats = DeepCNN(cfg.cnn_channels, cfg.cnn_out_dim, dtype=cfg.jnp_dtype,
                        remat=cfg.remat_cnn, name="cnn")(xw, train=train)  # (B*S, cnn_out_dim)
        seq = feats.reshape(B, S, cfg.cnn_out_dim)

        if cfg.cnn_out_dim != cfg.d_model:
            seq = nn.Dense(cfg.d_model, dtype=cfg.jnp_dtype, name="input_proj")(seq)

        if cfg.use_cls:
            cls = self.param("cls_token", nn.initializers.normal(0.02),
                             (1, 1, cfg.d_model), jnp.float32)
            seq = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(seq.dtype), (B, 1, cfg.d_model)), seq],
                axis=1)  # (B, S+1, d)

        seq = SinusoidalPositionalEncoding(cfg.d_model, cfg.max_len, name="pos")(seq)
        seq = nn.LayerNorm(epsilon=1e-5, dtype=cfg.jnp_dtype, name="norm")(seq)
        encoded = TransformerEncoder(
            cfg.d_model, cfg.num_heads, cfg.num_layers, cfg.ff_mult, cfg.dropout,
            cfg.jnp_dtype, name="transformer")(seq, deterministic=not train)

        style_emb = encoded[:, 0, :] if cfg.use_cls else encoded.mean(axis=1)

        class_emb = None
        if labels is not None:
            class_emb = class_prototypes(style_emb, labels, cfg.num_classes)
        return style_emb, class_emb
