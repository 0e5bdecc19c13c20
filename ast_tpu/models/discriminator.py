"""Instrument-class discriminator MLP (256 -> 128 -> 128 -> 2, ReLU), shared
across style / class / content embeddings.

Capability-parity rebuild of the reference Discriminator
(reference: discriminator.py:14-28)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ast_tpu.config import ModelConfig


class Discriminator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.cfg.disc_hidden, dtype=self.cfg.jnp_dtype, name="fc1")(emb)
        h = nn.relu(h)
        h = nn.Dense(self.cfg.disc_hidden, dtype=self.cfg.jnp_dtype, name="fc2")(h)
        h = nn.relu(h)
        return nn.Dense(self.cfg.num_classes, dtype=self.cfg.jnp_dtype, name="fc3")(h)
