"""Contrastive losses on style embeddings and class prototypes.

Capability-parity rebuild of the reference's InfoNCE and margin losses
(reference: losses.py:9-36, losses.py:45-57)."""

from __future__ import annotations

import jax.numpy as jnp
import jax.nn


def infonce_loss(style_emb: jnp.ndarray, labels: jnp.ndarray,
                 temperature: float = 0.1) -> jnp.ndarray:
    """Supervised contrastive loss (losses.py:9-36): cosine similarity matrix,
    self-similarity masked with -1e9 *before* the temperature scaling (the
    reference's exact order), mean log-softmax over same-class positives."""
    emb = style_emb / (jnp.linalg.norm(style_emb, axis=1, keepdims=True) + 1e-12)
    sim = emb @ emb.T  # (B, B)
    B = sim.shape[0]
    eye = jnp.eye(B, dtype=bool)
    sim = jnp.where(eye, -1e9, sim)
    log_prob = jax.nn.log_softmax(sim / temperature, axis=1)
    pos_mask = (labels[:, None] == labels[None, :]) & ~eye
    pos_count = jnp.maximum(pos_mask.sum(axis=1), 1)
    pos_log_prob = (log_prob * pos_mask).sum(axis=1) / pos_count
    return -pos_log_prob.mean()


def margin_loss(class_emb: jnp.ndarray, margin: float = 2.0) -> jnp.ndarray:
    """Hinge on pairwise prototype distances (losses.py:45-57), written for C
    classes like the reference."""
    diff = class_emb[:, None, :] - class_emb[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff ** 2, axis=2) + 1e-24)
    C = class_emb.shape[0]
    iu = jnp.triu_indices(C, k=1)
    pos_distances = dist[iu]
    return jnp.mean(jax.nn.relu(margin - pos_distances) ** 2)
