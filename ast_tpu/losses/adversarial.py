"""Adversarial (discriminator) losses.

Capability-parity rebuild of the reference adversarial_loss
(reference: losses.py:69-123): cross-entropy on style and class embeddings
(the discriminator *should* classify those), and for the generator phase an
entropy-maximization term pushing the content embedding's class prediction
toward uniform. Gradient isolation between phases is handled by the train
step with stop_gradient, not here."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import jax.nn


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def adversarial_loss(
    style_emb: jnp.ndarray,
    class_emb: Optional[jnp.ndarray],
    content_emb: jnp.ndarray,
    discriminate: Callable[[jnp.ndarray], jnp.ndarray],
    labels: jnp.ndarray,
    compute_for_discriminator: bool,
    lambda_content: float = 1.0,
    lambda_class: float = 0.5,
    lambda_style: float = 1.0,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """`discriminate` is the bound discriminator apply function. Returns
    (discriminator_loss, generator_loss or None) exactly as the reference."""
    if content_emb.ndim == 3:
        content_emb = content_emb.mean(axis=1)  # (B, d), losses.py:89-91

    style_pred = discriminate(style_emb)
    content_pred = discriminate(content_emb)

    disc_loss = (lambda_style * cross_entropy(style_pred, labels)
                 + lambda_content * cross_entropy(content_pred, labels))

    if class_emb is not None:
        class_pred = discriminate(class_emb)
        # prototypes are ordered by ascending class id (losses.py:105-107)
        class_labels = jnp.arange(class_pred.shape[0])
        disc_loss = disc_loss + lambda_class * cross_entropy(class_pred, class_labels)

    if compute_for_discriminator:
        return disc_loss, None

    content_probs = jax.nn.softmax(content_pred, axis=-1)
    content_entropy = -jnp.sum(
        content_probs * jnp.log(content_probs + 1e-8), axis=-1).mean()
    gen_loss = -lambda_content * content_entropy
    return disc_loss, gen_loss
