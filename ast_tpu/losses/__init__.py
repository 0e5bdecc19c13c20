"""Loss layer (L3): reconstruction, contrastive, adversarial, disentanglement.

Capability map to the reference losses.py + the duplicated
compute_comprehensive_loss in the decoder files."""

from ast_tpu.losses.adversarial import adversarial_loss, cross_entropy
from ast_tpu.losses.contrastive import infonce_loss, margin_loss
from ast_tpu.losses.hsic import (
    cross_covariance_loss,
    disentanglement_loss,
    hsic_loss,
)
from ast_tpu.losses.reconstruction import compute_comprehensive_loss

__all__ = [
    "adversarial_loss", "cross_entropy", "infonce_loss", "margin_loss",
    "cross_covariance_loss", "disentanglement_loss", "hsic_loss",
    "compute_comprehensive_loss",
]
