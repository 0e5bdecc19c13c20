"""ast_tpu — a TPU-native audio style transfer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
francescobrigante/Audio-Style-Transfer (piano<->violin neural style transfer
via disentangled style/content representations): on-device complex STFT+CQT
feature extraction, CNN+Transformer style/content encoders, an autoregressive
transformer decoder with a lax.scan KV-cache decode loop, the full
InfoNCE/margin/HSIC/adversarial/multi-scale-reconstruction loss stack, a
curriculum GAN training step, and evaluation drivers — designed for jit/pjit
over device meshes rather than ported from the reference's single-GPU torch
code.
"""

__version__ = "0.3.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some site configurations (e.g. the axon TPU plugin's sitecustomize)
    # force-select their platform over the JAX_PLATFORMS env var. An
    # explicitly-set env var should win everywhere (tests/conftest.py does
    # this same override for the virtual CPU mesh).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from ast_tpu.config import (
    AudioConfig,
    Config,
    CurriculumSchedule,
    DEFAULT_CONFIG,
    LossWeights,
    ModelConfig,
    TrainConfig,
)

__all__ = [
    "AudioConfig", "Config", "CurriculumSchedule", "DEFAULT_CONFIG",
    "LossWeights", "ModelConfig", "TrainConfig", "__version__",
    "StyleTransferPipeline", "train", "export_pipeline", "load_exported",
]


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax-heavy modules on
    `import ast_tpu`)."""
    if name == "StyleTransferPipeline":
        from ast_tpu.eval.inference import StyleTransferPipeline

        return StyleTransferPipeline
    if name == "train":
        from ast_tpu.train.loop import train

        return train
    if name in ("export_pipeline", "load_exported"):
        from ast_tpu import export

        return getattr(export, name)
    raise AttributeError(name)
