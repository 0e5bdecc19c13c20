"""Shared model construction/loading for the evaluation drivers.

Mirrors the reference's pattern: build the four modules at eval config
(evaluation_reconstruction.py:238-258), load a checkpoint when present, fall
back to random init with a warning otherwise
(evaluation_reconstruction.py:264-278)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ast_tpu.config import Config
from ast_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
from ast_tpu.train.state import Models, TrainState, init_state


@dataclasses.dataclass
class EvalBundle:
    cfg: Config
    models: Models
    state: TrainState
    class_prototypes: Optional[jnp.ndarray]


def load_eval_bundle(cfg: Config, checkpoint_dir: Optional[str] = None,
                     checkpoint_path: Optional[str] = None,
                     codec: str = "linear", seed: int = 0,
                     sections_per_clip: int = 4,
                     dtype: Optional[str] = None,
                     log=print) -> EvalBundle:
    """dtype, when given, overrides ModelConfig.dtype for the forward
    compute ("auto" resolves per backend — config.resolve_dtype; params and
    checkpoint storage stay float32 either way)."""
    if dtype is not None:
        from ast_tpu.config import resolve_dtype

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           dtype=resolve_dtype(dtype)))
    models = Models.create(cfg, codec=codec)
    state = init_state(cfg, models, jax.random.PRNGKey(seed),
                       sections_per_clip=sections_per_clip)
    protos = None

    path = checkpoint_path
    if path is None and checkpoint_dir is not None:
        path = latest_checkpoint(checkpoint_dir)
    if path is not None:
        try:
            log(f"Loading checkpoint: {path}")
            state, protos = load_checkpoint(
                path, state, class_prototypes_shape=(2, cfg.model.d_model))
            log("All models loaded successfully!")
        except Exception as e:
            log(f"Error loading checkpoint: {e}")
            log("Using randomly initialized models...")
    else:
        log("Checkpoint not found")
        log("Using randomly initialized models...")

    return EvalBundle(cfg, models, state, protos)
