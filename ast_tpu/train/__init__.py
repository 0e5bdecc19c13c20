"""Training layer (L4): state, jitted GAN-alternating step, curriculum,
checkpointing, training loop."""

from ast_tpu.train.state import Models, TrainState, init_state, make_optimizers
from ast_tpu.train.step import curriculum_scalars, make_train_step

__all__ = [
    "Models", "TrainState", "init_state", "make_optimizers",
    "curriculum_scalars", "make_train_step",
]
