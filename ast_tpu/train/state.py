"""Training state: all four modules' params/stats + two optimizers.

The reference keeps four separate torch modules and (per the reconstructed
train2 recipe, README.md:144-150) two optimizers with separate backward
passes. Here everything lives in one pytree so a single jitted step updates
it; the generator/discriminator phase separation is done with stop_gradient
and disjoint optimizer partitions instead of separate graphs."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ast_tpu.config import Config
from ast_tpu.models import ContentEncoder, Decoder, Discriminator, StyleEncoder


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    # variables per module: {'params':…, 'batch_stats':…, 'spectral':…}
    content: Dict[str, Any]
    style: Dict[str, Any]
    decoder: Dict[str, Any]
    disc: Dict[str, Any]
    gen_opt_state: Any
    disc_opt_state: Any
    rng: jax.Array


@dataclasses.dataclass
class Models:
    """Module instances (hyperparams only — no state)."""

    content: ContentEncoder
    style: StyleEncoder
    decoder: Decoder
    disc: Discriminator

    @classmethod
    def create(cls, cfg: Config, codec: str = "linear") -> "Models":
        return cls(
            content=ContentEncoder(cfg.model),
            style=StyleEncoder(cfg.model),
            decoder=Decoder(cfg.model, codec=codec),
            disc=Discriminator(cfg.model),
        )


def make_optimizers(cfg: Config):
    # linear warmup starting at lr/warmup (not 0: a zero first step is a
    # wasted batch and breaks update-visibility tests)
    sched = optax.linear_schedule(
        cfg.train.learning_rate / max(cfg.train.warmup_steps, 1),
        cfg.train.learning_rate,
        cfg.train.warmup_steps,
    )
    if cfg.train.lr_decay_steps > 0:
        # cosine decay from the peak to lr/10 after warmup — squeezes the
        # late-training reconstruction error the constant schedule leaves on
        # the table (see docs/TRAINING.md chorale runs)
        sched = optax.join_schedules(
            [sched,
             optax.cosine_decay_schedule(
                 cfg.train.learning_rate, cfg.train.lr_decay_steps,
                 alpha=0.1)],
            [cfg.train.warmup_steps],
        )
    gen_tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adamw(sched, weight_decay=cfg.train.weight_decay),
    )
    disc_tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adamw(cfg.train.disc_learning_rate,
                    weight_decay=cfg.train.weight_decay),
    )
    return gen_tx, disc_tx


import contextlib


def cpu_init_context():
    """Initialize parameters on the host CPU backend when the default device
    is an accelerator. Only worth it for SMALL models: host init skips an
    accelerator init compile, but the weights must then upload through the
    host link — for the full 154M-param model that upload measured ~5 min on
    a relay-attached chip, dwarfing the compile it saves. Full-size paths
    (StyleTransferPipeline.init_random, init_state) therefore jit the init
    on-device instead; this context remains for small/CI configs."""
    try:
        if jax.default_backend() != "cpu":
            return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        pass
    return contextlib.nullcontext()


def init_state(cfg: Config, models: Models, rng: jax.Array,
               sections_per_clip: int = 4) -> TrainState:
    """Initialize all module variables with dummy shaped inputs.

    Parameter shapes are independent of batch and section count (the models
    are fully shape-dynamic over B and S), so init traces with B=2, S=1 —
    the cheapest program that creates every variable. sections_per_clip is
    kept in the signature for callers that want the historical behavior but
    does not affect the result. Params materialize directly in device HBM
    via ONE jitted init program (host init + upload measured ~5 min for the
    154M-param model through a relay link; the init compile is ~30 s)."""
    del sections_per_clip  # param shapes don't depend on it
    m = cfg.model
    B, S = 2, 1
    x = jnp.zeros((B, S, 2, m.window_size, m.feat_bins), m.jnp_dtype)
    y = jnp.zeros((B, S, 2, m.window_size, m.stft_bins), m.jnp_dtype)
    labels = jnp.array([0, 1])
    emb = jnp.zeros((B, m.d_model), m.jnp_dtype)
    seq = jnp.zeros((B, S, m.d_model), m.jnp_dtype)

    @jax.jit
    def _init(key):
        k_c, k_s, k_d, k_x, k_rest = jax.random.split(key, 5)
        return (models.content.init(k_c, x), models.style.init(k_s, x, labels),
                models.decoder.init(k_d, seq, emb, y),
                models.disc.init(k_x, emb), k_rest)

    content_vars, style_vars, decoder_vars, disc_vars, k_rest = _init(rng)

    gen_tx, disc_tx = make_optimizers(cfg)
    gen_params = {
        "content": content_vars["params"],
        "style": style_vars["params"],
        "decoder": decoder_vars["params"],
    }
    return TrainState(
        step=jnp.asarray(0),
        content=dict(content_vars),
        style=dict(style_vars),
        decoder=dict(decoder_vars),
        disc=dict(disc_vars),
        gen_opt_state=gen_tx.init(gen_params),
        disc_opt_state=disc_tx.init(disc_vars["params"]),
        rng=k_rest,
    )
