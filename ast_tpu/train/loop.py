"""Training driver: epochs over balanced batches with the 4-phase curriculum,
periodic orbax checkpoints, metric logging.

Reconstruction of the reference's missing train2.ipynb loop (README.md:144-150,
paper §3.5/Appendix; see SURVEY.md §3.2): GAN-alternating step, curriculum
recon -> +contrastive -> +HSIC -> +adversarial(ramped), checkpoint every N
epochs. Additions the reference lacks: resume from checkpoint (incl. optimizer
and RNG state), prefetched input pipeline, persisted class prototypes."""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax

from ast_tpu.config import Config
from ast_tpu.data.pipeline import prefetch
from ast_tpu.train.checkpoint import (latest_checkpoint, load_checkpoint,
                                      save_checkpoint, wait_for_checkpoints)
from ast_tpu.train.state import Models, TrainState, init_state
from ast_tpu.train.step import curriculum_scalars, make_train_step


def train(
    cfg: Config,
    batch_iter_factory: Callable[[int], Iterable],
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    codec: str = "linear",
    sections_per_clip: int = 4,
    log: Callable[[str], None] = print,
    start_epoch: int = 0,
    metrics_dir: Optional[str] = None,
    mesh=None,
    reference_init: bool = False,
    async_checkpoint: bool = True,
) -> TrainState:
    """Run cfg.train.num_epochs epochs. `batch_iter_factory(epoch)` yields
    (x (B,S,2,W,F), labels (B,)) balanced batches.

    With `mesh` (a ("data","model") jax.sharding.Mesh), batches shard on the
    data axis and the decoder's frame-codec projections go tensor-parallel on
    the model axis; XLA inserts the gradient all-reduce (the DDP/NCCL
    equivalent the reference never had, SURVEY.md §2.3)."""
    models = Models.create(cfg, codec=codec)
    state = init_state(cfg, models, jax.random.PRNGKey(cfg.train.seed),
                       sections_per_clip=sections_per_clip)

    if reference_init:
        # the reference's conservative init scheme (style_encoder.py:263-308:
        # He convs, Xavier gain 0.2 linears/transformer, N(0,0.02) CLS) —
        # the authors' fix for gradient explosions under default init
        from ast_tpu.models.init import reference_initialize

        k = jax.random.PRNGKey(cfg.train.seed + 1)
        ks = jax.random.split(k, 4)
        state = state.replace(
            content=reference_initialize(state.content, ks[0]),
            style=reference_initialize(state.style, ks[1]),
            decoder=reference_initialize(state.decoder, ks[2]),
            disc=reference_initialize(state.disc, ks[3]),
        )

    shard_batch = lambda t: t
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ast_tpu.parallel import batch_sharding, shard_variables

        rep = NamedSharding(mesh, P())
        state = state.replace(
            content=jax.tree.map(lambda l: jax.device_put(l, rep), state.content),
            style=jax.tree.map(lambda l: jax.device_put(l, rep), state.style),
            decoder=shard_variables(state.decoder, mesh),
            disc=jax.tree.map(lambda l: jax.device_put(l, rep), state.disc),
            gen_opt_state=jax.tree.map(lambda l: jax.device_put(l, rep),
                                       state.gen_opt_state),
            disc_opt_state=jax.tree.map(lambda l: jax.device_put(l, rep),
                                        state.disc_opt_state),
        )
        bsh = batch_sharding(mesh)
        shard_batch = lambda t: jax.device_put(t, bsh)

    if checkpoint_dir and resume:
        path = latest_checkpoint(checkpoint_dir)
        if path:
            state, _ = load_checkpoint(path, state,
                                       class_prototypes_shape=(2, cfg.model.d_model))
            start_epoch = int(os.path.basename(path).rsplit("_", 1)[-1])
            log(f"Resumed from {path} (epoch {start_epoch}, step {int(state.step)})")

    step_fn = make_train_step(cfg, models, mesh=mesh)
    from ast_tpu.utils.logging import MetricLogger

    mlog = MetricLogger(metrics_dir)
    last_protos = None
    proto_fn = None
    for epoch in range(start_epoch, cfg.train.num_epochs):
        curr = curriculum_scalars(cfg, epoch)
        t0 = time.perf_counter()
        n_batches = 0
        running = {}
        for x, labels in prefetch(lambda e=epoch: iter(batch_iter_factory(e))):
            state, metrics = step_fn(state, shard_batch(x), shard_batch(labels),
                                     curr)
            n_batches += 1
            # accumulate on device; fetching every scalar every step costs a
            # host round-trip per metric (expensive on remote-attached TPUs)
            for k, v in metrics.items():
                running[k] = v if k not in running else running[k] + v
        if n_batches == 0:
            raise ValueError("batch_iter_factory produced no batches")

        # the metric fetch synchronizes with the device, so it belongs inside
        # the timed region — dispatches are async and on a relay-attached
        # chip the raw dispatch loop can run 10-50x faster than the compute
        avg = {k: float(v) / n_batches for k, v in running.items()}
        dt = time.perf_counter() - t0
        mlog.log(int(state.step), {**avg, "epoch": epoch + 1,
                                   "steps_per_sec": n_batches / dt})
        log(f"epoch {epoch + 1}/{cfg.train.num_epochs} "
            f"loss={avg.get('loss/total', float('nan')):.4f} "
            f"disc={avg.get('loss/disc', float('nan')):.4f} "
            f"({n_batches} steps, {dt:.1f}s, "
            f"{n_batches / dt:.2f} steps/s)")

        if checkpoint_dir and (epoch + 1) % cfg.train.checkpoint_every == 0:
            # persist class prototypes computed from the last batch's styles
            if proto_fn is None:
                from ast_tpu.models import StyleEncoder

                style = StyleEncoder(cfg.model)
                proto_fn = jax.jit(lambda v, xx, ll: style.apply(v, xx, ll)[1])
            protos = proto_fn(state.style, x, labels)
            last_protos = protos
            # async (default): the device->host fetch + write run on a
            # background thread while the next epochs keep stepping — a
            # full-size save is minutes through a relay-attached chip
            path = save_checkpoint(checkpoint_dir, epoch + 1, state, protos,
                                   block=not async_checkpoint)
            log(f"checkpoint {'saving (async)' if async_checkpoint else 'saved'}: {path}")

    wait_for_checkpoints()
    return state
