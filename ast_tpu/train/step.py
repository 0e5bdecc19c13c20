"""The jitted training step: generator phase + discriminator phase.

Reconstruction of the reference's (missing) train2.ipynb recipe from
README.md:144-150, the bundled paper §3.5/Appendix, and losses.py — see
SURVEY.md §3.2. GAN alternation is expressed TPU-style: ONE compiled step
computes both phases, using stop_gradient for the isolation the reference got
from separate backward passes:

* generator phase: grads w.r.t. {content, style, decoder} params; the
  discriminator is applied through a frozen (stop_gradient) closure. Includes
  the paper-§3.3 "helper" terms (style/class CE through the frozen
  discriminator) plus the content-entropy fooling term (losses.py:116-121).
* discriminator phase: grads w.r.t. discriminator params on stop_gradient'ed
  embeddings — equivalent to torch .detach().

Curriculum weights enter as traced scalars so one XLA program serves all four
phases (README.md:146-149). A lax.scan gradient-accumulation variant supports
effective batches beyond device memory — a capability the reference (capped
by one GPU) lacks."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ast_tpu.config import Config
from ast_tpu.losses import (
    compute_comprehensive_loss,
    cross_entropy,
    disentanglement_loss,
    infonce_loss,
    margin_loss,
)
from ast_tpu.train.state import Models, TrainState, make_optimizers


def _build_loss_fns(cfg: Config, models: Models, mesh=None):
    lw = cfg.loss
    stft_bins = cfg.model.stft_bins
    pipe_stages = cfg.train.pipe_stages

    def apply_generator(gen_params, state: TrainState, x, labels, rng,
                        curriculum=None):
        """Run encoders + teacher-forced decoder, returning losses' inputs and
        updated batch_stats/spectral collections."""
        r_c, r_s, r_d = jax.random.split(rng, 3)
        content_vars = {**state.content, "params": gen_params["content"]}
        style_vars = {**state.style, "params": gen_params["style"]}
        decoder_vars = {**state.decoder, "params": gen_params["decoder"]}

        (style_emb, class_emb), style_mut = models.style.apply(
            style_vars, x, labels, True,
            mutable=["batch_stats", "spectral"], rngs={"dropout": r_s})
        content_emb, content_mut = models.content.apply(
            content_vars, x, True,
            mutable=["batch_stats", "spectral"], rngs={"dropout": r_c})

        # pipeline-parallel decoder core (TrainConfig.pipe_stages > 1): the
        # transformer stack runs as a GPipe microbatched pipeline over the
        # mesh's "pipe" axis; grads flow to the core weights through this
        # closure (gen_params is the differentiated argument). Codec/norm/PE
        # pieces stay inside the module apply below.
        core_fn = None
        if pipe_stages > 1:
            r_d, r_pipe = jax.random.split(r_d)
            data_axis = ("data" if "data" in mesh.axis_names
                         and mesh.shape["data"] > 1 else None)
            dropout_on = cfg.model.dropout > 0.0

            def core_fn(tgt, memory):
                from ast_tpu.parallel.pipeline import pipelined_decoder_forward
                return pipelined_decoder_forward(
                    cfg.model, gen_params["decoder"]["core"], tgt, memory,
                    mesh, pipe_axis="pipe", data_axis=data_axis,
                    deterministic=not dropout_on,
                    dropout_rng=r_pipe if dropout_on else None)

        # teacher-forced reconstruction of the STFT slice of the input
        # (the decoder regenerates only the 513 STFT bins,
        # SimpleDecoder_TransformerOnly.py:13,59)
        y = x[..., :stft_bins]
        sample_p, sample_rng = None, None
        sample_iters = max(1, cfg.train.scheduled_sampling_iterations)
        if cfg.train.scheduled_sampling > 0.0:
            # ramped per-epoch probability travels as a traced curriculum
            # scalar; the static config gate keeps the faithful (p=0) path
            # one-pass
            r_d, sample_rng = jax.random.split(r_d)
            sample_p = curriculum["ss_p"]
        # iterated scheduled sampling (sample_iterations >= S-1 at p=1 ==
        # the exact reencode rollout) returns BOTH the rollout and the
        # teacher-forced frames so the loss can train them 50/50
        rollout_mode = sample_p is not None and sample_iters > 1
        y_pred, dec_mut = models.decoder.apply(
            decoder_vars, content_emb, class_emb[labels], y, None, True,
            core_fn, sample_p, sample_rng, sample_iters, rollout_mode,
            mutable=["batch_stats", "spectral"],
            rngs={"dropout": r_d})
        y_pred_tf = None
        if rollout_mode:
            y_pred, y_pred_tf = y_pred

        muts = (style_mut, content_mut, dec_mut)
        # losses always accumulate in f32 even when the forward computes in
        # bfloat16 (cfg.model.dtype): HSIC kernels and log-softmax terms are
        # precision-sensitive
        f32 = lambda t: t.astype(jnp.float32)
        return (f32(style_emb), f32(class_emb), f32(content_emb), f32(y),
                f32(y_pred),
                (f32(y_pred_tf) if y_pred_tf is not None else None), muts)

    def gen_loss_fn(gen_params, state: TrainState, x, labels, curriculum, rng):
        (style_emb, class_emb, content_emb, y, y_pred, y_pred_tf,
         muts) = apply_generator(gen_params, state, x, labels, rng,
                                 curriculum)

        recon = compute_comprehensive_loss(y_pred, y, lw)
        if y_pred_tf is not None:
            # iterated-sampling (rollout) mode: mix the teacher-forced and
            # rollout losses — TF keeps the per-frame fit sharp, the rollout
            # term closes the AR tracking gap. The mix is
            # TrainConfig.rollout_weight (0.5 = the original 50/50).
            w = cfg.train.rollout_weight
            recon_tf = compute_comprehensive_loss(y_pred_tf, y, lw)
            rollout_mse = recon["mse_loss"]
            recon = jax.tree.map(lambda a, b: w * a + (1.0 - w) * b,
                                 recon, recon_tf)
            recon["mse_rollout"] = rollout_mse
            recon["mse_tf"] = recon_tf["mse_loss"]
            if cfg.train.rollout_consistency_weight > 0.0:
                # distill the rollout toward the FROZEN teacher-forced
                # output — the AR-vs-TF tracking quantity itself; stop_grad
                # keeps the TF fit undisturbed (TrainConfig comment).
                consist = jnp.mean(jnp.square(
                    y_pred - jax.lax.stop_gradient(y_pred_tf)))
                recon["consistency"] = consist
                recon["total_loss"] = (
                    recon["total_loss"]
                    + cfg.train.rollout_consistency_weight * consist)
        nce = infonce_loss(style_emb, labels, lw.infonce_temperature)
        marg = margin_loss(class_emb, lw.margin_value)
        hsic = disentanglement_loss(style_emb, content_emb.mean(axis=1))

        # frozen discriminator for the generator phase
        disc_params = jax.tree.map(jax.lax.stop_gradient, state.disc["params"])

        def discriminate(e):
            return models.disc.apply({**state.disc, "params": disc_params}, e)

        content_pred = discriminate(content_emb.mean(axis=1))
        content_probs = jax.nn.softmax(content_pred, axis=-1)
        content_entropy = -jnp.sum(
            content_probs * jnp.log(content_probs + 1e-8), axis=-1).mean()
        # fool on content (maximize entropy), help on style/class (paper §3.3)
        adv_gen = (
            -lw.adv_content * content_entropy
            + lw.adv_style * cross_entropy(discriminate(style_emb), labels)
            + lw.adv_class * cross_entropy(
                discriminate(class_emb), jnp.arange(class_emb.shape[0]))
        )

        total = (
            recon["total_loss"]
            + curriculum["contrastive"] * (lw.infonce * nce + lw.margin * marg)
            + curriculum["hsic"] * lw.hsic * hsic
            + curriculum["adversarial"] * adv_gen
        )
        metrics = {
            "loss/total": total,
            "loss/recon": recon["total_loss"],
            "loss/mse": recon["mse_loss"],
            "loss/infonce": nce,
            "loss/margin": marg,
            "loss/hsic": hsic,
            "loss/adv_gen": adv_gen,
        }
        if "mse_rollout" in recon:
            metrics["loss/mse_rollout"] = recon["mse_rollout"]
            metrics["loss/mse_tf"] = recon["mse_tf"]
        if "consistency" in recon:
            metrics["loss/consistency"] = recon["consistency"]
        aux = (metrics, muts, (style_emb, class_emb, content_emb))
        return total, aux

    def disc_loss_fn(disc_params, state: TrainState, embs, labels):
        style_emb, class_emb, content_emb = jax.tree.map(
            jax.lax.stop_gradient, embs)
        disc_vars = {**state.disc, "params": disc_params}

        def discriminate(e):
            return models.disc.apply(disc_vars, e)

        loss = (
            lw.adv_style * cross_entropy(discriminate(style_emb), labels)
            + lw.adv_content * cross_entropy(
                discriminate(content_emb.mean(axis=1)), labels)
            + lw.adv_class * cross_entropy(
                discriminate(class_emb), jnp.arange(class_emb.shape[0]))
        )
        return loss, {"loss/disc": loss}

    return gen_loss_fn, disc_loss_fn


def _apply_updates(state: TrainState, gen_tx, disc_tx, gen_grads, disc_grads,
                   muts, metrics, disc_metrics, rng) -> Tuple[TrainState, Dict]:
    gen_params = {
        "content": state.content["params"],
        "style": state.style["params"],
        "decoder": state.decoder["params"],
    }
    updates, gen_opt_state = gen_tx.update(gen_grads, state.gen_opt_state,
                                           gen_params)
    gen_params = jax.tree.map(lambda p, u: p + u, gen_params, updates)

    d_updates, disc_opt_state = disc_tx.update(
        disc_grads, state.disc_opt_state, state.disc["params"])
    disc_params = jax.tree.map(lambda p, u: p + u,
                               state.disc["params"], d_updates)

    style_mut, content_mut, dec_mut = muts
    new_state = state.replace(
        step=state.step + 1,
        content={**state.content, **content_mut, "params": gen_params["content"]},
        style={**state.style, **style_mut, "params": gen_params["style"]},
        decoder={**state.decoder, **dec_mut, "params": gen_params["decoder"]},
        disc={**state.disc, "params": disc_params},
        gen_opt_state=gen_opt_state,
        disc_opt_state=disc_opt_state,
        rng=rng,
    )
    metrics = dict(metrics)
    metrics.update(disc_metrics)
    metrics["grad_norm/gen"] = jnp.sqrt(
        sum(jnp.sum(g ** 2) for g in jax.tree.leaves(gen_grads)))
    return new_state, metrics


def _check_pipe(cfg: Config, mesh):
    if cfg.train.pipe_stages <= 1:
        return
    if mesh is None:
        raise ValueError("pipe_stages > 1 requires a mesh with a 'pipe' axis")
    if "pipe" not in mesh.axis_names:
        raise ValueError(f"mesh axes {mesh.axis_names} carry no 'pipe' axis")
    if mesh.shape["pipe"] != cfg.train.pipe_stages:
        raise ValueError(f"mesh 'pipe' axis size {mesh.shape['pipe']} != "
                         f"pipe_stages {cfg.train.pipe_stages}")
    if cfg.model.num_layers % cfg.train.pipe_stages:
        raise ValueError(f"num_layers {cfg.model.num_layers} not divisible "
                         f"by pipe_stages {cfg.train.pipe_stages}")


def make_train_step(cfg: Config, models: Models, mesh=None):
    """Build the jitted train step: (state, x, labels, curriculum) -> (state, metrics).

    x: (B, S, 2, window, feat_bins) balanced batch (first half piano,
    second half violin, dataloader.py:123-147); labels: (B,).
    curriculum: dict of scalars {contrastive, hsic, adversarial}.

    mesh: required when cfg.train.pipe_stages > 1 — a jax.sharding.Mesh
    whose "pipe" axis (size pipe_stages) carries the GPipe decoder-core
    pipeline; an optional "data" axis composes dp with pp."""
    _check_pipe(cfg, mesh)
    gen_tx, disc_tx = make_optimizers(cfg)
    gen_loss_fn, disc_loss_fn = _build_loss_fns(cfg, models, mesh)

    def train_step(state: TrainState, x, labels, curriculum: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, step_rng = jax.random.split(state.rng)
        gen_params = {
            "content": state.content["params"],
            "style": state.style["params"],
            "decoder": state.decoder["params"],
        }
        (_, (metrics, muts, embs)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gen_params, state, x, labels, curriculum,
                                       step_rng)
        (_, disc_metrics), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc["params"], state, embs, labels)
        return _apply_updates(state, gen_tx, disc_tx, gen_grads, disc_grads,
                              muts, metrics, disc_metrics, rng)

    return jax.jit(train_step)


def make_grad_accum_train_step(cfg: Config, models: Models, accum_steps: int,
                               mesh=None):
    """Gradient accumulation: lax.scan over microbatches averaging BOTH
    phases' gradients, then ONE optimizer update per phase.

    Inputs: xs (accum, B, S, 2, W, F), labels (accum, B)."""
    _check_pipe(cfg, mesh)
    gen_tx, disc_tx = make_optimizers(cfg)
    gen_loss_fn, disc_loss_fn = _build_loss_fns(cfg, models, mesh)

    def train_step(state: TrainState, xs, labels, curriculum):
        rng, step_rng = jax.random.split(state.rng)
        micro_rngs = jax.random.split(step_rng, accum_steps)
        gen_params = {
            "content": state.content["params"],
            "style": state.style["params"],
            "decoder": state.decoder["params"],
        }

        def micro(carry, inp):
            gen_acc, disc_acc, _ = carry
            x, lab, r = inp
            (_, (metrics, muts, embs)), g = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(gen_params, state, x, lab,
                                           curriculum, r)
            (_, disc_metrics), dg = jax.value_and_grad(
                disc_loss_fn, has_aux=True)(state.disc["params"], state, embs, lab)
            gen_acc = jax.tree.map(lambda a, b: a + b / accum_steps, gen_acc, g)
            disc_acc = jax.tree.map(lambda a, b: a + b / accum_steps, disc_acc, dg)
            metrics = dict(metrics)
            metrics.update(disc_metrics)
            return (gen_acc, disc_acc, muts), metrics

        gen_zero = jax.tree.map(jnp.zeros_like, gen_params)
        disc_zero = jax.tree.map(jnp.zeros_like, state.disc["params"])
        # trace once to get mutable-collection structure for the carry
        _, (m0, muts0, e0) = gen_loss_fn(gen_params, state, xs[0], labels[0],
                                         curriculum, micro_rngs[0])

        (gen_grads, disc_grads, muts), metrics_seq = jax.lax.scan(
            micro, (gen_zero, disc_zero, muts0), (xs, labels, micro_rngs))
        metrics = jax.tree.map(lambda m: m.mean(), metrics_seq)
        # disc metrics already merged inside micro; split back out
        disc_metrics = {"loss/disc": metrics.pop("loss/disc")}
        return _apply_updates(state, gen_tx, disc_tx, gen_grads, disc_grads,
                              muts, metrics, disc_metrics, rng)

    return jax.jit(train_step)


def curriculum_scalars(cfg: Config, epoch: int) -> Dict[str, jnp.ndarray]:
    w = cfg.curriculum.weights_at(epoch)
    ramp = max(1, cfg.train.scheduled_sampling_ramp_epochs)
    w["ss_p"] = cfg.train.scheduled_sampling * min(1.0, epoch / ramp)
    return {k: jnp.asarray(v, jnp.float32) for k, v in w.items()}
