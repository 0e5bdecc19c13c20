"""Train-step tests on the tiny config: one step runs, losses finite, params
change, curriculum gating works, and the discriminator phase leaves the
generator untouched."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ast_tpu.config import Config, ModelConfig
from ast_tpu.train import Models, curriculum_scalars, init_state, make_train_step

TINY_CFG = dataclasses.replace(Config(), model=ModelConfig().tiny())


def _batch(rng, cfg, B=4, S=3):
    m = cfg.model
    x = rng.standard_normal((B, S, 2, m.window_size, m.feat_bins)).astype(np.float32)
    labels = np.array([0] * (B // 2) + [1] * (B // 2))
    return jnp.asarray(x), jnp.asarray(labels)


import pytest


@pytest.fixture(scope="module")
def shared_step():
    """One compiled train step shared by the basic tests (compiles dominate
    suite time)."""
    cfg = TINY_CFG
    models = Models.create(cfg)
    return cfg, models, make_train_step(cfg, models)


def test_train_step_runs_and_updates(rng, shared_step):
    cfg, models, step = shared_step
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=3)
    x, labels = _batch(rng, cfg)
    curr = {k: jnp.asarray(v) for k, v in
            {"contrastive": 1.0, "hsic": 1.0, "adversarial": 1.0}.items()}

    new_state, metrics = step(state, x, labels, curr)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1

    # generator params changed
    old = jax.tree.leaves(state.decoder["params"])
    new = jax.tree.leaves(new_state.decoder["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))
    # discriminator params changed
    old_d = jax.tree.leaves(state.disc["params"])
    new_d = jax.tree.leaves(new_state.disc["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old_d, new_d))
    # batch stats updated
    old_bs = jax.tree.leaves(state.content["batch_stats"])
    new_bs = jax.tree.leaves(new_state.content["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old_bs, new_bs))


def test_two_steps_progress(rng, shared_step):
    cfg, models, step = shared_step
    state = init_state(cfg, models, jax.random.PRNGKey(1), sections_per_clip=3)
    x, labels = _batch(rng, cfg)
    curr = {"contrastive": jnp.asarray(0.0), "hsic": jnp.asarray(0.0),
            "adversarial": jnp.asarray(0.0)}
    state, m1 = step(state, x, labels, curr)
    state, m2 = step(state, x, labels, curr)
    assert int(state.step) == 2
    assert np.isfinite(float(m2["loss/total"]))


def test_curriculum_schedule():
    cfg = Config()
    w0 = cfg.curriculum.weights_at(0)
    assert w0 == {"contrastive": 0.0, "hsic": 0.0, "adversarial": 0.0}
    w1 = cfg.curriculum.weights_at(15)
    assert w1["contrastive"] == 1.0 and w1["hsic"] == 0.0
    w2 = cfg.curriculum.weights_at(25)
    assert w2["hsic"] == 1.0 and w2["adversarial"] == 0.0
    w3 = cfg.curriculum.weights_at(35)
    assert 0 < w3["adversarial"] <= 1.0
    w4 = cfg.curriculum.weights_at(100)
    assert w4["adversarial"] == 1.0
    scal = curriculum_scalars(cfg, 35)
    assert set(scal) == {"contrastive", "hsic", "adversarial", "ss_p"}
    assert float(scal["ss_p"]) == 0.0  # faithful default: no sampling


@pytest.mark.slow
def test_grad_accum_step(rng):
    from ast_tpu.train.step import make_grad_accum_train_step

    cfg = TINY_CFG
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(2), sections_per_clip=3)
    step = make_grad_accum_train_step(cfg, models, accum_steps=2)
    m = cfg.model
    xs = jnp.asarray(rng.standard_normal(
        (2, 4, 3, 2, m.window_size, m.feat_bins)).astype(np.float32))
    labels = jnp.asarray(np.tile(np.array([0, 0, 1, 1]), (2, 1)))
    curr = {k: jnp.asarray(1.0) for k in ("contrastive", "hsic", "adversarial")}
    new_state, metrics = step(state, xs, labels, curr)
    assert int(new_state.step) == 1  # one optimizer update for 2 microbatches
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    old = jax.tree.leaves(state.decoder["params"])
    new = jax.tree.leaves(new_state.decoder["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(old, new))


@pytest.mark.slow
def test_train_step_conv_codec(rng):
    """The second decoder family (new_decoder conv codec) trains too."""
    cfg = TINY_CFG
    models = Models.create(cfg, codec="conv")
    state = init_state(cfg, models, jax.random.PRNGKey(3), sections_per_clip=2)
    step = make_train_step(cfg, models)
    m = cfg.model
    x = jnp.asarray(rng.standard_normal(
        (4, 2, 2, m.window_size, m.feat_bins)).astype(np.float32))
    labels = jnp.asarray(np.array([0, 0, 1, 1]))
    curr = {k: jnp.asarray(1.0) for k in ("contrastive", "hsic", "adversarial")}
    new_state, metrics = step(state, x, labels, curr)
    assert np.isfinite(float(metrics["loss/total"]))
    old = jax.tree.leaves(state.decoder["params"])
    new = jax.tree.leaves(new_state.decoder["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(old, new))


def test_scheduled_sampling_schedule_and_p0(rng):
    """Scheduled sampling semantics, decoder-level (fast): the ramp scalar
    follows epoch/ramp_epochs and p=0 through the SS path reproduces the
    plain teacher-forced forward exactly (dropout off). The full GAN-step
    compile with sampling on lives in the slow tier
    (test_scheduled_sampling_full_step)."""
    from ast_tpu.config import TrainConfig
    from ast_tpu.models.decoder import Decoder

    cfg = dataclasses.replace(
        TINY_CFG,
        model=dataclasses.replace(TINY_CFG.model, dropout=0.0),
        train=TrainConfig(batch_size=4, scheduled_sampling=0.5,
                          scheduled_sampling_ramp_epochs=10,
                          lr_decay_steps=50))
    # ramp scalar
    assert float(curriculum_scalars(cfg, 0)["ss_p"]) == 0.0
    assert abs(float(curriculum_scalars(cfg, 5)["ss_p"]) - 0.25) < 1e-6
    assert float(curriculum_scalars(cfg, 100)["ss_p"]) == 0.5

    # p=0 through the SS code path == the plain one-pass TF forward
    m = cfg.model
    B, S = 2, 3
    content = jnp.asarray(rng.standard_normal((B, S, m.d_model)), jnp.float32)
    cls = jnp.asarray(rng.standard_normal((B, m.d_model)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, S, 2, m.window_size, m.stft_bins)),
                    jnp.float32)
    dec = Decoder(m, codec="linear")
    variables = dec.init(jax.random.PRNGKey(1), content, cls, y)
    plain = dec.apply(variables, content, cls, y, None, False)
    ss0 = dec.apply(variables, content, cls, y, None, False, None,
                    jnp.asarray(0.0), jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(ss0),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_scheduled_sampling_full_step(rng):
    """Full GAN step with the sampling transform active: losses finite, step
    advances. Slow tier — this compiles a second full train-step program
    (~2 min of XLA CPU compile); the sampling semantics are pinned fast by
    test_scheduled_sampling_schedule_and_p0 and the p=1/iterated tests."""
    from ast_tpu.config import TrainConfig

    cfg = dataclasses.replace(
        TINY_CFG,
        model=dataclasses.replace(TINY_CFG.model, dropout=0.0),
        train=TrainConfig(batch_size=4, scheduled_sampling=0.5,
                          scheduled_sampling_ramp_epochs=10,
                          lr_decay_steps=50))
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=3)
    step = make_train_step(cfg, models)
    x, labels = _batch(rng, cfg)
    state2, metrics = step(state, x, labels, curriculum_scalars(cfg, 5))
    assert np.isfinite(float(metrics["loss/total"]))
    assert int(state2.step) == int(state.step) + 1


def test_scheduled_sampling_p1_matches_reencode_oracle(rng):
    """At p=1 every non-start input is the reencoded model prediction from a
    teacher-forced pass — i.e. ONE iteration of the iterated-teacher-forcing
    oracle. Check against the manual two-pass construction."""
    from ast_tpu.models.decoder import Decoder

    m = dataclasses.replace(TINY_CFG.model, dropout=0.0)
    B, S = 2, 3
    content = jnp.asarray(rng.standard_normal((B, S, m.d_model)), jnp.float32)
    cls = jnp.asarray(rng.standard_normal((B, m.d_model)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, S, 2, m.window_size, m.stft_bins)),
                    jnp.float32)
    dec = Decoder(m, codec="linear")
    variables = dec.init(jax.random.PRNGKey(1), content, cls, y)

    got = dec.apply(variables, content, cls, y, None, False, None,
                    jnp.asarray(1.0), jax.random.PRNGKey(2))

    # oracle: TF pass -> predicted frames -> TF pass on those frames
    pred = dec.apply(variables, content, cls, y, None, False)
    want = dec.apply(variables, content, cls, pred, None, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_iterated_sampling_equals_reencode_rollout(rng):
    """The round-4 rollout-training transform: at p=1 with S-1 feedback
    iterations, the iterated-scheduled-sampling forward EQUALS the reencode
    autoregressive rollout (causal induction — iteration k fixes input
    positions <= k), so the training loss optimizes the true rollout."""
    from ast_tpu.models.decoder import Decoder, autoregressive_decode

    m = dataclasses.replace(TINY_CFG.model, dropout=0.0,
                            ar_feedback="reencode")
    B, S = 2, 4
    content = jnp.asarray(rng.standard_normal((B, S, m.d_model)), jnp.float32)
    cls = jnp.asarray(rng.standard_normal((B, m.d_model)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, S, 2, m.window_size, m.stft_bins)),
                    jnp.float32)
    dec = Decoder(m, codec="linear")
    variables = dec.init(jax.random.PRNGKey(1), content, cls, y)

    got, got_tf = dec.apply(variables, content, cls, y, None, False, None,
                            jnp.asarray(1.0), jax.random.PRNGKey(2), S - 1,
                            True)
    want = autoregressive_decode(dec, variables, content, cls, S,
                                 feedback="reencode")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
    # the returned TF branch is the plain teacher-forced forward
    plain = dec.apply(variables, content, cls, y, None, False)
    np.testing.assert_allclose(np.asarray(got_tf), np.asarray(plain),
                               atol=1e-6, rtol=1e-6)


def test_rollout_consistency_distills_toward_tf(rng):
    """TrainConfig.rollout_consistency_weight adds exactly
    w * mse(rollout, stop_grad(TF)) to the generator loss and logs it as
    loss/consistency (eager loss-fn check — no train-step compile)."""
    from ast_tpu.config import TrainConfig
    from ast_tpu.train.step import _build_loss_fns

    def make(wc):
        return dataclasses.replace(
            TINY_CFG,
            model=dataclasses.replace(TINY_CFG.model, dropout=0.0,
                                      ar_feedback="reencode"),
            train=TrainConfig(batch_size=4, scheduled_sampling=1.0,
                              scheduled_sampling_ramp_epochs=1,
                              scheduled_sampling_iterations=2,
                              rollout_consistency_weight=wc))

    cfg0, cfg1 = make(0.0), make(0.7)
    models = Models.create(cfg0)
    state = init_state(cfg0, models, jax.random.PRNGKey(0),
                       sections_per_clip=2)
    x, labels = _batch(rng, cfg0, S=2)  # iters 2 >= S-1: exact rollout
    curr = curriculum_scalars(cfg0, 5)  # past the 1-epoch ramp: p = 1.0
    gen_params = {"style": state.style["params"],
                  "content": state.content["params"],
                  "decoder": state.decoder["params"]}
    key = jax.random.PRNGKey(3)

    loss0, (m0, _, _) = _build_loss_fns(cfg0, models)[0](
        gen_params, state, x, labels, curr, key)
    loss1, (m1, _, _) = _build_loss_fns(cfg1, models)[0](
        gen_params, state, x, labels, curr, key)
    assert "loss/consistency" not in m0
    consist = float(m1["loss/consistency"])
    assert np.isfinite(consist) and consist > 0.0
    np.testing.assert_allclose(float(loss1) - float(loss0), 0.7 * consist,
                               rtol=1e-4)


@pytest.mark.slow
def test_rollout_train_step_runs(rng):
    """Full GAN step with iterated scheduled sampling: rollout + TF losses
    both logged, finite, and the step advances. Slow tier — the iterated
    two-pass step is the single longest XLA CPU compile in the suite
    (~4 min); the rollout-equals-AR semantics are pinned fast by
    test_iterated_sampling_equals_reencode_rollout."""
    from ast_tpu.config import TrainConfig

    cfg = dataclasses.replace(
        TINY_CFG,
        train=TrainConfig(batch_size=4, scheduled_sampling=1.0,
                          scheduled_sampling_ramp_epochs=1,
                          scheduled_sampling_iterations=2))
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=3)
    step = make_train_step(cfg, models)
    x, labels = _batch(rng, cfg)
    state2, metrics = step(state, x, labels, curriculum_scalars(cfg, 50))
    assert np.isfinite(float(metrics["loss/total"]))
    assert np.isfinite(float(metrics["loss/mse_rollout"]))
    assert np.isfinite(float(metrics["loss/mse_tf"]))
    assert int(state2.step) == int(state.step) + 1
