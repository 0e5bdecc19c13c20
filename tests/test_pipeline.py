"""Pipeline parallelism over the decoder's transformer stack: the ppermute
microbatched pipeline must match the sequential TransformerDecoder exactly
(forward AND gradients) on the 8-device virtual CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ast_tpu.config import ModelConfig
from ast_tpu.models.attention import TransformerDecoder, causal_mask
from ast_tpu.parallel import pipelined_decoder_forward

CFG = dataclasses.replace(ModelConfig().tiny(), num_layers=4)


def _setup(batch=8, seq=5, mem_len=6, seed=0):
    core = TransformerDecoder(CFG.d_model, CFG.num_heads, CFG.num_layers,
                              CFG.ff_mult, CFG.dropout)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    tgt = jax.random.normal(k1, (batch, seq, CFG.d_model), jnp.float32)
    mem = jax.random.normal(k2, (batch, mem_len, CFG.d_model), jnp.float32)
    params = core.init(k3, tgt, mem, causal_mask(seq), True)["params"]
    ref = core.apply({"params": params}, tgt, mem, causal_mask(seq), True)
    return core, params, tgt, mem, ref


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def test_pipeline_matches_sequential_pipe4():
    _, params, tgt, mem, ref = _setup()
    mesh = _mesh((4,), ("pipe",))
    out = pipelined_decoder_forward(CFG, params, tgt, mem, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_matches_sequential_dp2_pipe2_more_microbatches():
    _, params, tgt, mem, ref = _setup(batch=16)
    mesh = _mesh((2, 2), ("data", "pipe"))
    out = pipelined_decoder_forward(CFG, params, tgt, mem, mesh,
                                    data_axis="data", num_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pipeline_gradients_match_sequential():
    core, params, tgt, mem, ref = _setup(batch=4)
    mesh = _mesh((2,), ("pipe",))

    def seq_loss(p):
        y = core.apply({"params": p}, tgt, mem, causal_mask(tgt.shape[1]), True)
        return jnp.mean(y ** 2)

    def pipe_loss(p):
        y = pipelined_decoder_forward(CFG, p, tgt, mem, mesh)
        return jnp.mean(y ** 2)

    g_seq = jax.grad(seq_loss)(params)
    g_pipe = jax.jit(jax.grad(pipe_loss))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_seq)
    flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
    assert len(flat_s) == len(flat_p)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_rejects_indivisible_layers():
    _, params, tgt, mem, _ = _setup()
    mesh = _mesh((3,), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_decoder_forward(CFG, params, tgt, mem, mesh)


# ---------------------------------------------------------------------------
# round-4: dropout/dtype plumbing + the pipelined TRAIN STEP
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_pipeline_dropout_live_and_per_microbatch():
    """deterministic=False must actually drop (and differ per key), while
    staying finite — the training-path contract (ADVICE r3: wiring the
    pipeline into the train step must not silently disable dropout)."""
    cfg = dataclasses.replace(CFG, dropout=0.5)
    _, params, tgt, mem, ref = _setup()
    mesh = _mesh((2,), ("pipe",))
    det = pipelined_decoder_forward(cfg, params, tgt, mem, mesh)
    k = jax.random.PRNGKey(7)
    drop1 = pipelined_decoder_forward(cfg, params, tgt, mem, mesh,
                                      deterministic=False, dropout_rng=k)
    drop2 = pipelined_decoder_forward(
        cfg, params, tgt, mem, mesh, deterministic=False,
        dropout_rng=jax.random.PRNGKey(8))
    assert np.isfinite(np.asarray(drop1)).all()
    assert not np.allclose(np.asarray(det), np.asarray(drop1))
    assert not np.allclose(np.asarray(drop1), np.asarray(drop2))
    with pytest.raises(ValueError, match="dropout_rng"):
        pipelined_decoder_forward(cfg, params, tgt, mem, mesh,
                                  deterministic=False)


def test_pipeline_bf16_runs_in_bf16():
    """The stage layers must compute in model_cfg.jnp_dtype (ADVICE r3: a
    bfloat16 config previously ran the pipeline in f32)."""
    cfg = dataclasses.replace(CFG, dtype="bfloat16")
    _, params, tgt, mem, _ = _setup()
    mesh = _mesh((2,), ("pipe",))
    out = pipelined_decoder_forward(cfg, params, tgt.astype(jnp.bfloat16),
                                    mem, mesh)
    assert out.dtype == jnp.bfloat16


def _tiny_train_setup(pipe_stages, mesh, batch=8, sections=2, seed=0):
    from ast_tpu.config import Config, TrainConfig
    from ast_tpu.train import Models, init_state, make_train_step

    model = dataclasses.replace(ModelConfig().tiny(), num_layers=4,
                                dropout=0.0)
    cfg = Config(model=model,
                 train=TrainConfig(batch_size=batch, warmup_steps=1,
                                   pipe_stages=pipe_stages))
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(seed))
    step = make_train_step(cfg, models, mesh=mesh)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(
        (batch, sections, 2, model.window_size, model.feat_bins)
    ).astype(np.float32))
    labels = jnp.asarray(
        np.array([0] * (batch // 2) + [1] * (batch // 2), np.int32))
    curr = {k: jnp.asarray(1.0)
            for k in ("contrastive", "hsic", "adversarial")}
    return step, state, x, labels, curr


@pytest.mark.slow
def test_train_step_pipelined_matches_sequential():
    """One full GAN train step with the decoder core routed through the
    GPipe pipeline (TrainConfig.pipe_stages=2 on a ("data","pipe") mesh)
    must produce the same losses and updated parameters as the monolithic
    step — dropout 0, so the programs are numerically equivalent."""
    mesh = _mesh((4, 2), ("data", "pipe"))
    step_pp, state, x, labels, curr = _tiny_train_setup(2, mesh)
    step_seq, state_seq, _, _, _ = _tiny_train_setup(1, None)

    new_pp, m_pp = step_pp(state, x, labels, curr)
    new_seq, m_seq = step_seq(state_seq, x, labels, curr)

    np.testing.assert_allclose(float(m_pp["loss/total"]),
                               float(m_seq["loss/total"]), rtol=2e-5)
    np.testing.assert_allclose(float(m_pp["loss/disc"]),
                               float(m_seq["loss/disc"]), rtol=2e-5)
    flat_pp = jax.tree_util.tree_flatten(new_pp.decoder["params"])[0]
    flat_seq = jax.tree_util.tree_flatten(new_seq.decoder["params"])[0]
    assert len(flat_pp) == len(flat_seq)
    for a, b in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_train_step_pipe_validation():
    from ast_tpu.config import Config, TrainConfig
    from ast_tpu.train import Models, make_train_step

    model = dataclasses.replace(ModelConfig().tiny(), num_layers=4)
    cfg = Config(model=model, train=TrainConfig(pipe_stages=2))
    models = Models.create(cfg)
    with pytest.raises(ValueError, match="requires a mesh"):
        make_train_step(cfg, models, mesh=None)
    with pytest.raises(ValueError, match="no 'pipe' axis"):
        make_train_step(cfg, models, mesh=_mesh((2,), ("data",)))
    with pytest.raises(ValueError, match="!= pipe_stages"):
        make_train_step(cfg, models, mesh=_mesh((4,), ("pipe",)))
    cfg3 = dataclasses.replace(
        cfg, train=TrainConfig(pipe_stages=3),
        model=dataclasses.replace(model, num_layers=4))
    with pytest.raises(ValueError, match="not divisible"):
        make_train_step(cfg3, Models.create(cfg3),
                        mesh=_mesh((3,), ("pipe",)))
