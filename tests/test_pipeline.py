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
