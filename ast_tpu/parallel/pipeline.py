"""GPipe-style pipeline parallelism over the decoder's transformer stack.

The canonical TPU microbatched pipeline (the scaling-book recipe): the
`pipe` mesh axis holds P stages, stage s owning num_layers/P contiguous
TransformerDecoderLayers. Activations rotate stage -> stage+1 over ICI via
`lax.ppermute` inside a `lax.scan` of M + P - 1 ticks: stage 0 injects
microbatch t at tick t, stage P-1 emits microbatch t-(P-1). Composes with
data parallelism by sharding the microbatch batch dim over a `data` axis.

The whole pipeline is one jittable, DIFFERENTIABLE program (ppermute has a
transpose rule), so it serves both teacher-forced training of the decoder
stack (wired into `train/step.py make_train_step` via
`TrainConfig.pipe_stages`) and batch inference.

Memory note: only the LAYER WEIGHTS shard over `pipe` (each stage holds
num_layers/P layers). The microbatch queue `xs` and output buffer live with
spec P(None, data) — every stage holds the full queue for the whole scan, so
activation memory per chip shrinks with the data axis but NOT with P. That
is the right trade here: this model's memory mass is weights (the ~75M-param
frame codec Linears and per-layer FF blocks), not the (B, S<=50, 256)
activations. A stage-streamed queue would save activation HBM at the cost of
extra collectives; revisit only for seq-length-dominated workloads.

Reference scope: the reference trains its transformer decoder monolithically
on a single GPU (SimpleDecoder_TransformerOnly.py:30-45); this module is the
TPU-native scale-out path for decoders too deep/wide for one chip's HBM.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:                                  # jax >= 0.8
    from jax import shard_map
except ImportError:                   # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ast_tpu.models.attention import TransformerDecoderLayer, causal_mask

__all__ = ["stack_layer_params", "pipelined_decoder_forward"]


def stack_layer_params(core_params: Any, num_layers: int) -> Any:
    """{'layer0': tree, 'layer1': tree, ...} -> one tree whose leaves carry a
    leading `num_layers` axis. All decoder layers are shape-homogeneous."""
    layers = [core_params[f"layer{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *layers)


def pipelined_decoder_forward(
    model_cfg,
    core_params: Any,
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    mesh: Mesh,
    *,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    memory_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Teacher-forced decoder-core forward, pipelined over `pipe_axis`.

    model_cfg:    ModelConfig (d_model / num_heads / num_layers / ff_mult /
                  dtype — layers compute in model_cfg.jnp_dtype, matching the
                  sequential core, models/decoder.py:227-229).
    core_params:  the Decoder core's params subtree ({'layer0': ..., ...}).
    tgt:          (B, S, D) shifted target embeddings (post input_norm/PE).
    memory:       (B, Sm, D) cross-attention memory.
    deterministic/dropout_rng: with deterministic=False a dropout_rng is
    required; each (microbatch, layer) pair folds its own key so training
    through the pipeline keeps decoder dropout live. The draw ORDER differs
    from the sequential core's, so outputs are only bit-equal to it when
    deterministic (or dropout == 0) — same contract as any resharding of a
    stochastic program.
    memory_mask:  optional (B or 1, 1, S, Sm) cross-attention mask, threaded
    to every layer (the sequential core's memory_mask parameter).

    Returns (B, S, D), numerically equal to TransformerDecoder.__call__ with
    a causal mask when deterministic.

    Requires num_layers % mesh.shape[pipe_axis] == 0 and
    B % num_microbatches == 0 (default num_microbatches = P, the minimum
    that keeps every stage busy in steady state).
    """
    n_stages = mesh.shape[pipe_axis]
    n_layers = model_cfg.num_layers
    if n_layers % n_stages:
        raise ValueError(f"num_layers={n_layers} not divisible by "
                         f"pipe axis size {n_stages}")
    layers_per_stage = n_layers // n_stages

    batch, seq, dim = tgt.shape
    n_micro = num_microbatches or n_stages
    if batch % n_micro:
        raise ValueError(f"batch {batch} not divisible by microbatches {n_micro}")
    mb = batch // n_micro
    if data_axis is not None and mb % mesh.shape[data_axis]:
        raise ValueError(f"microbatch size {mb} not divisible by "
                         f"data axis size {mesh.shape[data_axis]}")
    if not deterministic and dropout_rng is None:
        raise ValueError("deterministic=False requires dropout_rng")

    # parent=None: this template module must stay detached even when the
    # call site is inside another module's apply (the train step invokes
    # this from Decoder.forward_training via core_fn) — without it flax
    # would try to register it as a submodule of the caller.
    layer = TransformerDecoderLayer(
        model_cfg.d_model, model_cfg.num_heads,
        model_cfg.d_model * model_cfg.ff_mult,
        model_cfg.dropout, model_cfg.jnp_dtype, parent=None)
    mask = causal_mask(seq)

    # (P, Lp, ...) leading axes: sharding axis 0 over `pipe` hands each
    # stage exactly its own Lp layers' weights.
    stacked = stack_layer_params(core_params, n_layers)
    stacked = jax.tree.map(
        lambda a: a.reshape((n_stages, layers_per_stage) + a.shape[1:]), stacked)

    # the residual stream runs in jnp_dtype (as in the sequential core, where
    # the first LayerNorm/Dense casts); casting up front keeps the scan carry
    # dtype stable across ticks
    xs = tgt.astype(model_cfg.jnp_dtype).reshape(n_micro, mb, seq, dim)
    mems = memory.reshape((n_micro, mb) + memory.shape[1:])
    if memory_mask is not None and memory_mask.shape[0] == batch:
        mmasks = memory_mask.reshape((n_micro, mb) + memory_mask.shape[1:])
    else:
        mmasks = None  # shared (broadcast) mask or none

    # key travels as raw uint32 data: shard_map replication of typed PRNG
    # keys is backend-sensitive, key_data is just an array
    key_data = (jax.random.key_data(dropout_rng)
                if dropout_rng is not None else jnp.zeros((2,), jnp.uint32))

    p_spec = P(pipe_axis)
    x_spec = P(None, data_axis)  # microbatch batch dim data-parallel
    rep_spec = P()
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def pipe_fn(params, xs, mems, mmasks, key_data):
        params = jax.tree.map(lambda a: a[0], params)  # (1, Lp, ...) -> (Lp, ...)
        stage = jax.lax.axis_index(pipe_axis)
        n_ticks = n_micro + n_stages - 1
        base_key = jax.random.wrap_key_data(key_data)

        def stage_apply(x, mem, mmask, micro_idx):
            # layers_per_stage is static and small: unrolled Python loop.
            for i in range(layers_per_stage):
                p_i = jax.tree.map(lambda a: a[i], params)
                if deterministic:
                    x = layer.apply({"params": p_i}, x, mem, mask, True, mmask)
                else:
                    # one key per (microbatch, global layer): masks stay
                    # independent across microbatches AND layers
                    g_layer = stage * layers_per_stage + i
                    k = jax.random.fold_in(
                        jax.random.fold_in(base_key, micro_idx), g_layer)
                    x = layer.apply({"params": p_i}, x, mem, mask, False,
                                    mmask, rngs={"dropout": k})
            return x

        def tick(carry, t):
            act, outs = carry
            # Stage 0 injects microbatch t (for t < M; later ticks recycle
            # ring garbage that never reaches a valid output slot).
            x_in = xs[jnp.clip(t, 0, n_micro - 1)]
            act = jnp.where((stage == 0) & (t < n_micro), x_in, act)
            # Stage s processes microbatch t - s at tick t.
            micro_idx = jnp.clip(t - stage, 0, n_micro - 1)
            mem = mems[micro_idx]
            mmask = None if mmasks is None else mmasks[micro_idx]
            y = stage_apply(act, mem, mmask, micro_idx)
            out_idx = t - (n_stages - 1)
            write = (stage == n_stages - 1) & (out_idx >= 0)
            safe = jnp.clip(out_idx, 0, n_micro - 1)
            outs = outs.at[safe].set(jnp.where(write, y, outs[safe]))
            act = jax.lax.ppermute(y, pipe_axis, perm)
            return (act, outs), None

        init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
        # Only the final stage holds real outputs; psum replicates them
        # around the ring (every other stage contributes zeros).
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            pipe_axis)

    import inspect
    flag = ("check_vma" if "check_vma" in
            inspect.signature(shard_map).parameters else "check_rep")
    fn = shard_map(pipe_fn, mesh=mesh,
                   in_specs=(p_spec, x_spec, x_spec,
                             (rep_spec if mmasks is None else x_spec),
                             rep_spec),
                   out_specs=x_spec, **{flag: False})
    out = fn(stacked, xs, mems, mmasks, key_data)
    return out.reshape(batch, seq, dim)
