"""Device mesh + sharding rules.

The reference is strictly single-process single-device (SURVEY.md §2.3: no
torch.distributed anywhere); parallelism here is a green-field TPU design:

* a 2-D logical mesh ("data", "model") over ICI;
* batch tensors sharded on "data" (gradient all-reduce = what DDP/NCCL would
  have been, inserted automatically by XLA);
* the decoder's giant frame-codec projections (2*287*513 x 256 ~ 75M params
  each, SimpleDecoder_TransformerOnly.py:13-17) sharded on "model" — the only
  tensors worth tensor-parallelism at this scale. Everything else replicates.

Sequence parallelism applies at minute scale, where the window count S
reaches the hundreds: StyleTransferPipeline.process_audio_sp shards ONE
clip's window axis across "data" (GSPMD constraints around the per-window
CNN; XLA inserts the all-gather for the tiny transformer). Pipeline/expert
parallelism are not applicable at 154M params with a 4-layer decoder; the
mesh API carries the axes so they could be added without interface
changes."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None, strict: bool = False) -> Mesh:
    """Create a ("data", "model") mesh. Default: all devices on "data".

    When the requested shape does not match the available device count
    (e.g. asking for (4, 2) on a single-chip host), degrade to a pure
    data-parallel (n, 1) mesh instead of failing — tensor parallelism is
    an optimization, not a correctness requirement at this model scale.
    Pass strict=True to get the old hard error."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        if strict:
            raise ValueError(f"mesh shape {shape} != {n} devices")
        import warnings
        warnings.warn(
            f"mesh shape {shape} != {n} devices; degrading to ({n}, 1) "
            f"data-parallel mesh (tp=1)")
        shape = (n, 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading tensors: sharded along the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _codec_spec(path_names, leaf) -> P:
    """PartitionSpec for one parameter, by its tree path."""
    joined = "/".join(path_names)
    if "frame_codec" in joined:
        if "stft_to_embedding" in joined:
            # kernel (stft_dim, d): shard the huge input dim
            if leaf.ndim == 2:
                return P(MODEL_AXIS, None)
        if "embedding_to_stft" in joined:
            # kernel (d, stft_dim) / bias (stft_dim,): shard the huge output dim
            if leaf.ndim == 2:
                return P(None, MODEL_AXIS)
            if leaf.ndim == 1:
                return P(MODEL_AXIS)
    return P()


def param_sharding(tree: Any, mesh: Mesh):
    """NamedSharding pytree for module variables: codec projections go
    tensor-parallel on "model", the rest replicates. On a mesh without a
    "model" axis (e.g. the ("data","pipe") pipeline-training mesh)
    everything replicates — pipeline stages consume weights through the
    shard_map in parallel/pipeline.py, not through these shardings."""
    has_model = MODEL_AXIS in mesh.axis_names

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        spec = _codec_spec(names, leaf) if has_model else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_tree(tree: Any, shardings: Any):
    return jax.tree.map(jax.device_put, tree, shardings)


def shard_variables(variables: Any, mesh: Mesh):
    """device_put a module variable collection with codec-aware sharding."""
    return shard_tree(variables, param_sharding(variables, mesh))
