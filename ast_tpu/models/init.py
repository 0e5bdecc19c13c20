"""Reference weight-initialization scheme as a param-tree transform.

The reference applies a custom init after module construction
(reference: style_encoder.py:263-308 `initialize_weights`, and the decoders'
_init_weights, SimpleDecoder_TransformerOnly.py:47-55): He fan-in for convs,
Xavier gain=0.2 for Linear and transformer projections, N(0, 0.02) for the
CLS token, constant 1/0 for norm scales/biases. The authors note default init
caused gradient explosions (style_encoder.py:261-262, paper Appendix). In
Flax, initialization is functional: this transform rewrites an initialized
variables tree in place of torch's in-place mutation."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _he_fan_in(rng, shape):
    # conv kernel (kh, kw, in, out): fan_in = kh*kw*in (torch kaiming fan_in,
    # nonlinearity=relu -> gain sqrt(2))
    fan_in = int(np.prod(shape[:-1]))
    std = np.sqrt(2.0 / fan_in)
    return std * jax.random.normal(rng, shape)


def _xavier(rng, shape, gain: float = 0.2):
    fan_in, fan_out = shape[0], shape[-1]
    std = gain * np.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape)


def reference_initialize(variables: Any, rng: jax.Array,
                         linear_gain: float = 0.2) -> Any:
    """Re-initialize a module's 'params' collection with the reference
    scheme. Other collections (batch_stats, spectral) are left untouched
    (they are already constant/valid at init)."""
    params = variables["params"]
    leaves_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    rngs = jax.random.split(rng, len(leaves_paths))

    def classify(path_names, leaf):
        joined = "/".join(path_names)
        name = path_names[-1]
        if name == "cls_token":
            return "cls"
        if name in ("scale",):
            return "const1"
        if name in ("bias", "in_proj_bias"):
            return "const0"
        if name == "start_token":
            # decoder keeps torch.randn start token scaled by xavier? the
            # reference zeroes 1-D params and xaviers >1-D in _init_weights;
            # start_token is (1,1,d) -> xavier
            return "xavier"
        if name == "kernel" and leaf.ndim == 4:
            return "he_conv"
        if name in ("kernel", "in_proj_kernel") and leaf.ndim >= 2:
            return "xavier"
        if leaf.ndim <= 1:
            return "const0"
        return "xavier"

    new_leaves = []
    for (path, leaf), r in zip(leaves_paths, rngs):
        names = [getattr(p, "key", str(p)) for p in path]
        kind = classify(names, leaf)
        if kind == "he_conv":
            new = _he_fan_in(r, leaf.shape)
        elif kind == "xavier":
            new = _xavier(r, leaf.shape, linear_gain)
        elif kind == "cls":
            new = 0.02 * jax.random.normal(r, leaf.shape)
        elif kind == "const1":
            new = jax.numpy.ones_like(leaf)
        else:
            new = jax.numpy.zeros_like(leaf)
        new_leaves.append(new.astype(leaf.dtype))

    treedef = jax.tree_util.tree_structure(params)
    new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return {**variables, "params": new_params}
