"""Shared model blocks: positional encoding, spectral-norm conv, ResBlock,
DeepCNN, torch-exact adaptive average pooling.

TPU-native re-design of the reference's shared blocks
(reference: style_encoder.py:9-29 SinusoidalPositionalEncoding,
style_encoder.py:41-84 ResBlock, style_encoder.py:95-132 DeepCNN).
Layout is NHWC (XLA's preferred conv layout on TPU) instead of torch's NCHW;
the compat loader transposes imported weights accordingly.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_position_encoding(max_len: int, dim: int) -> np.ndarray:
    """Classic sin/cos table, identical to the reference
    (style_encoder.py:13-21)."""
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64) * (-math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class SinusoidalPositionalEncoding(nn.Module):
    """Adds the PE table to a (B, L, D) sequence (style_encoder.py:24-29)."""

    dim: int
    max_len: int = 500

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pe = jnp.asarray(sinusoidal_position_encoding(self.max_len, self.dim), x.dtype)
        return x + pe[None, : x.shape[1], :]


@functools.lru_cache(maxsize=64)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic pooling matrix with torch AdaptiveAvgPool region
    boundaries: region i = [floor(i*in/out), ceil((i+1)*in/out))."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d semantics on an NHWC tensor.

    Expressed as two small matmuls with precomputed static weights — exact
    (including the overlapping-region weighting the reference relies on when
    chaining (5,10)->(2,5)->(1,1), style_encoder.py:113-114)."""
    h_in, w_in = x.shape[1], x.shape[2]
    ph = jnp.asarray(_adaptive_pool_matrix(h_in, out_hw[0]), x.dtype)
    pw = jnp.asarray(_adaptive_pool_matrix(w_in, out_hw[1]), x.dtype)
    return jnp.einsum("oh,nhwc,pw->nopc", ph, x, pw)


class SNConv(nn.Module):
    """2D conv with spectral normalization.

    The reference uses torch spectral_norm on every conv
    (style_encoder.py:50-58,67): one power-iteration step per training
    forward, weight divided by the leading singular value estimate. Here the
    u-vector lives in the 'spectral' variable collection and is updated when
    `update_stats` is True."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: tuple = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # sn_folded=True: the caller pre-divided every kernel by its sigma (see
    # fold_spectral_norms) — skip the power-iteration readout entirely. At
    # inference sigma depends only on the params, yet the readout is a chain
    # of serial small matvecs per conv (18 chains per content forward) that
    # XLA cannot parallelize away; folding them out of the per-call program
    # is numerically identical.
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        in_feat = x.shape[-1]
        kshape = (*self.kernel_size, in_feat, self.features)
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(in_axis=(0, 1, 2), out_axis=3),
            kshape,
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        # torch reshapes the NCHW weight to (out, in*kh*kw); our NHWC kernel
        # flattens to (kh*kw*in, out) — same matrix transposed, same sigma.
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(self.make_rng("params") if self.has_rng("params")
                                      else jax.random.PRNGKey(0), (self.features,)),
        )
        if self.sn_folded:
            kernel_sn = kernel  # kernel is already kernel/sigma
        else:
            w_mat = kernel.reshape(-1, self.features)
            u = u_var.value
            u = u / (jnp.linalg.norm(u) + 1e-12)
            v = w_mat @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = w_mat.T @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
            sigma = v @ w_mat @ u_new
            if update_stats and not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(u_new)
            kernel_sn = kernel / jax.lax.stop_gradient(sigma)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel_sn.astype(self.dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def _sigma_readout(kernel: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """EXACTLY the inference-time sigma estimate SNConv.__call__ computes
    (update_stats=False): one power-iteration readout from the stored u."""
    w_mat = kernel.reshape(-1, kernel.shape[-1])
    u = u / (jnp.linalg.norm(u) + 1e-12)
    v = w_mat @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = w_mat.T @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    return v @ w_mat @ u_new


def fold_spectral_norms(variables):
    """Pre-divide every SNConv kernel by its sigma so inference can run with
    sn_folded=True modules (no per-forward power-iteration chains).

    Walks the 'params' tree in parallel with the 'spectral' collection: any
    scope holding a spectral 'u' next to a params 'kernel' is an SNConv, and
    its kernel is replaced by kernel / sigma — the exact value the unfolded
    module would use, so outputs are bit-identical. NOTE: only valid for
    trees whose spectral-normed modules are SNConv (the content/style CNNs);
    SNConvTranspose (conv codec) uses a different w_mat convention and must
    not be folded with this function."""
    spectral = variables.get("spectral")
    if not spectral:
        return variables

    def walk(params, spec):
        out = dict(params)
        for key, sub in spec.items():
            if key not in params:
                continue
            if "u" in sub and hasattr(sub["u"], "shape") and "kernel" in params[key]:
                leaf = dict(params[key])
                leaf["kernel"] = leaf["kernel"] / jax.lax.stop_gradient(
                    _sigma_readout(leaf["kernel"], sub["u"]))
                out[key] = leaf
            else:
                out[key] = walk(params[key], sub)
        return out

    new_vars = dict(variables)
    new_vars["params"] = walk(dict(variables["params"]), dict(spectral))
    return new_vars


class ResBlock(nn.Module):
    """Residual block: [SNConv3x3 -> BN -> ReLU -> SNConv3x3 -> BN] + shortcut
    (SNConv1x1 + InstanceNorm(affine) when down/channel-changing), final ReLU
    (reference: style_encoder.py:41-84)."""

    features: int
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    sn_folded: bool = False  # see SNConv.sn_folded

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stride = (2, 2) if self.downsample else (1, 1)
        in_feat = x.shape[-1]

        out = SNConv(self.features, (3, 3), stride, ((1, 1), (1, 1)), dtype=self.dtype,
                     sn_folded=self.sn_folded,
                     name="conv1")(x, update_stats=train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = SNConv(self.features, (3, 3), (1, 1), ((1, 1), (1, 1)), dtype=self.dtype,
                     sn_folded=self.sn_folded,
                     name="conv2")(out, update_stats=train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype, name="bn2")(out)

        if self.downsample or in_feat != self.features:
            identity = SNConv(self.features, (1, 1), stride, ((0, 0), (0, 0)),
                              dtype=self.dtype, sn_folded=self.sn_folded,
                              name="shortcut_conv")(x, update_stats=train)
            identity = nn.InstanceNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="shortcut_norm")(identity)
        else:
            identity = x

        return nn.relu(out + identity)


class DeepCNN(nn.Module):
    """Per-window CNN feature extractor: stacked stride-2 ResBlocks ->
    adaptive pools (2,5)->(1,1) -> flatten -> Linear
    (reference: style_encoder.py:95-132; all blocks downsample because
    downsample_number=100 > len(channels))."""

    channels: Sequence[int] = (32, 64, 128, 256, 512, 512)
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    sn_folded: bool = False  # see SNConv.sn_folded

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 block0_out: jnp.ndarray | None = None) -> jnp.ndarray:
        # x: (N, H, W, C=2)
        # block0_out: precomputed output of block0 (the fused Pallas kernel,
        # ops/pallas_block0.py) — when given, block0's flax module is
        # skipped (its params stay in the tree, unused this call)
        # static_argnums counts self: (self=0, x=1, train=2)
        block_cls = (nn.remat(ResBlock, static_argnums=(2,))
                     if self.remat else ResBlock)
        for i, ch in enumerate(self.channels):
            if i == 0 and block0_out is not None:
                x = block0_out
                continue
            x = block_cls(ch, downsample=True, dtype=self.dtype,
                          sn_folded=self.sn_folded, name=f"block{i}")(x, train)
        x = adaptive_avg_pool2d(x, (2, 5))
        x = adaptive_avg_pool2d(x, (1, 1))
        x = x.reshape(x.shape[0], -1)  # (N, channels[-1])
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)
        return x
