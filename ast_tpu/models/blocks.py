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
        w_mat = kernel.reshape(-1, self.features)
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(self.make_rng("params") if self.has_rng("params")
                                      else jax.random.PRNGKey(0), (self.features,)),
        )
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


class ResBlock(nn.Module):
    """Residual block: [SNConv3x3 -> BN -> ReLU -> SNConv3x3 -> BN] + shortcut
    (SNConv1x1 + InstanceNorm(affine) when down/channel-changing), final ReLU
    (reference: style_encoder.py:41-84)."""

    features: int
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stride = (2, 2) if self.downsample else (1, 1)
        in_feat = x.shape[-1]

        out = SNConv(self.features, (3, 3), stride, ((1, 1), (1, 1)), dtype=self.dtype,
                     name="conv1")(x, update_stats=train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = SNConv(self.features, (3, 3), (1, 1), ((1, 1), (1, 1)), dtype=self.dtype,
                     name="conv2")(out, update_stats=train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype, name="bn2")(out)

        if self.downsample or in_feat != self.features:
            identity = SNConv(self.features, (1, 1), stride, ((0, 0), (0, 0)),
                              dtype=self.dtype, name="shortcut_conv")(x, update_stats=train)
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (N, H, W, C=2)
        # static_argnums counts self: (self=0, x=1, train=2)
        block_cls = (nn.remat(ResBlock, static_argnums=(2,))
                     if self.remat else ResBlock)
        for i, ch in enumerate(self.channels):
            x = block_cls(ch, downsample=True, dtype=self.dtype, name=f"block{i}")(x, train)
        x = adaptive_avg_pool2d(x, (2, 5))
        x = adaptive_avg_pool2d(x, (1, 1))
        x = x.reshape(x.shape[0], -1)  # (N, channels[-1])
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)
        return x
