"""Transformer primitives with torch-compatible math.

The reference relies on torch's nn.TransformerEncoder (post-norm, ReLU) for
both encoders (style_encoder.py:181-191, content_encoder.py:61-68) and
nn.TransformerDecoder (pre-norm) for the decoder
(SimpleDecoder_TransformerOnly.py:27-35). These modules reproduce that math
exactly (combined qkv projection, same residual/norm order) so converted
checkpoints are numerically interchangeable, while exposing a KV-cache `step`
path the reference lacks — its autoregressive loop re-runs the full decoder
over the growing prefix every step
(SimpleDecoder_TransformerOnly.py:102-125); here decode is O(S) via lax.scan.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (combined in_proj + out_proj)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (self.dim, 3 * self.dim),
            jnp.float32,
        )
        self.in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * self.dim,), jnp.float32,
        )
        self.out_proj = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")
        self.attn_drop = nn.Dropout(self.dropout)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_heads, self.dim // self.num_heads).transpose(0, 2, 1, 3)

    def __call__(
        self,
        query: jnp.ndarray,
        key_value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q, k, v = self.project(query, key_value)
        return self.attend(q, k, v, mask=mask, deterministic=deterministic)

    def project(self, query: jnp.ndarray, key_value: jnp.ndarray):
        """Compute (q, k, v) head tensors: (B, H, L, Dh)."""
        wq, wk, wv = jnp.split(self.in_proj_kernel.astype(self.dtype), 3, axis=1)
        bq, bk, bv = jnp.split(self.in_proj_bias.astype(self.dtype), 3)
        q = query @ wq + bq
        k = key_value @ wk + bk
        v = key_value @ wv + bv
        return self._heads(q), self._heads(k), self._heads(v)

    def project_q(self, query: jnp.ndarray) -> jnp.ndarray:
        """Query head tensor only — for cached cross-attention decode steps
        where K/V are precomputed (skips 2/3 of the in_proj matmul)."""
        wq = self.in_proj_kernel[:, : self.dim].astype(self.dtype)
        bq = self.in_proj_bias[: self.dim].astype(self.dtype)
        return self._heads(query @ wq + bq)

    def attend(self, q, k, v, mask=None, deterministic=True):
        """Scaled dot-product attention over head tensors + output proj."""
        scale = (self.dim // self.num_heads) ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if mask is not None:
            logits = jnp.where(mask, NEG_INF, logits)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = self.attn_drop(weights, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        b, h, l, dh = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
        return self.out_proj(out)


class FeedForward(nn.Module):
    """linear1 -> ReLU -> dropout -> linear2 (torch TransformerLayer FF)."""

    dim: int
    hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer, torch semantics (norm_first=False):
    x = norm1(x + SA(x)); x = norm2(x + FF(x))."""

    dim: int
    num_heads: int
    ff_hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        sa = MultiheadAttention(self.dim, self.num_heads, self.dropout, self.dtype,
                                name="self_attn")(x, x, mask, deterministic)
        sa = nn.Dropout(self.dropout, deterministic=deterministic)(sa)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + sa)
        ff = FeedForward(self.dim, self.ff_hidden, self.dropout, self.dtype,
                         name="ff")(x, deterministic)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + ff)


class TransformerEncoder(nn.Module):
    """Stack of post-norm encoder layers (no final norm, as torch default)."""

    dim: int
    num_heads: int
    num_layers: int
    ff_mult: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.dim, self.num_heads, self.dim * self.ff_mult, self.dropout,
                self.dtype, name=f"layer{i}")(x, mask, deterministic)
        return x


def causal_mask(length: int) -> jnp.ndarray:
    """(1, 1, L, L) boolean mask, True = disallowed (strict upper triangle),
    matching the reference's torch.triu(..., diagonal=1)
    (SimpleDecoder_TransformerOnly.py:70-71)."""
    return jnp.triu(jnp.ones((length, length), dtype=bool), k=1)[None, None]


class TransformerDecoderLayer(nn.Module):
    """Pre-norm decoder layer, torch semantics (norm_first=True):
    x += SA(norm1(x)); x += CrossA(norm2(x), memory); x += FF(norm3(x))."""

    dim: int
    num_heads: int
    ff_hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiheadAttention(self.dim, self.num_heads, self.dropout,
                                            self.dtype, name="self_attn")
        self.cross_attn = MultiheadAttention(self.dim, self.num_heads, self.dropout,
                                             self.dtype, name="cross_attn")
        self.ff = FeedForward(self.dim, self.ff_hidden, self.dropout, self.dtype,
                              name="ff")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, memory, tgt_mask=None, deterministic: bool = True,
                 memory_mask=None):
        h1 = self.norm1(x)
        sa = self.self_attn(h1, h1, tgt_mask, deterministic)
        x = x + self.drop(sa, deterministic=deterministic)
        ca = self.cross_attn(self.norm2(x), memory, memory_mask, deterministic)
        x = x + self.drop(ca, deterministic=deterministic)
        f = self.ff(self.norm3(x), deterministic)
        x = x + self.drop(f, deterministic=deterministic)
        return x

    def precompute_cross_kv(self, memory):
        """Cross-attention K/V from memory — computed once per decode."""
        _, k, v = self.cross_attn.project(memory, memory)
        return k, v

    def step(self, x_t, pos, k_cache, v_cache, cross_k, cross_v):
        """One KV-cached decode step.

        x_t: (B, 1, D) current token; pos: scalar position;
        k_cache/v_cache: (B, H, S_max, Dh) self-attention caches.
        Returns (y_t, k_cache, v_cache) with the caches updated at `pos`."""
        h = self.norm1(x_t)
        q, k_new, v_new = self.self_attn.project(h, h)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, (0, 0, pos, 0))
        s_max = k_cache.shape[2]
        valid = jnp.arange(s_max)[None, None, None, :] > pos  # mask future slots
        sa = self.self_attn.attend(q, k_cache, v_cache, mask=valid)
        x_t = x_t + sa
        qc = self.cross_attn.project_q(self.norm2(x_t))
        ca = self.cross_attn.attend(qc, cross_k, cross_v, mask=None)
        x_t = x_t + ca
        x_t = x_t + self.ff(self.norm3(x_t), deterministic=True)
        return x_t, k_cache, v_cache


class TransformerDecoder(nn.Module):
    """Stack of pre-norm decoder layers (no final norm: the reference builds
    nn.TransformerDecoder without a norm and applies its own output_norm,
    SimpleDecoder_TransformerOnly.py:35,65)."""

    dim: int
    num_heads: int
    num_layers: int
    ff_mult: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(self.dim, self.num_heads, self.dim * self.ff_mult,
                                    self.dropout, self.dtype, name=f"layer{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, tgt, memory, tgt_mask=None, deterministic: bool = True,
                 memory_mask=None):
        x = tgt
        for layer in self.layers:
            x = layer(x, memory, tgt_mask, deterministic, memory_mask)
        return x

    def precompute_cross_kv(self, memory):
        return [layer.precompute_cross_kv(memory) for layer in self.layers]

    def step(self, x_t, pos, k_caches, v_caches, cross_kvs):
        """KV-cached step through all layers. k_caches/v_caches: lists of
        per-layer (B, H, S_max, Dh) caches; cross_kvs from
        precompute_cross_kv."""
        new_k, new_v = [], []
        for layer, k_c, v_c, (ck, cv) in zip(self.layers, k_caches, v_caches, cross_kvs):
            x_t, k_c, v_c = layer.step(x_t, pos, k_c, v_c, ck, cv)
            new_k.append(k_c)
            new_v.append(v_c)
        return x_t, new_k, new_v
