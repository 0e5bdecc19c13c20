"""Autoregressive spectrogram decoders.

Capability-parity rebuild of the reference's two decoder variants:

* `SimpleDecoder` — transformer-only, linear frame codec
  (reference: SimpleDecoder_TransformerOnly.py:9-133, the primary checkpoint
  variant per checkpoints/read.txt).
* `ConvDecoder` — CNN frame codec around the same transformer core
  (reference: new_decoder.py:9-345).

TPU-first redesign of the decode loop: the reference's inference re-runs the
full 4-layer transformer over the growing prefix each step with no KV cache
(SimpleDecoder_TransformerOnly.py:102-125 — O(S^2 * layers)); here
`autoregressive_decode` is a lax.scan over a KV-cached single-token step
(O(S)), mathematically identical because causal masking makes each output
depend only on its prefix. Faithfully preserved quirk: the reference applies
`input_norm` in the teacher-forced path but NOT in inference
(forward_training:89 vs forward_inference:111); we reproduce that.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ast_tpu.config import ModelConfig
from ast_tpu.models.attention import TransformerDecoder, causal_mask
from ast_tpu.models.blocks import (
    SinusoidalPositionalEncoding,
    SNConv,
    adaptive_avg_pool2d,
    sinusoidal_position_encoding,
)


class LinearFrameCodec(nn.Module):
    """Flatten-Linear frame codec (SimpleDecoder_TransformerOnly.py:13-17):
    one (2*287*513 <-> d_model) pair of ~75M-param projections. These two
    matmuls dominate decoder FLOPs and map straight onto the MXU."""

    cfg: ModelConfig

    def setup(self):
        self.stft_to_embedding = nn.Dense(self.cfg.d_model, dtype=self.cfg.jnp_dtype,
                                          name="stft_to_embedding")
        self.embedding_to_stft = nn.Dense(self.cfg.stft_dim, dtype=self.cfg.jnp_dtype,
                                          name="embedding_to_stft")

    def encode(self, y: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, S, 2, H, W) -> (B, S, d)."""
        B, S = y.shape[:2]
        flat = y.reshape(B, S, -1)
        return self.stft_to_embedding(flat)

    def decode(self, emb: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, S, d) -> (B, S, 2, H, W)."""
        B, S = emb.shape[:2]
        out = self.embedding_to_stft(emb)
        return out.reshape(B, S, 2, self.cfg.window_size, self.cfg.stft_bins)


def conv_transpose2d(x, kernel, stride=2, padding=1, output_padding=1):
    """torch.nn.ConvTranspose2d semantics on NHWC input.

    kernel: (kh, kw, out_ch, in_ch) — note transposed channel order, matching
    torch's (in, out, kh, kw) after layout permutation."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = kernel[::-1, ::-1]  # convT = correlation with flipped kernel
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding)
    return jax.lax.conv_general_dilated(
        x,
        jnp.swapaxes(flipped, 2, 3),  # -> (kh, kw, in_ch, out_ch)
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class SNConvTranspose(nn.Module):
    """Spectral-normalized ConvTranspose2d (new_decoder.py:72-96)."""

    features: int
    kernel_size: tuple = (3, 3)
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        in_feat = x.shape[-1]
        # (kh, kw, out, in): mirrors torch ConvTranspose weight (in, out, kh, kw)
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (*self.kernel_size, self.features, in_feat), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        # torch spectral_norm uses dim=1 (the out-channel axis) for
        # ConvTranspose weights (in, out, kh, kw) -> matrix (out, in*kh*kw).
        # Our (kh, kw, out, in) kernel must therefore be unfolded by the OUT
        # axis — (kh*kw*in, out), the transpose up to column permutation —
        # so sigma matches torch's and torch's weight_u imports verbatim.
        w_mat = jnp.moveaxis(kernel, 2, -1).reshape(-1, self.features)
        u_var = self.variable("spectral", "u", lambda: jnp.ones((self.features,)))
        u = u_var.value / (jnp.linalg.norm(u_var.value) + 1e-12)
        v = w_mat @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w_mat.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = v @ w_mat @ u_new
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        kernel_sn = (kernel / jax.lax.stop_gradient(sigma)).astype(self.dtype)

        y = conv_transpose2d(x.astype(self.dtype), kernel_sn, self.stride,
                             self.padding, self.output_padding)
        return y + bias.astype(self.dtype)


class ConvFrameCodec(nn.Module):
    """Strided-conv frame codec (new_decoder.py:27-100):
    encode: 4 SN convs (2->16->32->64->64, strides 1,2,2,2) + BN/ReLU ->
    AdaptiveAvgPool(32,16) -> [conv3x3 + conv1x1 -> 1ch] -> Linear(512->d);
    decode: Linear(d->512) -> 4 SN convT upsamples (1->64->32->16->8) ->
    SN convT to 2ch -> bilinear resize to (287, 513)."""

    cfg: ModelConfig
    f_compressed: int = 32
    t_compressed: int = 16
    feature_dim: int = 64

    def setup(self):
        d = self.cfg.jnp_dtype
        self.enc_convs = [
            SNConv(16, (3, 3), (1, 1), ((1, 1), (1, 1)), dtype=d, name="enc_conv0"),
            SNConv(32, (3, 3), (2, 2), ((1, 1), (1, 1)), dtype=d, name="enc_conv1"),
            SNConv(64, (3, 3), (2, 2), ((1, 1), (1, 1)), dtype=d, name="enc_conv2"),
            SNConv(self.feature_dim, (3, 3), (2, 2), ((1, 1), (1, 1)), dtype=d,
                   name="enc_conv3"),
        ]
        self.enc_bns = [
            nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d, name=f"enc_bn{i}")
            for i in range(4)
        ]
        self.spatial_conv = SNConv(self.feature_dim, (3, 3), (1, 1), ((1, 1), (1, 1)),
                                   dtype=d, name="spatial_conv")
        self.spatial_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d,
                                       name="spatial_bn")
        self.spatial_out = SNConv(1, (1, 1), (1, 1), ((0, 0), (0, 0)), dtype=d,
                                  name="spatial_out")
        self.feature_to_sequence = nn.Dense(self.cfg.d_model, dtype=d,
                                            name="feature_to_sequence")
        self.sequence_to_feature = nn.Dense(self.f_compressed * self.t_compressed,
                                            dtype=d, name="sequence_to_feature")
        self.dec_convs = [
            SNConvTranspose(self.feature_dim, dtype=d, name="dec_conv0"),
            SNConvTranspose(32, dtype=d, name="dec_conv1"),
            SNConvTranspose(16, dtype=d, name="dec_conv2"),
            SNConvTranspose(8, dtype=d, name="dec_conv3"),
        ]
        self.dec_bns = [
            nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d, name=f"dec_bn{i}")
            for i in range(4)
        ]
        self.dec_out = SNConvTranspose(2, stride=1, padding=1, output_padding=0,
                                       dtype=d, name="dec_out")

    def encode(self, y: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, S, C, H, W = y.shape
        x = y.reshape(B * S, C, H, W).transpose(0, 2, 3, 1)  # NHWC
        for conv, bn in zip(self.enc_convs, self.enc_bns):
            x = conv(x, update_stats=train)
            x = bn(x, use_running_average=not train)
            x = nn.relu(x)
        x = adaptive_avg_pool2d(x, (self.f_compressed, self.t_compressed))
        x = self.spatial_conv(x, update_stats=train)
        x = self.spatial_bn(x, use_running_average=not train)
        x = nn.relu(x)
        x = self.spatial_out(x, update_stats=train)  # (B*S, 32, 16, 1)
        x = x.reshape(B * S, -1)
        emb = self.feature_to_sequence(x)
        return emb.reshape(B, S, self.cfg.d_model)

    def decode(self, emb: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, S, _ = emb.shape
        x = self.sequence_to_feature(emb)
        x = x.reshape(B * S, self.f_compressed, self.t_compressed, 1)
        for conv, bn in zip(self.dec_convs, self.dec_bns):
            x = conv(x, update_stats=train)
            x = bn(x, use_running_average=not train)
            x = nn.relu(x)
        x = self.dec_out(x, update_stats=train)  # (B*S, 512, 256, 2)
        # torch nn.Upsample(bilinear, align_corners=False) never antialiases;
        # jax.image.resize defaults antialias=True, which matters here because
        # the H axis (512 -> 287) is a downsample (new_decoder.py:99).
        x = jax.image.resize(
            x, (x.shape[0], self.cfg.window_size, self.cfg.stft_bins, x.shape[-1]),
            method="bilinear", antialias=False)
        x = x.transpose(0, 3, 1, 2)  # -> (B*S, 2, H, W)
        return x.reshape(B, S, 2, self.cfg.window_size, self.cfg.stft_bins)


class Decoder(nn.Module):
    """Shared transformer decoding machinery around a frame codec.

    codec='linear' -> SimpleDecoder behavior; codec='conv' -> new_decoder."""

    cfg: ModelConfig
    codec: str = "linear"

    def setup(self):
        cfg = self.cfg
        if self.codec == "linear":
            self.frame_codec = LinearFrameCodec(cfg, name="frame_codec")
        elif self.codec == "conv":
            self.frame_codec = ConvFrameCodec(cfg, name="frame_codec")
        else:
            raise ValueError(f"unknown codec {self.codec!r}")
        self.content_proj = nn.Dense(cfg.d_model, dtype=cfg.jnp_dtype,
                                     name="content_proj")
        self.class_proj = nn.Dense(cfg.d_model, dtype=cfg.jnp_dtype, name="class_proj")
        self.pos = SinusoidalPositionalEncoding(cfg.d_model, cfg.max_len, name="pos")
        self.core = TransformerDecoder(cfg.d_model, cfg.num_heads, cfg.num_layers,
                                       cfg.ff_mult, cfg.dropout, cfg.jnp_dtype,
                                       name="core")
        self.start_token = self.param("start_token", nn.initializers.normal(1.0),
                                      (1, 1, cfg.d_model), jnp.float32)
        self.input_norm = nn.LayerNorm(epsilon=1e-5, dtype=cfg.jnp_dtype,
                                       name="input_norm")
        self.output_norm = nn.LayerNorm(epsilon=1e-5, dtype=cfg.jnp_dtype,
                                        name="output_norm")
        self.drop = nn.Dropout(cfg.dropout)

    # ---- shared pieces (reference: SimpleDecoder…:57-78) ----

    def prepare_memory(self, content_emb: jnp.ndarray, class_emb: jnp.ndarray,
                       train: bool = False) -> jnp.ndarray:
        """(B, S, d) content + (B, d) class -> (B, 2S, d) cross-attn memory."""
        B, S, _ = content_emb.shape
        content_m = self.content_proj(content_emb)
        class_m = jnp.broadcast_to(self.class_proj(class_emb)[:, None, :],
                                   (B, S, self.cfg.d_model))
        memory = jnp.concatenate([content_m, class_m], axis=1)
        return self.drop(memory, deterministic=not train)

    def generate_output(self, dec_out: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.frame_codec.decode(self.output_norm(dec_out), train=train)

    # ---- teacher-forced training path (reference: SimpleDecoder…:80-100) ----

    def __call__(self, content_emb, class_emb, y=None, target_length=None,
                 train: bool = False, core_fn=None, sample_p=None,
                 sample_rng=None, sample_iterations: int = 1,
                 return_tf: bool = False):
        memory = self.prepare_memory(content_emb, class_emb, train=train)
        if y is not None and train:
            return self.forward_training(y, memory, train=train,
                                         core_fn=core_fn, sample_p=sample_p,
                                         sample_rng=sample_rng,
                                         sample_iterations=sample_iterations,
                                         return_tf=return_tf)
        if y is not None:
            # eval-mode teacher forcing (used by reconstruction eval);
            # sample_p passes through so the scheduled-sampling transform is
            # testable deterministically
            return self.forward_training(y, memory, train=False,
                                         core_fn=core_fn, sample_p=sample_p,
                                         sample_rng=sample_rng,
                                         sample_iterations=sample_iterations,
                                         return_tf=return_tf)
        raise ValueError(
            "autoregressive inference goes through ast_tpu.models.decoder."
            "autoregressive_decode (lax.scan KV-cache path), not __call__")

    def forward_training(self, y, memory, train: bool = False, core_fn=None,
                         sample_p=None, sample_rng=None,
                         sample_iterations: int = 1,
                         return_tf: bool = False):
        """core_fn, when given, replaces self.core's sequential stack with an
        externally-parallelized implementation of the same math — the
        pipeline-parallel training path (parallel/pipeline.py) passes the
        GPipe forward here so pre/post-core pieces (codec, shift, PE, norms)
        stay inside this module's variable scope.

        sample_p (a traced scalar in [0, 1]) turns on scheduled sampling
        (Bengio et al. 2015), a capability the reference lacks: a
        teacher-forced pass produces the model's own frame predictions, and
        the input at each position is then the REENCODED prediction —
        input_norm(PE(encode(decode(.)))), the exact ar_feedback="reencode"
        rollout transform — with probability sample_p, else the teacher
        input. This trains the decoder to track its own rollout: without it
        a decoder that is accurate under teacher forcing can still compound
        feedback error autoregressively (the reference's train/inference
        mismatch, SimpleDecoder_TransformerOnly.py:102-125 vs :80-100).
        Sampled embeddings carry no gradient (standard stop-gradient).

        sample_iterations (static) iterates the feedback map: each iteration
        re-runs the core on inputs rebuilt from the PREVIOUS iteration's
        predictions (sampled positions only; un-sampled positions stay the
        teacher input every iteration). Because the mask is causal, inputs
        at positions <= k are exactly the autoregressive rollout's after k
        iterations, so with sample_p == 1 and sample_iterations >= S-1 the
        returned frames EQUAL autoregressive_decode(feedback="reencode") —
        the training loss then optimizes the true rollout, not a one-step
        approximation of it (tests/test_train_step.py pins the equality).

        return_tf additionally returns the plain teacher-forced frames (the
        first iteration's predictions) so the train step can mix a TF loss
        with the rollout loss without a second apply."""
        B, S = y.shape[:2]
        y_emb = self.frame_codec.encode(y, train=train)  # (B, S, d)
        start = jnp.broadcast_to(self.start_token.astype(y_emb.dtype),
                                 (B, 1, self.cfg.d_model))
        y_shift = jnp.concatenate([start, y_emb[:, :-1, :]], axis=1)
        x_tf = self.input_norm(self.pos(y_shift))
        x = x_tf

        def run_core(xx):
            if core_fn is None:
                return self.core(xx, memory, causal_mask(S),
                                 deterministic=not train)
            return core_fn(xx, memory)

        dec_tf = None
        if sample_p is not None:
            if sample_rng is None:
                raise ValueError("scheduled sampling requires sample_rng")
            take = jax.random.bernoulli(sample_rng, sample_p, (B, S, 1))
            for k in range(max(1, int(sample_iterations))):
                dec_k = run_core(x)
                if k == 0:
                    dec_tf = dec_k
                frames = self.frame_codec.decode(self.output_norm(dec_k),
                                                 train=train)
                pred_emb = self.frame_codec.encode(frames, train=train)
                pred_shift = jnp.concatenate(
                    [start, jax.lax.stop_gradient(pred_emb[:, :-1, :])],
                    axis=1)
                x_ss = self.input_norm(self.pos(pred_shift))
                # position 0 is the start token on both branches, so the
                # mask may freely cover it
                x = jnp.where(take, x_ss, x_tf)

        dec = run_core(x)
        out = self.generate_output(dec, train=train)
        if return_tf:
            out_tf = (self.generate_output(dec_tf, train=train)
                      if dec_tf is not None else out)
            return out, out_tf
        return out

    # ---- KV-cache decode pieces (called via .apply inside lax.scan) ----

    def decode_precompute(self, memory):
        return self.core.precompute_cross_kv(memory)

    def decode_step(self, x_t, pos, k_caches, v_caches, cross_kvs):
        """One AR step: PE at `pos` is added to the raw previous output
        (the reference feeds un-normalized transformer outputs back,
        SimpleDecoder…:107-122 — input_norm intentionally absent here)."""
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.cfg.max_len, self.cfg.d_model),
            x_t.dtype)
        x_t = x_t + jax.lax.dynamic_slice(pe, (pos, 0), (1, self.cfg.d_model))[None]
        return self.core.step(x_t, pos, k_caches, v_caches, cross_kvs)

    def start_tokens(self, batch: int):
        return jnp.broadcast_to(self.start_token, (batch, 1, self.cfg.d_model))

    # ---- re-encode feedback pieces (ar_feedback="reencode" quirk fix) ----

    def decode_step_prepared(self, x_t, pos, k_caches, v_caches, cross_kvs):
        """One AR step on an input that is ALREADY PE'd + input_norm'd —
        used by the "reencode" feedback mode where inputs are produced by
        prepare_start/prepare_feedback (the exact teacher-forcing input
        transform, forward_training's y_shift pipeline)."""
        return self.core.step(x_t, pos, k_caches, v_caches, cross_kvs)

    def prepare_start(self, batch: int):
        """input_norm(PE(start_token)) — TF's position-0 input."""
        x = self.start_tokens(batch).astype(self.cfg.jnp_dtype)
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.cfg.max_len, self.cfg.d_model),
            x.dtype)
        return self.input_norm(x + pe[0][None, None])

    # ---- streaming pieces (ast_tpu.eval.streaming) ----

    def core_forward(self, x, memory, tgt_mask=None, memory_mask=None):
        """Run the transformer core over a full (B, K, d) input ring with an
        optional cross-attention memory mask — the streaming decode path
        re-runs the core over its sliding context each window (K is small, so
        the O(K^2) re-run is cheaper than sliding-KV-cache bookkeeping)."""
        return self.core(x, memory, tgt_mask, deterministic=True,
                         memory_mask=memory_mask)

    def prepare_stream_inputs(self, emb, normed: bool):
        """PE (by ring slot position) + optionally input_norm over a
        (B, K, d) ring of pre-PE decoder input embeddings.

        normed=False reproduces the reference-faithful "raw" feedback (PE
        only, no input_norm — SimpleDecoder_TransformerOnly.py:107-122);
        normed=True the "reencode" quirk-fix transform (the teacher-forcing
        input pipeline, forward_training's y_shift)."""
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.cfg.max_len, self.cfg.d_model),
            emb.dtype)
        x = emb + pe[None, : emb.shape[1], :]
        return self.input_norm(x) if normed else x

    def encode_frame(self, frame):
        """frame_codec.encode of a (B, S, 2, W, F) frame — the pre-PE
        "reencode" feedback embedding for a decoded output frame."""
        return self.frame_codec.encode(frame)

    def prepare_feedback(self, y_t, pos):
        """input_norm(PE_pos(encode(decode(y_t)))) for (B, 1, d) transformer
        output y_t: decode the predicted frame to STFT space, re-encode it,
        and apply TF's PE + input_norm — so the rollout of a perfectly-fit
        decoder reproduces its teacher-forced pass."""
        frame = self.frame_codec.decode(self.output_norm(y_t))  # (B,1,2,W,F)
        emb = self.frame_codec.encode(frame)  # (B, 1, d)
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.cfg.max_len, self.cfg.d_model),
            emb.dtype)
        x = emb + jax.lax.dynamic_slice(pe, (pos, 0), (1, self.cfg.d_model))[None]
        return self.input_norm(x)


def autoregressive_decode(
    decoder: Decoder,
    variables,
    content_emb: jnp.ndarray,
    class_emb: jnp.ndarray,
    target_length: int,
    rngs: Optional[dict] = None,
    feedback: Optional[str] = None,
) -> jnp.ndarray:
    """lax.scan KV-cached autoregressive generation -> (B, S, 2, H, W).

    Equivalent to the reference forward_inference
    (SimpleDecoder_TransformerOnly.py:102-125) but O(S) instead of O(S^2).

    feedback (default: decoder.cfg.ar_feedback):
      "raw"      — reference-faithful: feed the previous transformer output
                   back directly (the train/inference mismatch quirk).
      "reencode" — quirk fix: feed back input_norm(PE(encode(decode(y_t)))),
                   the exact transform teacher forcing applies to true
                   frames; a perfectly-fit decoder then rolls out
                   identically to its teacher-forced pass."""
    cfg = decoder.cfg
    B = content_emb.shape[0]
    S = int(target_length)
    n_heads, d_head = cfg.num_heads, cfg.d_model // cfg.num_heads
    feedback = feedback or getattr(cfg, "ar_feedback", "raw")

    memory = decoder.apply(variables, content_emb, class_emb, False,
                           method=Decoder.prepare_memory)
    cross_kvs = decoder.apply(variables, memory, method=Decoder.decode_precompute)
    if feedback == "reencode":
        x0 = decoder.apply(variables, B, method=Decoder.prepare_start)
    else:
        x0 = decoder.apply(variables, B, method=Decoder.start_tokens)
    x0 = x0.astype(cfg.jnp_dtype)

    k0 = [jnp.zeros((B, n_heads, S, d_head), cfg.jnp_dtype)
          for _ in range(cfg.num_layers)]
    v0 = [jnp.zeros((B, n_heads, S, d_head), cfg.jnp_dtype)
          for _ in range(cfg.num_layers)]

    if feedback == "reencode":
        def step(carry, pos):
            x_t, k_caches, v_caches = carry
            y_t, k_caches, v_caches = decoder.apply(
                variables, x_t, pos, k_caches, v_caches, cross_kvs,
                method=Decoder.decode_step_prepared)
            nxt = decoder.apply(variables, y_t, pos + 1,
                                method=Decoder.prepare_feedback)
            return (nxt, k_caches, v_caches), y_t[:, 0, :]
    else:
        def step(carry, pos):
            x_t, k_caches, v_caches = carry
            y_t, k_caches, v_caches = decoder.apply(
                variables, x_t, pos, k_caches, v_caches, cross_kvs,
                method=Decoder.decode_step)
            return (y_t, k_caches, v_caches), y_t[:, 0, :]

    if S <= 8:
        # Unrolled: for the 10 s headline clip S=4 — a lax.scan of tiny
        # per-step ops serializes poorly on TPU (dynamic cache updates,
        # loop-carried layout constraints); unrolling gives XLA static cache
        # indices and cross-step scheduling freedom. Identical math.
        carry = (x0, k0, v0)
        outs = []
        for pos in range(S):  # python ints -> static slice indices
            carry, y = step(carry, pos)
            outs.append(y)
        dec_out = jnp.stack(outs, axis=1)  # (B, S, d)
    else:
        (_, _, _), ys = jax.lax.scan(step, (x0, k0, v0), jnp.arange(S))
        dec_out = jnp.transpose(ys, (1, 0, 2))  # (B, S, d)
    return decoder.apply(variables, dec_out, False, method=Decoder.generate_output)
