"""Frozen configuration dataclasses for the whole framework.

The reference scatters module-level constants across entry points
(reference: utilityFunctions.py:8-10, evaluation_reconstruction.py:17-33,
evaluation_style_transfer.py:19-36) with *divergent* values (overlap 96 vs 86).
Here there is exactly one config object per concern, consumed everywhere; the
two historical overlap values are both representable (`overlap_frames` for the
training/data path, `eval_overlap_frames` for the eval/inference path) so the
reference's observed behavior can be reproduced or unified behind one flag.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Audio/DSP constants (reference: utilityFunctions.py:8-10,12,39,105)."""

    sample_rate: int = 22050
    clip_seconds: float = 10.0

    # STFT
    n_fft: int = 1024
    hop_length: int = 256

    # CQT
    cqt_bins: int = 84
    cqt_bins_per_octave: int = 12
    cqt_fmin: float = 32.70319566257483  # C1, librosa.note_to_hz("C1")
    cqt_filter_scale: float = 1.0
    cqt_sparsity: float = 0.01
    # "recursive" = librosa's octave-downsampling evaluation (the algorithm
    # the reference's librosa.cqt actually runs; 5.6x faster batched on TPU —
    # 17.5 ms vs 98 ms at B=32 — with a Kaiser-windowed decimator keeping the
    # delta vs the direct evaluation at ~0.5% even on broadband content);
    # "direct" = all bins at the full rate, no resampling error
    cqt_algorithm: str = "recursive"
    # STFT/ISTFT evaluation: "fft" (jnp.fft), "matmul" (DFT as MXU matmuls),
    # "ct" (two-stage Cooley-Tukey matmul), or "auto" = matmul on TPU / fft
    # elsewhere. On TPU the DFT matmul at dft_precision="high" is BOTH ~1.7x
    # faster than jnp.fft (5.9 vs 10.6 ms stft, 6.3 vs 10.0 ms istft at
    # B=32) and more accurate on the inverse: XLA's TPU IRFFT shows ~2.9e-1
    # max relative error vs a fp64 oracle (scripts/cmp_irfft_diag.py), while
    # the matmul at "high" (bf16x3) holds ~4e-5.
    stft_method: str = "auto"
    # Precision for the DFT/CQT matmul evaluations: "default" (one bf16
    # pass, ~2e-3), "high" (bf16x3, ~6e-5, fastest measured on-chip), or
    # "highest" (bf16x6, same accuracy as high on these sizes, slower).
    dft_precision: str = "high"
    # Recursive-CQT octave transform: "rfft" (rfft + sparse-basis matmul),
    # "matmul" (time-domain collapsed-kernel MXU matmul, identical
    # summands), or "auto" = matmul on TPU / rfft elsewhere.
    cqt_transform: str = "auto"

    # Windowing of spectrogram frames into model sections
    window_size: int = 287          # frames per section
    overlap_frames: int = 96        # training/data path (utilityFunctions.py:10)
    eval_overlap_frames: int = 86   # eval path int(287*0.3) (evaluation_style_transfer.py:27)

    @property
    def clip_samples(self) -> int:
        return int(self.clip_seconds * self.sample_rate)

    @property
    def stft_bins(self) -> int:
        return self.n_fft // 2 + 1  # 513

    @property
    def feat_bins(self) -> int:
        return self.stft_bins + self.cqt_bins  # 597

    @property
    def frames_per_clip(self) -> int:
        # torch.stft(center=True): 1 + n_samples // hop
        return 1 + self.clip_samples // self.hop_length  # 862

    def num_windows(self, n_frames: int, overlap: int | None = None) -> int:
        """Number of overlap windows produced for a T-frame spectrogram
        (reference: utilityFunctions.py:240-263 loop semantics)."""
        overlap = self.overlap_frames if overlap is None else overlap
        step = self.window_size - overlap
        n = 0
        for start in range(0, n_frames, step):
            end = min(start + self.window_size, n_frames)
            if end - start < self.window_size * 0.5:
                break
            n += 1
            if end == n_frames:
                break
        return n


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (reference: style_encoder.py:151-197,
    content_encoder.py:10-68, SimpleDecoder_TransformerOnly.py:10-45,
    discriminator.py:15)."""

    in_channels: int = 2
    cnn_channels: Tuple[int, ...] = (32, 64, 128, 256, 512, 512)
    cnn_out_dim: int = 256
    d_model: int = 256
    num_heads: int = 4
    num_layers: int = 4
    ff_mult: int = 4
    dropout: float = 0.1
    disc_hidden: int = 128
    num_classes: int = 2
    max_len: int = 500              # sinusoidal PE table length
    window_size: int = 287          # decoder frame height
    stft_bins: int = 513            # decoder frame width
    feat_bins: int = 597            # encoder input width (stft+cqt)
    use_cls: bool = True
    # Autoregressive feedback mode. "raw" is reference-faithful: each decode
    # step feeds the previous transformer OUTPUT back, un-normalized and in
    # output-embedding space, while teacher forcing trains on
    # input_norm(PE(encode(true frame))) — the train/inference mismatch that
    # makes the reference's AR rollout diverge after window 0
    # (SimpleDecoder_TransformerOnly.py:102-125 vs :80-100). "reencode"
    # (quirk fix, Config().unfaithful()) feeds back EXACTLY what teacher
    # forcing would see for the predicted frame:
    # input_norm(PE(encode(decode(y_t)))) — a perfectly-fit decoder then
    # rolls out identically to its teacher-forced pass.
    ar_feedback: str = "raw"
    # Compute dtype for the forward pass; params stay float32.
    dtype: str = "float32"
    # Alternative implementations for the CNN's first ResBlock (C_in=2) at
    # inference — the HBM-bound block (~8 ms of the 27 ms batch core at
    # B=32). Values (ops/pallas_block0.py block0_impl):
    #   "off"/"auto"  flax/XLA convs inside the encoder (the default and
    #          the parity oracle path; both alternatives below measured
    #          worse on the current v5e toolchain — see NOTES_NEXT.md)
    #   "xla"  folded-weight XLA rewrite: BN folded into conv weights,
    #          conv1 via space-to-depth, InstanceNorm shortcut as a
    #          per-sample affine (no full-size stats pass); GSPMD-safe but
    #          measured 23% slower in context (scripts/cmp_block0_xla.py)
    #   "on"   the fused Pallas kernel — interpret-mode-tested but FAULTS
    #          the TPU worker on the current libtpu; only for toolchains
    #          where scripts/cmp_block0_sizes.py passes. Runtime failures
    #          self-disable per-pipeline and drop back to the flax convs.
    fused_block0: str = "auto"
    # Rematerialize ResBlock activations in the backward pass (trades FLOPs
    # for HBM; the CNN stack over B*S windows dominates training memory).
    remat_cnn: bool = False

    @property
    def stft_dim(self) -> int:
        return 2 * self.window_size * self.stft_bins  # 294462

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    def tiny(self) -> "ModelConfig":
        """A scaled-down config for CI/dry-run tests (same topology)."""
        return dataclasses.replace(
            self,
            cnn_channels=(8, 16),
            cnn_out_dim=32,
            d_model=32,
            num_heads=2,
            num_layers=2,
            disc_hidden=16,
            window_size=16,
            stft_bins=24,
            feat_bins=32,
        )


def resolve_dtype(dtype: str) -> str:
    """Resolve an inference-dtype knob: "auto" means bfloat16 on TPU-like
    backends, float32 everywhere else.

    bf16 on the inference batch core was measured at -10.6% device compute
    (demo/roofline_b32_bf16.json) with a 0.9% waveform rel-L2 delta vs fp32
    — the accuracy gate lives in tests/test_inference.py
    (test_bf16_pipeline_matches_f32) and bench.py re-measures the delta on
    every run, falling back to fp32 if it ever exceeds the gate. On CPU the
    emulated bf16 is slower AND the win was never measured there, so "auto"
    stays fp32. Params are float32 regardless (ModelConfig.dtype is the
    forward-compute dtype only)."""
    if dtype != "auto":
        return dtype
    import jax

    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - uninitialized backend
        return "float32"
    return "bfloat16" if backend in ("tpu", "axon") else "float32"


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Loss weighting (reference: losses.py + SimpleDecoder…:195-201 and the
    bundled paper §3.5; MSE weight 1.0 matches the primary decoder variant,
    new_decoder.py:405 uses 2.0)."""

    mse: float = 1.0
    magnitude: float = 0.5
    phase: float = 0.2
    temporal: float = 0.3
    spectral: float = 0.1

    infonce: float = 1.0
    infonce_temperature: float = 0.1
    margin: float = 1.0
    margin_value: float = 2.0
    hsic: float = 20.0
    adv_style: float = 1.0
    adv_content: float = 1.0
    adv_class: float = 0.5


@dataclasses.dataclass(frozen=True)
class CurriculumSchedule:
    """4-phase curriculum (reference: README.md:144-150, paper §3.5/Appendix:
    recon -> +contrastive -> +HSIC -> +adversarial with dynamic weight)."""

    phase_epochs: Tuple[int, ...] = (10, 20, 30)  # phase boundaries
    adv_weight_max: float = 1.0
    adv_warmup_epochs: int = 10

    def weights_at(self, epoch: int) -> dict:
        contrastive = 1.0 if epoch >= self.phase_epochs[0] else 0.0
        hsic = 1.0 if epoch >= self.phase_epochs[1] else 0.0
        if epoch >= self.phase_epochs[2]:
            ramp = min(1.0, (epoch - self.phase_epochs[2] + 1) / max(1, self.adv_warmup_epochs))
            adv = self.adv_weight_max * ramp
        else:
            adv = 0.0
        return {"contrastive": contrastive, "hsic": hsic, "adversarial": adv}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    learning_rate: float = 1e-4
    disc_learning_rate: float = 1e-4
    weight_decay: float = 0.0
    warmup_steps: int = 500
    # cosine-decay the generator LR from its peak to lr/10 over this many
    # steps after warmup; 0 = constant after warmup (the reconstructed
    # reference recipe). Set from the CLI as epochs * steps_per_epoch.
    lr_decay_steps: int = 0
    grad_clip_norm: float = 1.0
    num_epochs: int = 100
    checkpoint_every: int = 10
    seed: int = 0
    # Scheduled sampling (capability add; the reference trains pure teacher
    # forcing, which leaves the AR rollout untrained against its own
    # feedback errors): max probability of feeding the decoder its own
    # REENCODED prediction (the ar_feedback="reencode" rollout transform)
    # instead of the teacher frame, ramped linearly from 0 over
    # scheduled_sampling_ramp_epochs. 0 = off (faithful recipe).
    scheduled_sampling: float = 0.0
    scheduled_sampling_ramp_epochs: int = 100
    # Feedback iterations for scheduled sampling. 1 = classic one-step
    # scheduled sampling. >= S-1 (with scheduled_sampling=1.0) makes the
    # sampled forward EQUAL the reencode autoregressive rollout (causal
    # induction: iteration k fixes input positions <= k), so the loss trains
    # the true rollout; the train step then mixes the teacher-forced loss
    # and the rollout loss 50/50 (models/decoder.py forward_training).
    scheduled_sampling_iterations: int = 1
    # Weight of the rollout loss in iterated-sampling mode: recon =
    # (1-w)*TF + w*rollout. 0.5 (the original 50/50 mix) trains tracking
    # hardest but measurably stalls TF optimization (the round-4 ss run
    # plateaued at mse_tf 0.79 where the pure-TF run reached 0.31); smaller
    # weights preserve TF fidelity while still training the rollout — the
    # round-5 recipe fine-tunes a converged pure-TF checkpoint at w=0.5
    # for a short phase instead of mixing from scratch.
    rollout_weight: float = 0.5
    # Rollout->TF consistency distillation (iterated-sampling mode only):
    # adds  w * mse(rollout, stop_gradient(TF))  to the generator loss.
    # The rollout/TF recon mix above pulls both branches toward the TARGET;
    # this term additionally pulls the rollout toward the (frozen)
    # teacher-forced output itself — the quantity AR-vs-TF tracking
    # measures (scripts/ar_tracking_check.py) — without perturbing the TF
    # fit (no gradient flows through the TF branch). 0 = off.
    rollout_consistency_weight: float = 0.0
    # mesh axis sizes; (n, 1) = pure data parallel
    mesh_shape: Tuple[int, int] = (1, 1)  # (data, model)
    # Pipeline-parallel decoder-stack training: > 1 routes the decoder
    # core's teacher-forced forward through the GPipe microbatched pipeline
    # (parallel/pipeline.py) over a mesh "pipe" axis of this size. Requires
    # model.num_layers % pipe_stages == 0 and a mesh carrying a "pipe" axis
    # passed to make_train_step. 1 = the monolithic (sequential) core.
    pipe_stages: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossWeights = dataclasses.field(default_factory=LossWeights)
    curriculum: CurriculumSchedule = dataclasses.field(default_factory=CurriculumSchedule)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    # Reference-faithful quirk behavior (PARITY.md quirk table). True (the
    # default) reproduces the reference exactly. `Config().unfaithful()`
    # flips every config-level quirk FIX on at once:
    #   * quirk #1 — unified overlap: eval uses the training overlap (96/96
    #     instead of 96 train / 86 eval)
    #   * inference-feature normalization: StyleTransferPipeline z-scores the
    #     inference features with the packaged training stats (the reference
    #     trains on normalized features but never normalizes at inference,
    #     evaluation_style_transfer.py:135-140)
    #   * AR feedback re-encoding: autoregressive decode feeds back
    #     input_norm(PE(encode(decoded frame))) — the transform teacher
    #     forcing applies — instead of the raw transformer output
    #     (ModelConfig.ar_feedback="reencode")
    faithful: bool = True

    def unfaithful(self) -> "Config":
        """The faithful=False preset: all quirk fixes enabled (see above)."""
        return dataclasses.replace(
            self,
            faithful=False,
            audio=dataclasses.replace(
                self.audio, eval_overlap_frames=self.audio.overlap_frames),
            model=dataclasses.replace(self.model, ar_feedback="reencode"),
        )


DEFAULT_CONFIG = Config()
