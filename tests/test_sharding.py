"""Multi-device sharding tests on the 8-device virtual CPU mesh: data-parallel
train step and tensor-parallel codec sharding compile and execute."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ast_tpu.config import Config, ModelConfig
from ast_tpu.parallel import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_variables,
)
from ast_tpu.train import Models, init_state, make_train_step

TINY_CFG = dataclasses.replace(Config(), model=ModelConfig().tiny())


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh((4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = make_mesh()
    assert mesh2.shape == {"data": 8, "model": 1}


def test_mesh_degrades_to_dp_on_device_mismatch():
    # single-chip host asked for a (4,2) mesh: degrade to (n,1), don't fail
    import warnings

    one = jax.devices()[:1]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mesh = make_mesh((4, 2), devices=one)
    assert mesh.shape == {"data": 1, "model": 1}
    import pytest

    with pytest.raises(ValueError):
        make_mesh((4, 2), devices=one, strict=True)


@pytest.mark.slow
def test_codec_param_sharding_rule():
    cfg = TINY_CFG
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=2)
    mesh = make_mesh((4, 2))
    shardings = param_sharding(state.decoder["params"], mesh)
    fc = shardings["frame_codec"]
    assert fc["stft_to_embedding"]["kernel"].spec == P(MODEL_AXIS, None)
    assert fc["embedding_to_stft"]["kernel"].spec == P(None, MODEL_AXIS)
    assert fc["embedding_to_stft"]["bias"].spec == P(MODEL_AXIS)
    # everything else replicated
    assert shardings["content_proj"]["kernel"].spec == P()


@pytest.mark.slow
def test_data_parallel_train_step(rng):
    cfg = TINY_CFG
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=2)
    step = make_train_step(cfg, models)

    mesh = make_mesh((8, 1))
    bsh = batch_sharding(mesh)
    m = cfg.model
    B, S = 8, 2
    x = jax.device_put(
        jnp.asarray(rng.standard_normal(
            (B, S, 2, m.window_size, m.feat_bins)).astype(np.float32)), bsh)
    labels = jax.device_put(jnp.asarray(np.array([0] * 4 + [1] * 4)), bsh)
    state = jax.tree.map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P())), state)

    curr = {k: jnp.asarray(1.0) for k in ("contrastive", "hsic", "adversarial")}
    new_state, metrics = step(state, x, labels, curr)
    assert np.isfinite(float(metrics["loss/total"]))
    assert int(new_state.step) == 1


def test_tensor_parallel_codec_forward(rng):
    """Shard the codec projections across the model axis and check the decoder
    forward still matches the replicated result."""
    cfg = TINY_CFG
    models = Models.create(cfg)
    m = cfg.model
    B, S = 2, 2
    content = jnp.asarray(rng.standard_normal((B, S, m.d_model)).astype(np.float32))
    class_emb = jnp.asarray(rng.standard_normal((B, m.d_model)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(
        (B, S, 2, m.window_size, m.stft_bins)).astype(np.float32))
    variables = models.decoder.init(jax.random.PRNGKey(0), content, class_emb, y)

    expected = np.asarray(models.decoder.apply(variables, content, class_emb, y))

    mesh = make_mesh((4, 2))
    sharded_vars = shard_variables(variables, mesh)
    out = np.asarray(
        jax.jit(lambda v, c, e, t: models.decoder.apply(v, c, e, t))(
            sharded_vars, content, class_emb, y))
    np.testing.assert_allclose(out, expected, atol=1e-5)


@pytest.mark.slow
def test_mesh_aware_train_loop(rng, tmp_path):
    """train() with a mesh: full epoch on the 8-device CPU mesh."""
    import os

    from ast_tpu.config import AudioConfig, TrainConfig
    from ast_tpu.data import make_wav_fixture
    from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches
    from ast_tpu.train.loop import train

    audio = AudioConfig(sample_rate=4000, clip_seconds=0.5, n_fft=64,
                        hop_length=64, cqt_bins=12, cqt_fmin=200.0,
                        window_size=16, overlap_frames=5, eval_overlap_frames=5)
    model = dataclasses.replace(ModelConfig().tiny(), window_size=16,
                                stft_bins=audio.stft_bins,
                                feat_bins=audio.feat_bins)
    cfg = dataclasses.replace(Config(), audio=audio, model=model,
                              train=TrainConfig(batch_size=8, num_epochs=1))

    root = str(tmp_path)
    make_wav_fixture(root, n_clips=4, cfg=audio)
    ds = DualInstrumentDataset.from_dirs(os.path.join(root, "piano"),
                                         os.path.join(root, "violin"),
                                         stats_dir=None, cfg=audio)
    S = audio.num_windows(audio.frames_per_clip)
    mesh = make_mesh((4, 2))
    state = train(cfg, lambda e: balanced_batches(ds, 8, epoch=e),
                  sections_per_clip=S, mesh=mesh)
    assert int(state.step) >= 1


@pytest.mark.slow
def test_sharded_batch_inference(rng):
    """Data-parallel serving path: process_audio_batch_sharded on the 8-device
    mesh matches the single-device batch path, including batch padding (B=5
    does not divide the 4-wide data axis)."""
    from ast_tpu.config import AudioConfig
    from ast_tpu.eval.inference import StyleTransferPipeline

    audio = AudioConfig(sample_rate=4000, clip_seconds=0.5, n_fft=64,
                        hop_length=64, cqt_bins=12, cqt_fmin=200.0,
                        window_size=16, overlap_frames=5, eval_overlap_frames=5)
    model = dataclasses.replace(ModelConfig().tiny(), window_size=16,
                                stft_bins=audio.stft_bins,
                                feat_bins=audio.feat_bins)
    cfg = dataclasses.replace(Config(), audio=audio, model=model)
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)

    B = 5
    wavs = rng.standard_normal((B, int(audio.clip_samples))).astype(np.float32)
    ids = np.array([1, 0, 1, 1, 0])

    expected = pipe.process_audio_batch(wavs, ids)
    mesh = make_mesh((4, 2))
    out = pipe.process_audio_batch_sharded(wavs, ids, mesh=mesh)
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, atol=2e-4)

    # tensor-parallel codec variant agrees too
    out_tp = pipe.process_audio_batch_sharded(wavs, ids, mesh=mesh,
                                              tensor_parallel=True)
    np.testing.assert_allclose(out_tp, expected, atol=2e-4)


@pytest.mark.slow
def test_sequence_parallel_long_clip(rng):
    """Sequence-parallel single-clip path: process_audio_sp shards the
    window axis S of ONE long clip across the mesh's data axis (GSPMD
    constraints around the per-window CNN) and matches the unsharded
    process_audio output."""
    from ast_tpu.config import AudioConfig
    from ast_tpu.eval.inference import StyleTransferPipeline

    audio = AudioConfig(sample_rate=4000, clip_seconds=4.0, n_fft=64,
                        hop_length=64, cqt_bins=12, cqt_fmin=200.0,
                        window_size=16, overlap_frames=5, eval_overlap_frames=5)
    model = dataclasses.replace(ModelConfig().tiny(), window_size=16,
                                stft_bins=audio.stft_bins,
                                feat_bins=audio.feat_bins)
    cfg = dataclasses.replace(Config(), audio=audio, model=model)
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)

    wav = rng.standard_normal(int(audio.clip_samples)).astype(np.float32)
    S = audio.num_windows(audio.frames_per_clip, audio.eval_overlap_frames)
    assert S >= 8, S  # long enough that every mesh shard holds windows

    expected = pipe.process_audio(wav, 1)
    out = pipe.process_audio_sp(wav, 1, mesh=make_mesh((8, 1)))
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, atol=2e-4)
    # a (4,2) mesh (data axis 4, S=... not divisible is fine: GSPMD pads)
    out2 = pipe.process_audio_sp(wav, 1, mesh=make_mesh((4, 2)))
    np.testing.assert_allclose(out2, expected, atol=2e-4)


def test_distributed_helpers_single_process():
    from ast_tpu.parallel import initialize_distributed, local_batch_slice, process_info

    initialize_distributed()  # no-op single process
    idx, count = process_info()
    assert idx == 0 and count == 1
    assert local_batch_slice(8) == slice(0, 8)
    import pytest
    with pytest.raises(ValueError):
        local_batch_slice(7) if count == 2 else (_ for _ in ()).throw(ValueError)
