"""End-to-end tests of the evaluation drivers and checkpoint/resume on the
tiny config + synthetic wav fixture: outputs (per-sample txt, aggregate json,
global statistics) must appear in the reference's formats."""

import dataclasses
import json
import os

import numpy as np
import pytest
import jax

from ast_tpu.config import AudioConfig, Config, ModelConfig, TrainConfig
from ast_tpu.data import make_wav_fixture
from ast_tpu.eval.model_loading import load_eval_bundle
from ast_tpu.eval.reconstruction import process_test_set_with_dataloader, save_results_json
from ast_tpu.eval.style_transfer import process_test_set, save_global_statistics
from ast_tpu.train import Models, init_state
from ast_tpu.train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint

TINY_AUDIO = AudioConfig(
    sample_rate=4000, clip_seconds=0.5, n_fft=64, hop_length=64,
    cqt_bins=12, cqt_fmin=200.0, window_size=16,
    overlap_frames=5, eval_overlap_frames=5,
)
TINY_MODEL = dataclasses.replace(
    ModelConfig().tiny(), window_size=16,
    stft_bins=TINY_AUDIO.stft_bins, feat_bins=TINY_AUDIO.feat_bins)
TINY = Config(audio=TINY_AUDIO, model=TINY_MODEL,
              train=TrainConfig(batch_size=2, num_epochs=1))


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    make_wav_fixture(str(root), n_clips=2, cfg=TINY_AUDIO)
    return str(root)


def test_reconstruction_driver(fixture_dir, tmp_path):
    out = str(tmp_path / "recon_out")
    metrics = process_test_set_with_dataloader(
        fixture_dir, out, cfg=TINY, checkpoint_dir=None, stats_dir=None,
        batch_size=2)
    # 2 fixture pairs, half-batch=1 -> 2 batches; unlike the reference's
    # collate (which discards the second half of every item batch,
    # dataloader.py:133-141) every pair is evaluated
    assert len(metrics["piano_reconstruction"]) == 2
    assert len(metrics["violin_reconstruction"]) == 2
    txts = [f for root, _, files in os.walk(out) for f in files
            if f.endswith("_metrics.txt")]
    assert len(txts) == 4
    path = save_results_json(metrics, out)
    with open(path) as f:
        data = json.load(f)
    assert set(data) == {"piano_reconstruction", "violin_reconstruction"}
    sample = data["piano_reconstruction"][0]
    assert set(sample) == {"chroma_distance", "onset_accuracy",
                           "pitch_correlation", "mse_spectrogram"}


def test_style_transfer_driver(fixture_dir, tmp_path):
    out = str(tmp_path / "st_out")
    metrics = process_test_set(fixture_dir, out, batch_size=2, cfg=TINY,
                               checkpoint_dir=None, stats_dir=None)
    assert len(metrics["piano_to_violin"]) == 2
    assert len(metrics["violin_to_piano"]) == 2
    stats = save_global_statistics(metrics, out)
    content = open(stats).read()
    assert "Global Style Transfer Statistics" in content
    assert "Piano To Violin" in content
    # per-sample txt
    p2v = os.listdir(os.path.join(out, "from_piano_to_violin"))
    assert any(f.endswith(".txt") for f in p2v)
    body = open(os.path.join(out, "from_piano_to_violin", p2v[0])).read()
    assert "Chroma Similarity" in body


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = TINY
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=2)
    protos = np.ones((2, cfg.model.d_model), np.float32)
    path = save_checkpoint(str(tmp_path), 5, state, protos)
    assert latest_checkpoint(str(tmp_path)) == os.path.join(
        str(tmp_path), "checkpoint_epoch_5")

    template = init_state(cfg, models, jax.random.PRNGKey(1), sections_per_clip=2)
    restored, protos_r = load_checkpoint(
        path, template, class_prototypes_shape=(2, cfg.model.d_model))
    np.testing.assert_allclose(np.asarray(protos_r), protos)
    a = jax.tree.leaves(state.decoder["params"])
    b = jax.tree.leaves(restored.decoder["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_checkpoint_async_save(tmp_path):
    """block=False saves on a background thread; wait_for_checkpoints joins
    it and the file round-trips. A failing async save surfaces at the wait
    (not silently)."""
    from ast_tpu.train.checkpoint import save_checkpoint as save
    from ast_tpu.train.checkpoint import wait_for_checkpoints

    cfg = TINY
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(2), sections_per_clip=2)
    protos = np.full((2, cfg.model.d_model), 2.0, np.float32)
    path = save(str(tmp_path), 7, state, protos, block=False)
    wait_for_checkpoints()
    template = init_state(cfg, models, jax.random.PRNGKey(3),
                          sections_per_clip=2)
    restored, protos_r = load_checkpoint(
        path, template, class_prototypes_shape=(2, cfg.model.d_model))
    np.testing.assert_allclose(np.asarray(protos_r), protos)
    for x, y in zip(jax.tree.leaves(state.style["params"]),
                    jax.tree.leaves(restored.style["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # error propagation: make the target un-creatable (the parent
    # "directory" is a file, so the checkpoint dir cannot be created)
    blocker = tmp_path / "blocked"
    blocker.write_text("not a directory")
    import pytest

    save(str(blocker), 9, state, protos, block=False)
    with pytest.raises(RuntimeError, match="async checkpoint save"):
        wait_for_checkpoints()


@pytest.mark.slow
def test_eval_bundle_uses_checkpoint_prototypes(tmp_path):
    cfg = TINY
    models = Models.create(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=2)
    protos = np.full((2, cfg.model.d_model), 3.5, np.float32)
    save_checkpoint(str(tmp_path), 1, state, protos)
    bundle = load_eval_bundle(cfg, checkpoint_dir=str(tmp_path),
                              sections_per_clip=2)
    np.testing.assert_allclose(np.asarray(bundle.class_prototypes), protos)


@pytest.mark.slow
def test_train_loop_end_to_end(fixture_dir, tmp_path):
    """One real epoch: wav fixture -> balanced batches -> train -> checkpoint."""
    from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches
    from ast_tpu.train.loop import train

    cfg = dataclasses.replace(
        TINY, train=TrainConfig(batch_size=2, num_epochs=1, checkpoint_every=1))
    ds = DualInstrumentDataset.from_dirs(
        os.path.join(fixture_dir, "piano"), os.path.join(fixture_dir, "violin"),
        stats_dir=None, cfg=cfg.audio)
    T = cfg.audio.frames_per_clip
    S = cfg.audio.num_windows(T)

    state = train(
        cfg,
        lambda epoch: balanced_batches(ds, 2, shuffle=True, epoch=epoch),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sections_per_clip=S,
    )
    assert int(state.step) >= 1
    assert latest_checkpoint(str(tmp_path / "ckpt")) is not None

    # close the loop: trained checkpoint -> eval bundle -> pipeline -> one
    # HTTP serving request (the full user journey in one test)
    import io
    import urllib.request
    import wave

    from ast_tpu.eval.inference import StyleTransferPipeline
    from ast_tpu.serve import TransferServer

    bundle = load_eval_bundle(cfg, checkpoint_dir=str(tmp_path / "ckpt"),
                              sections_per_clip=S)
    assert bundle.class_prototypes is not None  # persisted by the train loop
    pipe = StyleTransferPipeline.from_variables(
        cfg, bundle.state.content, bundle.state.decoder,
        bundle.class_prototypes)
    srv = TransferServer(pipe, port=0, max_seconds=10.0,
                         bucket_seconds=cfg.audio.clip_seconds)
    srv.start_background()
    try:
        host, port = srv.address[:2]
        wav_path = os.path.join(fixture_dir, "piano",
                                sorted(os.listdir(os.path.join(
                                    fixture_dir, "piano")))[0])
        req = urllib.request.Request(
            f"http://{host}:{port}/transfer?target=violin",
            data=open(wav_path, "rb").read(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            with wave.open(io.BytesIO(r.read()), "rb") as w:
                assert w.getnframes() > 0
    finally:
        srv.shutdown()
