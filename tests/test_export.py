"""AOT deployment artifact tests (ast_tpu/export.py): export the fused
transfer program with jax.export, reload it, and run it with no model code.

The reference requires its full model source + hand-wired checkpoint loading
for inference (evaluation_style_transfer.py:214-252); the artifact makes the
serving host model-code-free."""

import io
import json
import os
import subprocess
import sys
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ast_tpu.eval import StyleTransferPipeline
from ast_tpu.export import export_pipeline, load_exported
from tests.test_inference import TINY, TINY_AUDIO


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    pipe = StyleTransferPipeline.init_random(TINY, seed=3)
    path = str(tmp_path_factory.mktemp("exported"))
    export_pipeline(pipe, path,
                    bucket_seconds=(TINY_AUDIO.clip_seconds,
                                    2 * TINY_AUDIO.clip_seconds))
    return pipe, path


def test_exported_matches_pipeline(artifact):
    """The exported program must reproduce the live pipeline bit-for-bit on
    the same platform (same trace, same params)."""
    pipe, path = artifact
    exp = load_exported(path)
    rng = np.random.default_rng(11)
    wav = (0.2 * rng.standard_normal(TINY_AUDIO.clip_samples)
           ).astype(np.float32)
    got = exp.transfer(wav, "violin")
    want = pipe.transfer(wav, "violin")
    np.testing.assert_array_equal(got, want)
    # the other target must route through the class-embedding table
    got_p = exp.transfer(wav, "piano")
    assert not np.allclose(got, got_p)


def test_exported_bucket_padding(artifact):
    """A short clip pads to the smallest fitting bucket and trims back to its
    own istft length — same semantics as transfer_any_length."""
    pipe, path = artifact
    exp = load_exported(path)
    rng = np.random.default_rng(12)
    hop = TINY_AUDIO.hop_length
    n = TINY_AUDIO.clip_samples - 3 * hop - 7
    wav = (0.2 * rng.standard_normal(n)).astype(np.float32)
    got = exp.transfer(wav, "piano")
    assert got.shape == (hop * (n // hop),)
    want = pipe.transfer_any_length(wav, "piano",
                                    bucket_seconds=TINY_AUDIO.clip_seconds)
    np.testing.assert_array_equal(got, want)
    # a clip using the second bucket
    n2 = int(1.5 * TINY_AUDIO.clip_samples)
    wav2 = (0.2 * rng.standard_normal(n2)).astype(np.float32)
    out2 = exp.transfer(wav2, "piano")
    assert out2.shape == (hop * (n2 // hop),)
    assert np.isfinite(out2).all()


def test_exported_rejects_oversized_and_unknown(artifact):
    _, path = artifact
    exp = load_exported(path)
    with pytest.raises(ValueError, match="largest exported bucket"):
        exp.process_audio(np.zeros(3 * TINY_AUDIO.clip_samples, np.float32), 1)
    with pytest.raises(KeyError):
        exp.transfer(np.zeros(64, np.float32), "guitar")


@pytest.fixture(scope="module")
def batched_artifact(tmp_path_factory):
    """pcm16-wire artifact with the batched serving core (rungs 1 and 2)."""
    pipe = StyleTransferPipeline.init_random(TINY, seed=3)
    path = str(tmp_path_factory.mktemp("exported_b"))
    export_pipeline(pipe, path, bucket_seconds=(TINY_AUDIO.clip_seconds,),
                    batch_sizes=(1, 2), wire="pcm16")
    return pipe, path


def test_exported_batched_pcm16_matches_pipeline(batched_artifact):
    """The exported batched core must reproduce the live batched path on the
    same platform, through the pcm16 wire both ways."""
    pipe, path = batched_artifact
    exp = load_exported(path)
    assert exp.wire == "pcm16"
    assert exp.batch_rungs() == (1, 2)
    rng = np.random.default_rng(21)
    wavs = (0.2 * rng.standard_normal((2, TINY_AUDIO.clip_samples))
            ).astype(np.float32)
    ids = np.array([0, 1], np.int32)
    got = exp.process_audio_batch(wavs, ids)
    want = pipe.process_audio_batch(wavs, ids, wire="pcm16")
    np.testing.assert_array_equal(got, want)
    # B=1 routes through the single-clip program, rows padded/trimmed
    got1 = exp.process_audio_batch(wavs[:1], ids[:1])
    np.testing.assert_array_equal(got1[0], exp.process_audio(wavs[0], 0))
    # guard rails: wire mismatch and over-rung batches are explicit errors
    with pytest.raises(ValueError, match="wire"):
        exp.process_audio(wavs[0], 0, wire="f32")
    with pytest.raises(ValueError, match="largest exported rung"):
        exp.process_audio_batch(np.zeros((3, TINY_AUDIO.clip_samples),
                                         np.float32), np.zeros(3, np.int32))


def test_serve_from_artifact(batched_artifact):
    """The HTTP daemon serves an exported artifact: transfer round-trips,
    /healthz reports the artifact, /stream is 501 (needs model code)."""
    from ast_tpu.serve import TransferServer

    pipe, path = batched_artifact
    exp = load_exported(path)
    srv = TransferServer(exp, port=0, max_seconds=60.0,
                         batch_ladder=exp.batch_rungs(), wire=exp.wire,
                         artifact=path)
    srv.start_background()
    try:
        host, port = srv.address[:2]
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["streaming"] is False and h["artifact"] == path
        assert set(h["targets"]) == {"piano", "violin"}

        sr = TINY_AUDIO.sample_rate
        rng = np.random.default_rng(22)
        wav = (0.2 * rng.standard_normal(TINY_AUDIO.clip_samples)
               ).astype(np.float32)
        buf = io.BytesIO()
        pcm = np.clip(np.round(wav * 32768.0), -32768, 32767).astype("<i2")
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        req = urllib.request.Request(base + "/transfer?target=violin",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            body = r.read()
        with wave.open(io.BytesIO(body), "rb") as w:
            out = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        # the daemon serves exactly what the artifact computes (modulo the
        # wav body's own 16-bit quantization)
        hop = TINY_AUDIO.hop_length
        want = exp.process_audio(pcm.astype(np.float32) / 32768.0, 1)
        want = np.clip(want[: hop * (len(wav) // hop)], -1.0, 1.0)
        np.testing.assert_array_equal(
            out, np.clip(np.round(want * 32768.0), -32768, 32767)
            .astype(np.int16))

        # live streaming needs the incremental model step -> 501
        req = urllib.request.Request(base + "/stream?target=violin",
                                     data=pcm.tobytes(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 501
    finally:
        srv.shutdown()


def test_exported_runs_without_model_code(artifact):
    """The load path must not import flax or any ast_tpu model/eval module —
    the whole point of the artifact is a model-code-free serving host."""
    _, path = artifact
    code = f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import numpy as np
from ast_tpu.export import load_exported

exp = load_exported({path!r})
wav = np.zeros({int(TINY_AUDIO.clip_samples)}, np.float32)
out = exp.transfer(wav, "violin")
assert out.shape[0] > 0 and np.isfinite(out).all()
banned = [m for m in sys.modules
          if m.startswith("flax") or m.startswith("ast_tpu.models")
          or m.startswith("ast_tpu.eval")]
assert not banned, f"model code imported on the load path: {{banned}}"
print("OK", out.shape[0])
"""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, env=env)
    assert res.returncode == 0, res.stderr
    assert res.stdout.startswith("OK")


# ---------------------------------------------------------------------------
# live streaming from the artifact (stream_contexts exports): the /stream
# 501 above remains only for artifacts exported WITHOUT the streaming step
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def stream_artifact(tmp_path_factory):
    """Artifact carrying the jax.export'd per-window streaming step (K=4)."""
    pipe = StyleTransferPipeline.init_random(TINY, seed=3)
    path = str(tmp_path_factory.mktemp("exported_s"))
    export_pipeline(pipe, path, bucket_seconds=(TINY_AUDIO.clip_seconds,),
                    stream_contexts=(4,))
    return pipe, path


def test_stream_from_artifact_matches_live(stream_artifact):
    """An artifact stream session must reproduce the live pipeline's
    StreamingTransfer bit-for-bit (same trace, same params, same platform)."""
    from ast_tpu.eval.streaming import StreamingTransfer

    pipe, path = stream_artifact
    exp = load_exported(path)
    assert exp.supports_streaming
    rng = np.random.default_rng(31)
    wav = (0.1 * rng.standard_normal(2 * TINY_AUDIO.clip_samples)
           ).astype(np.float32)
    got = exp.stream_session("violin", context=4).process(wav)
    want = StreamingTransfer(pipe, target="violin",
                             context_windows=4).process(wav)
    np.testing.assert_array_equal(got, want)
    # guard rails: un-exported context / mismatched margin are explicit
    with pytest.raises(ValueError, match="no exported stream program"):
        exp.stream_session("violin", context=6)
    with pytest.raises(ValueError, match="margin"):
        exp.stream_session("violin", context=4, margin=1)


def test_stream_from_artifact_http(stream_artifact):
    """--artifact daemons serve /stream when the artifact carries the
    streaming step: the chunked PCM16 response equals the local artifact
    session's output."""
    from ast_tpu.serve import TransferServer

    pipe, path = stream_artifact
    exp = load_exported(path)
    srv = TransferServer(exp, port=0, max_seconds=60.0, artifact=path)
    srv.start_background()
    try:
        host, port = srv.address[:2]
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["streaming"] is True

        rng = np.random.default_rng(32)
        wav = (0.2 * rng.standard_normal(2 * TINY_AUDIO.clip_samples)
               ).astype(np.float32)
        pcm = np.clip(np.round(wav * 32768.0), -32768, 32767).astype("<i2")
        req = urllib.request.Request(
            base + "/stream?target=violin&context=4",
            data=pcm.tobytes(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            got = np.frombuffer(r.read(), "<i2")

        out = exp.stream_session("violin", context=4).process(
            pcm.astype(np.float32) / 32768.0)
        want = np.clip(np.round(out * 32768.0), -32768, 32767).astype("<i2")
        np.testing.assert_array_equal(got, want)
    finally:
        srv.shutdown()
