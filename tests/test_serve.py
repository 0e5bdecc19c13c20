"""HTTP serving daemon tests (tiny config, random weights, CPU mesh)."""

import io
import json
import os
import urllib.request
import wave

import numpy as np
import pytest

from ast_tpu.eval.inference import StyleTransferPipeline
from ast_tpu.serve import TransferServer
from tests.test_inference import TINY, TINY_AUDIO


@pytest.fixture(scope="module")
def server():
    pipe = StyleTransferPipeline.init_random(TINY, seed=0)
    srv = TransferServer(pipe, port=0, max_seconds=60.0,
                         bucket_seconds=TINY_AUDIO.clip_seconds)
    srv.start_background()
    host, port = srv.address[:2]
    yield f"http://{host}:{port}"
    srv.shutdown()


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    pcm = np.clip(np.round(wav * 32768.0), -32768, 32767).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert set(h["targets"]) == {"piano", "violin"}


def test_transfer_roundtrip(server):
    sr = TINY_AUDIO.sample_rate
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(TINY_AUDIO.clip_samples)).astype(np.float32)
    status, body, ctype = _post(server + "/transfer?target=violin",
                                _wav_bytes(wav, sr))
    assert status == 200, body
    assert ctype == "audio/wav"
    with wave.open(io.BytesIO(body), "rb") as w:
        assert w.getframerate() == sr
        out = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    # istft output length = hop * (T - 1) for the padded bucket
    assert out.size > 0
    assert np.isfinite(out.astype(np.float32)).all()

    # /reconstruct is the same-class alias
    status, body, _ = _post(server + "/reconstruct?target=piano",
                            _wav_bytes(wav, sr))
    assert status == 200, body


def test_bad_requests(server):
    sr = TINY_AUDIO.sample_rate
    wav = np.zeros(TINY_AUDIO.clip_samples, np.float32)
    # unknown target
    status, body, _ = _post(server + "/transfer?target=guitar",
                            _wav_bytes(wav, sr))
    assert status == 400
    assert b"unknown target" in body
    # undecodable body
    status, body, _ = _post(server + "/transfer?target=violin", b"not audio")
    assert status == 400
    # unknown path
    status, body, _ = _post(server + "/nope", b"x")
    assert status == 404


def test_concurrent_requests_coalesce(server):
    """Concurrent clients: decode/encode threads overlap and same-bucket
    device work COALESCES into batched device calls (dynamic batching) —
    all requests succeed and the /stats histogram shows a group size > 1."""
    import concurrent.futures

    sr = TINY_AUDIO.sample_rate
    rng = np.random.default_rng(7)
    bodies = [_wav_bytes((0.1 * rng.standard_normal(
        TINY_AUDIO.clip_samples)).astype(np.float32), sr) for _ in range(12)]

    def one(i):
        target = ("violin", "piano")[i % 2]
        return _post(server + f"/transfer?target={target}", bodies[i])[0]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        codes = list(ex.map(one, range(12)))
    assert codes == [200] * 12

    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    sizes = {int(k): v for k, v in s["batch_sizes"].items()}
    assert sizes, "no device calls recorded"
    assert max(sizes) > 1, f"requests never coalesced: {sizes}"
    # every request was served by exactly one group slot
    assert sum(k * v for k, v in sizes.items()) >= 12


def test_batched_matches_single(server):
    """A clip served inside a coalesced batch must produce the same audio
    as the same clip served alone (the batched core is numerically the
    same program modulo vmap)."""
    import concurrent.futures

    sr = TINY_AUDIO.sample_rate
    rng = np.random.default_rng(11)
    wav = (0.1 * rng.standard_normal(TINY_AUDIO.clip_samples)).astype(np.float32)
    body = _wav_bytes(wav, sr)

    # alone (no concurrent traffic): group of 1
    solo = _post(server + "/transfer?target=violin", body)
    assert solo[0] == 200

    # under concurrency: the same body again, racing 7 fillers
    filler = [_wav_bytes((0.1 * rng.standard_normal(
        TINY_AUDIO.clip_samples)).astype(np.float32), sr) for _ in range(7)]

    def one(b):
        return _post(server + "/transfer?target=violin", b)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, [body] + filler))
    assert all(r[0] == 200 for r in results)

    def pcm(buf):
        with wave.open(io.BytesIO(buf), "rb") as w:
            return np.frombuffer(w.readframes(w.getnframes()), "<i2")

    a, b = pcm(solo[1]), pcm(results[0][1])
    assert a.shape == b.shape
    # identical up to fp reassociation in the vmapped program (+-1 PCM step)
    assert np.max(np.abs(a.astype(np.int32) - b.astype(np.int32))) <= 1


@pytest.mark.slow
def test_warmup_precompiles_bucket(server):
    """After warmup(seconds), a request of a length in the same bucket is
    served without further compilation (and fast)."""
    import time

    pipe = StyleTransferPipeline.init_random(TINY, seed=1)
    srv = TransferServer(pipe, port=0, max_seconds=60.0,
                         bucket_seconds=TINY_AUDIO.clip_seconds)
    srv.start_background()
    try:
        srv.warmup([TINY_AUDIO.clip_seconds])
        host, port = srv.address[:2]
        sr = TINY_AUDIO.sample_rate
        wav = np.zeros(TINY_AUDIO.clip_samples, np.float32)
        t0 = time.perf_counter()
        status, _, _ = _post(f"http://{host}:{port}/transfer?target=piano",
                             _wav_bytes(wav, sr))
        dt = time.perf_counter() - t0
        assert status == 200
        # compiled path: well under the ~seconds a tiny-config compile takes
        assert dt < 2.0, dt
    finally:
        srv.shutdown()


def _post_accept_mp3(url, body):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Accept": "audio/mpeg"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), None


def test_mp3_response_off_grid_rate(server):
    """The fixture pipeline runs at 4000 Hz — off the MPEG rate grid — so
    Accept: audio/mpeg must be refused (lame would silently resample rather
    than fail) with 406 either way (no lame, or off-grid rate)."""
    sr = TINY_AUDIO.sample_rate
    wav = np.zeros(TINY_AUDIO.clip_samples, np.float32)
    status, body, _ = _post_accept_mp3(server + "/transfer?target=violin",
                                       _wav_bytes(wav, sr))
    assert status == 406, body


@pytest.mark.slow
def test_mp3_response_on_grid_rate():
    """A pipeline at an MPEG-grid rate (8000 Hz) returns a decodable mp3
    body for Accept: audio/mpeg when the native encoder is available."""
    import dataclasses
    import tempfile

    from ast_tpu.config import AudioConfig, Config, ModelConfig
    from ast_tpu.data.audio_io import mp3_supported, read_mp3
    from ast_tpu.eval.inference import StyleTransferPipeline

    audio = AudioConfig(sample_rate=8000, clip_seconds=0.5, n_fft=64,
                        hop_length=64, cqt_bins=12, cqt_fmin=200.0,
                        window_size=16, overlap_frames=5,
                        eval_overlap_frames=5)
    model = dataclasses.replace(ModelConfig().tiny(), window_size=16,
                                stft_bins=audio.stft_bins,
                                feat_bins=audio.feat_bins)
    cfg = Config(audio=audio, model=model)
    pipe = StyleTransferPipeline.init_random(cfg, seed=0)
    srv = TransferServer(pipe, port=0, max_seconds=30.0,
                         bucket_seconds=audio.clip_seconds)
    srv.start_background()
    try:
        host, port = srv.address[:2]
        wav = np.zeros(audio.clip_samples, np.float32)
        status, body, ctype = _post_accept_mp3(
            f"http://{host}:{port}/transfer?target=violin",
            _wav_bytes(wav, audio.sample_rate))
        if not mp3_supported():
            assert status == 406
            return
        assert status == 200 and ctype == "audio/mpeg", body
        with tempfile.NamedTemporaryFile(suffix=".mp3") as f:
            f.write(body)
            f.flush()
            decoded, dsr = read_mp3(f.name)
            assert decoded.size > 0 and dsr == audio.sample_rate
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_mulaw_wire_server():
    """A daemon configured with wire='mulaw8' serves correct audio (the
    companding happens on device inside the transfer program)."""
    pipe = StyleTransferPipeline.init_random(TINY, seed=3)
    srv = TransferServer(pipe, port=0, max_seconds=60.0,
                         bucket_seconds=TINY_AUDIO.clip_seconds,
                         wire="mulaw8")
    srv.start_background()
    try:
        host, port = srv.address[:2]
        sr = TINY_AUDIO.sample_rate
        rng = np.random.default_rng(5)
        wav = (0.1 * rng.standard_normal(TINY_AUDIO.clip_samples)
               ).astype(np.float32)
        status, body, ctype = _post(
            f"http://{host}:{port}/transfer?target=violin",
            _wav_bytes(wav, sr))
        assert status == 200 and ctype == "audio/wav", body
        with wave.open(io.BytesIO(body), "rb") as w:
            out = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        assert out.size > 0 and np.isfinite(out.astype(np.float32)).all()
        # must stay close to what the float pipeline produces (clipped to
        # the wav range, since mu-law egress clips on device)
        ref = np.clip(pipe.process_audio(
            np.pad(wav, (0, 0)), 1), -1.0, 1.0)
        hop = TINY_AUDIO.hop_length
        ref = ref[: hop * (len(wav) // hop)]
        got = out.astype(np.float32)[: len(ref)] / 32768.0
        scale = np.abs(ref).mean() + 1e-9
        assert np.abs(got - ref).mean() / scale < 0.05
    finally:
        srv.shutdown()


def test_oversized_body_closes_connection(server):
    """A 413 on an unconsumed body must close the keep-alive connection —
    otherwise the unread body bytes would be parsed as the next request."""
    import http.client

    host = server.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=30)
    try:
        conn.putrequest("POST", "/transfer?target=violin")
        conn.putheader("Content-Length", str(10 ** 10))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        resp.read()
        assert resp.will_close
    finally:
        conn.close()


def test_stats_endpoint(server):
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["requests"].get("transfer", 0) >= 1
    assert s["errors"] >= 1
    assert s["latency_ms"]["n"] >= 1 and s["latency_ms"]["p50"] > 0
    assert "batch_sizes" in s


# ---------------------------------------------------------------------------
# POST /stream — live chunked PCM16 streaming


def _stream_pcm(url_host: str, path: str, pcm: bytes, chunk: int = 4096,
                timeout: float = 300.0) -> bytes:
    """Send pcm bytes as a chunked request body; return the whole response
    body (http.client decodes the chunked response transparently)."""
    import http.client

    conn = http.client.HTTPConnection(url_host, timeout=timeout)
    try:
        blocks = (pcm[i:i + chunk] for i in range(0, len(pcm), chunk))
        conn.request("POST", path, body=blocks,
                     headers={"Transfer-Encoding": "chunked"},
                     encode_chunked=True)
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        return resp.read()
    finally:
        conn.close()


@pytest.fixture(scope="module")
def stream_server():
    pipe = StyleTransferPipeline.init_random(TINY, seed=2)
    srv = TransferServer(pipe, port=0, max_seconds=60.0,
                         bucket_seconds=TINY_AUDIO.clip_seconds)
    srv.start_background()
    host, port = srv.address[:2]
    yield pipe, f"{host}:{port}"
    srv.shutdown()


def test_stream_endpoint_matches_local_stream(stream_server):
    """The /stream endpoint must emit exactly what a local StreamingTransfer
    produces for the same PCM16 input (bit-identical after quantization)."""
    from ast_tpu.eval.streaming import StreamingTransfer

    pipe, host = stream_server
    rng = np.random.default_rng(21)
    wav = (0.2 * rng.standard_normal(3 * TINY_AUDIO.sample_rate)
           ).astype(np.float32)
    pcm_in = np.clip(np.round(wav * 32768.0), -32768, 32767).astype("<i2")
    body = _stream_pcm(host, "/stream?target=violin&context=4&margin=8",
                       pcm_in.tobytes(), chunk=1000)
    got = np.frombuffer(body, "<i2")

    local = StreamingTransfer(pipe, "violin", context_windows=4,
                              margin_frames=8)
    out = local.process(pcm_in.astype(np.float32) / 32768.0)
    want = np.clip(np.round(out * 32768.0), -32768, 32767).astype("<i2")
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_stream_endpoint_incremental(stream_server):
    """Output bytes must arrive BEFORE the request body is finished — the
    defining property of a streaming endpoint."""
    import socket

    pipe, host = stream_server
    h, p = host.split(":")
    rng = np.random.default_rng(22)
    sr = TINY_AUDIO.sample_rate
    wav = (0.2 * rng.standard_normal(4 * sr)).astype(np.float32)
    pcm = np.clip(np.round(wav * 32768.0), -32768, 32767).astype("<i2").tobytes()

    s = socket.create_connection((h, int(p)), timeout=120)
    try:
        s.sendall(b"POST /stream?target=piano&context=4&margin=8 HTTP/1.1\r\n"
                  b"Host: x\r\nTransfer-Encoding: chunked\r\n\r\n")
        # first half of the audio: enough for several windows
        half = pcm[: len(pcm) // 2]
        s.sendall(f"{len(half):x}\r\n".encode() + half + b"\r\n")
        # server should emit finalized samples for the early windows now,
        # while we still hold the rest of the body
        s.settimeout(120)
        got = s.recv(65536)
        assert b"200" in got.split(b"\r\n", 1)[0]
        body_started = b"\r\n\r\n" in got
        buf = got
        while not body_started or len(buf.split(b"\r\n\r\n", 1)[1]) < 16:
            more = s.recv(65536)
            assert more, "connection closed before any streamed output"
            buf += more
            body_started = b"\r\n\r\n" in buf
        # now finish the request
        rest = pcm[len(pcm) // 2:]
        s.sendall(f"{len(rest):x}\r\n".encode() + rest + b"\r\n0\r\n\r\n")
        s.settimeout(120)
        while b"0\r\n\r\n" not in buf[-1024:]:
            more = s.recv(65536)
            if not more:
                break
            buf += more
    finally:
        s.close()


def test_stream_endpoint_too_short(stream_server):
    """A stream shorter than one window terminates cleanly with an empty
    chunked body (the 200 header is already committed)."""
    _, host = stream_server
    body = _stream_pcm(host, "/stream?target=violin&context=4&margin=8",
                       b"\x00\x00" * 32)
    assert body == b""


def test_stream_endpoint_bad_target(stream_server):
    import http.client

    _, host = stream_server
    conn = http.client.HTTPConnection(host, timeout=60)
    try:
        conn.request("POST", "/stream?target=guitar", body=b"\x00\x00" * 100,
                     headers={"Content-Length": "200"})
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"unknown target" in resp.read()
    finally:
        conn.close()


def test_batcher_mixed_bucket_fairness():
    """A rare-bucket request under saturated common-bucket traffic must be
    served once it is the oldest waiter — not deferred behind every queued
    common-bucket group (the round-3 tail-requeue starvation path)."""
    import threading
    import time as _time

    from ast_tpu.serve import _Batcher

    class _Audio:
        hop_length = 1

    class _Cfg:
        audio = _Audio()

    class _FakePipe:
        cfg = _Cfg()

        def __init__(self, delay):
            self.delay = delay

        def process_audio(self, wav, target_id, wire=None):
            _time.sleep(self.delay)
            return np.zeros(int(np.asarray(wav).shape[0]), np.float32)

        def process_audio_batch(self, wavs, ids, wire=None):
            _time.sleep(self.delay)
            return np.zeros(np.asarray(wavs).shape, np.float32)

    from ast_tpu.serve import _Request

    delay = 0.05
    batcher = _Batcher(_FakePipe(delay), threading.Lock(),
                       window_ms=2.0, ladder=(1, 2, 4))

    def enqueue(n):
        # direct queue puts pin the ARRIVAL ORDER deterministically
        # (thread-based submission can reorder on a loaded host)
        r = _Request(np.zeros(n, np.float32), n, 1)
        batcher._q.put(r)
        return r

    try:
        # 8 common-bucket requests already queued when B arrives...
        early = [enqueue(64) for _ in range(8)]
        _time.sleep(delay)
        rare = enqueue(128)
        # ...and a continuous stream of 24 MORE arriving after it (the
        # traffic pattern that starved the round-3 tail-requeue design:
        # the deferred rare request kept losing its place to newcomers).
        # A watcher snapshots how many late requests completed AT THE MOMENT
        # rare did (counting after the 0.3 s enqueue loop would measure the
        # enqueue loop's duration, not the service order).
        late = [None] * 24
        late_done_at_rare = []

        def watch():
            if rare.event.wait(timeout=30):
                late_done_at_rare.append(sum(
                    1 for r in late if r is not None and r.event.is_set()))

        watcher = threading.Thread(target=watch)
        watcher.start()
        for i in range(24):
            late[i] = enqueue(64)
            _time.sleep(delay / 4)
        assert rare.event.wait(timeout=30), "rare-bucket request starved"
        watcher.join(timeout=30)
        for r in early + late:
            assert r.event.wait(timeout=30)
        # Guarantee under test: B waits only on requests that arrived
        # BEFORE it (the 8 early = 2 groups, + scheduling slack), never on
        # the whole late stream.
        assert late_done_at_rare and late_done_at_rare[0] <= 8, (
            f"rare bucket served after {late_done_at_rare}/24 late arrivals")
        assert all(r.err is None for r in early + late + [rare])
    finally:
        batcher.stop()


@pytest.mark.slow
def test_concurrent_streams_coalesce_and_match_solo():
    """VERDICT r3 #4: N concurrent live streams must ride ONE vmapped device
    call per window (not N serialized steps) AND each session's output must
    match solo streaming of the same audio."""
    import threading

    from ast_tpu.eval.streaming import StreamingTransfer
    from ast_tpu.serve import _StreamBatcher

    pipe = StyleTransferPipeline.init_random(TINY, seed=2)
    K, margin = 4, 8
    rng = np.random.default_rng(41)
    wavs = [(0.2 * rng.standard_normal(3 * TINY_AUDIO.sample_rate)
             ).astype(np.float32) for _ in range(3)]
    targets = ["violin", "piano", "violin"]

    solo = [StreamingTransfer(pipe, t, context_windows=K,
                              margin_frames=margin).process(w)
            for t, w in zip(targets, wavs)]

    # generous window: the first batched group compiles while later windows
    # queue, so coalescing must not depend on sub-ms arrival luck
    batcher = _StreamBatcher(pipe, threading.Lock(), window_ms=200.0)
    try:
        outs = [None] * 3
        errs = []

        def run(i):
            try:
                s = StreamingTransfer(
                    pipe, targets[i], context_windows=K,
                    margin_frames=margin,
                    step_runner=batcher.runner_for((K, margin)))
                outs[i] = s.process(wavs[i])
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errs, errs
        for got, want in zip(outs, solo):
            assert got.shape == want.shape
            # batched steps run the vmapped program; equality up to vmap's
            # reassociation (bit-equal in practice on CPU f32)
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
        # the histogram must prove coalescing actually happened
        assert any(k > 1 for k in batcher.hist), dict(batcher.hist)
    finally:
        batcher.stop()


def test_warmup_stream_precompiles(stream_server):
    """--warmup-stream: warmup_stream() must build + exercise the /stream
    window step for the handler-default key so the first live session finds
    it in the pipeline's step cache (through the shared _StreamBatcher)."""
    from ast_tpu.eval.streaming import resolve_margin

    pipe, _host = stream_server
    srv2 = TransferServer(pipe, port=0, max_seconds=60.0,
                          bucket_seconds=TINY_AUDIO.clip_seconds)
    srv2.start_background()
    try:
        srv2.warmup_stream(context=4, margin=8)
        assert (4, 8, False) in pipe.__dict__.get("_stream_steps", {})
        # default key resolves margin from the config
        srv2.warmup_stream()
        m = resolve_margin(pipe.cfg, None)
        assert (8, m, False) in pipe.__dict__.get("_stream_steps", {})
    finally:
        srv2.shutdown()
