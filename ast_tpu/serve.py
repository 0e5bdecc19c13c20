"""HTTP serving daemon for style transfer.

The reference's only inference surfaces are notebooks and eval scripts
(style_transfer_inference_test.ipynb, evaluation_style_transfer.py:309-340 —
a strictly offline per-clip loop); a production framework needs an online
serving entry point. This is a dependency-free (stdlib http.server) daemon
around `StyleTransferPipeline`:

    POST /transfer?target=violin     wav/mp3 body -> transferred wav body
    POST /reconstruct?target=piano   same-class reconstruction
    GET  /healthz                    liveness + device + compiled buckets
    GET  /stats                      request counts + latency quantiles

Arbitrary clip lengths are served through the pipeline's static-shape
bucketing (`transfer_any_length`) so each distinct length bucket compiles
once; device work is serialized behind a lock (one chip, one program at a
time), while decode/encode of concurrent requests proceed in parallel in
the threading server.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from ast_tpu.config import Config
from ast_tpu.data.audio_io import load_audio, write_wav
from ast_tpu.eval.inference import NAME_TO_ID, StyleTransferPipeline


class TransferServer:
    """Bind a StyleTransferPipeline to an HTTP port.

    `max_seconds` caps accepted clip length (decode + bucket cost is linear
    in it); `bucket_seconds` is the static-shape bucket granularity.
    """

    def __init__(self, pipe: StyleTransferPipeline, host: str = "127.0.0.1",
                 port: int = 0, max_seconds: float = 300.0,
                 bucket_seconds: float = 5.0):
        self.pipe = pipe
        self.max_seconds = float(max_seconds)
        self.bucket_seconds = float(bucket_seconds)
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        import collections

        self._requests = {}   # endpoint -> count
        self._errors = 0
        # bounded: a long-lived daemon must not grow a float per request
        # forever (and /stats sorts this under the stats lock)
        self._latencies = collections.deque(maxlen=10000)
        handler = self._make_handler()
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True

    def warmup(self, seconds=(10.0,)) -> None:
        """Precompile the length-bucket programs for the given clip lengths
        so the first real request doesn't pay the compile (minutes through a
        relay-attached chip). Each distinct bucket is one program; lengths in
        the same bucket share it."""
        sr = self.pipe.cfg.audio.sample_rate
        for s in seconds:
            wav = np.zeros(max(1, int(float(s) * sr)), np.float32)
            with self._device_lock:
                # the target id is a traced argument, so one call per bucket
                # compiles the program for every target
                self.pipe.transfer_any_length(
                    wav, "violin", bucket_seconds=self.bucket_seconds)

    # ------------------------------------------------------------------

    @property
    def address(self) -> tuple:
        return self.httpd.server_address

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()

    # ------------------------------------------------------------------

    def _record(self, endpoint: str, dt: Optional[float] = None,
                error: bool = False):
        with self._stats_lock:
            self._requests[endpoint] = self._requests.get(endpoint, 0) + 1
            if dt is not None:
                self._latencies.append(dt)
            if error:
                self._errors += 1

    def _handle_audio(self, body: bytes, target: str,
                      mp3_out: bool = False) -> bytes:
        """wav/mp3 bytes -> transferred wav (or mp3-192k) bytes. Raises
        ValueError on bad input."""
        if target not in NAME_TO_ID:
            raise ValueError(f"unknown target {target!r}; "
                             f"expected one of {sorted(NAME_TO_ID)}")
        a = self.pipe.cfg.audio
        with tempfile.TemporaryDirectory() as td:
            in_path = os.path.join(td, "in.audio")
            with open(in_path, "wb") as f:
                f.write(body)
            try:
                from ast_tpu.data.audio_io import audio_info

                sr_orig, _, n_frames, _ = audio_info(in_path)
                # true clip length, capped; at least a few hops so the
                # istft trim never rounds to an empty output
                seconds = min(n_frames / max(1, sr_orig), self.max_seconds)
                seconds = max(seconds, 4.0 * a.hop_length / a.sample_rate)
                # load_audio sniffs wav vs mp3 and resamples/downmixes
                # (the reference's loader, utilityFunctions.py:105-122)
                wav, _ = load_audio(in_path, a.sample_rate, seconds)
            except ValueError:
                raise
            except Exception as e:
                raise ValueError(f"undecodable audio: {e}") from None
            wav = wav[0]

            with self._device_lock:
                out = self.pipe.transfer_any_length(
                    wav, target, bucket_seconds=self.bucket_seconds)
            out = np.clip(out, -1.0, 1.0)
            if mp3_out:
                from ast_tpu.data.audio_io import write_mp3

                out_path = os.path.join(td, "out.mp3")
                try:
                    write_mp3(out_path, out, a.sample_rate)  # native lame, 192k
                except Exception as e:
                    # e.g. a sample rate off the MP3 grid
                    raise ValueError(f"mp3 encode failed: {e}") from None
            else:
                out_path = os.path.join(td, "out.wav")
                write_wav(out_path, out, a.sample_rate)
            with open(out_path, "rb") as f:
                return f.read()

    def _healthz(self) -> dict:
        import jax

        from ast_tpu.data.audio_io import mp3_supported

        return {
            "status": "ok",
            "backend": jax.default_backend(),
            "devices": len(jax.devices()),
            "targets": sorted(NAME_TO_ID),
            "max_seconds": self.max_seconds,
            "bucket_seconds": self.bucket_seconds,
            "mp3": mp3_supported(),
        }

    def _statsz(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies)
            q = (lambda p: round(lat[min(len(lat) - 1,
                                         int(round(p * (len(lat) - 1))))]
                                 * 1000, 2)
                 ) if lat else (lambda p: None)
            return {
                "requests": dict(self._requests),
                "errors": self._errors,
                "latency_ms": {"p50": q(0.50), "p90": q(0.90),
                               "p99": q(0.99), "n": len(lat)},
            }

    # ------------------------------------------------------------------

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                try:
                    self.send_response(code)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    if self.close_connection:
                        self.send_header("Connection", "close")
                    self.end_headers()
                    self.wfile.write(body)
                except (BrokenPipeError, ConnectionResetError):
                    # client gave up (e.g. timed out while queued behind a
                    # warmup/compile); not a server error — drop quietly
                    self.close_connection = True

            def _send_json(self, code: int, obj: dict):
                self._send(code, json.dumps(obj).encode(), "application/json")

            def _reject(self, code: int, obj: dict):
                """Error response on a path where the request body was NOT
                consumed: an HTTP/1.1 keep-alive peer would otherwise have
                its unread body bytes parsed as the next request line. Close
                the connection instead of draining arbitrarily large
                bodies."""
                self.close_connection = True
                self._send_json(code, obj)

            def do_GET(self):
                path = urlparse(self.path).path
                if path == "/healthz":
                    server._record("healthz")
                    self._send_json(200, server._healthz())
                elif path == "/stats":
                    server._record("stats")
                    self._send_json(200, server._statsz())
                else:
                    self._send_json(404, {"error": f"unknown path {path}"})

            def do_POST(self):
                parsed = urlparse(self.path)
                path = parsed.path
                if path not in ("/transfer", "/reconstruct"):
                    self._reject(404, {"error": f"unknown path {path}"})
                    return
                q = parse_qs(parsed.query)
                target = q.get("target", [""])[0]
                n = int(self.headers.get("Content-Length", 0))
                # worst supported upload: max_seconds of 96 kHz stereo
                # float32 wav (load_audio downmixes/resamples/caps anyway)
                max_bytes = int(server.max_seconds * 96000 * 2 * 4) + (1 << 12)
                if n <= 0 or n > max_bytes:
                    server._record(path.lstrip("/"), error=True)
                    self._reject(413 if n > 0 else 400,
                                 {"error": f"bad Content-Length {n}"})
                    return
                body = self.rfile.read(n)
                mp3_out = "audio/mpeg" in (self.headers.get("Accept") or "")
                if mp3_out:
                    from ast_tpu.data.audio_io import mp3_supported
                    from ast_tpu.tools.segment import MP3_SAMPLE_RATES

                    sr = server.pipe.cfg.audio.sample_rate
                    if not mp3_supported():
                        server._record(path.lstrip("/"), error=True)
                        self._send_json(406, {
                            "error": "mp3 output unavailable "
                                     "(system libmp3lame not found)"})
                        return
                    if sr not in MP3_SAMPLE_RATES:
                        # lame would silently resample off-grid rates rather
                        # than fail; refuse instead of shipping audio at a
                        # different rate than advertised
                        server._record(path.lstrip("/"), error=True)
                        self._send_json(406, {
                            "error": f"mp3 output unavailable: pipeline "
                                     f"rate {sr} is off the MPEG grid"})
                        return
                t0 = time.perf_counter()
                try:
                    # /reconstruct is the same-class decode (the notebook's
                    # cell-5 behavior): identical compute path, caller sets
                    # target = the source class
                    out = server._handle_audio(body, target, mp3_out=mp3_out)
                except ValueError as e:
                    server._record(path.lstrip("/"), error=True)
                    self._send_json(400, {"error": str(e)})
                    return
                except Exception as e:  # device/runtime failure -> 500
                    server._record(path.lstrip("/"), error=True)
                    self._send_json(500, {
                        "error": f"{type(e).__name__}: {e}"})
                    return
                server._record(path.lstrip("/"), time.perf_counter() - t0)
                self._send(200, out, "audio/mpeg" if mp3_out else "audio/wav")

        return Handler


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Style-transfer HTTP server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8742)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--max-seconds", type=float, default=300.0)
    p.add_argument("--bucket-seconds", type=float, default=5.0)
    p.add_argument("--warmup", default=None, metavar="SECONDS[,SECONDS...]",
                   help="precompile these clip-length buckets before "
                        "accepting traffic (e.g. --warmup 10,60)")
    args = p.parse_args(argv)

    import jax

    from ast_tpu.eval.model_loading import load_eval_bundle

    cfg = Config()
    bundle = load_eval_bundle(cfg, checkpoint_dir=args.checkpoint_dir)
    protos = bundle.class_prototypes
    if protos is None:
        print("No class prototypes in checkpoint; using random prototypes "
              "(untrained-model smoke mode)")
        protos = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.model.d_model))
    pipe = StyleTransferPipeline.from_variables(
        cfg, bundle.state.content, bundle.state.decoder, protos)
    server = TransferServer(pipe, host=args.host, port=args.port,
                            max_seconds=args.max_seconds,
                            bucket_seconds=args.bucket_seconds)
    if args.warmup:
        lengths = [float(s) for s in args.warmup.split(",") if s]
        print(f"warming up {len(lengths)} length bucket(s)...")
        server.warmup(lengths)
    host, port = server.address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(POST /transfer?target=violin, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
