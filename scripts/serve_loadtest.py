"""Load test for the serving daemon's dynamic batching.

Measures sequential-singles throughput (the round-2 serialized behavior)
vs concurrent throughput (requests coalesced by the batcher into batched
device calls), against a running ast_tpu.serve daemon.

Usage:
    python scripts/serve.py --port 8934 --warmup 10 --warmup-batch 1,4,16 &
    python scripts/serve_loadtest.py --url http://127.0.0.1:8934 \
        --clips 48 --workers 24

Context for interpreting results on a relay-attached chip: the batched path
is ~5.7x cheaper per clip in device compute (BENCH single_clip_device_ms vs
device_compute_ms_per_clip), but at high request rates the daemon saturates
the host<->device link instead (each 10 s clip is ~2x220 KB on the wire at
pcm16; --wire mulaw8 halves that). Measured on the 1-core relay host:
2.1-2.7x e2e over serialized singles, link-bound at ~11 MB/s.
"""

import argparse
import concurrent.futures
import io
import json
import time
import urllib.request
import wave

import numpy as np


def wav_bytes(x: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8742")
    p.add_argument("--clips", type=int, default=48)
    p.add_argument("--workers", type=int, default=24)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--sr", type=int, default=22050)
    p.add_argument("--seq", type=int, default=8,
                   help="sequential-singles baseline request count")
    args = p.parse_args()

    rng = np.random.default_rng(3)
    bodies = [wav_bytes((0.1 * rng.standard_normal(
        int(args.sr * args.seconds))).astype(np.float32), args.sr)
        for _ in range(args.clips)]
    url = args.url + "/transfer?target=violin"

    def post(b: bytes) -> int:
        req = urllib.request.Request(url, data=b, method="POST")
        with urllib.request.urlopen(req, timeout=1200) as r:
            r.read()
        return r.status

    post(bodies[0])  # prime (any residual compile)

    t0 = time.time()
    for b in bodies[: args.seq]:
        post(b)
    seq = args.seq / (time.time() - t0)
    print(f"sequential singles: {seq:.2f} clips/s")

    t0 = time.time()
    with concurrent.futures.ThreadPoolExecutor(args.workers) as ex:
        codes = list(ex.map(post, bodies))
    wall = time.time() - t0
    assert all(c == 200 for c in codes), codes
    conc = args.clips / wall
    print(f"concurrent batched: {conc:.2f} clips/s "
          f"({args.clips} in {wall:.1f}s), speedup {conc / seq:.1f}x")
    with urllib.request.urlopen(args.url + "/stats", timeout=30) as r:
        print("batch_sizes:", json.loads(r.read())["batch_sizes"])


if __name__ == "__main__":
    main()
