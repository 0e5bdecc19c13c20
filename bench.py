"""Benchmark: end-to-end piano->violin style transfer of a 10 s 22.05 kHz clip
on one TPU chip — the BASELINE.json north-star metric.

Measures the fully fused on-device pipeline (STFT+CQT feature extraction ->
ContentEncoder -> KV-cached AR decode -> overlap-average -> ISTFT) with the
full-size model (d=256, ~154M-param frame codec). The reference has no speed
baseline (single-GPU torch with CPU librosa CQT and an uncached O(S^2) decode
loop); BASELINE.json sets the target at <1 s per clip, i.e. 1 clip/s, which
is what vs_baseline is normalized against.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _mark(label: str):
    """Wall-clock stage marker on stderr (stdout stays one JSON line)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {label}",
          file=sys.stderr, flush=True)


def main():
    import jax

    from ast_tpu.config import Config
    from ast_tpu.eval.inference import StyleTransferPipeline

    cfg = Config()
    pipe = StyleTransferPipeline.init_random(cfg, seed=0, sections=4)
    _mark("pipeline init (params on device)")

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B = 32  # throughput saturates (~41 clips/s) at B=32; B=64 adds nothing
    clips_np = (0.1 * rng.standard_normal(
        (B, cfg.audio.clip_samples))).astype(np.float32)
    targets = np.ones(B, np.int64)

    # batched end-to-end throughput FIRST — it is the headline metric, and
    # the remote compile service's latency variance is huge (27s..17min for
    # the same program), so the headline's one required compile must come
    # before every optional extra. Serving path: B clips per device call,
    # int16 PCM wire format, host transfer included. Three configurations —
    # sequential batch calls at B and 2B (larger batches amortize the
    # link's per-RPC overhead) and the pipelined transfer_stream (depth>1
    # keeps batches in flight; wins when the transport allows overlapping
    # upload with compute, loses when it serializes RPCs) — best wins.
    pcm = np.clip(np.round(clips_np * 32768.0), -32768, 32767).astype(np.int16)

    def seq_throughput(batch: int, n_windows: int = 2, iters: int = 3):
        reps = -(-batch // B)
        arr = np.tile(pcm, (reps, 1))[:batch]
        ids = np.tile(targets, reps)[:batch]
        out = pipe.process_audio_batch(arr, ids, pcm16_wire=True)  # compile
        assert np.isfinite(out).all()
        _mark(f"batch core B={batch} compiled")
        windows = []
        for _ in range(n_windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                pipe.process_audio_batch(arr, ids, pcm16_wire=True)
            windows.append(iters * batch / (time.perf_counter() - t0))
        thr = max(windows)
        _mark(f"seq B={batch}: {thr:.1f} clips/s")
        return thr

    seq_by_batch = {B: seq_throughput(B)}

    n_stream = 4 * B
    stream_clips = np.tile(pcm, (4, 1))
    stream_ids = np.tile(targets, 4)
    stream_windows = []
    for _ in range(2):
        t0 = time.perf_counter()
        got = sum(1 for _ in pipe.transfer_stream(
            stream_clips, stream_ids, batch_size=B, depth=3, pcm16_wire=True))
        assert got == n_stream
        stream_windows.append(n_stream / (time.perf_counter() - t0))
    stream_clips_per_sec = max(stream_windows)
    _mark(f"pipelined stream: {stream_clips_per_sec:.1f} clips/s")

    # optional extras, each behind a time gate (one more remote compile
    # apiece; skipped on a catastrophic-compile day so the headline and the
    # JSON line always land)
    if time.perf_counter() - _T0 < 420:
        seq_by_batch[2 * B] = seq_throughput(2 * B)

    clips_per_sec = max(*seq_by_batch.values(), stream_clips_per_sec)

    latency_ms = None
    device_ms = None
    if time.perf_counter() - _T0 < 600:
        # single-clip core: end-to-end latency + pure device compute
        out1 = pipe.transfer(clips_np[0], "violin")
        assert np.isfinite(out1).all()
        _mark("single-clip core compiled")
        lat_iters = 8
        t0 = time.perf_counter()
        for i in range(lat_iters):
            out = pipe.process_audio(clips_np[i % B], 1)
        latency_ms = (time.perf_counter() - t0) / lat_iters * 1000
        _mark(f"single-clip latency: {latency_ms:.1f} ms")

        clip_dev = jnp.asarray(clips_np[0])
        core = pipe._jitted_core
        t = jnp.asarray(1)
        one = lambda x: core(x, pipe.class_embeddings, t, pipe.content_vars,
                             pipe.decoder_vars,
                             n_samples=cfg.audio.clip_samples,
                             overlap=cfg.audio.eval_overlap_frames)
        jax.block_until_ready(one(clip_dev))
        t0 = time.perf_counter()
        outs = [one(clip_dev) for _ in range(50)]
        jax.block_until_ready(outs)
        device_ms = (time.perf_counter() - t0) / 50 * 1000
        _mark(f"single-clip device compute: {device_ms:.2f} ms")

    # batched device compute per clip (the serving number: B=32 resident)
    pcm_dev = jnp.asarray(pcm)
    tids_dev = jnp.asarray(targets)
    bcore = pipe._jitted_batch_core
    bone = lambda: bcore(pcm_dev, pipe.class_embeddings, tids_dev,
                         pipe.content_vars, pipe.decoder_vars,
                         n_samples=cfg.audio.clip_samples,
                         overlap=cfg.audio.eval_overlap_frames, out_wire="pcm16")
    jax.block_until_ready(bone())
    t0 = time.perf_counter()
    outs = [bone() for _ in range(10)]
    jax.block_until_ready(outs)
    batch_device_ms = (time.perf_counter() - t0) / 10 / B * 1000
    _mark(f"batched device compute: {batch_device_ms:.3f} ms/clip")

    result = {
        "metric": "piano->violin clips/sec (10s audio) on v5e-1",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        # target from BASELINE.json: <1 s per 10 s clip => 1.0 clip/s
        "vs_baseline": round(clips_per_sec / 1.0, 3),
        "sequential_clips_per_sec": {str(b): round(v, 3)
                                     for b, v in seq_by_batch.items()},
        "pipelined_clips_per_sec": round(stream_clips_per_sec, 3),
        "single_clip_latency_ms": (round(latency_ms, 2)
                                   if latency_ms is not None else None),
        "device_compute_ms_per_clip": round(batch_device_ms, 3),
        "single_clip_device_ms": (round(device_ms, 3)
                                  if device_ms is not None else None),
        "batch_size": B,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
