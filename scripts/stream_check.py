#!/usr/bin/env python
"""Drive the live-streaming path (ast_tpu/eval/streaming.py) on the real chip.

Pushes PCM blocks through `StreamingTransfer` at the full-size config exactly
as a live client would, then reports:

  - compile time (first window's step program),
  - steady-state wall time per window step (device + relay dispatch),
  - realtime factor (seconds of audio emitted per wall second, warm),
  - the algorithmic latency bound (featurization margin + window span).

A run is healthy when the realtime factor is >> 1 (the stream only needs one
device call every step*hop/sr ≈ 2.3 s of audio) and the emitted sample count
equals the offline ISTFT length hop*(T-1).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_signal(seconds: float, sr: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (0.35 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 330 * t)
         + 0.1 * np.sin(2 * np.pi * 523.25 * t)
         + 0.01 * rng.standard_normal(t.shape[0]))
    return x.astype(np.float32)


def run_stream(pipe, wav, block, target, context):
    from ast_tpu.eval.streaming import StreamingTransfer

    stream = StreamingTransfer(pipe, target, context_windows=context)
    n_out = 0
    window_times = []  # wall seconds of each push that ran >=1 window step
    windows_before = 0
    t_start = time.perf_counter()
    for i in range(0, len(wav), block):
        t0 = time.perf_counter()
        out = stream.push(wav[i:i + block])
        dt = time.perf_counter() - t0
        ran = stream._next_w - windows_before
        if ran:
            window_times.append((dt, ran))
            windows_before = stream._next_w
        n_out += len(out)
    t0 = time.perf_counter()
    tail = stream.flush()
    flush_dt = time.perf_counter() - t0
    n_out += len(tail)
    total = time.perf_counter() - t_start
    return stream, window_times, flush_dt, n_out, total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--block-ms", type=float, default=100.0)
    p.add_argument("--target", default="violin")
    p.add_argument("--context", type=int, default=8)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args()

    import jax

    from ast_tpu.config import Config
    from ast_tpu.eval.inference import StyleTransferPipeline

    cfg = Config()
    a = cfg.audio
    print(f"devices: {jax.devices()}", flush=True)
    if args.checkpoint_dir:
        from ast_tpu.eval.model_loading import load_pipeline

        pipe = load_pipeline(args.checkpoint_dir)
    else:
        pipe = StyleTransferPipeline.init_random(cfg, seed=0)

    wav = make_signal(args.seconds, a.sample_rate)
    block = max(1, int(args.block_ms / 1000.0 * a.sample_rate))

    # cold run: includes the one-time step compile on the first window
    t0 = time.perf_counter()
    stream, wt, _, n_out, total_cold = run_stream(
        pipe, wav, block, args.target, args.context)
    compile_s = wt[0][0] if wt else float("nan")
    print(f"cold stream: {total_cold:.1f} s total, first-window (compile) "
          f"{compile_s:.1f} s, {len(wt)} window-running pushes", flush=True)

    # warm run: fresh stream state, compiled step reused via the pipe cache
    stream, wt, flush_dt, n_out, total_warm = run_stream(
        pipe, wav, block, args.target, args.context)
    steps = sum(r for _, r in wt)
    per_window = sum(t for t, _ in wt) / max(1, steps)
    T = 1 + len(wav) // a.hop_length
    expect = a.hop_length * (T - 1)
    audio_s = n_out / a.sample_rate
    cadence = (a.window_size - a.eval_overlap_frames) * a.hop_length / a.sample_rate
    print(f"warm stream: {total_warm:.2f} s wall for {audio_s:.1f} s audio "
          f"-> realtime factor {audio_s / total_warm:.1f}x")
    print(f"  {steps} windows, {per_window * 1000:.1f} ms/window step "
          f"(output cadence {cadence:.2f} s audio/window), "
          f"flush {flush_dt * 1000:.0f} ms")
    print(f"  algorithmic latency bound {stream.algorithmic_latency_seconds:.2f} s "
          f"(auto margin {stream._margin} frames)")
    status = "OK" if n_out == expect else f"MISMATCH (expect {expect})"
    print(f"  emitted {n_out} samples, offline-ISTFT length {expect}: {status}")
    out_ok = np.isfinite(audio_s) and n_out == expect
    sys.exit(0 if out_ok else 1)


if __name__ == "__main__":
    main()
