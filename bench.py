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
import time

import numpy as np


def main():
    import jax

    from ast_tpu.config import Config
    from ast_tpu.eval.inference import StyleTransferPipeline

    cfg = Config()
    pipe = StyleTransferPipeline.init_random(cfg, seed=0, sections=4)

    rng = np.random.default_rng(0)
    clip = (0.1 * rng.standard_normal(cfg.audio.clip_samples)).astype(np.float32)

    # warmup / compile
    out = pipe.transfer(clip, "violin")
    assert np.isfinite(out).all()

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = pipe.process_audio(clip, 1)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    clips_per_sec = n_iters / elapsed
    result = {
        "metric": "piano->violin clips/sec (10s audio) on v5e-1",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        # target from BASELINE.json: <1 s per 10 s clip => 1.0 clip/s
        "vs_baseline": round(clips_per_sec / 1.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
