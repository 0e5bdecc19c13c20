"""Reconstruction evaluation driver.

Capability-parity rebuild of evaluation_reconstruction.py:230-468:
per test sample, encode content, condition on the sample's OWN class
prototype, decode autoregressively, invert the FIRST window only (the
reference evaluates just stft_sections[0], quirk #3 —
evaluation_reconstruction.py:161-189), compute
{chroma_distance, onset_accuracy, pitch_correlation, mse_spectrogram},
write per-sample txt files, print aggregate statistics, and emit
evaluation_results.json. Output file names/format match the reference."""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.config import Config, DEFAULT_CONFIG
from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches
from ast_tpu.dsp.stft import istft_ri
from ast_tpu.eval.inference import generate_class_embeddings
from ast_tpu.eval.metrics import calculate_reconstruction_metrics
from ast_tpu.eval.model_loading import EvalBundle, load_eval_bundle
from ast_tpu.models import ContentEncoder, autoregressive_decode


def reconstruct_audio_first_window(stft_sections: jnp.ndarray,
                                   cfg: Config) -> np.ndarray:
    """ISTFT of window 0 only (evaluation_reconstruction.py:161-189)."""
    first = stft_sections[0]  # (2, W, 513)
    return np.asarray(istft_ri(first, n_fft=cfg.audio.n_fft,
                               hop_length=cfg.audio.hop_length))


def print_aggregate_statistics(metrics: Dict[str, list], log=print) -> None:
    """(evaluation_reconstruction.py:397-423)."""
    log("=" * 60)
    log("AGGREGATE STATISTICS")
    log("=" * 60)
    for transformation in metrics:
        log(f"Statistics for {transformation.replace('_', ' ').title()}:")
        if not metrics[transformation]:
            log("   No data available")
            continue
        for metric in metrics[transformation][0].keys():
            values = [r[metric] for r in metrics[transformation]
                      if r[metric] is not None and np.isfinite(r[metric])]
            if values:
                log(f"   {metric.replace('_', ' ').title()}: "
                    f"Mean = {np.mean(values):.4f}, Std = {np.std(values):.4f}, "
                    f"Min = {np.min(values):.4f}, Max = {np.max(values):.4f}, "
                    f"Valid samples = {len(values)}")
            else:
                log(f"   {metric.replace('_', ' ').title()}: No valid values")


def process_test_set_with_dataloader(
    test_dir: str,
    output_dir: str,
    cfg: Config = DEFAULT_CONFIG,
    checkpoint_dir: Optional[str] = "checkpoints",
    batch_size: int = 2,
    stats_dir: Optional[str] = "train_set_stats",
    bundle: Optional[EvalBundle] = None,
    log=print,
) -> Dict[str, list]:
    piano_out = os.path.join(output_dir, "piano_reconstruction")
    violin_out = os.path.join(output_dir, "violin_reconstruction")
    Path(piano_out).mkdir(parents=True, exist_ok=True)
    Path(violin_out).mkdir(parents=True, exist_ok=True)

    if bundle is None:
        bundle = load_eval_bundle(cfg, checkpoint_dir=checkpoint_dir, log=log)

    piano_dir = os.path.join(test_dir, "piano")
    violin_dir = os.path.join(test_dir, "violin")
    if not os.path.isdir(piano_dir) or not os.path.isdir(violin_dir):
        raise FileNotFoundError(
            f"Test directories not found: {piano_dir}, {violin_dir}")

    dataset = DualInstrumentDataset.from_dirs(
        piano_dir, violin_dir, use_separate_stats=True, stats_dir=stats_dir,
        cfg=cfg.audio)

    content = ContentEncoder(cfg.model)
    decoder = bundle.models.decoder
    # whole-batch device work: one content pass + one batched AR decode + a
    # vmapped first-window ISTFT per dataloader batch (the reference loops
    # per sample with batch 1)
    content_apply = jax.jit(lambda v, s: content.apply(v, s))
    ar_decode = jax.jit(
        lambda v, c, e, S: autoregressive_decode(decoder, v, c, e, S),
        static_argnames=("S",))
    istft_first_batch = jax.jit(jax.vmap(
        lambda w: istft_ri(w[0], n_fft=cfg.audio.n_fft,
                           hop_length=cfg.audio.hop_length)))

    # class prototypes: from checkpoint when available, else bootstrapped from
    # the first batch as the reference does (evaluation_reconstruction.py:124-155)
    metrics: Dict[str, list] = {"piano_reconstruction": [],
                                "violin_reconstruction": []}
    class_embeddings = bundle.class_prototypes

    for batch_idx, (sections, labels) in enumerate(
            balanced_batches(dataset, batch_size, shuffle=False)):
        if class_embeddings is None:
            half = sections.shape[0] // 2
            class_embeddings = generate_class_embeddings(
                cfg, bundle.state.style, sections[0], sections[half])
            log("Generated class embeddings from first batch")

        # device work for the WHOLE batch
        content_emb = content_apply(bundle.state.content, sections)
        class_embs = class_embeddings[labels]  # (B, d) own-class prototypes
        stft_sections = sections[:, :, :, :, : cfg.model.stft_bins]
        S = stft_sections.shape[1]
        recon = ar_decode(bundle.state.decoder, content_emb, class_embs, S)
        # first window only, quirk #3 (evaluation_reconstruction.py:161-189)
        recon_audios = np.asarray(istft_first_batch(recon))
        orig_audios = np.asarray(istft_first_batch(stft_sections))

        for i in range(sections.shape[0]):
            label = int(labels[i])
            source_class = "piano" if label == 0 else "violin"
            result = calculate_reconstruction_metrics(
                orig_audios[i], recon_audios[i], cfg.audio.sample_rate)
            metrics[f"{source_class}_reconstruction"].append(result)

            out_dir = piano_out if source_class == "piano" else violin_out
            out_name = f"{source_class}_batch{batch_idx}_sample{i}_metrics.txt"
            with open(os.path.join(out_dir, out_name), "w") as f:
                f.write(f"Metrics for {source_class} "
                        f"(batch {batch_idx}, sample {i})\n")
                f.write("-" * 50 + "\n")
                for name, value in result.items():
                    value_str = f"{value:.4f}" if np.isfinite(value) else str(value)
                    f.write(f"{name.replace('_', ' ').title()}: {value_str}\n")

    print_aggregate_statistics(metrics, log=log)
    return metrics


def save_results_json(metrics: Dict[str, list], output_dir: str) -> str:
    """evaluation_results.json (evaluation_reconstruction.py:438-460)."""
    def convert(v):
        if isinstance(v, (np.floating, float)):
            v = float(v)
            return None if (np.isnan(v) or np.isinf(v)) else v
        if isinstance(v, np.integer):
            return int(v)
        return v

    json_metrics = {
        key: [{k: convert(v) for k, v in item.items()} for item in items]
        for key, items in metrics.items()
    }
    path = os.path.join(output_dir, "evaluation_results.json")
    with open(path, "w") as f:
        json.dump(json_metrics, f, indent=2)
    return path


def main(test_dir: str = "dataset/test",
         output_dir: str = "result_evaluation_reconstruction",
         cfg: Config = DEFAULT_CONFIG) -> Dict[str, list]:
    metrics = process_test_set_with_dataloader(test_dir, output_dir, cfg)
    path = save_results_json(metrics, output_dir)
    print(f"Results saved to: {path}")
    return metrics


if __name__ == "__main__":
    main()
