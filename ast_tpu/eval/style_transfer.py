"""Style-transfer evaluation driver.

Capability-parity rebuild of evaluation_style_transfer.py:214-449: for each
half-batch sample, reassemble its windows with the eval-side overlap
(int(287*0.3)=86 — quirk #1), invert the STFT slice to audio, run the full
transfer toward the opposite class, and score
{chroma_similarity, mfcc_distance, instrumentation_similarity,
self_similarity_distance} against a random reference clip of the target
class; write per-sample txt files and global_statistics.txt in the
reference's formats."""

from __future__ import annotations

import os
import random
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ast_tpu.config import Config, DEFAULT_CONFIG
from ast_tpu.data.audio_io import load_audio
from ast_tpu.data.dataset import DualInstrumentDataset, balanced_batches, list_audio_files
from ast_tpu.dsp.stft import istft_ri
from ast_tpu.dsp.windows import sections2spectrogram
from ast_tpu.eval.inference import StyleTransferPipeline, generate_class_embeddings
from ast_tpu.eval.metrics import eval_style_transfer_metrics
from ast_tpu.eval.model_loading import EvalBundle, load_eval_bundle

ID_TO_NAME = {0: "piano", 1: "violin"}


def save_metrics(metrics: Dict, output_path: str, log=print) -> None:
    """(evaluation_style_transfer.py:403-418)."""
    with open(output_path, "w") as f:
        f.write(f" - Chroma Similarity: {metrics['chroma_similarity']:.4f}\n")
        for key, title in (("mfcc_distance", "MFCC Distance"),
                           ("instrumentation_similarity", "Instrumentation Similarity"),
                           ("self_similarity_distance", "Self Similarity Distance")):
            if metrics[key] is not None:
                f.write(f" - {title}: {metrics[key]:.4f}\n")
            else:
                f.write(f" - {title}: None\n")
    log(f"Saved results: {output_path}")


def save_global_statistics(metrics_dict: Dict[str, list], output_dir: str,
                           filename: str = "global_statistics.txt",
                           log=print) -> str:
    """(evaluation_style_transfer.py:420-444)."""
    stats_path = os.path.join(output_dir, filename)
    with open(stats_path, "w") as f:
        f.write("=== Global Style Transfer Statistics ===\n\n")
        for direction in metrics_dict:
            f.write(f"Transformation: {direction.replace('_', ' ').title()}\n")
            entries = metrics_dict[direction]
            if not entries:
                f.write("  No data available.\n\n")
                continue
            for metric in entries[0].keys():
                values = [e[metric] for e in entries if e[metric] is not None]
                if values:
                    f.write(f"  - {metric.replace('_', ' ').title()}: "
                            f"Mean = {np.mean(values):.4f}, "
                            f"Std = {np.std(values):.4f}\n")
                else:
                    f.write(f"  - {metric.replace('_', ' ').title()}: None\n")
            f.write("\n")
    log(f"Global statistics saved to: {stats_path}")
    return stats_path


def _random_reference(test_dir: str, target_class: str, cfg: Config,
                      rng: random.Random, log=print) -> Optional[np.ndarray]:
    files = list_audio_files(os.path.join(test_dir, target_class))
    if not files:
        log(f"Notice: No audio reference for {target_class} in "
            f"{test_dir}/{target_class}/")
        return None
    wav, _ = load_audio(rng.choice(files), cfg.audio.sample_rate,
                        cfg.audio.clip_seconds)
    return wav[0]


def process_test_set(
    test_dir: str,
    output_dir: str,
    batch_size: int = 8,
    cfg: Config = DEFAULT_CONFIG,
    checkpoint_dir: Optional[str] = "checkpoints",
    stats_dir: Optional[str] = "train_set_stats",
    bundle: Optional[EvalBundle] = None,
    seed: int = 0,
    log=print,
) -> Dict[str, list]:
    p2v_dir = os.path.join(output_dir, "from_piano_to_violin")
    v2p_dir = os.path.join(output_dir, "from_violin_to_piano")
    Path(p2v_dir).mkdir(parents=True, exist_ok=True)
    Path(v2p_dir).mkdir(parents=True, exist_ok=True)

    if bundle is None:
        bundle = load_eval_bundle(cfg, checkpoint_dir=checkpoint_dir, log=log)

    dataset = DualInstrumentDataset.from_dirs(
        os.path.join(test_dir, "piano"), os.path.join(test_dir, "violin"),
        use_separate_stats=True, stats_dir=stats_dir, cfg=cfg.audio)

    rng = random.Random(seed)
    overlap = cfg.audio.eval_overlap_frames
    metrics: Dict[str, list] = {"piano_to_violin": [], "violin_to_piano": []}

    import functools

    import jax

    @functools.partial(jax.jit, static_argnames=("total_frames",))
    def windows_to_audio_batch(samples, total_frames: int):
        def one(sample):
            full = sections2spectrogram(sample, total_frames, overlap)
            stft_spec = full[:, :, : cfg.model.stft_bins]
            return istft_ri(stft_spec, n_fft=cfg.audio.n_fft,
                            hop_length=cfg.audio.hop_length)

        return jax.vmap(one)(samples)

    class_embeddings = bundle.class_prototypes
    pipeline = None

    for batch_idx, (sections, labels) in enumerate(
            balanced_batches(dataset, batch_size, shuffle=False)):
        if class_embeddings is None:
            half0 = sections.shape[0] // 2
            class_embeddings = generate_class_embeddings(
                cfg, bundle.state.style, sections[0], sections[half0])
            log(f"Generated class embeddings from batch shape: {sections.shape}")
        if pipeline is None:
            # Inference-feature normalization (quirk-fix preset only): prefer
            # the unified stats of THIS corpus (stats_dir) over the packaged
            # reference stats, so synthetic/custom corpora normalize
            # consistently with their training features.
            pipe_stats = None
            if not cfg.faithful and stats_dir:
                unified = os.path.join(stats_dir, "stats_unified_stft_cqt.npz")
                if os.path.exists(unified):
                    from ast_tpu.dsp.norm import FeatureStats

                    pipe_stats = FeatureStats.from_npz(unified)
            pipeline = StyleTransferPipeline.from_variables(
                cfg, bundle.state.content, bundle.state.decoder,
                class_embeddings, stats=pipe_stats)

        B = sections.shape[0]
        half = B // 2
        # batched device work: reassemble all waveforms, then transfer the
        # whole batch toward each sample's opposite class in ONE device call
        # (the reference loops per sample, evaluation_style_transfer.py:289)
        n_sections, _, wind, _ = sections.shape[1:]
        total_frames = (n_sections - 1) * (wind - overlap) + wind
        waveforms = np.asarray(windows_to_audio_batch(sections, total_frames))
        labels_np = np.asarray(labels)
        generated_all = pipeline.process_audio_batch(waveforms, 1 - labels_np,
                                                     overlap=overlap)

        for i in range(B):
            src_label = int(labels_np[i])
            tgt_label = 1 - src_label
            direction = ("piano_to_violin" if src_label == 0
                         else "violin_to_piano")
            waveform = waveforms[i]
            generated = generated_all[i]
            reference = _random_reference(test_dir, ID_TO_NAME[tgt_label],
                                          cfg, rng, log=log)

            st = eval_style_transfer_metrics(generated, waveform, reference,
                                             sr=cfg.audio.sample_rate)
            metrics[direction].append(st)

            out_dir = p2v_dir if direction == "piano_to_violin" else v2p_dir
            sample_idx = i if src_label == 0 else i - half
            out_name = f"{direction}_batch{batch_idx}_sample{sample_idx}.txt"
            save_metrics(st, os.path.join(out_dir, out_name), log=log)

    return metrics


def main(test_dir: str = "dataset/test",
         output_dir: str = "result_evaluation_style_transfer",
         batch_size: int = 8, cfg: Config = DEFAULT_CONFIG) -> Dict[str, list]:
    all_metrics = process_test_set(test_dir, output_dir, batch_size, cfg)
    save_global_statistics(all_metrics, output_dir)
    return all_metrics


if __name__ == "__main__":
    main()
