"""Offline dataset tooling (L6): segmenters, merger, stats computation,
inspection/analysis — the Preprocessing_Dataset/ capability surface."""

from ast_tpu.tools.analysis import (
    analyze_dataset,
    dataset_variety_embedding,
    find_silent_tracks,
    frame_rms,
    plot_stats_comparison,
    read_stats_npz,
    summarize_statistics,
)
from ast_tpu.tools.segment import (
    bach_num_segments,
    etudes_num_segments,
    is_mostly_sound,
    rms_normalize,
    split_center,
    split_evenly_spaced,
    split_random_spaced,
    unify_datasets,
)
from ast_tpu.tools.stats import (
    compute_separated_stats,
    compute_stats,
    compute_unified_stats,
)

__all__ = [
    "analyze_dataset", "dataset_variety_embedding", "find_silent_tracks",
    "frame_rms", "plot_stats_comparison", "read_stats_npz",
    "summarize_statistics",
    "bach_num_segments", "etudes_num_segments", "is_mostly_sound",
    "rms_normalize", "split_center", "split_evenly_spaced",
    "split_random_spaced", "unify_datasets",
    "compute_separated_stats", "compute_stats", "compute_unified_stats",
]
