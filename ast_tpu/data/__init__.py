"""Data layer (L1): host-side decode (native C++ wav + polyphase resample),
on-device batched featurization, balanced dual-instrument batching, stats
fallback semantics, synthetic fixtures."""

from ast_tpu.data.audio_io import load_audio, read_wav, wav_info, write_wav
from ast_tpu.data.dataset import (
    DualInstrumentDataset,
    balanced_batches,
    diagnose_window_counts,
    get_dataloader,
    list_audio_files,
)
from ast_tpu.data.pipeline import Prefetcher, prefetch
from ast_tpu.data.synthetic import dummy_batches, make_wav_fixture

__all__ = [
    "load_audio", "read_wav", "wav_info", "write_wav",
    "DualInstrumentDataset", "balanced_batches", "diagnose_window_counts",
    "get_dataloader", "list_audio_files",
    "Prefetcher", "prefetch",
    "dummy_batches", "make_wav_fixture",
]
