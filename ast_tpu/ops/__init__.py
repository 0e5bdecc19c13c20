"""Custom TPU kernels (Pallas)."""

from ast_tpu.ops.pallas_ola import (
    overlap_add,
    overlap_add_reference,
    overlap_add_waveform,
)

__all__ = ["overlap_add", "overlap_add_reference", "overlap_add_waveform"]
