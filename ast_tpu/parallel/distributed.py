"""Multi-host initialization & helpers.

The reference has no distributed runtime at all (SURVEY.md §2.3). For
multi-host TPU pods the JAX runtime handles the NCCL-equivalent transport
(ICI intra-slice, DCN inter-slice); this module wraps the one-time process
group setup and the host-local batch slicing that multi-host data loading
needs."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host process group (no-op in single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_info() -> Tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this host should load (per-host data
    loading: each host decodes only its shard)."""
    idx, count = process_info()
    if global_batch % count != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{count} processes")
    per = global_batch // count
    return slice(idx * per, (idx + 1) * per)


def assemble_global_array(local_array: np.ndarray, mesh, spec):
    """Build a globally-sharded jax.Array from this host's local shard
    (multi-host input pipeline glue)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    global_shape = (local_array.shape[0] * jax.process_count(),
                    *local_array.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local_array,
                                                  global_shape)
