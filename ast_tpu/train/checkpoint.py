"""Orbax checkpointing.

The reference saves a bare dict of 4 state_dicts with torch.save and keeps no
optimizer/RNG state and no class prototypes (checkpoints/read.txt,
evaluation_*:246-272; prototypes are regenerated from the first test batch at
eval time — quirk #5). Here a checkpoint is the FULL training state:
{module variables x4, both optimizer states, step, rng, class_prototypes},
so training resumes exactly and inference needs no bootstrap batch. Layout is
orbax StandardCheckpointer (async-safe, TPU-friendly)."""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Tuple

import jax.numpy as jnp
import orbax.checkpoint as ocp

from ast_tpu.train.state import TrainState

CHECKPOINT_PREFIX = "checkpoint_epoch_"

# at most one async save in flight (serialized device->host fetches: through
# a relay-attached chip the fetch IS the expensive part, ~minutes for the
# full-size 1.9 GB state — see NOTES/docs)
_inflight: List[Tuple[threading.Thread, str, dict]] = []


def _tree_of(state: TrainState, class_prototypes) -> dict:
    return {
        "step": state.step,
        "content": state.content,
        "style": state.style,
        "decoder": state.decoder,
        "disc": state.disc,
        "gen_opt_state": state.gen_opt_state,
        "disc_opt_state": state.disc_opt_state,
        "rng": state.rng,
        "class_prototypes": (jnp.zeros((2, 1)) if class_prototypes is None
                             else jnp.asarray(class_prototypes)),
    }


def _write(path: str, tree: dict) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def save_checkpoint(directory: str, epoch: int, state: TrainState,
                    class_prototypes=None, block: bool = True) -> str:
    """Save to {directory}/checkpoint_epoch_{epoch} (reference naming,
    checkpoints/read.txt).

    `block=False` runs the device->host fetch + write on a background thread
    so training keeps stepping during the save (jax arrays are immutable and
    the train step donates nothing, so the captured state stays valid). At
    most one save is in flight — a second non-blocking save first waits for
    the previous one; call `wait_for_checkpoints()` before reading the files
    or exiting."""
    path = os.path.abspath(os.path.join(directory, f"{CHECKPOINT_PREFIX}{epoch}"))
    tree = _tree_of(state, class_prototypes)
    if block:
        wait_for_checkpoints()  # keep epoch ordering with any async save
        _write(path, tree)
        return path
    wait_for_checkpoints()
    holder: dict = {}

    def _guarded():
        try:
            _write(path, tree)
        except BaseException as e:  # noqa: BLE001 — re-raised at wait
            holder["error"] = e

    t = threading.Thread(target=_guarded, name=f"ckpt-save-{epoch}",
                         daemon=True)
    t.start()
    _inflight.append((t, path, holder))
    return path


def wait_for_checkpoints() -> None:
    """Join any in-flight async save; re-raises its failure."""
    while _inflight:
        t, path, holder = _inflight.pop(0)
        t.join()
        if "error" in holder:
            raise RuntimeError(
                f"async checkpoint save to {path} failed") from holder["error"]


def load_checkpoint(path: str, template: TrainState,
                    class_prototypes_shape: Optional[Tuple[int, int]] = None
                    ) -> Tuple[TrainState, Optional[jnp.ndarray]]:
    """Restore a TrainState saved by save_checkpoint; `template` supplies the
    tree structure/shapes (an init_state output)."""
    proto_tpl = (jnp.zeros(class_prototypes_shape)
                 if class_prototypes_shape else jnp.zeros((2, 1)))
    tpl = _tree_of(template, proto_tpl)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), tpl)
    state = template.replace(
        step=restored["step"],
        content=restored["content"],
        style=restored["style"],
        decoder=restored["decoder"],
        disc=restored["disc"],
        gen_opt_state=restored["gen_opt_state"],
        disc_opt_state=restored["disc_opt_state"],
        rng=restored["rng"],
    )
    protos = restored["class_prototypes"]
    if protos.shape == (2, 1):
        protos = None
    return state, protos


def latest_checkpoint(directory: str) -> Optional[str]:
    """Newest checkpoint_epoch_N path, or None."""
    if not os.path.isdir(directory):
        return None
    best, best_n = None, -1
    for name in os.listdir(directory):
        if name.startswith(CHECKPOINT_PREFIX):
            try:
                n = int(name[len(CHECKPOINT_PREFIX):])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(directory, name), n
    return best
