"""Worker process for the TRUE multi-process distributed test
(tests/test_multiprocess.py) — NOT collected by pytest.

Each worker is one "host" of a 2-process JAX job: its own process group
member (`jax.distributed.initialize` over a Gloo/CPU backend — the stand-in
for the DCN transport on a real multi-host pod), 2 local virtual devices,
4 global. It loads only its own slice of the global batch
(`local_batch_slice`), assembles the globally-sharded batch array
(`assemble_global_array`), replicates the train state across all processes,
and runs the SAME jitted dp train step the single-process path uses — XLA
inserts the cross-process gradient all-reduce.

Prints one JSON line {"pid", "loss0", "loss1", "checksum"} on success.
The reference has no distributed runtime at all (SURVEY.md §2.3); this
exercises the multi-host half of the replacement design's claim.
"""

import dataclasses
import json
import os
import sys


def main() -> None:
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ast_tpu.parallel.distributed import (
        assemble_global_array,
        initialize_distributed,
        local_batch_slice,
        process_info,
    )

    initialize_distributed(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
    assert process_info() == (pid, nproc)
    assert jax.local_device_count() == 2 and jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ast_tpu.config import Config, ModelConfig
    from ast_tpu.parallel import batch_sharding, make_mesh
    from ast_tpu.train import Models, init_state, make_train_step

    cfg = dataclasses.replace(Config(), model=ModelConfig().tiny())
    models = Models.create(cfg)
    # identical seed on every process -> identical host-side init, then
    # replicated placement across ALL processes' devices
    state = init_state(cfg, models, jax.random.PRNGKey(0), sections_per_clip=2)
    mesh = make_mesh((jax.device_count(), 1))
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda l: jax.make_array_from_process_local_data(rep, np.asarray(l)),
        state)

    # global batch built from a shared seed; each process materializes ONLY
    # its own rows (per-host data loading), then assembles the global array
    m = cfg.model
    B, S = 8, 2
    rng = np.random.default_rng(7)
    x_global = rng.standard_normal(
        (B, S, 2, m.window_size, m.feat_bins)).astype(np.float32)
    labels_global = np.array([0] * (B // 2) + [1] * (B // 2), dtype=np.int32)
    sl = local_batch_slice(B)
    bsh = batch_sharding(mesh)
    x = assemble_global_array(x_global[sl], mesh, bsh.spec)
    labels = assemble_global_array(labels_global[sl], mesh, bsh.spec)

    step = make_train_step(cfg, models)
    curr = {k: jnp.asarray(1.0) for k in ("contrastive", "hsic", "adversarial")}
    losses = []
    for _ in range(2):
        state, metrics = step(state, x, labels, curr)
        losses.append(float(metrics["loss/total"]))

    # replicated scalar fingerprint of the updated params (addressable on
    # every process): identical across processes == the all-reduce agreed
    leaves = jax.tree.leaves(
        (state.content, state.style, state.decoder, state.disc))
    checksum = float(sum(jnp.sum(jnp.abs(l)) for l in leaves))
    print(json.dumps({"pid": pid, "loss0": losses[0], "loss1": losses[1],
                      "checksum": checksum}), flush=True)


if __name__ == "__main__":
    main()
