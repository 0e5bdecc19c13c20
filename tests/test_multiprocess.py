"""TRUE multi-process distributed training test.

The in-suite sharding tests (tests/test_sharding.py) run on one process with
8 virtual devices; this one launches TWO separate Python processes that form
a real JAX process group (`jax.distributed.initialize` — the same entry point
a multi-host TPU pod uses, with the gRPC coordination service standing in for
DCN), each owning 2 virtual CPU devices, and runs the SAME jitted dp train
step on a globally-sharded batch assembled from per-host shards.

Asserts: both processes compute identical losses on both steps (the gradient
all-reduce agreed) and identical post-update parameter checksums (the
replicated state stayed in sync). The reference has no distributed runtime
at all (SURVEY.md §2.3); this exercises the multi-host half of the
replacement design. Worker source: tests/mp_worker.py.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_train_step():
    port = _free_port()
    nproc = 2
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid), str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, (
                f"worker failed rc={p.returncode}\nstdout:\n{out}\n"
                f"stderr:\n{err[-4000:]}")
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    assert sorted(o["pid"] for o in outs) == list(range(nproc))
    a, b = outs
    # losses identical across processes: the global batch & all-reduce agreed
    assert a["loss0"] == pytest.approx(b["loss0"], rel=0, abs=0.0)
    assert a["loss1"] == pytest.approx(b["loss1"], rel=0, abs=0.0)
    # params stayed replicated after two optimizer updates
    assert a["checksum"] == pytest.approx(b["checksum"], rel=0, abs=0.0)
    # and the step actually changed the loss (training, not a no-op)
    assert a["loss0"] != a["loss1"]
