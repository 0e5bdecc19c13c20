"""Tests for utils: metric logging, step timer, profiling contexts."""

import json
import os

from ast_tpu.utils import MetricLogger, StepTimer, trace


def test_metric_logger(tmp_path):
    d = str(tmp_path / "logs")
    with MetricLogger(d) as ml:
        ml.log(1, {"loss": 2.5})
        ml.log(2, {"loss": 1.25, "acc": 0.5})
    path = os.path.join(d, "metrics.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 2.5
    assert lines[1]["acc"] == 0.5 and "time" in lines[1]


def test_metric_logger_no_dir():
    ml = MetricLogger(None)
    ml.log(1, {"x": 1.0})  # console-only, no crash
    ml.close()


def test_step_timer():
    import time

    t = StepTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    s = t.summary()
    assert 0.005 < s["a"] < 0.5
    out = []
    t.report(log=out.append)
    assert any("a:" in line for line in out)


def test_trace_context():
    import jax.numpy as jnp

    with trace("test-region"):
        x = jnp.arange(4).sum()
    assert int(x) == 6
