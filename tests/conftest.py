"""Test configuration: run the suite on an 8-device virtual CPU mesh so
sharding/pjit paths are exercised without TPU hardware. Must set env before
jax is imported anywhere."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu";
# override it back so the suite runs on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def audio_clip(rng):
    """A deterministic 2-second synthetic 'musical' clip at 22050 Hz."""
    sr = 22050
    t = np.arange(2 * sr) / sr
    x = np.zeros_like(t)
    for f0, a in [(220.0, 0.5), (330.0, 0.3), (440.0, 0.2), (587.33, 0.15)]:
        x += a * np.sin(2 * np.pi * f0 * t)
    # amplitude envelope with a few note onsets
    env = np.clip(np.sin(2 * np.pi * 1.5 * t) + 0.4, 0, None)
    x = (x * env + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
    return x / np.max(np.abs(x))
