"""Unit tests for the fused block0 Pallas kernel (ops/pallas_block0.py).

Run in interpret mode on the forced-CPU test backend; on a real TPU the
same code compiles via Mosaic (covered by the driver/bench runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ast_tpu.models.blocks import ResBlock, fold_spectral_norms
from ast_tpu.ops.pallas_block0 import (FoldedBlock0, block0_fused,
                                       block0_reference, fold_block0,
                                       fused_block0_active)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _random_folded(rng, c=32):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return FoldedBlock0(
        w1=r(18, c) * 0.2, b1=r(c) * 0.1, v96=r(3 * c, 3 * c) * 0.1,
        b2=r(c) * 0.1, wsc=r(2, c) * 0.3, bsc=r(c) * 0.1,
        in_scale=r(c) * 0.5 + 1.0, in_bias=r(c) * 0.1)


def test_kernel_matches_reference_single_tile(rng):
    """H1 <= tile: no halo traffic; pure conv/fold math."""
    fb = _random_folded(rng)
    x = jnp.asarray(rng.standard_normal((3, 2, 16, 21)).astype(np.float32))
    ref = np.asarray(block0_reference(x, fb))
    got = np.asarray(block0_fused(x, fb, interpret=True))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9) < 2e-2


def test_kernel_matches_reference_multi_tile(rng):
    """H1 spans several grid tiles: exercises the halo slivers, the edge
    masks, and the w-wrap masks."""
    fb = _random_folded(rng)
    x = jnp.asarray(rng.standard_normal((2, 2, 48, 37)).astype(np.float32))
    ref = np.asarray(block0_reference(x, fb))
    got = np.asarray(block0_fused(x, fb, interpret=True))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9) < 2e-2


def test_kernel_matches_flax_resblock(rng):
    """Against the actual ResBlock module at inference: fold_spectral_norms
    -> fold_block0 -> kernel must reproduce apply(train=False)."""
    xh = jnp.asarray(rng.standard_normal((4, 32, 21, 2)).astype(np.float32)
                     * 0.5)
    blk = ResBlock(32, downsample=True)
    var = blk.init(jax.random.PRNGKey(0), xh)
    want = np.asarray(blk.apply(var, xh, train=False))
    folded = fold_spectral_norms(var)
    fb = fold_block0(folded["params"], folded["batch_stats"])
    got = np.asarray(block0_fused(jnp.transpose(xh, (0, 3, 1, 2)), fb,
                                  interpret=True))
    assert np.abs(want - got).max() / (np.abs(want).max() + 1e-9) < 2e-2


def test_active_gate():
    """Gate semantics: off always wins, mesh disables, auto is TPU-only
    (these tests run on CPU), on forces."""
    import dataclasses

    from ast_tpu.config import ModelConfig

    m = ModelConfig()
    on_tpu = jax.default_backend() == "tpu"
    assert fused_block0_active(m) is on_tpu  # auto
    assert fused_block0_active(dataclasses.replace(m, fused_block0="off")) is False
    assert fused_block0_active(dataclasses.replace(m, fused_block0="on")) is True
    assert fused_block0_active(m, mesh=object()) is False
    assert fused_block0_active(
        dataclasses.replace(m, in_channels=3, fused_block0="on")) is False
