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

    from ast_tpu.ops.pallas_block0 import block0_impl

    m = ModelConfig()
    # default "auto" = flax convs: the Pallas kernel faults the current
    # libtpu and the XLA rewrite measured slower in context (config.py)
    assert m.fused_block0 == "auto"
    assert block0_impl(m) == "none"
    assert fused_block0_active(m) is False
    assert block0_impl(dataclasses.replace(m, fused_block0="xla")) == "xla"
    assert block0_impl(dataclasses.replace(m, fused_block0="off")) == "none"
    on = dataclasses.replace(m, fused_block0="on")
    assert block0_impl(on) == "pallas"
    assert fused_block0_active(on) is True
    assert block0_impl(on, mesh=object()) == "none"  # no pallas under GSPMD
    assert block0_impl(
        dataclasses.replace(m, fused_block0="xla"), mesh=object()) == "xla"
    assert block0_impl(
        dataclasses.replace(m, in_channels=3, fused_block0="on")) == "none"


def test_block0_xla_matches_reference():
    """The folded-weight XLA rewrite (s2d conv1 + per-sample IN shortcut)
    must match block0_reference to fp32 reassociation accuracy."""
    from ast_tpu.ops.pallas_block0 import block0_reference, block0_xla

    fb = _random_folded(np.random.default_rng(3))
    for shape in ((2, 2, 37, 53), (2, 2, 16, 44)):  # odd AND even H/W
        x = 0.5 * jax.random.normal(jax.random.PRNGKey(4), shape)
        want = np.asarray(block0_reference(x, fb))
        got = np.asarray(block0_xla(x, fb))
        assert got.shape == want.shape
        rel = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
        assert rel < 1e-5, (shape, rel)
