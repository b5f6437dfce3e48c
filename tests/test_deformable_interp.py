"""Pallas deformable interpolation-matmul kernel vs the XLA gather core.

The kernel (ops/deformable_interp.py) replaces GroundingDINO's CUDA
MultiScaleDeformableAttention gather (reference
track_generation/tools/prompt_generator.py:132 via groundingdino's
ms_deform_attn) with tile-sparse interpolation matmuls. These tests run it
in interpret mode on the CPU mesh and assert exact-semantics parity with
deformable.ms_deform_attn_core, including the zero-padding out-of-range
convention and the block-padding paths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sola_tpu.ops.deformable_interp import (corner_terms,
                                            ms_deform_attn_core_pallas)
from sola_tpu.trackgen.gdino import deformable


def _make(rng, levels, lq, heads=4, head_dim=8, points=3, in_range=True):
    values = [jnp.asarray(rng.standard_normal((2, h, w, heads * head_dim)),
                          jnp.float32) for (h, w) in levels]
    span = (0.0, 1.0) if in_range else (-0.3, 1.3)
    loc = jnp.asarray(rng.uniform(*span, (2, lq, heads, len(levels),
                                          points, 2)), jnp.float32)
    wgt = rng.random((2, lq, heads, len(levels), points))
    wgt = jnp.asarray(wgt / wgt.sum(axis=(-1, -2), keepdims=True),
                      jnp.float32)
    return values, loc, wgt


@pytest.mark.parametrize("in_range", [True, False])
def test_pallas_core_matches_gather_core(in_range):
    rng = np.random.default_rng(0 if in_range else 1)
    values, loc, wgt = _make(rng, [(12, 16), (6, 8)], lq=40,
                             in_range=in_range)
    ref = deformable.ms_deform_attn_core(values, loc, wgt)
    got = ms_deform_attn_core_pallas(values, loc, wgt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_core_guard_modes_identical(monkeypatch):
    """SOLA_DEFORM_GUARDS toggles the per-head/per-term predication
    (guards=1, the tile-skip mode) vs the dense register sweep (guards=0,
    the default — measured faster on the encoder's dense diagonal band).
    Both modes must produce bit-identical results."""
    rng = np.random.default_rng(7)
    values, loc, wgt = _make(rng, [(12, 16), (6, 8)], lq=40, in_range=False)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("SOLA_DEFORM_GUARDS", mode)
        outs[mode] = np.asarray(
            ms_deform_attn_core_pallas(values, loc, wgt, interpret=True))
    np.testing.assert_array_equal(outs["0"], outs["1"])


def test_pallas_core_block_padding_paths():
    # lq=300 pads 256-blocks to 512; hw=20*26=520 pads 512-blocks to 1024
    rng = np.random.default_rng(2)
    values, loc, wgt = _make(rng, [(20, 26)], lq=300, heads=2, head_dim=16,
                             points=2)
    ref = deformable.ms_deform_attn_core(values, loc, wgt)
    got = ms_deform_attn_core_pallas(values, loc, wgt, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_core_bf16_values_bounded_drift():
    """Production GDINO runs the kernel on bf16 values, where the combined
    f32 attention-x-bilinear weights are cast to bf16 before the MXU
    matmul (deformable_interp.py _interp_kernel) — a numerics difference
    vs the gather core, which multiplies bf16 values by f32 weights.
    Bound that drift (ADVICE r4): weights lie in [0, 1] so the bf16 cast
    costs ~2^-8 relative per term; summed over heads*points corner terms
    in an f32 accumulator the output must stay within ~1% relative of the
    f32-weight gather core."""
    rng = np.random.default_rng(3)
    values, loc, wgt = _make(rng, [(12, 16), (6, 8)], lq=40)
    values16 = [v.astype(jnp.bfloat16) for v in values]
    ref = deformable.ms_deform_attn_core(values16, loc, wgt)  # bf16 x f32
    got = ms_deform_attn_core_pallas(values16, loc, wgt, interpret=True)
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    scale = np.abs(ref).max()
    maxdiff = np.abs(got - ref).max()
    assert maxdiff <= 0.015 * scale, (maxdiff, scale)


def test_corner_terms_zero_out_of_range():
    # every corner of a far-out-of-range sample carries zero weight, and a
    # boundary sample keeps only its in-range corners
    loc = jnp.asarray([[[[[-2.0, 0.5], [0.99, 0.5]]]]])  # (1,1,1,2,2)
    attn = jnp.ones((1, 1, 1, 2), jnp.float32)
    idx, wgt = corner_terms(loc, attn, h=4, w=4)
    wgt = np.asarray(wgt).reshape(2, 4)
    assert np.all(wgt[0] == 0.0)                      # x=-2: all 4 corners out
    assert np.count_nonzero(wgt[1]) == 2              # x=0.99: x1 corner out


def test_msdeformattn_env_override_parity():
    """The module's auto dispatch under SOLA_DEFORMABLE_CORE=pallas
    (interpret mode off-TPU) matches the gather path bit-for-semantics."""
    rng = np.random.default_rng(3)
    levels = [(8, 8), (4, 4)]
    mod = deformable.MSDeformAttn(d_model=32, n_levels=2, n_heads=4,
                                  n_points=2)
    q = jnp.asarray(rng.standard_normal((1, 10, 32)), jnp.float32)
    refp = jnp.asarray(rng.random((1, 10, 2, 2)), jnp.float32)
    vals = [jnp.asarray(rng.standard_normal((1, h, w, 32)), jnp.float32)
            for (h, w) in levels]
    params = mod.init(jax.random.PRNGKey(0), q, refp, vals)

    prev = os.environ.get("SOLA_DEFORMABLE_CORE")
    try:
        os.environ["SOLA_DEFORMABLE_CORE"] = "gather"
        ref = mod.apply(params, q, refp, vals)
        os.environ["SOLA_DEFORMABLE_CORE"] = "pallas"
        got = mod.apply(params, q, refp, vals)
    finally:
        if prev is None:
            os.environ.pop("SOLA_DEFORMABLE_CORE", None)
        else:
            os.environ["SOLA_DEFORMABLE_CORE"] = prev
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_auto_dispatch_uses_gather_off_tpu():
    # on the CPU test backend, auto mode must route to the gather core
    # (interpret-mode pallas at production shapes would hang the suite)
    rng = np.random.default_rng(4)
    values, loc, wgt = _make(rng, [(6, 8)], lq=8)
    ref = deformable.ms_deform_attn_core(values, loc, wgt)
    got = deformable.ms_deform_attn_core_auto(values, loc, wgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
