"""Hiera scan-over-runs: segmentation of the L config, converter stacking
roundtrip on a config with real runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.trackgen.sam2 import convert
from sola_tpu.trackgen.sam2.hiera import Hiera, HieraConfig, hiera_segments
from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model


def test_segments_hiera_l():
    segs = hiera_segments(HieraConfig.large())
    kinds = [(s[0], s[1]) for s in segs]
    # stage ends 1,7,43,47; q_pool at 2,8,44; globals at 23,33,43
    assert ("run", 0) in kinds          # stage 0: blocks 0-1
    assert ("single", 2) in kinds       # q_pool
    assert ("run", 3) in kinds          # stage 1: 3-7
    assert ("single", 23) in kinds and ("single", 33) in kinds \
        and ("single", 43) in kinds     # globals
    runs = {s[1]: s[2] for s in segs if s[0] == "run"}
    assert runs[9] == 14 and runs[24] == 9 and runs[34] == 9
    assert runs[45] == 3
    # coverage: every block exactly once
    covered = []
    for s in segs:
        if s[0] == "single":
            covered.append(s[1])
        else:
            covered.extend(range(s[1], s[1] + s[2]))
    assert sorted(covered) == list(range(48))


@pytest.fixture(scope="module")
def run_cfg_model():
    import dataclasses
    hiera = HieraConfig(embed_dim=16, num_heads=1, stages=(2, 2, 2, 2),
                        global_att_blocks=(5,), window_spec=(4, 2, 4, 2),
                        window_pos_embed_bkg_spatial_size=(2, 2))
    segs = hiera_segments(hiera)
    assert any(s[0] == "run" for s in segs), "config must contain runs"
    model = Hiera(hiera)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return hiera, model, variables


def test_run_params_are_stacked(run_cfg_model):
    hiera, model, variables = run_cfg_model
    params = variables["params"]
    run_keys = [k for k in params if k.startswith("run_")]
    assert run_keys
    stacked = params[run_keys[0]]["block"]["norm1"]["scale"]
    assert np.asarray(stacked).ndim == 2  # (n, dim)


def test_forward_runs_and_shapes(run_cfg_model):
    hiera, model, variables = run_cfg_model
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    outs = model.apply(variables, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 8, 8, 16)
    assert outs[3].shape == (1, 1, 1, 128)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_full_sam2_roundtrip_with_runs():
    import dataclasses
    from sola_tpu.trackgen.sam2.image_encoder import ImageEncoderConfig
    hiera = HieraConfig(embed_dim=16, num_heads=1, stages=(2, 2, 2, 2),
                        global_att_blocks=(5,), window_spec=(4, 2, 4, 2),
                        window_pos_embed_bkg_spatial_size=(2, 2))
    cfg = dataclasses.replace(
        SAM2Config.tiny_test(image_size=64),
        image_encoder=dataclasses.replace(
            ImageEncoderConfig.tiny_test(), hiera=hiera))
    model = SAM2Model(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), img)
    state = convert.params_to_torch_sam2(variables, cfg)
    # per-block torch naming exists for run members
    assert "image_encoder.trunk.blocks.0.norm1.weight" in state
    assert "image_encoder.trunk.blocks.1.norm1.weight" in state
    back = convert.torch_sam2_to_params(state, cfg)
    merged = convert._merge_with_template(variables, back)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(merged["params"])):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(p1))
