"""Numerical parity of the JAX SelectionModel vs the torch oracle, plus
mask-correctness: padded tracks/frames/words must not change valid outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.models.convert import (params_to_torch_state_dict,
                                     torch_state_dict_to_params)
from sola_tpu.models.selection import SelectionConfig, SelectionModel

torch = pytest.importorskip("torch")
from tests import torch_oracle  # noqa: E402

CFG = SelectionConfig(
    object_token_dim=32,
    lang_token_dim=64,
    n_layers=2,
    max_temporal_length=100,
    n_negative=8,
    dropout_p=0.0,
    n_groups=4,
    n_groups_module=4,
    num_heads=8,
)


@pytest.fixture(scope="module")
def state_and_vars():
    state = torch_oracle.make_state_dict(
        seed=0, d_obj=CFG.object_token_dim, d_lang=CFG.lang_token_dim,
        n_layers=CFG.n_layers, n_negative=CFG.n_negative,
        n_groups=CFG.n_groups)
    variables = torch_state_dict_to_params(state, n_layers=CFG.n_layers)
    return state, variables


def run_jax(variables, object_tokens, lang_tokens, **kwargs):
    model = SelectionModel(CFG)
    return model.apply(
        {"params": variables["params"], "buffers": variables["buffers"]},
        jnp.asarray(object_tokens), jnp.asarray(lang_tokens), **kwargs)


def test_forward_parity(state_and_vars, rng):
    state, variables = state_and_vars
    b, n, t, w = 2, 5, 24, 7
    object_tokens = rng.standard_normal((b, n, t, CFG.object_token_dim),
                                        dtype=np.float32)
    lang_tokens = rng.standard_normal((b, w, CFG.lang_token_dim),
                                      dtype=np.float32)
    ref_map, ref_tokens = torch_oracle.forward(
        state, object_tokens, lang_tokens, n_layers=CFG.n_layers,
        n_groups=CFG.n_groups, n_groups_module=CFG.n_groups_module,
        heads=CFG.num_heads)
    out_map, out_tokens = run_jax(variables, object_tokens, lang_tokens)
    np.testing.assert_allclose(np.asarray(out_map), ref_map, atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_tokens), ref_tokens, atol=2e-4,
                               rtol=1e-4)


def test_roundtrip_conversion(state_and_vars):
    state, variables = state_and_vars
    back = params_to_torch_state_dict(variables, n_layers=CFG.n_layers)
    for k, v in state.items():
        np.testing.assert_allclose(back[k], v.numpy(), rtol=1e-6,
                                   err_msg=k)


def test_padding_invariance(state_and_vars, rng):
    """Outputs on the valid region must be identical whether or not the
    batch is padded along tracks/frames/words — the property that makes
    cross-sample batching legal on TPU."""
    state, variables = state_and_vars
    n, t, w = 4, 16, 6
    object_tokens = rng.standard_normal((1, n, t, CFG.object_token_dim),
                                        dtype=np.float32)
    lang_tokens = rng.standard_normal((1, w, CFG.lang_token_dim),
                                      dtype=np.float32)

    base_map, base_tokens = run_jax(
        variables, object_tokens, lang_tokens,
        track_mask=jnp.ones((1, n), bool),
        frame_lengths=jnp.array([t]),
        lang_mask=jnp.ones((1, w), bool))

    # pad every axis with garbage
    n_pad, t_pad, w_pad = n + 3, t + 9, w + 5
    obj_pad = rng.standard_normal((1, n_pad, t_pad, CFG.object_token_dim),
                                  dtype=np.float32) * 10
    obj_pad[:, :n, :t] = object_tokens
    lang_pad = rng.standard_normal((1, w_pad, CFG.lang_token_dim),
                                   dtype=np.float32) * 10
    lang_pad[:, :w] = lang_tokens
    track_mask = np.zeros((1, n_pad), bool)
    track_mask[:, :n] = True
    lang_mask = np.zeros((1, w_pad), bool)
    lang_mask[:, :w] = True

    pad_map, pad_tokens = run_jax(
        variables, obj_pad, lang_pad,
        track_mask=jnp.asarray(track_mask),
        frame_lengths=jnp.array([t]),
        lang_mask=jnp.asarray(lang_mask))

    np.testing.assert_allclose(np.asarray(pad_map)[:, :n],
                               np.asarray(base_map), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pad_tokens)[:, :n],
                               np.asarray(base_tokens), atol=1e-4, rtol=1e-4)


def test_masked_matches_torch_unpadded(state_and_vars, rng):
    """Masked JAX forward on a padded batch == torch oracle on the unpadded
    data (transitive parity through the masks)."""
    state, variables = state_and_vars
    n, t, w = 3, 20, 5
    object_tokens = rng.standard_normal((1, n, t, CFG.object_token_dim),
                                        dtype=np.float32)
    lang_tokens = rng.standard_normal((1, w, CFG.lang_token_dim),
                                      dtype=np.float32)
    ref_map, _ = torch_oracle.forward(
        state, object_tokens, lang_tokens, n_layers=CFG.n_layers,
        n_groups=CFG.n_groups, n_groups_module=CFG.n_groups_module,
        heads=CFG.num_heads)

    obj_pad = np.zeros((1, n + 2, t + 12, CFG.object_token_dim), np.float32)
    obj_pad[:, :n, :t] = object_tokens
    lang_pad = np.zeros((1, w + 3, CFG.lang_token_dim), np.float32)
    lang_pad[:, :w] = lang_tokens
    track_mask = np.array([[True] * n + [False] * 2])
    lang_mask = np.array([[True] * w + [False] * 3])
    out_map, _ = run_jax(
        variables, obj_pad, lang_pad,
        track_mask=jnp.asarray(track_mask),
        frame_lengths=jnp.array([t]),
        lang_mask=jnp.asarray(lang_mask))
    np.testing.assert_allclose(np.asarray(out_map)[:, :n], ref_map,
                               atol=2e-4, rtol=1e-4)


def test_jit_and_grad():
    """The full model must be jittable and differentiable."""
    model = SelectionModel(CFG)
    key = jax.random.PRNGKey(0)
    obj = jax.random.normal(key, (2, 4, 16, CFG.object_token_dim))
    lang = jax.random.normal(key, (2, 6, CFG.lang_token_dim))
    variables = model.init(key, obj, lang)

    @jax.jit
    def loss_fn(params):
        score_map, _ = model.apply(
            {"params": params, "buffers": variables["buffers"]}, obj, lang)
        return jnp.sum(score_map ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_heterogeneous_batch_matches_individual(state_and_vars, rng):
    """Two samples with different track/frame counts batched together must
    each reproduce their individually-computed outputs."""
    state, variables = state_and_vars
    n1, t1 = 3, 12
    n2, t2 = 5, 20
    obj1 = rng.standard_normal((1, n1, t1, CFG.object_token_dim),
                               dtype=np.float32)
    obj2 = rng.standard_normal((1, n2, t2, CFG.object_token_dim),
                               dtype=np.float32)
    w = 6
    lang = rng.standard_normal((2, w, CFG.lang_token_dim), dtype=np.float32)

    out1, _ = run_jax(variables, obj1, lang[:1],
                      track_mask=jnp.ones((1, n1), bool),
                      frame_lengths=jnp.array([t1]),
                      lang_mask=jnp.ones((1, w), bool))
    out2, _ = run_jax(variables, obj2, lang[1:],
                      track_mask=jnp.ones((1, n2), bool),
                      frame_lengths=jnp.array([t2]),
                      lang_mask=jnp.ones((1, w), bool))

    n_pad, t_pad = 6, 24
    obj = rng.standard_normal((2, n_pad, t_pad, CFG.object_token_dim),
                              dtype=np.float32) * 7  # garbage padding
    obj[0, :n1, :t1] = obj1[0]
    obj[1, :n2, :t2] = obj2[0]
    track_mask = np.zeros((2, n_pad), bool)
    track_mask[0, :n1] = True
    track_mask[1, :n2] = True
    out, _ = run_jax(variables, obj, lang,
                     track_mask=jnp.asarray(track_mask),
                     frame_lengths=jnp.array([t1, t2]),
                     lang_mask=jnp.ones((2, w), bool))
    np.testing.assert_allclose(np.asarray(out)[0, :n1],
                               np.asarray(out1)[0], atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[1, :n2],
                               np.asarray(out2)[0], atol=2e-4, rtol=1e-4)
