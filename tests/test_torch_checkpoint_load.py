"""Loading reference-format checkpoints (epoch_N.pth / .npz) through the
eval-CLI weight path (train/state.py:load_torch_weights)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sola_tpu.models.selection import SelectionConfig, SelectionModel
from sola_tpu.train import state as state_lib

torch = pytest.importorskip("torch")
from tests import torch_oracle  # noqa: E402


@pytest.fixture(scope="module")
def reference_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    state = torch_oracle.make_state_dict(seed=3, d_obj=32, d_lang=64,
                                         n_layers=2, n_negative=8,
                                         n_groups=4)
    pth = os.path.join(str(d), "epoch_1.pth")
    torch.save(state, pth)
    npz = os.path.join(str(d), "epoch_1.npz")
    np.savez(npz, **{k: v.numpy() for k, v in state.items()})
    return state, pth, npz


def test_load_pth(reference_ckpt):
    state, pth, _ = reference_ckpt
    variables = state_lib.load_torch_weights(pth, n_layers=2)
    got = np.asarray(variables["params"]["negative_token"])
    np.testing.assert_allclose(got, state["negative_token.weight"].numpy())
    # loaded weights drive the model
    cfg = SelectionConfig(object_token_dim=32, lang_token_dim=64, n_layers=2,
                          n_negative=8, dropout_p=0.0, n_groups=4,
                          n_groups_module=4)
    model = SelectionModel(cfg)
    out, _ = model.apply(
        {"params": variables["params"], "buffers": variables["buffers"]},
        jnp.zeros((1, 2, 16, 32)), jnp.zeros((1, 3, 64)))
    assert np.isfinite(np.asarray(out)).all()


def test_load_npz_matches_pth(reference_ckpt):
    _, pth, npz = reference_ckpt
    v1 = state_lib.load_torch_weights(pth, n_layers=2)
    v2 = state_lib.load_torch_weights(npz, n_layers=2)
    import jax
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(v1["params"]),
            jax.tree_util.tree_leaves_with_path(v2["params"])):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_roundtrip(tmp_path, reference_ckpt):
    """export_torch_npz(load(x)) == x for every tensor."""
    state, pth, _ = reference_ckpt
    variables = state_lib.load_torch_weights(pth, n_layers=2)

    class FakeState:
        params = variables["params"]
        buffers = variables["buffers"]

    out = os.path.join(str(tmp_path), "export.npz")
    state_lib.export_torch_npz(out, FakeState, n_layers=2)
    data = dict(np.load(out))
    for k, v in state.items():
        np.testing.assert_allclose(data[k], v.numpy(), atol=1e-6,
                                   err_msg=k)
