"""make_train_multi_step: K scanned optimizer steps == K jitted steps."""

import numpy as np

import jax
import jax.numpy as jnp

from sola_tpu.models.selection import SelectionConfig, SelectionModel
from sola_tpu.train import state as state_lib
from sola_tpu.train.loop import make_train_multi_step, make_train_step

CFG = SelectionConfig(
    object_token_dim=32, lang_token_dim=64, n_layers=1, n_negative=4,
    dropout_p=0.0, n_groups=4, n_groups_module=4)
TRAIN_CFG = {"positive_weight": 1.5, "alignment_weight": 0.3,
             "temperature": 0.07}


def _batch(rng, b=2, n=4, t=16, w=5):
    return {
        "object_tokens": jnp.asarray(
            rng.standard_normal((b, n, t, CFG.object_token_dim),
                                dtype=np.float32)),
        "track_mask": jnp.ones((b, n), bool),
        "frame_lengths": jnp.full((b,), t, jnp.int32),
        "lang_tokens": jnp.asarray(
            rng.standard_normal((b, w, CFG.lang_token_dim),
                                dtype=np.float32)),
        "lang_mask": jnp.ones((b, w), bool),
        "pos_tokens": jnp.asarray(
            rng.standard_normal((b, 1, CFG.lang_token_dim),
                                dtype=np.float32)),
        "labels": jnp.asarray(
            (rng.random((b, n)) > 0.5).astype(np.float32)),
    }


def test_multi_step_matches_single_steps():
    model = SelectionModel(CFG)
    optimizer = state_lib.make_optimizer(lr=1e-3, grad_clip_norm=1.0)
    rng = np.random.default_rng(0)
    batches = tuple(_batch(rng) for _ in range(3))
    rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(3)])

    step = make_train_step(model, optimizer, TRAIN_CFG)
    st_a = state_lib.create_train_state(CFG, optimizer)
    metrics_a = []
    for i, b in enumerate(batches):
        st_a, m = step(st_a, b, rngs[i])
        metrics_a.append({k: float(v) for k, v in m.items()})

    multi = make_train_multi_step(model, optimizer, TRAIN_CFG)
    st_b = state_lib.create_train_state(CFG, optimizer)
    st_b, m_b = multi(st_b, batches, rngs)

    # the scanned program fuses/reassociates fp32 reductions differently
    # than the standalone step, and early Adam steps normalize by tiny
    # second moments — amplifying reassociation noise into ~1e-5-level
    # param deltas; semantics (order, rngs, updates) are identical
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), st_a.params, st_b.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-4
    for i in range(3):
        for k in ("total", "bce", "alignment"):
            assert abs(metrics_a[i][k] - float(m_b[k][i])) < 1e-4, (i, k)
    assert int(st_b.step) == 3


def test_multi_step_accepts_token_rows():
    """Device-cached row tuples stack leaf-wise through the scan."""
    model = SelectionModel(CFG)
    optimizer = state_lib.make_optimizer(lr=1e-3, grad_clip_norm=1.0)
    rng = np.random.default_rng(1)
    batches = []
    for _ in range(2):
        b = _batch(rng)
        tok = b.pop("object_tokens")
        b["object_tokens"] = tuple(tok[i] for i in range(tok.shape[0]))
        batches.append(b)
    rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(2)])
    multi = make_train_multi_step(model, optimizer, TRAIN_CFG)
    st = state_lib.create_train_state(CFG, optimizer)
    st, m = multi(st, tuple(batches), rngs)
    assert np.isfinite(float(m["total"][-1]))
    assert int(st.step) == 2
