"""Context-parallel attention (parallel/cp.py): exact parity between the
key-sharded shard_map program on the virtual 8-device mesh and the
single-device reference, including fully-masked key shards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sola_tpu.parallel.cp import (cp_attention, place_cp_inputs,
                                  shard_map_attention)


def _dense_reference(q, k, v, key_mask):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q, np.float64),
                  np.asarray(k, np.float64)) * scale
    if key_mask is not None:
        s = np.where(np.asarray(key_mask)[:, None, None, :], s, -np.inf)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / np.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    return np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v, np.float64))


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides the 8-device CPU mesh"
    return Mesh(np.asarray(devs[:8]), ("model",))


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_cp_matches_dense(mesh):
    b, h, lq, lk, d = 2, 4, 16, 64, 32
    q, k, v = _rand(0, (b, h, lq, d)), _rand(1, (b, h, lk, d)), \
        _rand(2, (b, h, lk, d))
    mask = np.ones((b, lk), bool)
    mask[0, 40:] = False            # ragged; shards 5..7 fully masked in b=0
    mask[1, ::3] = False
    k_s, v_s, m_s = place_cp_inputs(mesh, k, v, jnp.asarray(mask))
    out = shard_map_attention(mesh, q, k_s, v_s, m_s, use_flash=False)
    ref = _dense_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               atol=2e-5, rtol=2e-5)


def test_cp_no_mask(mesh):
    b, h, lq, lk, d = 1, 2, 8, 32, 16
    q, k, v = _rand(3, (b, h, lq, d)), _rand(4, (b, h, lk, d)), \
        _rand(5, (b, h, lk, d))
    k_s, v_s, _ = place_cp_inputs(mesh, k, v, None)
    out = shard_map_attention(mesh, q, k_s, v_s, None, use_flash=False)
    ref = _dense_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               atol=2e-5, rtol=2e-5)


def test_cp_flash_kernel_interpret(mesh):
    """The Pallas kernel path (interpret mode off-TPU) composes with the
    shard_map combine: kernel lse + collective weights == dense."""
    b, h, lq, lk, d = 1, 2, 16, 64, 32
    q, k, v = _rand(6, (b, h, lq, d)), _rand(7, (b, h, lk, d)), \
        _rand(8, (b, h, lk, d))
    mask = np.ones((b, lk), bool)
    mask[0, 50:] = False
    k_s, v_s, m_s = place_cp_inputs(mesh, k, v, jnp.asarray(mask))
    out = shard_map_attention(mesh, q, k_s, v_s, m_s, use_flash=True)
    ref = _dense_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               atol=5e-5, rtol=5e-5)


def test_cp_single_device_degenerate():
    """axis of size 1 == plain attention (sanity for the combine math)."""
    devs = jax.devices()
    mesh1 = Mesh(np.asarray(devs[:1]), ("model",))
    b, h, lq, lk, d = 1, 1, 4, 8, 8
    q, k, v = _rand(9, (b, h, lq, d)), _rand(10, (b, h, lk, d)), \
        _rand(11, (b, h, lk, d))
    out = shard_map_attention(mesh1, q, k, v, None, use_flash=False)
    ref = _dense_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_lse_matches_dense():
    """fused_attention_lse returns the exact (out, lse) pair."""
    from sola_tpu.ops.flash_attention import fused_attention_lse
    b, h, lq, lk, d = 2, 2, 16, 48, 32
    q, k, v = _rand(12, (b, h, lq, d)), _rand(13, (b, h, lk, d)), \
        _rand(14, (b, h, lk, d))
    mask = np.ones((b, lk), bool)
    mask[1, 30:] = False
    out, lse = fused_attention_lse(q, k, v, jnp.asarray(mask))
    ref = _dense_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               atol=5e-5, rtol=5e-5)
    scale = 1.0 / (d ** 0.5)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q, np.float64),
                  np.asarray(k, np.float64)) * scale
    s = np.where(np.asarray(mask)[:, None, None, :], s, -np.inf)
    m = s.max(axis=-1)
    ref_lse = m + np.log(np.exp(s - m[..., None]).sum(axis=-1))
    np.testing.assert_allclose(np.asarray(lse, np.float64), ref_lse,
                               atol=5e-5, rtol=5e-5)
