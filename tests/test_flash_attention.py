"""Pallas fused attention vs the dense jnp reference (interpreter on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.ops.flash_attention import fused_attention


def dense_reference(q, k, v, key_mask=None):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d,
                                                                   q.dtype))
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("shape", [
    (1, 2, 16, 32),     # tiny
    (2, 4, 100, 64),    # non-multiple of block
    (1, 1, 64, 128),    # selection-model head dim
])
def test_matches_dense(rng, shape):
    b, h, l, d = shape
    q = jnp.asarray(rng.standard_normal((b, h, l, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, l + 13, d),
                                        dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, l + 13, d),
                                        dtype=np.float32))
    out = fused_attention(q, k, v, block_q=32, block_k=32)
    ref = dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_key_mask(rng):
    b, h, lq, lk, d = 2, 2, 24, 40, 32
    q = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    mask = np.ones((b, lk), bool)
    mask[0, 25:] = False
    mask[1, 5:9] = False
    out = fused_attention(q, k, v, key_mask=jnp.asarray(mask), block_q=16,
                          block_k=16)
    ref = dense_reference(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # masked keys must not influence the output at all
    k2 = k.at[0, :, 30].set(999.0)
    v2 = v.at[0, :, 30].set(-999.0)
    out2 = fused_attention(q, k2, v2, key_mask=jnp.asarray(mask),
                           block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=2e-5)


def test_selection_model_pallas_path(rng):
    """SelectionModel with use_pallas_attention=True must agree with the
    dense path (deterministic, no masks)."""
    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    cfg_dense = SelectionConfig(object_token_dim=16, lang_token_dim=64,
                                n_layers=1, n_negative=4, dropout_p=0.0,
                                n_groups=4, n_groups_module=4)
    cfg_pallas = SelectionConfig(object_token_dim=16, lang_token_dim=64,
                                 n_layers=1, n_negative=4, dropout_p=0.0,
                                 n_groups=4, n_groups_module=4,
                                 use_pallas_attention=True)
    obj = jnp.asarray(rng.standard_normal((1, 3, 16, 16), dtype=np.float32))
    lang = jnp.asarray(rng.standard_normal((1, 5, 64), dtype=np.float32))
    model_d = SelectionModel(cfg_dense)
    variables = model_d.init(jax.random.PRNGKey(0), obj, lang)
    out_d, _ = model_d.apply(variables, obj, lang)
    model_p = SelectionModel(cfg_pallas)
    out_p, _ = model_p.apply(variables, obj, lang)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_gradients_match_dense(rng, masked):
    """custom_vjp backward (Pallas recompute kernels) vs autodiff through
    the dense path — dq/dk/dv parity."""
    b, h, lq, lk, d = 2, 2, 24, 40, 32
    q = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    key_mask = None
    if masked:
        m = np.ones((b, lk), bool)
        m[0, 25:] = False
        m[1, 5:9] = False
        key_mask = jnp.asarray(m)
    cot = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))

    def fused_loss(q, k, v):
        out = fused_attention(q, k, v, key_mask=key_mask, block_q=16,
                              block_k=16)
        return jnp.sum(out * cot)

    def dense_loss(q, k, v):
        return jnp.sum(dense_reference(q, k, v, key_mask) * cot)

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4,
                                   err_msg=f"d{name}")
    if masked:
        # gradients w.r.t. masked keys/values must be exactly zero
        dk, dv = np.asarray(got[1]), np.asarray(got[2])
        assert np.abs(dk[0, :, 25:]).max() == 0.0
        assert np.abs(dv[1, :, 5:9]).max() == 0.0


def test_grad_through_nonaligned_lengths(rng):
    """Padding path: lengths not multiples of the block sizes."""
    b, h, lq, lk, d = 1, 2, 21, 37, 16
    q = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))

    def fused_loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, block_q=16, block_k=16) ** 2)

    def dense_loss(q, k, v):
        return jnp.sum(dense_reference(q, k, v) ** 2)

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4)


def test_sam2_memory_shape(rng):
    """SAM2 memory-attention shape: 1 head, head_dim 256, long keys."""
    b, h, lq, lk, d = 1, 1, 64, 600, 256
    q = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    mask = np.ones((b, lk), bool)
    mask[0, 500:] = False
    out = fused_attention(q, k, v, key_mask=jnp.asarray(mask))
    ref = dense_reference(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
