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


def _np_fmix32(x):
    x = np.uint32(x)
    x ^= x >> np.uint32(16)
    x = (x.astype(np.uint64) * np.uint64(0x7FEB352D)).astype(np.uint32)
    x ^= x >> np.uint32(15)
    x = (x.astype(np.uint64) * np.uint64(0x846CA68B)).astype(np.uint32)
    x ^= x >> np.uint32(16)
    return x


def np_keep_mask(seed, bh, lq, lk, rate):
    """Independent numpy reimplementation of the kernel's counter-based
    dropout hash (global (batch*head, q, k) indices — tiling-invariant)."""
    thresh = np.uint32(min(2 ** 32 - 1, int(round((1.0 - rate) * 2 ** 32))))
    rows = np.arange(lq, dtype=np.uint32)[:, None]
    cols = np.arange(lk, dtype=np.uint32)[None, :]
    base = _np_fmix32(np.uint32(seed) ^ np.uint32(
        (np.uint64(bh) * np.uint64(0x9E3779B1)) & np.uint64(0xFFFFFFFF)))
    h = _np_fmix32(base
                   ^ (rows * np.uint32(0x85EBCA6B)).astype(np.uint32)
                   ^ (cols * np.uint32(0xC2B2AE35)).astype(np.uint32))
    return h < thresh


def dense_dropout_reference(q, k, v, seed, rate, key_mask=None):
    """softmax -> fixed hash keep-mask -> 1/(1-rate) scale -> V (torch SDPA
    dropout placement with the kernel's exact mask)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(d, q.dtype))
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    keep = np.stack([np_keep_mask(seed, bi * h + hi, lq, lk, rate)
                     for bi in range(b) for hi in range(h)])
    keep = jnp.asarray(keep.reshape(b, h, lq, lk), p.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p * keep / (1.0 - rate), v)


def test_dropout_matches_dense_with_same_mask(rng):
    """Kernel dropout == dense softmax with the SAME hash mask applied —
    proves the in-kernel mask is exactly hash(seed, bh, global q, global k)
    regardless of block tiling (blocks chosen to force multi-tile grids)."""
    from sola_tpu.ops.flash_attention import fused_attention
    b, h, lq, lk, d = 2, 2, 24, 40, 32
    rate, seed = 0.3, 12345
    q = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    out = fused_attention(q, k, v, block_q=16, block_k=16,
                          dropout_rate=rate,
                          dropout_seed=jnp.asarray([seed], jnp.uint32))
    ref = dense_dropout_reference(q, k, v, seed, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and with a key mask on top
    m = np.ones((b, lk), bool)
    m[0, 25:] = False
    out_m = fused_attention(q, k, v, key_mask=jnp.asarray(m), block_q=16,
                            block_k=16, dropout_rate=rate,
                            dropout_seed=jnp.asarray([seed], jnp.uint32))
    ref_m = dense_dropout_reference(q, k, v, seed, rate,
                                    key_mask=jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                               atol=2e-5)


def test_dropout_gradients_match_dense(rng):
    """dq/dk/dv with in-kernel dropout vs autodiff through the dense path
    with the identical (host-regenerated) mask — the bwd kernels must
    rebuild the same mask the fwd used."""
    from sola_tpu.ops.flash_attention import fused_attention
    b, h, lq, lk, d = 2, 2, 24, 40, 32
    rate, seed = 0.25, 777
    q = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d), dtype=np.float32))
    cot = jnp.asarray(rng.standard_normal((b, h, lq, d), dtype=np.float32))
    m = np.ones((b, lk), bool)
    m[1, 30:] = False
    key_mask = jnp.asarray(m)

    def fused_loss(q, k, v):
        out = fused_attention(q, k, v, key_mask=key_mask, block_q=16,
                              block_k=16, dropout_rate=rate,
                              dropout_seed=jnp.asarray([seed], jnp.uint32))
        return jnp.sum(out * cot)

    def dense_loss(q, k, v):
        return jnp.sum(dense_dropout_reference(q, k, v, seed, rate,
                                               key_mask=key_mask) * cot)

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4,
                                   err_msg=f"d{name}")


def test_dropout_keep_fraction_and_seed_variation():
    """Statistics: the hash keeps ~(1-rate) of entries; distinct seeds give
    distinct masks; the same seed is bit-deterministic."""
    for rate in (0.1, 0.5):
        keep = np_keep_mask(42, 3, 256, 256, rate)
        frac = keep.mean()
        assert abs(frac - (1.0 - rate)) < 0.01, (rate, frac)
    a = np_keep_mask(1, 0, 64, 64, 0.5)
    b = np_keep_mask(2, 0, 64, 64, 0.5)
    assert (a != b).mean() > 0.3
    np.testing.assert_array_equal(a, np_keep_mask(1, 0, 64, 64, 0.5))


def test_selection_model_pallas_train_mode(rng):
    """SelectionModel end to end with use_pallas_attention=True in TRAIN
    mode (attention dropout active through the kernel): runs, finite, and
    differs from the deterministic output (dropout is live); gradients are
    finite through the custom_vjp."""
    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    cfg = SelectionConfig(object_token_dim=16, lang_token_dim=64,
                          n_layers=1, n_negative=4, dropout_p=0.0,
                          attn_dropout_p=0.4, n_groups=4, n_groups_module=4,
                          use_pallas_attention=True)
    obj = jnp.asarray(rng.standard_normal((2, 3, 16, 16), dtype=np.float32))
    lang = jnp.asarray(rng.standard_normal((2, 5, 64), dtype=np.float32))
    model = SelectionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), obj, lang)
    det, _ = model.apply(variables, obj, lang)

    def loss(params, drop_key):
        out, _ = model.apply({**variables, "params": params}, obj, lang,
                             deterministic=False,
                             rngs={"dropout": drop_key})
        return jnp.sum(out[0] ** 2), out[0]

    (val, out), grads = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    assert np.abs(np.asarray(out) - np.asarray(det)).max() > 1e-6
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # different dropout keys -> different stochastic outputs
    (_, out2), _ = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], jax.random.PRNGKey(2))
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-7


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
