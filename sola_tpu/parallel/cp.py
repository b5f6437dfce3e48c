"""Context parallelism: attention over a key/value axis sharded across chips.

SAM2's memory cross-attention is the propagation hot loop's dominant cost
(4096 queries x ~29k memory-bank keys per frame step at hiera-L,
model.py condition_features). A single v5e chip fits it comfortably, but
the memory bank grows linearly with ``num_recent`` x ``memory_stride`` —
long-context variants (more retained memories, denser banks, higher
resolutions) outgrow one chip's HBM/FLOPs. Context parallelism shards the
KEY axis across mesh devices: each chip attends its local key shard with
the same Pallas flash kernel the single-chip path uses, and the partial
rows combine EXACTLY via their logsumexp weights — two tiny collectives
(psum over (B, H, Lq) scalars and the weighted output sum) ride the ICI.

o_global = sum_i exp(lse_i - LSE) * o_i,   LSE = logsumexp_i(lse_i)

This is the standard blockwise/ring decomposition of softmax attention
(the same identity the flash kernel applies across key BLOCKS, lifted
across DEVICES); no approximation anywhere — parity vs the single-device
program is asserted in tests/test_cp.py, including shards whose keys are
entirely masked out (they get weight exp(-inf - LSE) = 0).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_attention_lse(q, k, v, key_mask, use_flash: bool):
    """(out (B,H,Lq,D), lse (B,H,Lq)) over the LOCAL key shard."""
    if use_flash:
        from sola_tpu.ops.flash_attention import fused_attention_lse
        return fused_attention_lse(q, k, v, key_mask)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -jnp.inf)
    lse = jax.nn.logsumexp(s, axis=-1)                      # (B,H,Lq)
    p = jnp.exp(s - jnp.where(jnp.isfinite(lse), lse,
                              0.0)[..., None])              # 0 if all-masked
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o.astype(q.dtype), lse


def cp_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                 key_mask: Optional[jax.Array], axis_name: str,
                 use_flash: bool = True) -> jax.Array:
    """Attention where k/v/key_mask hold only this device's KEY SHARD and
    q is replicated along ``axis_name``. Call inside shard_map/pjit; the
    result is the exact full-key attention, identical on every device.

    Shapes (local): q (B, H, Lq, D); k, v (B, H, Lk_local, D);
    key_mask (B, Lk_local) bool or None.
    """
    o_i, lse_i = _local_attention_lse(q, k, v, key_mask, use_flash)
    # logsumexp combine across the axis, -inf-safe (fully-masked shards)
    m = jax.lax.pmax(lse_i, axis_name)                      # (B,H,Lq)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e_i = jnp.where(lse_i == -jnp.inf, 0.0, jnp.exp(lse_i - m_safe))
    denom = jax.lax.psum(e_i, axis_name)
    w = e_i / jnp.maximum(denom, 1e-30)                     # (B,H,Lq)
    return jax.lax.psum(o_i.astype(jnp.float32) * w[..., None],
                        axis_name).astype(q.dtype)


def shard_map_attention(mesh: Mesh, q: jax.Array, k: jax.Array,
                        v: jax.Array, key_mask: Optional[jax.Array],
                        axis: str = "model",
                        use_flash: bool = True) -> jax.Array:
    """Convenience wrapper: given GLOBAL (B, H, L, D) tensors, shard the
    key axis of k/v/key_mask over ``mesh[axis]``, run cp_attention under
    shard_map, and return the (replicated) exact attention output.

    The key length must divide the axis size. Production integrations
    should instead call ``cp_attention`` inside their own shard_map with
    the rest of the model's sharding."""
    from jax.experimental.shard_map import shard_map

    kv_spec = P(None, None, axis, None)
    mask_spec = P(None, axis) if key_mask is not None else None
    in_specs = (P(), kv_spec, kv_spec, mask_spec)
    fn = lambda q_, k_, v_, m_: cp_attention(  # noqa: E731
        q_, k_, v_, m_, axis_name=axis, use_flash=use_flash)
    if key_mask is None:
        in_specs = (P(), kv_spec, kv_spec)
        fn = lambda q_, k_, v_: cp_attention(  # noqa: E731
            q_, k_, v_, None, axis_name=axis, use_flash=use_flash)
        args = (q, k, v)
    else:
        args = (q, k, v, key_mask)
    sharded = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P(),
                        check_rep=False)
    return sharded(*args)


def place_cp_inputs(mesh: Mesh, k: jax.Array, v: jax.Array,
                    key_mask: Optional[jax.Array], axis: str = "model"):
    """device_put k/v/mask with the key axis sharded over ``mesh[axis]``
    (the layout shard_map_attention expects to find them in)."""
    kv = NamedSharding(mesh, P(None, None, axis, None))
    k = jax.device_put(k, kv)
    v = jax.device_put(v, kv)
    if key_mask is not None:
        key_mask = jax.device_put(
            key_mask, NamedSharding(mesh, P(None, axis)))
    return k, v, key_mask
