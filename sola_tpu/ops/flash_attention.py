"""Fused (flash) attention Pallas kernel for TPU.

Blockwise softmax(QK^T)V with running-max/denominator accumulation in VMEM
scratch, so the (Lq, Lk) score matrix never materializes in HBM. Used by the
selection model's attention stack (BASELINE.md names fused attention kernels
as the north star) and sized for SAM2's memory attention, the per-frame hot
loop of track generation (4096 queries x ~29k memory tokens).

Grid layout: (batch*heads, q_blocks, k_blocks); the k axis is the innermost
(sequential on TPU) dimension, accumulating into scratch; outputs are
written on the final k step. Falls back to interpreter mode off-TPU so tests
exercise the same kernel on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                 m_scratch, l_scratch, acc_scratch, *, scale: float,
                 has_mask: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (bq, bk)
    if has_mask:
        valid = mask_ref[0] > 0  # (1, bk) -> broadcast rows
        s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scratch[:]                      # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                     # (bq, bk)
    alpha = jnp.exp(m_prev - m_new)            # (bq, 1)
    l_new = alpha * l_scratch[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] /
                    jnp.maximum(l_scratch[:], 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def _fused_attention_3d(q, k, v, mask, block_q: int, block_k: int,
                        interpret: bool):
    """q (BH, Lq, D); k/v (BH, Lk, D); mask (BH, Lk) int32 or None."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / (d ** 0.5)

    q_p = _pad_to(q, 1, block_q)
    k_p = _pad_to(k, 1, block_k)
    v_p = _pad_to(v, 1, block_k)
    lq_p = q_p.shape[1]
    lk_p = k_p.shape[1]
    has_mask = mask is not None or lk_p != lk
    if mask is None:
        mask = jnp.ones((bh, lk), jnp.int32)
    mask_p = _pad_to(mask.astype(jnp.int32), 1, block_k)[:, None, :]

    grid = (bh, lq_p // block_q, lk_p // block_k)
    kernel = functools.partial(_attn_kernel, scale=scale, has_mask=has_mask)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, iq, ik: (b, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        # batch*heads and q-blocks are independent (megacore-parallel); the
        # k axis is the online-softmax reduction and must stay sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q_p, k_p, v_p, mask_p)
    return out[:, :lq]


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    key_mask: Optional[jax.Array] = None,
                    block_q: int = 128, block_k: int = 128) -> jax.Array:
    """Fused attention over (B, H, Lq, D) / (B, H, Lk, D) head tensors.

    ``key_mask``: optional (B, Lk) boolean validity mask. Returns
    (B, H, Lq, D). Uses interpreter mode on non-TPU backends.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, max(_next_pow2(lq), 8))
    block_k = min(block_k, max(_next_pow2(lk), 8))
    q3 = q.reshape(b * h, lq, d)
    k3 = k.reshape(b * h, lk, d)
    v3 = v.reshape(b * h, lk, d)
    mask3 = None
    if key_mask is not None:
        mask3 = jnp.repeat(key_mask.astype(jnp.int32), h, axis=0)
    out = _fused_attention_3d(q3, k3, v3, mask3, block_q, block_k,
                              interpret)
    return out.reshape(b, h, lq, d)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
