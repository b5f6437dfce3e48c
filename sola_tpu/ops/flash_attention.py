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


def _fmix32(x):
    """splitmix32 finalizer on uint32 lanes (VPU integer ops only — works
    compiled on TPU AND in interpreter mode, unlike pltpu.prng_* which has
    no interpret rule in this JAX)."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _keep_mask(seed, b, iq, ik, bq: int, bk: int, keep_thresh: int):
    """Deterministic per-(batch*head, global q, global k) dropout keep mask.

    Counter-based: hash(seed, b, row, col) < keep_thresh, so the forward and
    both backward kernels regenerate the IDENTICAL mask from the same seed
    with no stored mask tensor (the torch reference stores SDPA's dropout
    mask implicitly in its autograd state; tools/attention.py:71)."""
    rows = (jnp.uint32(iq) * jnp.uint32(bq)
            + jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 0))
    cols = (jnp.uint32(ik) * jnp.uint32(bk)
            + jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 1))
    base = _fmix32(seed ^ (jnp.uint32(b) * jnp.uint32(0x9E3779B1)))
    h = _fmix32(base
                ^ (rows * jnp.uint32(0x85EBCA6B))
                ^ (cols * jnp.uint32(0xC2B2AE35)))
    return h < jnp.uint32(keep_thresh)


def _dropout_consts(rate: float):
    keep = 1.0 - rate
    thresh = min(2 ** 32 - 1, int(round(keep * 2 ** 32)))
    return thresh, 1.0 / keep


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref, lse_ref,
                 m_scratch, l_scratch, acc_scratch, *, scale: float,
                 has_mask: bool, dropout_rate: float):
    ib = pl.program_id(0)
    iq = pl.program_id(1)
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
    # l accumulates the UNDROPPED sum: softmax normalizes first, dropout
    # applies to the normalized probabilities (torch SDPA placement), and
    # since the denominator is a rowwise scalar the two orders commute
    l_new = alpha * l_scratch[:] + jnp.sum(p, axis=-1, keepdims=True)
    p_v = p
    if dropout_rate > 0.0:
        thresh, inv_keep = _dropout_consts(dropout_rate)
        keep = _keep_mask(seed_ref[0], ib, iq, ik, p.shape[0], p.shape[1],
                          thresh)
        p_v = p * (keep.astype(jnp.float32) * inv_keep)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p_v.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        # logsumexp per query row — the backward recompute needs it
        lse_ref[0] = (m_scratch[:] + jnp.log(l_safe)).astype(lse_ref.dtype)


def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        mask_ref, seed_ref, dq_ref, dq_scratch, *,
                        scale: float, has_mask: bool, dropout_rate: float):
    ib = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if has_mask:
        s = jnp.where(mask_ref[0] > 0, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])                # (bq, bk); 0 at masked keys
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # (bq, bk)
    if dropout_rate > 0.0:
        # dP = inv_keep * M (.) (dO V^T); delta = rowsum(dO (.) O) already
        # equals rowsum(P_dropped (.) dO V^T), so the identity is unchanged
        thresh, inv_keep = _dropout_consts(dropout_rate)
        keep = _keep_mask(seed_ref[0], ib, iq, ik, p.shape[0], p.shape[1],
                          thresh)
        dp = dp * (keep.astype(jnp.float32) * inv_keep)
    ds = p * (dp - delta_ref[0]) * scale
    dq_scratch[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         mask_ref, seed_ref, dk_ref, dv_ref, dk_scratch,
                         dv_scratch, *, scale: float, has_mask: bool,
                         dropout_rate: float):
    ib = pl.program_id(0)
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (bq, bk)
    if has_mask:
        s = jnp.where(mask_ref[0] > 0, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])                # (bq, bk)
    p_v = p
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # (bq, bk)
    if dropout_rate > 0.0:
        # the grid here is (b, ik, iq): seed with the same (b, iq, ik)
        # ordering so all three kernels regenerate one mask
        thresh, inv_keep = _dropout_consts(dropout_rate)
        keep = _keep_mask(seed_ref[0], ib, iq, ik, p.shape[0], p.shape[1],
                          thresh)
        drop = keep.astype(jnp.float32) * inv_keep
        p_v = p * drop
        dp = dp * drop
    dv_scratch[:] += jax.lax.dot_general(
        p_v, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # (bk, d)
    ds = p * (dp - delta_ref[0]) * scale
    dk_scratch[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # (bk, d)

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _fwd_impl(q, k, v, mask, seed, block_q: int, block_k: int,
              interpret: bool, has_mask: bool, dropout_rate: float = 0.0):
    """Core forward on block-aligned shapes. q (BH, Lq, D); k/v (BH, Lk, D);
    mask (BH, 1, Lk) int32; seed (1,) uint32 (ignored when dropout_rate==0).
    Returns (out, lse (BH, Lq, 1))."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    grid = (bh, lq // block_q, lk // block_k)
    kernel = functools.partial(_attn_kernel, scale=scale, has_mask=has_mask,
                               dropout_rate=dropout_rate)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, iq, ik: (b, 0, ik)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
        ],
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
    )(q, k, v, mask, seed)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_attention_core(q, k, v, mask, seed, block_q, block_k, interpret,
                          has_mask, dropout_rate):
    out, _ = _fwd_impl(q, k, v, mask, seed, block_q, block_k, interpret,
                       has_mask, dropout_rate)
    return out


def _core_fwd(q, k, v, mask, seed, block_q, block_k, interpret, has_mask,
              dropout_rate):
    out, lse = _fwd_impl(q, k, v, mask, seed, block_q, block_k, interpret,
                         has_mask, dropout_rate)
    return out, (q, k, v, mask, seed, out, lse)


def _core_bwd(block_q, block_k, interpret, has_mask, dropout_rate, res, do):
    q, k, v, mask, seed, out, lse = res
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    # delta_i = sum_d dO_id * O_id (rowwise), standard recompute identity
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (BH, Lq, 1)

    common_in = [q, k, v, do, lse, delta, mask, seed]

    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, scale=scale,
                          has_mask=has_mask, dropout_rate=dropout_rate),
        grid=(bh, lq // block_q, lk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, iq, ik: (b, 0, ik)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*common_in)

    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, scale=scale,
                          has_mask=has_mask, dropout_rate=dropout_rate),
        grid=(bh, lk // block_k, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, ik, iq: (b, 0, ik)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*common_in)

    import numpy as _np
    dmask = _np.zeros(mask.shape, dtype=jax.dtypes.float0)
    dseed = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask, dseed


_fused_attention_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret", "dropout_rate"))
def _fused_attention_3d(q, k, v, mask, seed, block_q: int, block_k: int,
                        interpret: bool, dropout_rate: float = 0.0):
    """q (BH, Lq, D); k/v (BH, Lk, D); mask (BH, Lk) int32 or None;
    seed (1,) uint32 or None (required when dropout_rate > 0)."""
    bh, lq, d = q.shape
    lk = k.shape[1]

    q_p = _pad_to(q, 1, block_q)
    k_p = _pad_to(k, 1, block_k)
    v_p = _pad_to(v, 1, block_k)
    has_mask = mask is not None or k_p.shape[1] != lk
    if mask is None:
        mask = jnp.ones((bh, lk), jnp.int32)
    mask_p = _pad_to(mask.astype(jnp.int32), 1, block_k)[:, None, :]
    if seed is None:
        seed = jnp.zeros((1,), jnp.uint32)

    out = _fused_attention_core(q_p, k_p, v_p, mask_p, seed, block_q,
                                block_k, interpret, has_mask, dropout_rate)
    return out[:, :lq]


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    key_mask: Optional[jax.Array] = None,
                    block_q: int = 128, block_k: int = 128,
                    dropout_rate: float = 0.0,
                    dropout_seed: Optional[jax.Array] = None) -> jax.Array:
    """Fused attention over (B, H, Lq, D) / (B, H, Lk, D) head tensors.

    ``key_mask``: optional (B, Lk) boolean validity mask. Returns
    (B, H, Lq, D). Uses interpreter mode on non-TPU backends.

    ``dropout_rate`` > 0 applies train-time dropout to the attention
    PROBABILITIES (torch SDPA placement, tools/attention.py:71) inside the
    kernel: a counter-based hash of (dropout_seed, batch*head, q, k)
    regenerates the identical keep mask in the forward and both backward
    recompute kernels, so no mask tensor is ever materialized in HBM.
    ``dropout_seed`` is a (1,) uint32 traced array (vary it per step)."""
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
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    out = _fused_attention_3d(q3, k3, v3, mask3,
                              None if dropout_rate == 0.0 else
                              dropout_seed.reshape(1).astype(jnp.uint32),
                              block_q, block_k, interpret,
                              float(dropout_rate))
    return out.reshape(b, h, lq, d)


def fused_attention_lse(q: jax.Array, k: jax.Array, v: jax.Array,
                        key_mask: Optional[jax.Array] = None,
                        block_q: int = 128, block_k: int = 128):
    """Forward-only fused attention that ALSO returns the per-row
    logsumexp: (out (B, H, Lq, D), lse (B, H, Lq)).

    The lse is what lets partial attentions over disjoint key shards
    combine exactly (context parallelism, parallel/cp.py):
    ``o = sum_i exp(lse_i - LSE) * o_i`` with ``LSE = logsumexp_i lse_i``.
    Rows whose keys are ALL masked return o=0 and lse ~= -inf (weight 0
    in the combine)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, max(_next_pow2(lq), 8))
    block_k = min(block_k, max(_next_pow2(lk), 8))
    q3 = q.reshape(b * h, lq, d)
    k3 = k.reshape(b * h, lk, d)
    v3 = v.reshape(b * h, lk, d)
    q_p = _pad_to(q3, 1, block_q)
    k_p = _pad_to(k3, 1, block_k)
    v_p = _pad_to(v3, 1, block_k)
    has_mask = key_mask is not None or k_p.shape[1] != lk
    if key_mask is None:
        mask3 = jnp.ones((b * h, lk), jnp.int32)
    else:
        mask3 = jnp.repeat(key_mask.astype(jnp.int32), h, axis=0)
    mask_p = _pad_to(mask3, 1, block_k)[:, None, :]
    out, lse = _fwd_impl(q_p, k_p, v_p, mask_p, jnp.zeros((1,), jnp.uint32),
                         block_q, block_k, interpret, has_mask)
    return (out[:, :lq].reshape(b, h, lq, d),
            lse[:, :lq, 0].reshape(b, h, lq))


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
