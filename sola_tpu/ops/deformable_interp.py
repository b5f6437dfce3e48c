"""Pallas TPU kernel: multi-scale deformable sampling as tile-sparse
interpolation matmuls.

GroundingDINO's deformable attention gathers 4 bilinear corners x 4
points x 4 levels per (query, head) — upstream a CUDA gather kernel
(MultiScaleDeformableAttention, exercised via prompt_generator.py:132).
TPUs have no hardware gather: the XLA ``take_along_axis`` form
(gdino/deformable.py) runs the 6-layer encoder at ~0.78 s/image, ~95% of
the whole GDINO forward.

TPU-native reformulation: sampling IS a sparse matmul. For one level,
``out[q] = S @ V`` where ``S[q, hw] = sum_{point, corner} attn_w *
corner_w * [hw == corner_index]`` folds the bilinear corners AND the
sampling points of that level into one interpolation matrix row with at
most 16 nonzeros. Dense S would be huge, but it never leaves VMEM: the
kernel builds one (Q_BLK, HW_BLK) tile at a time from the corner
indices/weights (VPU compares against an iota) and feeds it straight to
the MXU against the value tile.

Tile sparsity: encoder queries are the raster-ordered feature map and
reference points are the query's own position, so corner indices cluster
near the diagonal of S — most (q, hw) tiles contain no corner at all.
Each tile first runs a cheap any-hit test over the block's index range
and skips the build+matmul entirely when empty (``@pl.when``), which
keeps the VPU work proportional to the populated band while remaining
correct for arbitrary learned offsets (worst case degrades to the dense
sweep, never to a wrong answer).

Forward-only by design: the GDINO path is a frozen prompt generator
(SURVEY §2.2); nothing differentiates through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interp_kernel(idx_ref, wgt_ref, v_ref, o_ref, *scratch,
                   n_heads: int, head_dim: int, hw_blk: int, k_terms: int,
                   guards: bool):
    """One (b, q_block, hw_block) tile.

    idx_ref: (1, Q_BLK, n_heads * k_terms) int32 flat corner indices
             (clipped); k_terms = n_points x 4 bilinear corners
    wgt_ref: (1, Q_BLK, n_heads * k_terms) f32 combined weights (attn x
             corner, zeroed for out-of-range corners)
    v_ref:   (1, HW_BLK, n_heads * head_dim) values
    o_ref:   (1, Q_BLK, n_heads * head_dim) f32 accumulator
    s_scratch: (Q_BLK, HW_BLK) f32 — the head's interpolation-matrix tile

    Three skip levels keep the VPU sweep volume proportional to the
    populated band: whole-tile (no corner at all), per-head (this head's
    16 terms all miss — cross-level query blocks routinely straddle
    tiles where only some heads land), and per-term (a single point's
    corners miss while its siblings hit). Each test is a (Q_BLK, K)- or
    (Q_BLK, 1)-sized reduction, ~HW_BLK x cheaper than the sweep it
    guards."""
    hwi = pl.program_id(2)

    @pl.when(hwi == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    lo = hwi * hw_blk
    idx = idx_ref[0] - lo  # (Q_BLK, n_heads*K), block-relative
    in_blk = (idx >= 0) & (idx < hw_blk)

    s_scratch = scratch[0] if guards else None

    @pl.when(jnp.any(in_blk))
    def _tile():
        q_blk = idx.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (q_blk, hw_blk), 1)
        wgt = wgt_ref[0]
        for h in range(n_heads):
            h_cols = slice(h * k_terms, (h + 1) * k_terms)
            if not guards:
                # dense sweep: build S in registers, no predication — on a
                # densely populated band the 8x16 per-head/per-term guard
                # reductions cost more than the sweeps they skip
                s = jnp.zeros((q_blk, hw_blk), jnp.float32)
                for k in range(k_terms):
                    col = h * k_terms + k
                    s += jnp.where(iota == idx[:, col][:, None],
                                   wgt[:, col][:, None], 0.0)
                v_h = v_ref[0, :, h * head_dim:(h + 1) * head_dim]
                o_ref[0, :, h * head_dim:(h + 1) * head_dim] += jnp.dot(
                    s.astype(v_h.dtype), v_h,
                    preferred_element_type=jnp.float32)
                continue

            @pl.when(jnp.any(in_blk[:, h_cols]))
            def _head(h=h):
                s_scratch[...] = jnp.zeros_like(s_scratch)
                for k in range(k_terms):
                    col = h * k_terms + k

                    @pl.when(jnp.any(in_blk[:, col:col + 1]))
                    def _term(col=col):
                        s_scratch[...] += jnp.where(
                            iota == idx[:, col][:, None],
                            wgt[:, col][:, None], 0.0)
                v_h = v_ref[0, :, h * head_dim:(h + 1) * head_dim]
                o_ref[0, :, h * head_dim:(h + 1) * head_dim] += jnp.dot(
                    s_scratch[...].astype(v_h.dtype), v_h,
                    preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_heads", "q_blk",
                                             "hw_blk", "interpret",
                                             "guards"))
def interp_matmul_level(idx: jax.Array, wgt: jax.Array, value: jax.Array,
                        n_heads: int, q_blk: int = 256, hw_blk: int = 512,
                        interpret: bool = False,
                        guards: bool = False) -> jax.Array:
    """One level's deformable sampling: (B, Q, H*K) indices/weights +
    (B, HW, H*D) values -> (B, Q, H*D) f32.

    Q must be a multiple of ``q_blk`` and HW of ``hw_blk`` (callers pad;
    padded queries carry zero weights)."""
    b, q, hk = idx.shape
    hw = value.shape[1]
    head_dim = value.shape[2] // n_heads
    k_terms = hk // n_heads
    assert q % q_blk == 0 and hw % hw_blk == 0, (q, q_blk, hw, hw_blk)
    grid = (b, q // q_blk, hw // hw_blk)
    kernel = functools.partial(_interp_kernel, n_heads=n_heads,
                               head_dim=head_dim, hw_blk=hw_blk,
                               k_terms=k_terms, guards=guards)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_blk, hk), lambda bi, qi, hi: (bi, qi, 0)),
            pl.BlockSpec((1, q_blk, hk), lambda bi, qi, hi: (bi, qi, 0)),
            pl.BlockSpec((1, hw_blk, value.shape[2]),
                         lambda bi, qi, hi: (bi, hi, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_blk, value.shape[2]),
                               lambda bi, qi, hi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, q, value.shape[2]),
                                       jnp.float32),
        # the S tile lives in VMEM scratch only in guard mode; the dense
        # sweep builds it in registers and skips the allocation
        scratch_shapes=([pltpu.VMEM((q_blk, hw_blk), jnp.float32)]
                        if guards else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(idx, wgt, value)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def corner_terms(loc_xy: jax.Array, attn_w: jax.Array, h: int, w: int):
    """Bilinear corners of one level -> (idx, wgt) with K=16 terms per
    (query, head): flat clipped indices and combined weights
    (attention x bilinear, zeroed out-of-range) — torch grid_sample
    align_corners=False convention, matching deformable.bilinear_sample.

    loc_xy: (B, Q, H, P, 2) normalized; attn_w: (B, Q, H, P).
    Returns idx (B, Q, H, P*4) int32, wgt same shape f32.
    """
    loc_xy = loc_xy.astype(jnp.float32)  # bf16 coords quantize subpixel
    attn_w = attn_w.astype(jnp.float32)
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    idxs, wgts = [], []
    for yi, xi, cw in ((y0, x0, wy0 * wx0), (y0, x0 + 1, wy0 * wx1),
                       (y0 + 1, x0, wy1 * wx0), (y0 + 1, x0 + 1, wy1 * wx1)):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idxs.append(yi_c * w + xi_c)
        wgts.append(jnp.where(inb, cw * attn_w, 0.0))
    idx = jnp.stack(idxs, axis=-1)   # (B, Q, H, P, 4)
    wgt = jnp.stack(wgts, axis=-1)
    b, q, heads, p, _ = idx.shape
    return (idx.reshape(b, q, heads, p * 4),
            wgt.reshape(b, q, heads, p * 4).astype(jnp.float32))


def ms_deform_attn_core_pallas(value_levels, sampling_locations,
                               attention_weights,
                               interpret: bool | None = None) -> jax.Array:
    """Drop-in replacement for deformable.ms_deform_attn_core on TPU.

    value_levels: per-level (B, H_l, W_l, n_heads * head_dim)
    sampling_locations: (B, Lq, n_heads, n_levels, n_points, 2) in [0, 1]
    attention_weights:  (B, Lq, n_heads, n_levels, n_points)
    Returns (B, Lq, n_heads * head_dim) in the values' dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    import os
    b, lq, n_heads, n_levels, n_points, _ = sampling_locations.shape
    c = value_levels[0].shape[-1]
    head_dim = c // n_heads
    # block sizes are trace-time constants (like SOLA_DEFORMABLE_CORE —
    # set them before the enclosing forward first compiles); smaller tiles
    # track the sampling band tighter at the cost of more grid steps
    q_blk_env = int(os.environ.get("SOLA_DEFORM_QBLK", "0"))
    hw_blk_env = int(os.environ.get("SOLA_DEFORM_HWBLK", "0"))
    # per-head/per-term guard predication (off by default: on the encoder's
    # densely populated diagonal band the 8x16 guard reductions measured
    # SLOWER than the dense sweeps they skip — gdino bench 0.15 -> 0.27
    # s/expr; the whole-tile any-hit skip above stays either way)
    guards = os.environ.get("SOLA_DEFORM_GUARDS", "0") == "1"
    q_blk = q_blk_env or (256 if lq >= 256 else 128)
    q_pad = _round_up(lq, q_blk)

    out = jnp.zeros((b, q_pad, c), jnp.float32)
    for lvl, value in enumerate(value_levels):
        h, w = value.shape[1], value.shape[2]
        hw = h * w
        hw_blk = min(hw_blk_env or 512, hw)
        idx, wgt = corner_terms(sampling_locations[:, :, :, lvl],
                                attention_weights[:, :, :, lvl], h, w)
        if q_pad != lq:
            pad = [(0, 0), (0, q_pad - lq), (0, 0), (0, 0)]
            idx = jnp.pad(idx, pad)
            wgt = jnp.pad(wgt, pad)  # zero weights: padded rows emit 0
        idx = idx.reshape(b, q_pad, n_heads * n_points * 4)
        wgt = wgt.reshape(b, q_pad, n_heads * n_points * 4)
        v_flat = value.reshape(b, hw, c)
        hw_pad = _round_up(hw, hw_blk)
        if hw_pad != hw:
            v_flat = jnp.pad(v_flat, [(0, 0), (0, hw_pad - hw), (0, 0)])
        out = out + interp_matmul_level(idx, wgt, v_flat, n_heads=n_heads,
                                        q_blk=q_blk, hw_blk=hw_blk,
                                        interpret=interpret, guards=guards)
    return out[:, :lq].astype(value_levels[0].dtype)
