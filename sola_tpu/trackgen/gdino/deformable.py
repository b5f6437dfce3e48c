"""Multi-scale deformable attention, XLA-native.

Replaces GroundingDINO's MultiScaleDeformableAttention C++/CUDA extension
(the native op the reference exercises through prompt_generator.py:132;
SURVEY.md §2.4 item 2). The irregular gather + bilinear interpolation is
expressed as four vectorized ``take`` gathers per level — XLA lowers these
to efficient TPU dynamic-gathers — with the weighted reduction fused into
the surrounding einsums.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Below this query count the tile-sparse Pallas core's per-tile overhead
# beats nothing worth beating: the decoder's 900-query cross-attention is
# <5% of the forward (scripts/profile_gdino.py), while the 21760-query
# encoder self-attention is ~95% — only the latter routes to the kernel.
_PALLAS_MIN_QUERIES = 4096


def bilinear_sample(value: jax.Array, loc_xy: jax.Array) -> jax.Array:
    """Sample (B, H, W, C) maps at (B, N, 2) normalized [0, 1] xy locations.

    align_corners=False convention (matching torch grid_sample with the
    upstream op's ``loc * size - 0.5`` pixel mapping); out-of-range samples
    contribute zero (zero padding).
    """
    b, h, w, c = value.shape
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = yi_c * w + xi_c  # (B, N)
        flat_val = value.reshape(b, h * w, c)
        out = jnp.take_along_axis(flat_val, flat_idx[..., None], axis=1)
        return out * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
            + v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])


def ms_deform_attn_core(value_levels: Sequence[jax.Array],
                        sampling_locations: jax.Array,
                        attention_weights: jax.Array) -> jax.Array:
    """Core deformable sampling.

    value_levels: per-level (B, H_l, W_l, n_heads * head_dim)
    sampling_locations: (B, Lq, n_heads, n_levels, n_points, 2) in [0, 1]
    attention_weights:  (B, Lq, n_heads, n_levels, n_points), softmaxed
    Returns (B, Lq, n_heads * head_dim).
    """
    b, lq, n_heads, n_levels, n_points, _ = sampling_locations.shape
    c = value_levels[0].shape[-1]
    head_dim = c // n_heads
    out = jnp.zeros((b, lq, n_heads, head_dim),
                    value_levels[0].dtype)
    for lvl, value in enumerate(value_levels):
        h, w = value.shape[1], value.shape[2]
        # fold heads into batch so each head samples its own channels
        v = value.reshape(b, h, w, n_heads, head_dim)
        v = v.transpose(0, 3, 1, 2, 4).reshape(b * n_heads, h, w, head_dim)
        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, H, P, 2)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(
            b * n_heads, lq * n_points, 2)
        sampled = bilinear_sample(v, loc)  # (B*H, Lq*P, hd)
        sampled = sampled.reshape(b, n_heads, lq, n_points, head_dim)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        out = out + jnp.einsum("bhqp,bhqpd->bqhd", wgt, sampled,
                               preferred_element_type=jnp.float32
                               ).astype(out.dtype)
    return out.reshape(b, lq, n_heads * head_dim)


def ms_deform_attn_core_auto(value_levels: Sequence[jax.Array],
                             sampling_locations: jax.Array,
                             attention_weights: jax.Array) -> jax.Array:
    """Backend-dispatched core: the tile-sparse Pallas interpolation-matmul
    kernel (ops/deformable_interp.py; 2.7x the gather core at production
    encoder shapes on v5e) on TPU for large query counts, the XLA gather
    form elsewhere. ``SOLA_DEFORMABLE_CORE=pallas|gather`` forces a path
    (tests use ``pallas`` with interpret mode on CPU).

    NOTE: the env var and backend are resolved at TRACE time — once an
    enclosing forward is jitted, later changes to SOLA_DEFORMABLE_CORE
    have no effect on the already-compiled program. Set the override
    before the first compilation (bench/CLIs read it at process start);
    bf16-mode kernel drift vs the gather core is bounded by
    tests/test_deformable_interp.py::test_pallas_core_bf16_values_bounded_drift."""
    mode = os.environ.get("SOLA_DEFORMABLE_CORE", "auto")
    lq = sampling_locations.shape[1]
    use_pallas = mode == "pallas" or (
        mode == "auto" and jax.default_backend() == "tpu"
        and lq >= _PALLAS_MIN_QUERIES)
    if use_pallas:
        from sola_tpu.ops.deformable_interp import ms_deform_attn_core_pallas
        return ms_deform_attn_core_pallas(
            list(value_levels), sampling_locations, attention_weights)
    return ms_deform_attn_core(value_levels, sampling_locations,
                               attention_weights)


class MSDeformAttn(nn.Module):
    """Deformable attention module (offsets + weights + projections).

    Accepts flattened values + static spatial shapes (upstream layout) or a
    per-level list.
    """
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, query: jax.Array, reference_points: jax.Array,
                 value, spatial_shapes: Sequence[tuple] | None = None,
                 value_mask: jax.Array | None = None) -> jax.Array:
        """query (B, Lq, d); reference_points (B, Lq, n_levels, 2|4)
        normalized; value: flattened (B, sumHW, d) with ``spatial_shapes``
        [(H_l, W_l)] or a per-level list of (B, H_l, W_l, d); value_mask
        (B, sumHW) bool True = valid (padded values are zeroed after
        projection, as upstream masked_fill)."""
        d = self.d_model
        nh, nl, np_ = self.n_heads, self.n_levels, self.n_points
        b, lq, _ = query.shape

        if spatial_shapes is None:
            spatial_shapes = [(v.shape[1], v.shape[2]) for v in value]
            value = jnp.concatenate(
                [v.reshape(b, -1, v.shape[-1]) for v in value], axis=1)
        projected = nn.Dense(d, name="value_proj")(value)
        if value_mask is not None:
            projected = jnp.where(value_mask[..., None], projected, 0.0)
        values = []
        start = 0
        for (h, w) in spatial_shapes:
            values.append(projected[:, start:start + h * w].reshape(
                b, h, w, d))
            start += h * w

        offsets = nn.Dense(nh * nl * np_ * 2, name="sampling_offsets",
                           kernel_init=nn.initializers.zeros)(query)
        offsets = offsets.reshape(b, lq, nh, nl, np_, 2)
        weights = nn.Dense(nh * nl * np_, name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(b, lq, nh, nl * np_), axis=-1).reshape(
                b, lq, nh, nl, np_)

        shapes = jnp.asarray([[w, h] for (h, w) in spatial_shapes],
                             jnp.float32)  # (levels, [W, H])
        if reference_points.shape[-1] == 2:
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / shapes[None, None, None, :, None, :])
        else:
            center = reference_points[..., :2]
            wh = reference_points[..., 2:]
            loc = (center[:, :, None, :, None, :]
                   + offsets / np_ * wh[:, :, None, :, None, :] * 0.5)
        out = ms_deform_attn_core_auto(values, loc, weights)
        return nn.Dense(d, name="output_proj")(out)
