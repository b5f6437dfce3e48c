"""Shared building blocks for the SAM2-in-JAX port.

All modules operate channels-last (B, H, W, C) — XLA/TPU's native conv
layout — instead of torch's NCHW. Parity citations refer to the upstream SAM2
modules the reference drives through ``build_sam2_video_predictor``
(generate_tokens_grid.py:15,91; SURVEY.md §2.2).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MLP(nn.Module):
    """N-layer MLP with ReLU (SAM's MLP block); optional sigmoid output."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layer_{i}")(x))
        x = nn.Dense(self.output_dim, name=f"layer_{self.num_layers - 1}")(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over the last axis of (B, H, W, C) maps.

    Equivalent to SAM's LayerNorm2d on NCHW (normalizes the channel axis
    only, with affine), just in channels-last layout.
    """
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = x.mean(axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


def window_partition(x: jax.Array, window: int):
    """(B, H, W, C) -> (B*nW, window, window, C), padding H/W up to multiples."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jax.Array, window: int, pad_hw, hw):
    """Inverse of window_partition, cropping any padding."""
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    c = x.shape[-1]
    x = x.reshape(b, hp // window, wp // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, :h, :w]


def sine_position_encoding(h: int, w: int, dim: int,
                           temperature: float = 10000.0,
                           normalize: bool = True,
                           scale: Optional[float] = None) -> jax.Array:
    """DETR-style 2D sine position embedding -> (H, W, dim).

    Matches SAM2's PositionEmbeddingSine used by the FPN neck and memory
    paths (dim split evenly between y and x; sin/cos interleaved).
    """
    if scale is None:
        scale = 2.0 * math.pi
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    num_pos_feats = dim // 2
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, w, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class RandomPositionEncoding(nn.Module):
    """SAM's PositionEmbeddingRandom: random-Fourier features of (x, y) in
    [0, 1], producing ``dim`` channels. Used for point prompts and the dense
    prompt-grid PE."""
    dim: int
    scale: float = 1.0

    def setup(self):
        self.gaussian = self.variable(
            "buffers", "positional_encoding_gaussian_matrix",
            lambda: self.scale * jax.random.normal(
                jax.random.PRNGKey(0), (2, self.dim // 2), jnp.float32))

    def encode(self, coords: jax.Array) -> jax.Array:
        """coords in [0, 1], shape (..., 2) -> (..., dim)."""
        proj = (2.0 * coords - 1.0) @ self.gaussian.value
        proj = 2.0 * np.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def grid(self, h: int, w: int) -> jax.Array:
        """Dense PE over a (h, w) grid of pixel centers -> (h, w, dim)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self.encode(coords)

    def __call__(self, coords: jax.Array) -> jax.Array:
        return self.encode(coords)


def _torch_bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """1-D interpolation matrix (n_out, n_in) matching torch
    ``F.interpolate(mode="bicubic", align_corners=False)`` exactly:
    cubic-convolution kernel with A=-0.75 (jax.image.resize's "cubic" uses
    A=-0.5, a different spline), half-pixel sampling, clamped borders."""
    a = -0.75

    def cc1(t):  # |s| <= 1
        return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0

    def cc2(t):  # 1 < |s| < 2
        return ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a

    m = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        w = [cc2(t + 1.0), cc1(t), cc1(1.0 - t), cc2(2.0 - t)]
        for k in range(4):
            j = min(max(i0 - 1 + k, 0), n_in - 1)
            m[i, j] += w[k]
    return m.astype(np.float32)


def torch_bicubic_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(H, W, C) -> (out_h, out_w, C), bit-matching torch bicubic
    (align_corners=False). Static-shape: the two 1-D interpolation matrices
    are compile-time constants, so the whole resize is two small matmuls."""
    mh = jnp.asarray(_torch_bicubic_matrix(x.shape[0], out_h))
    mw = jnp.asarray(_torch_bicubic_matrix(x.shape[1], out_w))
    return jnp.einsum("Hh,Ww,hwc->HWc", mh, mw, x)


def interpolate_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (..., H, W, C) maps (align_corners=False)."""
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, shape, method="linear")


def interpolate_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, shape, method="nearest")


def conv2d(features: int, kernel: int, stride: int = 1, padding: int = 0,
           name: Optional[str] = None, use_bias: bool = True) -> nn.Conv:
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   use_bias=use_bias, name=name)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         bias: Optional[jax.Array] = None) -> jax.Array:
    """Scaled dot-product attention over (B, H, L, D) head tensors."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
