"""Building-block layers for the selection model.

Numerics match the reference exactly (fp32, deterministic mode) while adding
mask-awareness everywhere, because the TPU build pads ragged axes (tracks,
frames, words) to static shapes and batches many (video, expression) pairs per
step — the reference runs batch_size=1 with ragged shapes
(configs/mevis/default.yaml:37-47).

* Weight standardization: module/ws.py:4-22 (Conv1d) and :24-38 (Linear) —
  per-output-channel mean-centering and division by the Bessel-corrected std
  (torch ``Tensor.std`` default) + 1e-5.
* GroupNorm: torch ``nn.GroupNorm`` semantics (biased variance, eps 1e-5,
  per-channel affine) computed over (C/G, L) per group — here with an optional
  length mask so padded positions are excluded from the statistics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def standardize_conv_kernel(kernel: jax.Array) -> jax.Array:
    """Weight-standardize a flax Conv kernel (ks, in, out).

    Equivalent to module/ws.py:8-13 on the torch (out, in, ks) layout: mean
    over (in, ks) per out-channel, then divide by Bessel-corrected std over
    the flattened (in*ks) fan-in + 1e-5.
    """
    ks, cin, cout = kernel.shape
    flat = kernel.reshape(ks * cin, cout)
    mean = flat.mean(axis=0, keepdims=True)
    centered = flat - mean
    n = ks * cin
    var = jnp.sum(centered * centered, axis=0, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var) + 1e-5
    return (centered / std).reshape(ks, cin, cout)


def standardize_dense_kernel(kernel: jax.Array) -> jax.Array:
    """Weight-standardize a flax Dense kernel (in, out); module/ws.py:28-33."""
    cin, cout = kernel.shape
    mean = kernel.mean(axis=0, keepdims=True)
    centered = kernel - mean
    var = jnp.sum(centered * centered, axis=0, keepdims=True) / max(cin - 1, 1)
    std = jnp.sqrt(var) + 1e-5
    return centered / std


class WSConv1d(nn.Module):
    """1-D convolution with on-the-fly weight standardization (ws.Conv1d).

    Operates on (B, L, C) inputs (feature-last — the natural TPU layout; the
    torch reference uses channel-first (B, C, L), module/module.py:137).
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            # torch Conv1d default init: kaiming_uniform(a=sqrt(5)) ==
            # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for this shape
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0, maxval=1.0)
            / jnp.sqrt(cin * self.kernel_size),
            (self.kernel_size, cin, self.features),
        )
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0, maxval=1.0)
            / jnp.sqrt(cin * self.kernel_size),
            (self.features,),
        )
        kernel = standardize_conv_kernel(kernel)
        # lax.conv requires matching dtypes (no promotion): bf16-transferred
        # tokens upcast to the param dtype here, on device
        y = jax.lax.conv_general_dilated(
            x.astype(kernel.dtype),
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NLC", "LIO", "NLC"),
        )
        return y + bias


class MaskedGroupNorm(nn.Module):
    """GroupNorm over (B, L, C) with an optional (B, L) validity mask.

    With a full mask this is exactly torch ``nn.GroupNorm(G, C)`` applied to
    the (B, C, L) permutation the reference uses (module/module.py:34,43,49
    and :76-92): per (sample, group) statistics over (C/G, L), biased
    variance, eps 1e-5, per-channel affine.
    """
    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        b, l, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(b, l, g, c // g)
        if mask is None:
            mean = xg.mean(axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
        else:
            m = mask.astype(x.dtype).reshape(b, l, 1, 1)
            count = jnp.maximum(m.sum(axis=1, keepdims=True) * (c // g), 1.0)
            mean = jnp.sum(xg * m, axis=(1, 3), keepdims=True) / count
            var = jnp.sum(jnp.square(xg - mean) * m, axis=(1, 3),
                          keepdims=True) / count
        y = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(b, l, c) * scale + bias
        if mask is not None:
            # keep padded positions finite/zeroed so downstream matmuls are clean
            y = y * mask.astype(x.dtype)[..., None]
        return y


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    """torch nn.LeakyReLU default slope (module/module.py:77)."""
    return jnp.where(x >= 0, x, x * negative_slope)


def prefix_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) valid lengths -> (B, max_len) boolean prefix mask."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (lengths.shape[0], max_len), 1)
    return iota < lengths[:, None]


def downsampled_length(lengths: jax.Array, stride: int, kernel: int,
                       padding: int) -> jax.Array:
    """Conv output length: floor((L + 2p - k) / s) + 1, element-wise."""
    return (lengths + 2 * padding - kernel) // stride + 1
