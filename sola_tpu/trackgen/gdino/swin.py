"""Swin Transformer backbone (GroundingDINO's image encoder), channels-last.

Swin-T spec: embed 96, depths (2, 2, 6, 2), heads (3, 6, 12, 24), window 7,
shifted windows with relative position bias, patch-merging downsampling.
Outputs stages 2-4 (strides 8, 16, 32) like GroundingDINO's backbone.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sola_tpu.trackgen.sam2.common import window_partition, window_unpartition


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_indices: tuple = (1, 2, 3)

    # GroundingDINO backbone family: default = Swin-T (swint_ogc ckpt);
    # Swin-B matches the groundingdino_swinb_cogcoor checkpoint
    @classmethod
    def base(cls) -> "SwinConfig":
        return cls(embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32), window_size=12)

    @classmethod
    def tiny_test(cls) -> "SwinConfig":
        return cls(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
                   window_size=4)

    @property
    def stage_dims(self):
        return [self.embed_dim * (2 ** i) for i in range(len(self.depths))]


def relative_position_index(window: int) -> np.ndarray:
    """(window^2, window^2) index into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"), axis=0).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask=None) -> jax.Array:
        """x: (nW, window*window, C)."""
        nw, l, c = x.shape
        h = self.num_heads
        hd = self.dim // h
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(nw, l, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, x.dtype))
        logits = jnp.einsum("whqd,whkd->whqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        bias_table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, h))
        idx = relative_position_index(self.window)
        bias = bias_table[idx.reshape(-1)].reshape(l, l, h)
        logits = logits + bias.transpose(2, 0, 1)[None]
        if attn_mask is not None:
            # attn_mask: (n_mask_groups, l, l); windows cycle through groups
            ng = attn_mask.shape[0]
            logits = logits.reshape(nw // ng, ng, h, l, l)
            logits = logits + attn_mask[None, :, None]
            logits = logits.reshape(nw, h, l, l)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("whqk,whkd->whqd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(nw, l, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


def shifted_window_mask(hp: int, wp: int, window: int,
                        shift: int) -> np.ndarray:
    """Attention mask groups for shifted windows ((nW, w^2, w^2) additive)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(hp // window, window, wp // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        # HF Swin rule: a resolution at or below the window size collapses to
        # one unshifted window (identical to upstream at real sizes, where
        # every level exceeds the window)
        window, shift = self.window, self.shift
        if min(h, w) <= window:
            window = min(h, w)
            shift = 0
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw, pad_hw = window_partition(x, window)
        nw, ws, _, _ = xw.shape
        xw = xw.reshape(nw, ws * ws, c)
        mask = None
        if shift > 0:
            mask = jnp.asarray(shifted_window_mask(pad_hw[0], pad_hw[1],
                                                   window, shift))
        xw = WindowAttention(self.dim, self.num_heads, window,
                             name="attn")(xw, mask)
        xw = xw.reshape(nw, ws, ws, c)
        x = window_unpartition(xw, window, pad_hw, (h, w))
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_0")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_1")(y)
        return x + y


class PatchMerging(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.dim_out, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> list[jax.Array]:
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    name="patch_embed")(images)
        x = nn.LayerNorm(name="patch_norm")(x)
        outs = []
        for stage, depth in enumerate(cfg.depths):
            dim = cfg.stage_dims[stage]
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(dim, cfg.num_heads[stage], cfg.window_size,
                              shift, cfg.mlp_ratio,
                              name=f"stage_{stage}_block_{blk}")(x)
            if stage in cfg.out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm_{stage}")(x))
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(cfg.stage_dims[stage + 1],
                                 name=f"merge_{stage}")(x)
        return outs
