"""Hiera ViT image-encoder trunk (SAM2's backbone), channels-last JAX.

Architecture: hierarchical windowed attention with q-pooling between stages
and a few global-attention blocks; dims double and spatial halves at each
stage transition. SAM2-L ("hiera_l") spec: embed_dim 144, heads 2, stages
(2, 6, 36, 4), global attention at blocks (23, 33, 43), window sizes
(8, 4, 16, 8). The reference drives this through SAM2's image/video
predictors (SURVEY.md §2.2); TPU-first notes: all attention is batched dense
matmul on (windows*B, tokens, C) — MXU-shaped — and pooling is a reshape-max,
not a strided gather.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from sola_tpu.trackgen.sam2.common import (sdpa, torch_bicubic_resize,
                                           window_partition,
                                           window_unpartition)


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144
    num_heads: int = 2
    stages: tuple = (2, 6, 36, 4)
    global_att_blocks: tuple = (23, 33, 43)
    window_spec: tuple = (8, 4, 16, 8)
    window_pos_embed_bkg_spatial_size: tuple = (7, 7)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    mlp_ratio: float = 4.0
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3

    @classmethod
    def large(cls) -> "HieraConfig":
        return cls()

    # upstream SAM2 model family (sam2_hiera_{t,s,b+}.yaml backbone blocks)
    @classmethod
    def tiny(cls) -> "HieraConfig":
        return cls(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                   global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7))

    @classmethod
    def small(cls) -> "HieraConfig":
        return cls(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                   global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7))

    @classmethod
    def base_plus(cls) -> "HieraConfig":
        return cls(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                   global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7),
                   window_pos_embed_bkg_spatial_size=(14, 14))

    @classmethod
    def tiny_test(cls) -> "HieraConfig":
        """Small config for unit tests (4 stages, 1 block each)."""
        return cls(embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
                   global_att_blocks=(2,), window_spec=(4, 2, 4, 2),
                   window_pos_embed_bkg_spatial_size=(2, 2))

    @property
    def stage_ends(self):
        ends = []
        total = 0
        for s in self.stages:
            total += s
            ends.append(total - 1)
        return ends

    @property
    def q_pool_blocks(self):
        # pooling happens at the first block of stages 2..4
        return [end + 1 for end in self.stage_ends[:-1]]

    @property
    def output_dims(self):
        d = self.embed_dim
        dims = []
        for i in range(len(self.stages)):
            dims.append(int(d))
            d *= self.dim_mul
        return dims


def _maxpool2x2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 max pooling on (B, H, W, C) via reshape (H, W even)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4))


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_pool: bool = False
    # route long token sequences (the global-attention blocks: 4096 tokens
    # at 1024px) through the Pallas flash kernel — dense sdpa materializes
    # a (B, heads, L, L) score matrix (~0.5 GB/frame/block at hiera-L),
    # pure HBM traffic the fused kernel never writes. Windowed blocks
    # (<=256 tokens) stay dense: their score tiles live in registers/VMEM
    # anyway and the kernel's grid overhead would dominate.
    fused_min_tokens: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        qkv = nn.Dense(3 * self.dim_out, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = q.reshape(b, h, w, self.num_heads * head_dim)
            q = _maxpool2x2(q)
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, self.num_heads, head_dim)
        qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        if kh.shape[2] >= self.fused_min_tokens and head_dim % 8 == 0:
            from sola_tpu.ops.flash_attention import fused_attention
            out = fused_attention(qh, kh, vh, block_q=512, block_k=512)
        else:
            out = sdpa(qh, kh, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(out)


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_pool: bool = False
    window_size: int = 0  # 0 = global attention

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, name="proj")(x)
            if self.q_pool:
                shortcut = _maxpool2x2(shortcut)
        h, w = x.shape[1], x.shape[2]
        window = self.window_size
        pad_hw = (h, w)
        if window > 0:
            x, pad_hw = window_partition(x, window)
        x = MultiScaleAttention(self.dim_out, self.num_heads,
                                q_pool=self.q_pool, name="attn")(x)
        if self.q_pool:
            window = window // 2 if window > 0 else 0
            pad_hw = (pad_hw[0] // 2, pad_hw[1] // 2)
            h, w = h // 2, w // 2
        if window > 0:
            x = window_unpartition(x, window, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), name="mlp_0")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, name="mlp_1")(y)
        return x + y


def hiera_segments(cfg: HieraConfig) -> list[tuple]:
    """Partition blocks into compile units: ("single", i, spec) for q-pool /
    global blocks, ("run", start, n, spec) for runs of >=2 identical
    windowed blocks (scanned over stacked params — shrinks the XLA graph of
    the 48-block Hiera-L ~5x, which is the difference between minutes and
    an hour of compile through a slow compiler path).

    spec = (dim, dim_out, heads, window, q_pool).
    """
    stage_ends = cfg.stage_ends
    q_pool_blocks = set(cfg.q_pool_blocks)
    total = sum(cfg.stages)
    specs = []
    dim = cfg.embed_dim
    heads = cfg.num_heads
    stage = 0
    for i in range(total):
        q_pool = i in q_pool_blocks
        dim_out = dim
        if q_pool:
            dim_out = int(dim * cfg.dim_mul)
            heads = int(heads * cfg.head_mul)
            stage += 1
        # the first block of a stage (q_pool) keeps the PREVIOUS stage's
        # window size (upstream hiera.py "lags by a block"; the block then
        # unpartitions at window//2 after pooling)
        window = cfg.window_spec[stage - 1 if q_pool else stage]
        if i in cfg.global_att_blocks:
            window = 0
        specs.append((dim, dim_out, heads, window, q_pool))
        dim = dim_out
    segments: list[tuple] = []
    i = 0
    while i < total:
        spec = specs[i]
        if spec[4] or spec[3] == 0:  # q_pool or global: always single
            segments.append(("single", i, spec))
            i += 1
            continue
        j = i
        while j + 1 < total and specs[j + 1] == spec:
            j += 1
        if j > i:
            segments.append(("run", i, j - i + 1, spec))
        else:
            segments.append(("single", i, spec))
        i = j + 1
    return segments


class BlockRunBody(nn.Module):
    """One block of a scanned run (carry-through signature for nn.scan)."""
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int

    @nn.compact
    def __call__(self, carry, _):
        out = MultiScaleBlock(
            dim=self.dim, dim_out=self.dim, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, q_pool=False,
            window_size=self.window_size, name="block")(carry)
        return out, None


class Hiera(nn.Module):
    cfg: HieraConfig
    scan_runs: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: (B, H, W, 3) -> list of 4 stage-end feature maps, strides
        4/8/16/32, dims embed_dim * 2^stage."""
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch_kernel, cfg.patch_kernel),
                    strides=(cfg.patch_stride, cfg.patch_stride),
                    padding=[(cfg.patch_padding, cfg.patch_padding)] * 2,
                    name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]
        # learned background PE (interpolated) + tiled window PE
        bkg = self.param("pos_embed", nn.initializers.normal(0.02),
                         (*cfg.window_pos_embed_bkg_spatial_size,
                          cfg.embed_dim))
        win = self.param("pos_embed_window", nn.initializers.normal(0.02),
                         (cfg.window_spec[0], cfg.window_spec[0],
                          cfg.embed_dim))
        # upstream: F.interpolate(pos_embed, (h, w), mode="bicubic") — torch
        # bicubic (A=-0.75), which jax.image.resize "cubic" (A=-0.5) is NOT
        pos = torch_bicubic_resize(bkg, h, w)
        tiles_h = h // cfg.window_spec[0]
        tiles_w = w // cfg.window_spec[0]
        pos = pos + jnp.tile(win, (tiles_h, tiles_w, 1))
        x = x + pos[None]

        stage_end_set = set(cfg.stage_ends)
        outputs: list = [None] * len(cfg.stages)
        segments = hiera_segments(cfg)

        def capture(i, x):
            if i in stage_end_set:
                outputs[cfg.stage_ends.index(i)] = x

        for seg in segments:
            if seg[0] == "single" or not self.scan_runs:
                blocks = ([seg[1]] if seg[0] == "single"
                          else range(seg[1], seg[1] + seg[2]))
                spec = seg[2] if seg[0] == "single" else seg[3]
                dim, dim_out, heads, window, q_pool = spec
                for i in blocks:
                    x = MultiScaleBlock(
                        dim=dim, dim_out=dim_out, num_heads=heads,
                        mlp_ratio=cfg.mlp_ratio, q_pool=q_pool,
                        window_size=window, name=f"block_{i}")(x)
                    capture(i, x)
            else:
                _, start, n, spec = seg
                dim, _, heads, window, _ = spec
                # a run never crosses a stage end except possibly at its
                # last block, so capturing after the scan is sufficient
                assert all(start + k not in stage_end_set
                           for k in range(n - 1)), "stage end inside run"
                Run = nn.scan(
                    BlockRunBody,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=n, in_axes=nn.broadcast)
                x, _ = Run(dim=dim, num_heads=heads,
                           mlp_ratio=cfg.mlp_ratio, window_size=window,
                           name=f"run_{start}")(x, None)
                capture(start + n - 1, x)
        return outputs
