"""SAM2 memory subsystem: memory encoder + RoPE memory attention.

The memory encoder fuses the current frame's stride-16 features with a
16x-downsampled sigmoid mask into compact 64-d memory features; memory
attention cross-attends the current frame's tokens to the spatial memories of
conditioning + recent frames plus object-pointer tokens (2D axial RoPE on the
spatial tokens only). This is the per-frame hot loop of track generation
(SURVEY.md §3.4, "THE hot loop").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sola_tpu.trackgen.sam2.common import LayerNorm2d, conv2d


# ---------------------------------------------------------------------------
# 2D axial rotary position embedding
# ---------------------------------------------------------------------------

def axial_rope_freqs(head_dim: int, end_x: int, end_y: int,
                     theta: float = 10000.0):
    """cos/sin tables for 2D axial RoPE over an (end_x, end_y) grid.

    Half the head dim rotates with the x coordinate, half with y; pair
    layout matches complex multiplication on adjacent feature pairs.
    Returns (cos, sin) of shape (end_x*end_y, head_dim//2).
    """
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(0, quarter, dtype=jnp.float32) * 2
                             / (head_dim // 2)))
    idx = jnp.arange(end_x * end_y, dtype=jnp.float32)
    tx = idx % end_x
    ty = idx // end_x
    fx = tx[:, None] * freqs[None, :]
    fy = ty[:, None] * freqs[None, :]
    ang = jnp.concatenate([fx, fy], axis=-1)  # (L, head_dim//2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               repeat_to: Optional[int] = None) -> jax.Array:
    """Rotate (B, H, L, D) by the (L0, D//2) tables; if ``repeat_to`` is
    given the tables tile along L (rope_k_repeat for multi-frame memories).
    Tables are cast to the activation dtype (keeps bf16 paths bf16)."""
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    l = x.shape[-2]
    if cos.shape[0] != l:
        reps = l // cos.shape[0]
        cos = jnp.tile(cos, (reps, 1))
        sin = jnp.tile(sin, (reps, 1))
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


class RoPEAttention(nn.Module):
    """Attention with 2D axial RoPE on q and the spatial prefix of k.

    Large shapes (SAM2's memory cross-attention: 4096 queries x ~29k keys)
    route through the fused Pallas kernel so the score matrix never hits
    HBM; small shapes use a dense einsum (lower launch overhead).
    """
    embed_dim: int
    num_heads: int
    kv_in_dim: Optional[int] = None
    feat_size: int = 64
    rope_theta: float = 10000.0
    fused_min_keys: int = 4096

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0,
                 key_mask: Optional[jax.Array] = None):
        d = self.embed_dim
        h = self.num_heads
        hd = d // h
        qp = nn.Dense(d, name="q_proj")(q)
        kp = nn.Dense(d, name="k_proj")(k)
        vp = nn.Dense(d, name="v_proj")(v)
        b, lq, _ = qp.shape
        lk = kp.shape[1]
        qh = qp.reshape(b, lq, h, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)

        cos, sin = axial_rope_freqs(hd, self.feat_size, self.feat_size,
                                    self.rope_theta)
        qh = apply_rope(qh, cos[:lq], sin[:lq])
        n_rope = lk - num_k_exclude_rope
        k_rope = apply_rope(kh[:, :, :n_rope], cos, sin)
        kh = jnp.concatenate([k_rope, kh[:, :, n_rope:]], axis=2) \
            if num_k_exclude_rope > 0 else k_rope

        if lk >= self.fused_min_keys and hd % 8 == 0:
            from sola_tpu.ops.flash_attention import fused_attention
            # large blocks amortize per-step overhead over the ~29k-key
            # memory axis (still well under the VMEM budget at hd<=256)
            out = fused_attention(qh, kh, vh, key_mask=key_mask,
                                  block_q=512, block_k=1024)
        else:
            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, qh.dtype))
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            if key_mask is not None:
                logits = jnp.where(key_mask[:, None, None, :], logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1).astype(qh.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                             preferred_element_type=jnp.float32).astype(
                                 qh.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(d, name="out_proj")(out)


@dataclasses.dataclass(frozen=True)
class MemoryAttentionConfig:
    d_model: int = 256
    num_layers: int = 4
    dim_feedforward: int = 2048
    num_heads: int = 1
    mem_dim: int = 64
    feat_size: int = 64

    @classmethod
    def tiny_test(cls) -> "MemoryAttentionConfig":
        return cls(d_model=32, num_layers=1, dim_feedforward=64, num_heads=1,
                   mem_dim=16, feat_size=4)


class MemoryAttentionLayer(nn.Module):
    cfg: MemoryAttentionConfig

    @nn.compact
    def __call__(self, tgt, memory, query_pos, memory_pos,
                 num_obj_ptr_tokens: int = 0, key_mask=None):
        cfg = self.cfg
        # self attention (pre-norm, no PE at attn per SAM2 config)
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        t2 = RoPEAttention(cfg.d_model, cfg.num_heads,
                           feat_size=cfg.feat_size, name="self_attn")(
                               t2, t2, t2)
        tgt = tgt + t2
        # cross attention: keys get their positional encodings added
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        k = memory + memory_pos
        t2 = RoPEAttention(cfg.d_model, cfg.num_heads,
                           kv_in_dim=cfg.mem_dim, feat_size=cfg.feat_size,
                           name="cross_attn")(
                               t2, k, memory,
                               num_k_exclude_rope=num_obj_ptr_tokens,
                               key_mask=key_mask)
        tgt = tgt + t2
        # FFN
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        t2 = nn.Dense(cfg.dim_feedforward, name="linear1")(t2)
        t2 = nn.relu(t2)
        t2 = nn.Dense(cfg.d_model, name="linear2")(t2)
        return tgt + t2


class _MemoryLayerBody(nn.Module):
    """Scan body: one memory-attention layer with broadcast side inputs."""
    cfg: MemoryAttentionConfig
    num_obj_ptr_tokens: int
    has_mask: bool

    @nn.compact
    def __call__(self, carry, xs):
        memory, curr_pos, memory_pos, key_mask = xs
        out = MemoryAttentionLayer(self.cfg, name="layer")(
            carry, memory, curr_pos, memory_pos, self.num_obj_ptr_tokens,
            key_mask=key_mask if self.has_mask else None)
        return out, None


class MemoryAttention(nn.Module):
    cfg: MemoryAttentionConfig
    scan_layers: bool = True

    @nn.compact
    def __call__(self, curr, curr_pos, memory, memory_pos,
                 num_obj_ptr_tokens: int = 0, key_mask=None):
        """curr (B, L, d_model); memory (B, Lm, mem_dim) + obj-ptr tokens.

        pos_enc_at_input=True: query PE added once at input with upstream's
        0.1 damping factor. ``key_mask``
        (B, Lm) masks invalid static memory slots out of the cross-attention
        (functionally identical to upstream's variable-length concat).
        The identical layers scan over stacked params (graph-size control —
        this module sits inside the per-frame tracking scan).
        """
        x = curr + 0.1 * curr_pos
        if self.scan_layers:
            Run = nn.scan(
                _MemoryLayerBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.cfg.num_layers, in_axes=nn.broadcast)
            mask_in = key_mask if key_mask is not None else \
                jnp.ones(memory.shape[:2], bool)
            x, _ = Run(cfg=self.cfg,
                       num_obj_ptr_tokens=num_obj_ptr_tokens,
                       has_mask=key_mask is not None,
                       name="layers")(
                           x, (memory, curr_pos, memory_pos, mask_in))
        else:
            for i in range(self.cfg.num_layers):
                x = MemoryAttentionLayer(self.cfg, name=f"layer_{i}")(
                    x, memory, curr_pos, memory_pos, num_obj_ptr_tokens,
                    key_mask=key_mask)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


# ---------------------------------------------------------------------------
# Memory encoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MemoryEncoderConfig:
    in_dim: int = 256
    out_dim: int = 64
    mask_downsample_layers: int = 4  # stride 16 total
    fuser_layers: int = 2

    @classmethod
    def tiny_test(cls) -> "MemoryEncoderConfig":
        return cls(in_dim=32, out_dim=16, mask_downsample_layers=4,
                   fuser_layers=1)


class CXBlock(nn.Module):
    """ConvNeXt block (SAM2 memory fuser): 7x7 depthwise conv + LN + MLP with
    layer-scale, residual."""
    dim: int

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, name="dwconv")(x)
        x = LayerNorm2d(name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(1e-6), (self.dim,))
        return inp + gamma * x


class MaskDownSampler(nn.Module):
    cfg: MemoryEncoderConfig

    @nn.compact
    def __call__(self, masks):
        """(B, 16h, 16w, 1) scaled-sigmoid masks -> (B, h, w, in_dim)."""
        chans = 1
        x = masks
        for i in range(self.cfg.mask_downsample_layers):
            chans = chans * 4
            x = conv2d(chans, 3, stride=2, padding=1, name=f"conv_{i}")(x)
            x = LayerNorm2d(name=f"ln_{i}")(x)
            x = jax.nn.gelu(x, approximate=False)
        return conv2d(self.cfg.in_dim, 1, name="conv_out")(x)


class MemoryEncoder(nn.Module):
    cfg: MemoryEncoderConfig

    @nn.compact
    def __call__(self, pix_feat, masks):
        """pix_feat (B, h, w, in_dim); masks (B, 16h, 16w, 1) already
        sigmoid-scaled (the caller applies sigmoid*20-10).

        Returns (B, h, w, out_dim) memory features.
        """
        m = MaskDownSampler(self.cfg, name="mask_downsampler")(masks)
        x = conv2d(self.cfg.in_dim, 1, name="pix_feat_proj")(pix_feat)
        x = x + m
        for i in range(self.cfg.fuser_layers):
            x = CXBlock(self.cfg.in_dim, name=f"fuser_{i}")(x)
        return conv2d(self.cfg.out_dim, 1, name="out_proj")(x)
