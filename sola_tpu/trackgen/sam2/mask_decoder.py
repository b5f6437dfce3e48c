"""SAM2 mask decoder: two-way transformer + upscaling + prediction heads.

Decodes the (memory-conditioned) image embedding and prompt tokens into mask
logits, IoU predictions, an object-presence score, and the SAM output token
that becomes the per-frame ``obj_ptr`` the selection stage trains on
(generate_tokens_grid.py:227-237 harvests these).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sola_tpu.trackgen.sam2.common import MLP, LayerNorm2d, sdpa


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    transformer_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    num_heads: int = 8
    num_multimask_outputs: int = 3
    attention_downsample_rate: int = 2
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98

    @classmethod
    def tiny_test(cls) -> "MaskDecoderConfig":
        return cls(transformer_dim=32, transformer_mlp_dim=64, num_heads=2,
                   iou_head_hidden_dim=32)

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


class DownsampledAttention(nn.Module):
    """SAM's Attention with internal-dim downsampling."""
    embed_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embed_dim // self.downsample_rate
        h = self.num_heads
        hd = d // h
        qp = nn.Dense(d, name="q_proj")(q)
        kp = nn.Dense(d, name="k_proj")(k)
        vp = nn.Dense(d, name="v_proj")(v)
        b, lq, _ = qp.shape
        lk = kp.shape[1]
        out = sdpa(qp.reshape(b, lq, h, hd).transpose(0, 2, 1, 3),
                   kp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3),
                   vp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3))
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    cfg: MaskDecoderConfig
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                cfg.transformer_dim, cfg.num_heads, name="self_attn")(
                    queries, queries, queries)
        else:
            q = queries + query_pe
            attn = DownsampledAttention(
                cfg.transformer_dim, cfg.num_heads, name="self_attn")(
                    q, q, queries)
            queries = queries + attn
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn = DownsampledAttention(
            cfg.transformer_dim, cfg.num_heads,
            cfg.attention_downsample_rate, name="cross_attn_t2i")(q, k, keys)
        queries = queries + attn
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        mlp = nn.Dense(cfg.transformer_mlp_dim, name="mlp_0")(queries)
        mlp = nn.relu(mlp)
        mlp = nn.Dense(cfg.transformer_dim, name="mlp_1")(mlp)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries + mlp)

        q = queries + query_pe
        k = keys + key_pe
        attn = DownsampledAttention(
            cfg.transformer_dim, cfg.num_heads,
            cfg.attention_downsample_rate, name="cross_attn_i2t")(k, q,
                                                                  queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys + attn)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: MaskDecoderConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/pe: (B, h, w, d); point_embedding: (B, N, d)."""
        b, h, w, d = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, d)
        key_pe = image_pe.reshape(b, h * w, d)
        queries = point_embedding
        for i in range(self.cfg.transformer_depth):
            queries, keys = TwoWayAttentionBlock(
                self.cfg, skip_first_layer_pe=(i == 0),
                name=f"layer_{i}")(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        attn = DownsampledAttention(
            self.cfg.transformer_dim, self.cfg.num_heads,
            self.cfg.attention_downsample_rate,
            name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries + attn)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: MaskDecoderConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.transformer_dim
        self.transformer = TwoWayTransformer(cfg, name="transformer")
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                                    (1, d))
        self.mask_tokens = self.param("mask_tokens",
                                      nn.initializers.normal(1.0),
                                      (cfg.num_mask_tokens, d))
        if cfg.pred_obj_scores:
            self.obj_score_token = self.param(
                "obj_score_token", nn.initializers.normal(1.0), (1, d))
            if cfg.pred_obj_scores_mlp:
                self.pred_obj_score_head = MLP(d, 1, 3,
                                               name="obj_score_head")
            else:
                self.pred_obj_score_head = nn.Dense(1, name="obj_score_head")
        self.upscale_conv1 = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), name="upscale_conv1")
        self.upscale_ln = LayerNorm2d(name="upscale_ln")
        self.upscale_conv2 = nn.ConvTranspose(
            d // 8, (2, 2), strides=(2, 2), name="upscale_conv2")
        self.hyper_mlps = [
            MLP(d, d // 8, 3, name=f"hyper_mlp_{i}")
            for i in range(cfg.num_mask_tokens)
        ]
        # SAM2 (unlike SAM1) builds the decoder with
        # iou_prediction_use_sigmoid=True: predicted IoUs are in [0, 1],
        # which AMG's pred_iou_thresh filtering assumes
        self.iou_head = MLP(cfg.iou_head_hidden_dim, cfg.num_mask_tokens,
                            cfg.iou_head_depth, sigmoid_output=True,
                            name="iou_head")

    def __call__(self, image_embedding, image_pe, sparse_prompt,
                 dense_prompt, multimask_output: bool,
                 high_res_features: Optional[tuple] = None):
        """image_embedding (B, h, w, d); sparse_prompt (B, N, d);
        dense_prompt (B, h, w, d); high_res_features = (s0 (B,4h,4w,d/8),
        s1 (B,2h,2w,d/4)) or None.

        Returns (masks (B, K, 4h, 4w), iou_pred (B, K), sam_token_out
        (B, d), object_score_logits (B, 1)) where K = 3 if multimask else 1.
        """
        cfg = self.cfg
        b = sparse_prompt.shape[0]
        tokens = [self.iou_token, self.mask_tokens]
        s_offset = 0
        if cfg.pred_obj_scores:
            tokens = [self.obj_score_token] + tokens
            s_offset = 1
        output_tokens = jnp.concatenate(tokens, axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b,) + output_tokens.shape)
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)

        src = image_embedding + dense_prompt
        pe = jnp.broadcast_to(image_pe[None] if image_pe.ndim == 3
                              else image_pe, src.shape)
        hs, keys = self.transformer(src, pe, tokens)
        iou_token_out = hs[:, s_offset]
        mask_tokens_out = hs[:, s_offset + 1:
                             s_offset + 1 + cfg.num_mask_tokens]

        h, w, d = src.shape[1], src.shape[2], src.shape[3]
        src = keys.reshape(b, h, w, d)
        x = self.upscale_conv1(src)
        if cfg.use_high_res_features and high_res_features is not None:
            s0, s1 = high_res_features
            x = x + s1
        x = jax.nn.gelu(self.upscale_ln(x), approximate=False)
        x = self.upscale_conv2(x)
        if cfg.use_high_res_features and high_res_features is not None:
            x = x + s0
        upscaled = jax.nn.gelu(x, approximate=False)  # (B, 4h, 4w, d/8)

        hyper = jnp.stack([
            self.hyper_mlps[i](mask_tokens_out[:, i])
            for i in range(cfg.num_mask_tokens)
        ], axis=1)  # (B, K, d/8)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, upscaled,
                           preferred_element_type=jnp.float32)
        iou_pred = self.iou_head(iou_token_out)
        if cfg.pred_obj_scores:
            object_score_logits = self.pred_obj_score_head(hs[:, 0])
        else:
            object_score_logits = 10.0 * jnp.ones((b, 1), masks.dtype)

        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
            sam_token_out = self._best_token(mask_tokens_out[:, 1:],
                                             out_iou)
        else:
            if cfg.dynamic_multimask_via_stability:
                out_masks, out_iou, sam_token_out = self._stable_single(
                    masks, iou_pred, mask_tokens_out)
            else:
                out_masks = masks[:, 0:1]
                out_iou = iou_pred[:, 0:1]
                sam_token_out = mask_tokens_out[:, 0]
        return out_masks, out_iou, sam_token_out, object_score_logits

    def _best_token(self, tokens, iou_pred):
        best = jnp.argmax(iou_pred, axis=-1)
        return jnp.take_along_axis(tokens, best[:, None, None],
                                   axis=1).squeeze(1)

    def _stable_single(self, masks, iou_pred, mask_tokens_out):
        """Single-mask output with the dynamic stability fallback: if the
        token-0 mask is unstable, substitute the best multimask output.

        The SAM token stays token 0 either way — upstream's stability swap
        (mask_decoder._dynamic_multimask_via_stability) replaces masks and
        ious only; sam_tokens_out = mask_tokens_out[:, 0:1] regardless."""
        cfg = self.cfg
        delta = cfg.dynamic_multimask_stability_delta
        m0 = masks[:, 0]
        area_i = jnp.sum(m0 > delta, axis=(-2, -1)).astype(jnp.float32)
        area_u = jnp.sum(m0 > -delta, axis=(-2, -1)).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0),
                              1.0)
        is_stable = stability >= cfg.dynamic_multimask_stability_thresh

        multi_iou = iou_pred[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        best_mask = jnp.take_along_axis(
            masks[:, 1:], best[:, None, None, None], axis=1)[:, 0]
        best_iou = jnp.take_along_axis(multi_iou, best[:, None],
                                       axis=1)[:, 0]
        out_mask = jnp.where(is_stable[:, None, None], m0, best_mask)
        out_iou = jnp.where(is_stable, iou_pred[:, 0], best_iou)
        return out_mask[:, None], out_iou[:, None], mask_tokens_out[:, 0]
