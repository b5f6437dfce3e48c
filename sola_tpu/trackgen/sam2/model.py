"""SAM2 base model: image encoder + prompt/mask heads + memory machinery.

Static-shape, jit-first re-design of SAM2's tracking core. Where upstream
SAM2 keeps Python dicts of per-frame tensors and variable-length memory
lists, this model takes FIXED memory banks (max_cond_frames conditioning
slots + num_recent recent slots + a 16-slot object-pointer bank) with
validity masks, so every per-frame step is one compiled XLA program — the
property that lets the video predictor scan frames without host round trips.

The object axis is a padded batch dimension (the reference's "batch<=4
objects per propagation pass", generate_tokens_grid.py:181-186, becomes a
compile-time knob).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from sola_tpu.trackgen.sam2.common import MLP, interpolate_bilinear
from sola_tpu.trackgen.sam2.image_encoder import (ImageEncoder,
                                                  ImageEncoderConfig)
from sola_tpu.trackgen.sam2.mask_decoder import MaskDecoder, MaskDecoderConfig
from sola_tpu.trackgen.sam2.memory import (MemoryAttention,
                                           MemoryAttentionConfig,
                                           MemoryEncoder,
                                           MemoryEncoderConfig)
from sola_tpu.trackgen.sam2.prompt_encoder import (PromptEncoder,
                                                   PromptEncoderConfig)


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    image_encoder: ImageEncoderConfig = ImageEncoderConfig()
    prompt_encoder: PromptEncoderConfig = PromptEncoderConfig()
    mask_decoder: MaskDecoderConfig = MaskDecoderConfig()
    memory_attention: MemoryAttentionConfig = MemoryAttentionConfig()
    memory_encoder: MemoryEncoderConfig = MemoryEncoderConfig()
    image_size: int = 1024
    num_maskmem: int = 7          # 1 cond + 6 recent (upstream default)
    max_cond_frames: int = 1      # static conditioning slots
    max_obj_ptrs: int = 16
    # keep a non-cond memory only every r-th frame (upstream
    # memory_temporal_stride_for_eval; r>1 trades accuracy for speed on
    # long videos)
    memory_stride: int = 1
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    use_mask_input_as_output_without_sam: bool = True
    directly_add_no_mem_embed: bool = True
    multimask_output_for_tracking: bool = False
    fixed_no_obj_ptr: bool = True

    @classmethod
    def large(cls) -> "SAM2Config":
        return cls()

    @classmethod
    def tiny_test(cls, image_size: int = 64) -> "SAM2Config":
        return cls(
            image_encoder=ImageEncoderConfig.tiny_test(),
            prompt_encoder=PromptEncoderConfig.tiny_test(),
            mask_decoder=MaskDecoderConfig.tiny_test(),
            memory_attention=MemoryAttentionConfig.tiny_test(),
            memory_encoder=MemoryEncoderConfig.tiny_test(),
            image_size=image_size,
            max_cond_frames=1,
            max_obj_ptrs=4,
        )

    @property
    def num_recent(self) -> int:
        return self.num_maskmem - 1

    @property
    def feat_hw(self) -> int:
        return self.image_size // 16

    @property
    def d_model(self) -> int:
        return self.image_encoder.d_model

    @property
    def mem_dim(self) -> int:
        return self.memory_encoder.out_dim


class SAM2Model(nn.Module):
    cfg: SAM2Config

    def setup(self):
        cfg = self.cfg
        d = cfg.d_model
        self.image_encoder = ImageEncoder(cfg.image_encoder,
                                          name="image_encoder")
        self.prompt_encoder = PromptEncoder(cfg.prompt_encoder,
                                            name="prompt_encoder")
        self.mask_decoder = MaskDecoder(cfg.mask_decoder, name="mask_decoder")
        self.memory_attention = MemoryAttention(cfg.memory_attention,
                                                name="memory_attention")
        self.memory_encoder = MemoryEncoder(cfg.memory_encoder,
                                            name="memory_encoder")
        # high-res skip projections (SAM2 base: conv_s0 -> d/8, conv_s1 -> d/4)
        self.conv_s0 = nn.Conv(d // 8, (1, 1), name="conv_s0")
        self.conv_s1 = nn.Conv(d // 4, (1, 1), name="conv_s1")
        self.no_mem_embed = self.param("no_mem_embed",
                                       nn.initializers.normal(0.02), (1, 1, d))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (cfg.num_maskmem, 1, 1, cfg.mem_dim))
        self.no_obj_ptr = self.param("no_obj_ptr",
                                     nn.initializers.normal(0.02), (1, d))
        self.obj_ptr_proj = MLP(d, d, 3, name="obj_ptr_proj")

    def __call__(self, images: jax.Array):
        """Init-path forward touching every submodule (so ``model.init``
        creates the full parameter tree); not used at inference."""
        cfg = self.cfg
        feats = self.encode_image(images)
        b = images.shape[0]
        coords = jnp.zeros((b, 1, 2), jnp.float32)
        labels = jnp.full((b, 1), -1, jnp.int32)
        out = self.sam_heads(feats["pix"], feats["s0"], feats["s1"], coords,
                             labels, None, False)
        # touch the mask-prompt conv path too
        prompt_hw = cfg.prompt_encoder.image_embedding_size[0] * 4
        self.sam_heads(feats["pix"], feats["s0"], feats["s1"], coords,
                       labels, jnp.zeros((b, prompt_hw, prompt_hw, 1)), False)
        mem = self.encode_memory(feats["pix"], out["high_res_masks"][:, 0])
        h = cfg.feat_hw
        cond_mem = jnp.broadcast_to(
            mem[:, None], (b, cfg.max_cond_frames, h, h, cfg.mem_dim))
        cond_valid = jnp.ones((b, cfg.max_cond_frames), bool)
        rec = jnp.zeros((b, cfg.num_recent, h, h, cfg.mem_dim))
        rec_valid = jnp.zeros((b, cfg.num_recent), bool)
        rec_tpos = jnp.ones((b, cfg.num_recent), jnp.int32)
        ptrs = jnp.zeros((b, cfg.max_obj_ptrs, cfg.d_model))
        ptr_valid = jnp.zeros((b, cfg.max_obj_ptrs), bool)
        return self.condition_features(feats["pix"], feats["pos"], cond_mem,
                                       cond_valid, rec, rec_valid, rec_tpos,
                                       ptrs, ptr_valid)

    # ------------------------------------------------------------------
    # Image encoding
    # ------------------------------------------------------------------

    def encode_image(self, images: jax.Array) -> dict:
        """images (B, S, S, 3) normalized -> feature dict:
        s0 (B, S/4, S/4, d/8), s1 (B, S/8, S/8, d/4),
        pix (B, S/16, S/16, d), pos (same shape sine PE)."""
        out = self.image_encoder(images)
        f4, f8, f16 = out["backbone_fpn"]
        return {
            "s0": self.conv_s0(f4),
            "s1": self.conv_s1(f8),
            "pix": f16,
            "pos": out["vision_pos"][2],
        }

    # ------------------------------------------------------------------
    # SAM heads
    # ------------------------------------------------------------------

    def sam_heads(self, pix_feat, s0, s1, coords, labels,
                  mask_prompt=None, multimask_output: bool = False,
                  suppress_empty_obj: bool = False,
                  compute_high_res: bool = True):
        """Run prompt encoder + mask decoder on (possibly memory-conditioned)
        stride-16 features.

        coords (B, N, 2) / labels (B, N) padded with -1; mask_prompt
        (B, 4h, 4w, 1) logits or None. ``suppress_empty_obj`` applies
        upstream's video-path convention (sam2_base._forward_sam_heads):
        when the object score is <= 0 the mask logits collapse to
        NO_OBJ_SCORE = -1024 (the image-predictor/AMG path does not do this).

        ``compute_high_res=False`` skips the (B, K, S, S) upscale — the AMG
        proposal pass filters on low-res logits only, and materializing
        128 x 3 x 1024^2 high-res masks per point batch is pure HBM waste
        there (the reference pays this cost; we don't).

        Returns dict: low_res_masks (B, K, 4h, 4w), high_res_masks
        (B, K, S, S) or None, ious (B, K), obj_ptr (B, d),
        object_score_logits (B, 1).
        """
        cfg = self.cfg
        if mask_prompt is not None:
            # bf16 mask-prompt conv path (same autocast rationale as below)
            mask_prompt = mask_prompt.astype(pix_feat.dtype)
        sparse, dense = self.prompt_encoder(coords, labels, mask_prompt)
        pe = self.prompt_encoder.dense_pe()
        # Cast the prompt embeddings/PE to the feature dtype at the decoder
        # boundary: the fourier PE is fp32 (fp32 coords x bf16 gaussian
        # promotes), and without this cast the fp32 sparse tokens promote
        # EVERY matmul in the two-way transformer + upscale convs to fp32 —
        # the whole decode path (AMG's 3k proposals/frame, propagation's
        # per-frame sam_heads) off the bf16 MXU rate. No-op in fp32 parity
        # mode; mirrors upstream's autocast-bf16 decoder
        # (generate_tokens_grid.py:84-88).
        dt = pix_feat.dtype
        sparse, dense, pe = (sparse.astype(dt), dense.astype(dt),
                             pe.astype(dt))
        low_res, ious, sam_token, obj_score = self.mask_decoder(
            pix_feat, pe, sparse, dense, multimask_output,
            high_res_features=(s0, s1))
        if cfg.mask_decoder.pred_obj_scores and suppress_empty_obj:
            is_obj = obj_score[:, 0] > 0  # (B,)
            low_res = jnp.where(is_obj[:, None, None, None], low_res,
                                jnp.asarray(-1024.0, low_res.dtype))
        high_res = None
        if compute_high_res:
            high_res = interpolate_bilinear(
                low_res.transpose(0, 2, 3, 1), cfg.image_size,
                cfg.image_size).transpose(0, 3, 1, 2)
        obj_ptr = self.obj_ptr_proj(sam_token)
        if cfg.fixed_no_obj_ptr:
            lam = (obj_score > 0).astype(obj_ptr.dtype)
            obj_ptr = lam * obj_ptr + (1.0 - lam) * self.no_obj_ptr
        return {
            "low_res_masks": low_res,
            "high_res_masks": high_res,
            "ious": ious,
            "obj_ptr": obj_ptr,
            "object_score_logits": obj_score,
        }

    def mask_as_output(self, pix_feat, s0, s1, mask_high: jax.Array) -> dict:
        """SAM2's use_mask_input_as_output_without_sam path: the given mask
        becomes the frame output directly (scaled to +-10 logits); the SAM
        heads still run with the mask as a dense prompt to produce obj_ptr."""
        cfg = self.cfg
        scale, bias = 20.0, -10.0
        b = mask_high.shape[0]
        high_res = mask_high.astype(jnp.float32) * scale + bias  # (B, S, S)
        h4 = cfg.feat_hw * 4
        low_res = interpolate_bilinear(high_res[..., None], h4, h4)[..., 0]
        # dense-prompt SAM pass for the object pointer
        prompt_hw = cfg.prompt_encoder.image_embedding_size[0] * 4
        mask_prompt = interpolate_bilinear(
            high_res[..., None], prompt_hw, prompt_hw)
        coords = jnp.zeros((b, 1, 2), jnp.float32)
        labels = jnp.full((b, 1), -1, jnp.int32)
        sam_out = self.sam_heads(pix_feat, s0, s1, coords, labels,
                                 mask_prompt=mask_prompt)
        is_obj = (jnp.max(mask_high.reshape(b, -1), axis=-1) > 0)
        obj_score = (scale * is_obj.astype(jnp.float32) + bias)[:, None]
        obj_ptr = sam_out["obj_ptr"]
        if cfg.fixed_no_obj_ptr:
            lam = is_obj.astype(obj_ptr.dtype)[:, None]
            obj_ptr = lam * obj_ptr + (1.0 - lam) * self.no_obj_ptr
        return {
            "low_res_masks": low_res[:, None],
            "high_res_masks": high_res[:, None],
            "ious": jnp.ones((b, 1), jnp.float32),
            "obj_ptr": obj_ptr,
            "object_score_logits": obj_score,
        }

    # ------------------------------------------------------------------
    # Memory
    # ------------------------------------------------------------------

    def encode_memory(self, pix_feat, high_res_masks) -> jax.Array:
        """(B, h, w, d) + (B, S, S) mask logits -> (B, h, w, mem_dim)."""
        cfg = self.cfg
        m = jax.nn.sigmoid(high_res_masks)[..., None]
        m = m * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc
        return self.memory_encoder(pix_feat, m.astype(pix_feat.dtype))

    def condition_features(self, pix_feat, pos, cond_mem, cond_valid,
                           recent_mem, recent_valid, recent_tpos,
                           obj_ptrs, obj_ptr_valid) -> jax.Array:
        """Cross-attend the current frame to the memory banks.

        pix_feat/pos: (B, h, w, d)
        cond_mem:     (B, C, h, w, mem)   cond_valid:   (B, C) bool
        recent_mem:   (B, R, h, w, mem)   recent_valid: (B, R) bool
        recent_tpos:  (B, R) int in [1, R] (temporal distance)
        obj_ptrs:     (B, P, d)           obj_ptr_valid: (B, P) bool

        Empty banks (nothing valid) fall back to the learned no-mem embedding
        (directly_add_no_mem_embed). Invalid slots are masked out of the
        attention by zeroing value/key contributions via a large negative
        bias — functionally identical to SAM2's variable-length concat.
        """
        cfg = self.cfg
        b, h, w, d = pix_feat.shape
        mem_dim = cfg.mem_dim
        hw = h * w
        curr = pix_feat.reshape(b, hw, d)
        curr_pos = pos.reshape(b, hw, d)

        any_mem = (jnp.any(cond_valid, axis=1) |
                   jnp.any(recent_valid, axis=1))  # (B,)

        from sola_tpu.trackgen.sam2.common import sine_position_encoding
        spatial_pos = sine_position_encoding(h, w, mem_dim).astype(
            cond_mem.dtype).reshape(1, hw, mem_dim)

        # conditioning slots: t_pos = 0 -> tpos index num_maskmem - 1
        cond_tok = cond_mem.reshape(b, -1, hw, mem_dim)
        cond_pos = (spatial_pos[:, None] +
                    self.maskmem_tpos_enc[cfg.num_maskmem - 1].reshape(
                        1, 1, 1, mem_dim))
        cond_pos = jnp.broadcast_to(cond_pos,
                                    cond_tok.shape).reshape(b, -1, mem_dim)
        cond_tok = cond_tok.reshape(b, -1, mem_dim)
        cond_mask = jnp.repeat(cond_valid, hw, axis=1)

        # recent slots: temporal distance t_rel in [1, num_recent] gets
        # maskmem_tpos_enc[t_rel - 1] (upstream sam2_base: index
        # num_maskmem - t_pos - 1 with t_pos = num_maskmem - t_rel)
        rec_tok = recent_mem.reshape(b, -1, hw, mem_dim)
        tpos_idx = jnp.clip(recent_tpos - 1, 0, cfg.num_maskmem - 2)
        tpos_enc = jnp.take(
            self.maskmem_tpos_enc.reshape(cfg.num_maskmem, mem_dim),
            tpos_idx, axis=0)  # (B, R, mem)
        rec_pos = spatial_pos[:, None] + tpos_enc[:, :, None, :]
        rec_pos = jnp.broadcast_to(
            rec_pos, rec_tok.shape).reshape(b, -1, mem_dim)
        rec_tok = rec_tok.reshape(b, -1, mem_dim)
        rec_mask = jnp.repeat(recent_valid, hw, axis=1)

        # object pointers: each d-dim pointer -> d/mem_dim tokens of mem_dim
        tok_per_ptr = d // mem_dim
        ptr_tok = obj_ptrs.reshape(b, -1, tok_per_ptr, mem_dim).reshape(
            b, -1, mem_dim)
        ptr_pos = jnp.zeros_like(ptr_tok)
        ptr_mask = jnp.repeat(obj_ptr_valid, tok_per_ptr, axis=1)
        num_obj_ptr_tokens = ptr_tok.shape[1]

        memory = jnp.concatenate([cond_tok, rec_tok, ptr_tok], axis=1)
        memory_pos = jnp.concatenate([cond_pos, rec_pos, ptr_pos], axis=1)
        key_mask = jnp.concatenate([cond_mask, rec_mask, ptr_mask], axis=1)
        # at least one key must stay unmasked for a well-defined softmax;
        # rows with no memory at all are replaced by no_mem below anyway
        key_mask = key_mask.at[:, 0].set(
            key_mask[:, 0] | ~jnp.any(key_mask, axis=1))
        memory = jnp.where(key_mask[..., None], memory, 0.0)

        conditioned = self.memory_attention(
            curr, curr_pos, memory, memory_pos, num_obj_ptr_tokens,
            key_mask=key_mask)
        no_mem = curr + self.no_mem_embed
        out = jnp.where(any_mem[:, None, None], conditioned, no_mem)
        return out.reshape(b, h, w, d)
