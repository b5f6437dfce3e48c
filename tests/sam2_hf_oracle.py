"""SAM2 oracle built on HuggingFace transformers' Sam2VideoModel.

transformers ships an upstream-validated torch implementation of SAM2
(numerically checked against facebookresearch/sam2 checkpoints). We use a
tiny random-init instance of it as the weight-level ground truth for:

  1. the checkpoint converter (sola_tpu/trackgen/sam2/convert.py) — the HF
     state_dict is renamed to the ORIGINAL facebook checkpoint naming (the
     format the reference loads, generate_tokens_grid.py:28-29) and pushed
     through ``torch_sam2_to_params``;
  2. per-module forward parity of the JAX port.

Config flags are pinned to SAM2 **v1** semantics (the reference's
``sam2_hiera_large.pt``): no occlusion spatial embedding, no temporal pos
encoding on object pointers.
"""

from __future__ import annotations

import re

import numpy as np
import torch


def jax_parity_config():
    """The JAX SAM2Config matching ``build_tiny_hf_sam2`` dim-for-dim.

    mem_dim must be 64 (HF hardcodes kv_in_dim=64 in the memory
    cross-attention) so d_model is 128 to exercise the 2-tokens-per-object-
    pointer split (128 / 64), like the real model's 256 / 64 = 4.
    """
    from sola_tpu.trackgen.sam2.hiera import HieraConfig
    from sola_tpu.trackgen.sam2.image_encoder import ImageEncoderConfig
    from sola_tpu.trackgen.sam2.mask_decoder import MaskDecoderConfig
    from sola_tpu.trackgen.sam2.memory import (MemoryAttentionConfig,
                                               MemoryEncoderConfig)
    from sola_tpu.trackgen.sam2.model import SAM2Config
    from sola_tpu.trackgen.sam2.prompt_encoder import PromptEncoderConfig

    # NOTE: unlike HieraConfig.tiny_test, the global-attention block must
    # not be a stage-first (q_pool) block — upstream divides window_size by
    # the query stride there and 0 // 2 crashes (real Hiera-L never mixes
    # the two either).
    hiera = HieraConfig(embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
                        global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
                        window_pos_embed_bkg_spatial_size=(2, 2))
    return SAM2Config(
        image_encoder=ImageEncoderConfig(hiera=hiera, d_model=128),
        prompt_encoder=PromptEncoderConfig(
            embed_dim=128, image_embedding_size=(4, 4),
            input_image_size=(64, 64), mask_in_chans=4),
        mask_decoder=MaskDecoderConfig(
            transformer_dim=128, transformer_mlp_dim=128, num_heads=2,
            iou_head_hidden_dim=128),
        memory_attention=MemoryAttentionConfig(
            d_model=128, num_layers=1, dim_feedforward=64, num_heads=1,
            mem_dim=64, feat_size=4),
        memory_encoder=MemoryEncoderConfig(
            in_dim=128, out_dim=64, mask_downsample_layers=4,
            fuser_layers=1),
        image_size=64, max_cond_frames=1, max_obj_ptrs=4)


def build_tiny_hf_sam2(seed: int = 0):
    """Tiny Sam2VideoModel matching ``jax_parity_config`` dim-for-dim."""
    from transformers import Sam2VideoConfig, Sam2VideoModel
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig, Sam2VisionConfig)
    from transformers.models.sam2_video.configuration_sam2_video import (
        Sam2VideoMaskDecoderConfig, Sam2VideoPromptEncoderConfig)

    hiera = Sam2HieraDetConfig(
        hidden_size=32, num_attention_heads=1, image_size=64,
        patch_kernel_size=7, patch_stride=4, patch_padding=3,
        query_stride=[2, 2],
        window_positional_embedding_background_size=[2, 2],
        num_query_pool_stages=3, blocks_per_stage=[1, 1, 2, 1],
        embed_dim_per_stage=[32, 64, 128, 256],
        num_attention_heads_per_stage=[1, 2, 4, 8],
        window_size_per_stage=[4, 2, 4, 2], global_attention_blocks=[3])
    vision = Sam2VisionConfig(
        backbone_config=hiera, backbone_channel_list=[256, 128, 64, 32],
        backbone_feature_sizes=[[16, 16], [8, 8], [4, 4]],
        fpn_hidden_size=128, fpn_top_down_levels=[2, 3])
    pe = Sam2VideoPromptEncoderConfig(hidden_size=128, image_size=64,
                                      patch_size=16, mask_input_channels=4)
    md = Sam2VideoMaskDecoderConfig(hidden_size=128, mlp_dim=128,
                                    num_attention_heads=2,
                                    iou_head_hidden_dim=128)
    cfg = Sam2VideoConfig(
        vision_config=vision, prompt_encoder_config=pe,
        mask_decoder_config=md, image_size=64,
        memory_attention_hidden_size=128, memory_attention_num_layers=1,
        memory_attention_feed_forward_hidden_size=64,
        memory_attention_rope_feat_sizes=[4, 4],
        memory_encoder_hidden_size=128, memory_encoder_output_channels=64,
        mask_downsampler_embed_dim=128, memory_fuser_num_layers=1,
        memory_fuser_embed_dim=128, memory_fuser_intermediate_dim=512,
        max_object_pointers_in_encoder=4,
        # SAM2 v1 semantics (reference checkpoint family)
        enable_occlusion_spatial_embedding=False,
        enable_temporal_pos_encoding_for_object_pointers=False)
    torch.manual_seed(seed)
    from transformers import Sam2VideoModel  # noqa: F811
    model = Sam2VideoModel(cfg)
    # HF init zeroes several embeddings (see Sam2VideoPreTrainedModel
    # ._init_weights); re-randomize so parity tests exercise real values
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name in ("no_memory_embedding", "no_object_pointer",
                     "memory_temporal_positional_encoding"):
            p = getattr(model, name)
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
    return model.eval()


# (regex, replacement) applied in order; first the submodule prefixes, then
# the per-leaf renames. Targets the facebook sam2_hiera_*.pt naming.
_RULES = [
    (r"^vision_encoder\.backbone\.", "image_encoder.trunk."),
    (r"^vision_encoder\.neck\.convs\.(\d+)\.", r"image_encoder.neck.convs.\1.conv."),
    (r"^prompt_encoder\.", "sam_prompt_encoder."),
    (r"^mask_decoder\.", "sam_mask_decoder."),
    (r"^object_pointer_proj\.", "obj_ptr_proj."),
    (r"^no_memory_embedding$", "no_mem_embed"),
    (r"^no_object_pointer$", "no_obj_ptr"),
    (r"^memory_temporal_positional_encoding$", "maskmem_tpos_enc"),
    # trunk leaves
    (r"\.patch_embed\.projection\.", ".patch_embed.proj."),
    (r"\.layer_norm1\.", ".norm1."),
    (r"\.layer_norm2\.", ".norm2."),
    (r"\.layer_norm3\.", ".norm3."),
    (r"\.layer_norm4\.", ".norm4."),
    (r"(trunk\.blocks\.\d+)\.mlp\.proj_in\.", r"\1.mlp.layers.0."),
    (r"(trunk\.blocks\.\d+)\.mlp\.proj_out\.", r"\1.mlp.layers.1."),
    # prompt encoder leaves
    (r"sam_prompt_encoder\.shared_embedding\.positional_embedding",
     "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    # (the generic .layer_normN. rules above already ran, so match .normN.)
    (r"sam_prompt_encoder\.mask_embed\.conv1\.", "sam_prompt_encoder.mask_downscaling.0."),
    (r"sam_prompt_encoder\.mask_embed\.norm1\.", "sam_prompt_encoder.mask_downscaling.1."),
    (r"sam_prompt_encoder\.mask_embed\.conv2\.", "sam_prompt_encoder.mask_downscaling.3."),
    (r"sam_prompt_encoder\.mask_embed\.norm2\.", "sam_prompt_encoder.mask_downscaling.4."),
    (r"sam_prompt_encoder\.mask_embed\.conv3\.", "sam_prompt_encoder.mask_downscaling.6."),
    # mask decoder leaves
    (r"\.o_proj\.", ".out_proj."),
    (r"transformer\.layer_norm_final_attn\.", "transformer.norm_final_attn."),
    (r"(transformer\.layers\.\d+)\.mlp\.proj_in\.", r"\1.mlp.lin1."),
    (r"(transformer\.layers\.\d+)\.mlp\.proj_out\.", r"\1.mlp.lin2."),
    (r"\.upscale_conv1\.", ".output_upscaling.0."),
    (r"\.upscale_layer_norm\.", ".output_upscaling.1."),
    (r"\.upscale_conv2\.", ".output_upscaling.3."),
    # 3-layer FeedForward -> MLP.layers.{0,1,2}; the middle layer is renamed
    # FIRST so the proj_in rule's output isn't re-rewritten
    (r"(output_hypernetworks_mlps\.\d+|iou_prediction_head|pred_obj_score_head|obj_ptr_proj)\.layers\.0\.", r"\1.layers.1."),
    (r"(output_hypernetworks_mlps\.\d+|iou_prediction_head|pred_obj_score_head|obj_ptr_proj)\.proj_in\.", r"\1.layers.0."),
    (r"(output_hypernetworks_mlps\.\d+|iou_prediction_head|pred_obj_score_head|obj_ptr_proj)\.proj_out\.", r"\1.layers.2."),
    # memory attention leaves
    (r"^memory_attention\.layer_norm\.", "memory_attention.norm."),
    # memory encoder leaves
    (r"^memory_encoder\.mask_downsampler\.layers\.(\d+)\.conv\.",
     lambda m: f"memory_encoder.mask_downsampler.encoder.{3 * int(m.group(1))}."),
    (r"^memory_encoder\.mask_downsampler\.layers\.(\d+)\.layer_norm\.",
     lambda m: f"memory_encoder.mask_downsampler.encoder.{3 * int(m.group(1)) + 1}."),
    (r"^memory_encoder\.mask_downsampler\.final_conv\.",
     None),  # handled below (needs layer count)
    (r"^memory_encoder\.feature_projection\.", "memory_encoder.pix_feat_proj."),
    (r"^memory_encoder\.memory_fuser\.layers\.(\d+)\.scale$", r"memory_encoder.fuser.layers.\1.gamma"),
    (r"^memory_encoder\.memory_fuser\.layers\.(\d+)\.depthwise_conv\.", r"memory_encoder.fuser.layers.\1.dwconv."),
    (r"^memory_encoder\.memory_fuser\.layers\.(\d+)\.layer_norm\.", r"memory_encoder.fuser.layers.\1.norm."),
    (r"^memory_encoder\.memory_fuser\.layers\.(\d+)\.pointwise_conv1\.", r"memory_encoder.fuser.layers.\1.pwconv1."),
    (r"^memory_encoder\.memory_fuser\.layers\.(\d+)\.pointwise_conv2\.", r"memory_encoder.fuser.layers.\1.pwconv2."),
    (r"^memory_encoder\.projection\.", "memory_encoder.out_proj."),
]

_DROP = (
    "no_memory_positional_encoding",   # unused with directly_add_no_mem_embed
    "shared_image_embedding.",         # tied duplicate of the prompt PE
    "mask_downsample.",                # HF-only multi-object helper
)


def hf_to_fb_state(model, n_mask_downsample_layers: int = 4) -> dict:
    """Rename the HF state_dict to the original facebook checkpoint naming
    (numpy values)."""
    out = {}
    final_conv_idx = 3 * n_mask_downsample_layers
    for key, value in model.state_dict().items():
        if any(key.startswith(d) for d in _DROP):
            continue
        name = key
        if name.startswith("memory_encoder.mask_downsampler.final_conv."):
            name = name.replace(
                "memory_encoder.mask_downsampler.final_conv.",
                f"memory_encoder.mask_downsampler.encoder.{final_conv_idx}.")
        for pat, rep in _RULES:
            if rep is None:
                continue
            name = re.sub(pat, rep, name)
        v = value.detach().cpu().numpy()
        if name == "sam_prompt_encoder.point_embed.weight":
            # HF fuses the 4 fb Embedding(1, d) tables into one (4, d)
            for i in range(4):
                out[f"sam_prompt_encoder.point_embeddings.{i}.weight"] = \
                    v[i:i + 1]
            continue
        out[name] = v
    return out
