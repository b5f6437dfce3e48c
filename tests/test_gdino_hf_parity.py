"""Weight-level GroundingDINO parity vs the HF transformers oracle.

A tiny random-init GroundingDinoForObjectDetection's state_dict is pushed
through the real converter (HF-naming core path); the full JAX forward is
then compared at shared weights — covering the Swin backbone, BERT with
sub-sentence masks, BiMHA fusion, deformable attention, two-stage query
selection, and the refinement decoder in one shot. Closes VERDICT.md
round-1 gap #3/#4 (GDINO fidelity) at the architecture level.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

ATOL = 2e-3  # deep stack: swin+bert+fusion+deformable+decoder accumulate


def build_tiny_hf_gdino(seed: int = 0):
    from transformers import (BertConfig, GroundingDinoConfig,
                              GroundingDinoForObjectDetection, SwinConfig)
    swin = SwinConfig(image_size=128, patch_size=4, embed_dim=16,
                      depths=[1, 2, 1, 1], num_heads=[1, 2, 2, 2],
                      window_size=2,
                      out_features=["stage2", "stage3", "stage4"])
    bert = BertConfig(vocab_size=1100, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64, pad_token_id=0,
                      layer_norm_eps=1e-5)
    cfg = GroundingDinoConfig(
        backbone_config=swin, text_config=bert, d_model=32,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=2,
        decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_feature_levels=4, encoder_n_points=2, decoder_n_points=2,
        num_queries=20, max_text_len=32)
    torch.manual_seed(seed)
    model = GroundingDinoForObjectDetection(cfg)
    # HF zero-initializes several params; randomize so parity is meaningful
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if float(p.abs().max()) == 0.0:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    return model.eval()


def jax_parity_config():
    import dataclasses

    from sola_tpu.models.text import RobertaConfig
    from sola_tpu.trackgen.gdino.model import GDINOConfig
    from sola_tpu.trackgen.gdino.swin import SwinConfig as JSwinConfig

    return GDINOConfig(
        swin=JSwinConfig(embed_dim=16, depths=(1, 2, 1, 1),
                         num_heads=(1, 2, 2, 2), window_size=2),
        text=dataclasses.replace(RobertaConfig.tiny(), vocab_size=1100,
                                 position_style="bert", pad_token_id=0),
        d_model=32, n_heads=2, n_levels=4, enc_n_points=2, dec_n_points=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=20,
        max_text_len=32, size_target=128, size_max=128)


@pytest.fixture(scope="module")
def bundle():
    from sola_tpu.trackgen.gdino.convert import (_merge_with_template,
                                                 hf_gdino_to_params)
    from sola_tpu.trackgen.gdino.model import GroundingDINO

    hf = build_tiny_hf_gdino(seed=0)
    cfg = jax_parity_config()
    model = GroundingDINO(cfg)
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    pmask = jnp.ones((1, 128, 128), bool)
    ids = jnp.zeros((1, 8), jnp.int32)
    tmask = jnp.ones((1, 8), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), img, pmask, ids, tmask)
    converted = hf_gdino_to_params(hf.state_dict(), cfg)
    variables, report = _merge_with_template(template, converted)
    return hf, model, variables, cfg, report


def test_conversion_covers_every_parameter(bundle):
    *_, report = bundle
    assert not report["missing"], report["missing"][:10]
    assert not report["extra"], report["extra"][:10]


def _text_inputs(rng, lt=12):
    # "[CLS] w w . w w w [SEP] pad..." — two phrases + padding
    ids = np.zeros((1, lt), np.int64)
    ids[0, :8] = [101, 7, 8, 1012, 9, 10, 11, 102]
    mask = np.zeros((1, lt), np.int64)
    mask[0, :8] = 1
    return ids, mask


@pytest.mark.parametrize("padded", [False, True])
def test_full_forward_parity(bundle, rng, padded):
    hf, model, variables, cfg, _ = bundle
    from sola_tpu.trackgen.gdino.model import generate_special_token_masks

    img = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    pmask = np.ones((1, 128, 128), bool)
    if padded:
        pmask[:, :, 96:] = False
        img[:, :, :, 96:] = 0.0
    ids, tmask = _text_inputs(rng)

    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(img),
                 input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(tmask),
                 pixel_mask=torch.from_numpy(pmask.astype(np.int64)))
    ref_logits = out.logits.numpy()[0]
    ref_boxes = out.pred_boxes.numpy()[0]

    smask, pids = generate_special_token_masks(ids)
    got = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                      jnp.asarray(pmask), jnp.asarray(ids.astype(np.int32)),
                      jnp.asarray(tmask.astype(np.int32)),
                      jnp.asarray(smask), jnp.asarray(pids))
    got_logits = np.asarray(got["pred_logits"][0])
    got_boxes = np.asarray(got["pred_boxes"][0])

    np.testing.assert_allclose(got_boxes, ref_boxes, atol=ATOL)
    finite = np.isfinite(ref_logits)
    assert (finite == np.isfinite(got_logits)).all()
    np.testing.assert_allclose(got_logits[finite], ref_logits[finite],
                               atol=ATOL)
    assert np.abs(ref_boxes).max() > 1e-3


def _fabricate_idea_state(hf_state: dict) -> dict:
    """HF-named state dict -> IDEA-Research-named dict, via a mapping
    written independently here (not by inverting the library's
    `_IDEA_RULES`) so a disagreement between the two fails the tests."""
    # build the IDEA-style dict by inverting the documented mapping for a
    # representative subset: fused projections + a few renames
    idea = {}
    import re
    for k, v in hf_state.items():
        if "relative_position_index" in k:
            continue  # buffer; _IDEA_DROP skips it on the real path too
        name = k
        name = name.replace(
            "model.backbone.conv_encoder.model.embeddings.patch_embeddings"
            ".projection", "backbone.0.patch_embed.proj")
        name = name.replace(
            "model.backbone.conv_encoder.model.embeddings.norm",
            "backbone.0.patch_embed.norm")
        name = re.sub(
            r"model\.backbone\.conv_encoder\.model\.encoder\.layers\.(\d+)"
            r"\.blocks\.(\d+)\.layernorm_before",
            r"backbone.0.layers.\1.blocks.\2.norm1", name)
        name = re.sub(
            r"model\.backbone\.conv_encoder\.model\.encoder\.layers\.(\d+)"
            r"\.blocks\.(\d+)\.layernorm_after",
            r"backbone.0.layers.\1.blocks.\2.norm2", name)
        name = re.sub(
            r"model\.backbone\.conv_encoder\.model\.encoder\.layers\.(\d+)"
            r"\.blocks\.(\d+)\.attention\.output\.dense",
            r"backbone.0.layers.\1.blocks.\2.attn.proj", name)
        name = re.sub(
            r"model\.backbone\.conv_encoder\.model\.encoder\.layers\.(\d+)"
            r"\.blocks\.(\d+)\.attention\.self\.relative_position_bias_table",
            r"backbone.0.layers.\1.blocks.\2.attn.relative_position_bias_table",
            name)
        name = re.sub(
            r"model\.backbone\.conv_encoder\.model\.encoder\.layers\.(\d+)"
            r"\.blocks\.(\d+)\.intermediate\.dense",
            r"backbone.0.layers.\1.blocks.\2.mlp.fc1", name)
        name = re.sub(
            r"model\.backbone\.conv_encoder\.model\.encoder\.layers\.(\d+)"
            r"\.blocks\.(\d+)\.output\.dense",
            r"backbone.0.layers.\1.blocks.\2.mlp.fc2", name)
        name = re.sub(
            r"model\.backbone\.conv_encoder\.model\.encoder\.layers\.(\d+)"
            r"\.downsample", r"backbone.0.layers.\1.downsample", name)
        name = name.replace(
            "model.backbone.conv_encoder.model.hidden_states_norms.stage2",
            "backbone.0.norm1")
        name = name.replace(
            "model.backbone.conv_encoder.model.hidden_states_norms.stage3",
            "backbone.0.norm2")
        name = name.replace(
            "model.backbone.conv_encoder.model.hidden_states_norms.stage4",
            "backbone.0.norm3")
        name = name.replace("model.text_backbone.", "bert.")
        name = name.replace("model.text_projection", "feat_map")
        name = re.sub(r"model\.input_proj_vision\.(\d+)\.",
                      r"input_proj.\1.", name)
        name = name.replace("model.level_embed", "transformer.level_embed")
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.deformable_layer"
                      r"\.self_attn\.",
                      r"transformer.encoder.layers.\1.self_attn.", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.deformable_layer"
                      r"\.self_attn_layer_norm",
                      r"transformer.encoder.layers.\1.norm1", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.deformable_layer"
                      r"\.fc1", r"transformer.encoder.layers.\1.linear1",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.deformable_layer"
                      r"\.fc2", r"transformer.encoder.layers.\1.linear2",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.deformable_layer"
                      r"\.final_layer_norm",
                      r"transformer.encoder.layers.\1.norm2", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
                      r"\.self_attn\.out_proj",
                      r"transformer.encoder.text_layers.\1.self_attn"
                      r".out_proj", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
                      r"\.fc1", r"transformer.encoder.text_layers.\1.linear1",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
                      r"\.fc2", r"transformer.encoder.text_layers.\1.linear2",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
                      r"\.layer_norm_before",
                      r"transformer.encoder.text_layers.\1.norm1", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
                      r"\.layer_norm_after",
                      r"transformer.encoder.text_layers.\1.norm2", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer"
                      r"\.layer_norm_vision",
                      r"transformer.encoder.fusion_layers.\1.layer_norm_v",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer"
                      r"\.layer_norm_text",
                      r"transformer.encoder.fusion_layers.\1.layer_norm_l",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer"
                      r"\.vision_param",
                      r"transformer.encoder.fusion_layers.\1.gamma_v", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer"
                      r"\.text_param",
                      r"transformer.encoder.fusion_layers.\1.gamma_l", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
                      r"\.vision_proj",
                      r"transformer.encoder.fusion_layers.\1.attn.v_proj",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
                      r"\.text_proj",
                      r"transformer.encoder.fusion_layers.\1.attn.l_proj",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
                      r"\.values_vision_proj",
                      r"transformer.encoder.fusion_layers.\1.attn"
                      r".values_v_proj", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
                      r"\.values_text_proj",
                      r"transformer.encoder.fusion_layers.\1.attn"
                      r".values_l_proj", name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
                      r"\.out_vision_proj",
                      r"transformer.encoder.fusion_layers.\1.attn.out_v_proj",
                      name)
        name = re.sub(r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
                      r"\.out_text_proj",
                      r"transformer.encoder.fusion_layers.\1.attn.out_l_proj",
                      name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)\.encoder_attn_text"
                      r"\.out_proj",
                      r"transformer.decoder.layers.\1.ca_text.out_proj",
                      name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)"
                      r"\.encoder_attn_text_layer_norm",
                      r"transformer.decoder.layers.\1.catext_norm", name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)\.encoder_attn\.",
                      r"transformer.decoder.layers.\1.cross_attn.", name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)"
                      r"\.encoder_attn_layer_norm",
                      r"transformer.decoder.layers.\1.norm1", name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)\.self_attn\.out_proj",
                      r"transformer.decoder.layers.\1.self_attn.out_proj",
                      name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)\.self_attn_layer_norm",
                      r"transformer.decoder.layers.\1.norm2", name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)\.fc1",
                      r"transformer.decoder.layers.\1.linear1", name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)\.fc2",
                      r"transformer.decoder.layers.\1.linear2", name)
        name = re.sub(r"model\.decoder\.layers\.(\d+)\.final_layer_norm",
                      r"transformer.decoder.layers.\1.norm3", name)
        name = name.replace("model.decoder.layer_norm",
                            "transformer.decoder.norm")
        name = name.replace("model.decoder.reference_points_head",
                            "transformer.decoder.ref_point_head")
        name = re.sub(r"^model\.decoder\.bbox_embed\.",
                      "transformer.decoder.bbox_embed.", name)
        name = name.replace("model.enc_output_norm",
                            "transformer.enc_output_norm")
        name = re.sub(r"^model\.enc_output\.", "transformer.enc_output.",
                      name)
        name = name.replace("model.encoder_output_bbox_embed",
                            "transformer.enc_out_bbox_embed")
        name = name.replace("model.query_position_embeddings.weight",
                            "transformer.tgt_embed.weight")
        idea[name] = v

    # fuse q/k/v back into torch-MultiheadAttention-style in_proj where IDEA
    # uses nn.MultiheadAttention (text enhancer, decoder self/ca_text) and
    # Swin's fused qkv
    def pop3(base, kind):
        return torch.cat([idea.pop(f"{base}.{p}.{kind}")
                          for p in ("query", "key", "value")], dim=0)

    # q/k/v keys were not renamed above (no per-key rule touches them), so
    # they still carry HF-style prefixes here
    fused = {}
    for k in list(idea):
        m = re.match(r"^model\.backbone\.conv_encoder\.model\.encoder"
                     r"\.layers\.(\d+)\.blocks\.(\d+)\.attention\.self"
                     r"\.query\.(weight|bias)$", k)
        if m:
            s, b, kind = m.groups()
            base = (f"model.backbone.conv_encoder.model.encoder.layers.{s}"
                    f".blocks.{b}.attention.self")
            fused[f"backbone.0.layers.{s}.blocks.{b}.attn.qkv.{kind}"] = \
                pop3(base, kind)
        m = re.match(r"^model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
                     r"\.self_attn\.query\.(weight|bias)$", k)
        if m:
            i, kind = m.groups()
            base = f"model.encoder.layers.{i}.text_enhancer_layer.self_attn"
            fused[f"transformer.encoder.text_layers.{i}.self_attn"
                  f".in_proj_{kind}"] = pop3(base, kind)
        m = re.match(r"^model\.decoder\.layers\.(\d+)\.(self_attn|"
                     r"encoder_attn_text)\.query\.(weight|bias)$", k)
        if m:
            i, which, kind = m.groups()
            base = f"model.decoder.layers.{i}.{which}"
            idea_which = ("self_attn" if which == "self_attn" else "ca_text")
            fused[f"transformer.decoder.layers.{i}.{idea_which}"
                  f".in_proj_{kind}"] = pop3(base, kind)
    # drop leftover split projections that were fused (bert.* stays split —
    # IDEA embeds the HF BertModel unchanged)
    for k in list(idea):
        if k.startswith("model.") and re.search(
                r"\.(query|key|value)\.(weight|bias)$", k):
            del idea[k]
    idea.update(fused)
    return idea


def test_idea_key_translation_roundtrip(bundle):
    """The IDEA->HF key translation feeds the same core converter: fabricate
    an IDEA-named state dict from the HF one and assert identical params."""
    hf, model, variables, cfg, _ = bundle
    from sola_tpu.trackgen.gdino.convert import (hf_gdino_to_params,
                                                 torch_gdino_to_params)

    hf_state = {k: v for k, v in hf.state_dict().items()}
    idea = _fabricate_idea_state(hf_state)
    direct = hf_gdino_to_params(hf_state, cfg)
    via_idea = torch_gdino_to_params(idea, cfg)

    flat_a = jax.tree_util.tree_leaves(direct)
    flat_b = jax.tree_util.tree_leaves(via_idea)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_idea_pth_checkpoint_end_to_end(bundle, rng, tmp_path):
    """A synthetic ``groundingdino_swint_ogc.pth``-shaped checkpoint —
    IDEA-Research naming, DDP ``module.`` prefixes, the ``{"model": ...}``
    wrapper the reference unpacks via clean_state_dict
    (prompt_generator.py:46-48) — loaded through the production
    ``build_gdino_from_checkpoint`` path, then one full forward compared
    against the HF-named conversion of the same weights. Closes the
    'IDEA key translation never exercised against a checkpoint file'
    gap without egress."""
    import os

    hf, model, variables, cfg, _ = bundle
    from sola_tpu.trackgen.gdino.convert import build_gdino_from_checkpoint
    from sola_tpu.trackgen.gdino.model import generate_special_token_masks

    idea = _fabricate_idea_state({k: v for k, v in hf.state_dict().items()})
    # the real file also carries entries our model has no use for; the
    # loader must DROP them (clean_state_dict parity), not crash or merge
    idea["bert.pooler.dense.weight"] = torch.zeros(4, 4)
    idea["label_enc.weight"] = torch.zeros(4, 4)
    ckpt = {"model": {f"module.{k}": torch.as_tensor(np.asarray(v))
                      for k, v in idea.items()}}
    path = os.path.join(str(tmp_path), "gdino_idea_synthetic.pth")
    torch.save(ckpt, path)

    loaded_model, loaded_vars, report = build_gdino_from_checkpoint(
        path, cfg=cfg)
    assert report["coverage"] >= 0.99, report
    assert not report["missing"], report["missing"][:10]

    img = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    pmask = np.ones((1, 128, 128), bool)
    ids, tmask = _text_inputs(rng)
    smask, pids = generate_special_token_masks(ids)
    args = (jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(pmask),
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(tmask.astype(np.int32)),
            jnp.asarray(smask), jnp.asarray(pids))
    got = loaded_model.apply(loaded_vars, *args)
    want = model.apply(variables, *args)
    np.testing.assert_array_equal(np.asarray(got["pred_boxes"]),
                                  np.asarray(want["pred_boxes"]))
    np.testing.assert_array_equal(np.asarray(got["pred_logits"]),
                                  np.asarray(want["pred_logits"]))


def test_bf16_forward_tracks_fp32(bundle, rng):
    """The bf16 production mode (prompts_gdino --bf16) must stay numerically
    coherent with fp32: same program, params + canvas cast to bfloat16 at
    the edges, boxes within bf16 tolerance. Guards the dtype-harmonization
    casts in model.py (fp32 PEs / probs promoting bf16 activations back to
    fp32 would silently change both speed and numerics)."""
    _, model, variables, cfg, _ = bundle
    from sola_tpu.trackgen.gdino.model import generate_special_token_masks

    img = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    pmask = np.ones((1, 128, 128), bool)
    ids, tmask = _text_inputs(rng)
    smask, pids = generate_special_token_masks(ids)
    args = (jnp.asarray(pmask), jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(tmask.astype(np.int32)), jnp.asarray(smask),
            jnp.asarray(pids))
    x32 = jnp.asarray(img.transpose(0, 2, 3, 1))

    ref = model.apply(variables, x32, *args)
    v16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    got = model.apply(v16, x32.astype(jnp.bfloat16), *args)

    boxes16 = np.asarray(got["pred_boxes"][0], np.float32)
    boxes32 = np.asarray(ref["pred_boxes"][0], np.float32)
    logits16 = np.asarray(got["pred_logits"][0], np.float32)
    assert np.isfinite(boxes16).all()
    assert np.isfinite(logits16[np.isfinite(
        np.asarray(ref["pred_logits"][0], np.float32))]).all()
    # the two-stage top-k can PERMUTE queries under bf16 (near-tied
    # proposal scores at random init), so rows aren't comparable
    # positionally — assert nearest-neighbor agreement instead: every
    # bf16 box should coincide with SOME fp32 box (the shared survivors
    # of the proposal pool), to bf16 precision for the large majority
    dist = np.abs(boxes16[:, None, :] - boxes32[None, :, :]).max(-1)
    nn = dist.min(axis=1)
    assert np.median(nn) < 0.02, nn
    assert (nn < 0.08).mean() >= 0.75, nn
