"""GroundingDINO checkpoint conversion -> JAX params.

Two torch naming schemes are supported:

* **IDEA-Research naming** — the ``groundingdino_swint_ogc.pth`` format the
  reference loads through SLConfig/clean_state_dict
  (prompt_generator.py:41-57). Handled by translating keys to the HF scheme
  first (`idea_to_hf_keys`), then running the one validated core converter.
* **HF transformers naming** (``GroundingDinoForObjectDetection``) — the
  core path, validated weight-for-weight against a random-init HF model in
  tests/test_gdino_hf_parity.py (100% coverage asserted).

Layout transforms are the usual torch->flax ones: Linear (O,I)->(I,O),
Conv (O,I,kh,kw)->(kh,kw,I,O); fused qkv kernels are built by concatenating
q/k/v along the output axis.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np

from sola_tpu.trackgen.gdino.model import GDINOConfig, GroundingDINO


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _dense(state, name):
    return {"kernel": _np(state[f"{name}.weight"]).T,
            "bias": _np(state[f"{name}.bias"])}


def _dense_nobias(state, name):
    return {"kernel": _np(state[f"{name}.weight"]).T}


def _conv(state, name):
    return {"kernel": np.transpose(_np(state[f"{name}.weight"]),
                                   (2, 3, 1, 0)),
            "bias": _np(state[f"{name}.bias"])}


def _ln(state, name):
    return {"scale": _np(state[f"{name}.weight"]),
            "bias": _np(state[f"{name}.bias"])}


def _mlp_head(state, name, n):
    return {f"layer_{i}": _dense(state, f"{name}.layers.{i}")
            for i in range(n)}


def _mha(state, name):
    return {proj: _dense(state, f"{name}.{proj}")
            for proj in ("query", "key", "value", "out_proj")}


def _fused_qkv(state, name):
    """HF split q/k/v -> one flax Dense(3d) kernel."""
    ws = [_np(state[f"{name}.{p}.weight"]).T for p in ("query", "key",
                                                       "value")]
    bs = [_np(state[f"{name}.{p}.bias"]) for p in ("query", "key", "value")]
    return {"kernel": np.concatenate(ws, axis=1),
            "bias": np.concatenate(bs)}


def hf_gdino_to_params(state: dict, cfg: GDINOConfig) -> dict:
    """HF GroundingDinoForObjectDetection state_dict -> {"params": ...}."""
    p: dict = {}

    # ---- Swin backbone ----
    sw = "model.backbone.conv_encoder.model"
    swin = {
        "patch_embed": _conv(state, f"{sw}.embeddings.patch_embeddings"
                                    ".projection"),
        "patch_norm": _ln(state, f"{sw}.embeddings.norm"),
    }
    scfg = cfg.swin
    for s, depth in enumerate(scfg.depths):
        for b in range(depth):
            t = f"{sw}.encoder.layers.{s}.blocks.{b}"
            swin[f"stage_{s}_block_{b}"] = {
                "norm1": _ln(state, f"{t}.layernorm_before"),
                "norm2": _ln(state, f"{t}.layernorm_after"),
                "attn": {
                    "qkv": _fused_qkv(state, f"{t}.attention.self"),
                    "proj": _dense(state, f"{t}.attention.output.dense"),
                    "rel_pos_bias": _np(state[
                        f"{t}.attention.self.relative_position_bias_table"]),
                },
                "mlp_0": _dense(state, f"{t}.intermediate.dense"),
                "mlp_1": _dense(state, f"{t}.output.dense"),
            }
        if s < len(scfg.depths) - 1:
            t = f"{sw}.encoder.layers.{s}.downsample"
            swin[f"merge_{s}"] = {
                "norm": _ln(state, f"{t}.norm"),
                "reduction": _dense_nobias(state, f"{t}.reduction"),
            }
    for idx, stage in enumerate(scfg.out_indices):
        swin[f"out_norm_{stage}"] = _ln(
            state, f"{sw}.hidden_states_norms.stage{stage + 1}")
    p["backbone"] = swin

    # ---- text backbone + projection ----
    tb = "model.text_backbone"
    bert = {
        "word_emb": {"embedding": _np(
            state[f"{tb}.embeddings.word_embeddings.weight"])},
        "pos_emb": {"embedding": _np(
            state[f"{tb}.embeddings.position_embeddings.weight"])},
        # token_type_ids are always 0 in GDINO: keep row 0 only
        "token_type_emb": _np(
            state[f"{tb}.embeddings.token_type_embeddings.weight"])[0],
        "emb_ln": _ln(state, f"{tb}.embeddings.LayerNorm"),
    }
    for i in range(cfg.text.num_layers):
        t = f"{tb}.encoder.layer.{i}"
        bert[f"layer_{i}"] = {
            "query": _dense(state, f"{t}.attention.self.query"),
            "key": _dense(state, f"{t}.attention.self.key"),
            "value": _dense(state, f"{t}.attention.self.value"),
            "attn_out": _dense(state, f"{t}.attention.output.dense"),
            "attn_ln": _ln(state, f"{t}.attention.output.LayerNorm"),
            "ffn_in": _dense(state, f"{t}.intermediate.dense"),
            "ffn_out": _dense(state, f"{t}.output.dense"),
            "ffn_ln": _ln(state, f"{t}.output.LayerNorm"),
        }
    p["bert"] = bert
    p["feat_map"] = _dense(state, "model.text_projection")

    # ---- input projections + level embedding ----
    for i in range(cfg.n_levels):
        p[f"input_proj_{i}"] = _conv(state, f"model.input_proj_vision.{i}.0")
        p[f"input_proj_norm_{i}"] = _ln(state,
                                        f"model.input_proj_vision.{i}.1")
    p["level_embed"] = _np(state["model.level_embed"])

    # ---- encoder layers ----
    def deform(name):
        return {k: _dense(state, f"{name}.{k}")
                for k in ("sampling_offsets", "attention_weights",
                          "value_proj", "output_proj")}

    for i in range(cfg.enc_layers):
        t = f"model.encoder.layers.{i}"
        p[f"enc_{i}"] = {
            "fusion_layer": {
                "layer_norm_vision": _ln(state,
                                         f"{t}.fusion_layer.layer_norm_vision"),
                "layer_norm_text": _ln(state,
                                       f"{t}.fusion_layer.layer_norm_text"),
                "vision_param": _np(state[f"{t}.fusion_layer.vision_param"]),
                "text_param": _np(state[f"{t}.fusion_layer.text_param"]),
                "attn": {k: _dense(state, f"{t}.fusion_layer.attn.{k}")
                         for k in ("vision_proj", "text_proj",
                                   "values_vision_proj", "values_text_proj",
                                   "out_vision_proj", "out_text_proj")},
            },
            "text_enhancer_layer": {
                "self_attn": _mha(state, f"{t}.text_enhancer_layer.self_attn"),
                "fc1": _dense(state, f"{t}.text_enhancer_layer.fc1"),
                "fc2": _dense(state, f"{t}.text_enhancer_layer.fc2"),
                "layer_norm_before": _ln(
                    state, f"{t}.text_enhancer_layer.layer_norm_before"),
                "layer_norm_after": _ln(
                    state, f"{t}.text_enhancer_layer.layer_norm_after"),
            },
            "deformable_layer": {
                "self_attn": deform(f"{t}.deformable_layer.self_attn"),
                "self_attn_layer_norm": _ln(
                    state, f"{t}.deformable_layer.self_attn_layer_norm"),
                "fc1": _dense(state, f"{t}.deformable_layer.fc1"),
                "fc2": _dense(state, f"{t}.deformable_layer.fc2"),
                "final_layer_norm": _ln(
                    state, f"{t}.deformable_layer.final_layer_norm"),
            },
        }

    # ---- query selection ----
    p["enc_output"] = _dense(state, "model.enc_output")
    p["enc_output_norm"] = _ln(state, "model.enc_output_norm")
    p["encoder_output_bbox_embed"] = _mlp_head(
        state, "model.encoder_output_bbox_embed", 3)
    p["query_embed"] = _np(state["model.query_position_embeddings.weight"])

    # ---- decoder ----
    for i in range(cfg.dec_layers):
        t = f"model.decoder.layers.{i}"
        p[f"dec_{i}"] = {
            "self_attn": _mha(state, f"{t}.self_attn"),
            "self_attn_layer_norm": _ln(state, f"{t}.self_attn_layer_norm"),
            "encoder_attn_text": _mha(state, f"{t}.encoder_attn_text"),
            "encoder_attn_text_layer_norm": _ln(
                state, f"{t}.encoder_attn_text_layer_norm"),
            "encoder_attn": deform(f"{t}.encoder_attn"),
            "encoder_attn_layer_norm": _ln(state,
                                           f"{t}.encoder_attn_layer_norm"),
            "fc1": _dense(state, f"{t}.fc1"),
            "fc2": _dense(state, f"{t}.fc2"),
            "final_layer_norm": _ln(state, f"{t}.final_layer_norm"),
        }
    p["decoder_layer_norm"] = _ln(state, "model.decoder.layer_norm")
    p["reference_points_head"] = _mlp_head(
        state, "model.decoder.reference_points_head", 2)
    # decoder_bbox_embed_share=True: one shared head (all list entries tied)
    p["bbox_embed"] = _mlp_head(state, "bbox_embed.0", 3)

    return {"params": p}


# ---------------------------------------------------------------------------
# IDEA-Research naming -> HF naming
# ---------------------------------------------------------------------------

_IDEA_RULES = [
    (r"^backbone\.0\.patch_embed\.proj\.",
     "model.backbone.conv_encoder.model.embeddings.patch_embeddings.projection."),
    (r"^backbone\.0\.patch_embed\.norm\.",
     "model.backbone.conv_encoder.model.embeddings.norm."),
    (r"^backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.norm1\.",
     r"model.backbone.conv_encoder.model.encoder.layers.\1.blocks.\2.layernorm_before."),
    (r"^backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.norm2\.",
     r"model.backbone.conv_encoder.model.encoder.layers.\1.blocks.\2.layernorm_after."),
    (r"^backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.attn\.proj\.",
     r"model.backbone.conv_encoder.model.encoder.layers.\1.blocks.\2.attention.output.dense."),
    (r"^backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.attn\.relative_position_bias_table",
     r"model.backbone.conv_encoder.model.encoder.layers.\1.blocks.\2.attention.self.relative_position_bias_table"),
    (r"^backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.mlp\.fc1\.",
     r"model.backbone.conv_encoder.model.encoder.layers.\1.blocks.\2.intermediate.dense."),
    (r"^backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.mlp\.fc2\.",
     r"model.backbone.conv_encoder.model.encoder.layers.\1.blocks.\2.output.dense."),
    (r"^backbone\.0\.layers\.(\d+)\.downsample\.",
     r"model.backbone.conv_encoder.model.encoder.layers.\1.downsample."),
    (r"^backbone\.0\.norm1\.",
     "model.backbone.conv_encoder.model.hidden_states_norms.stage2."),
    (r"^backbone\.0\.norm2\.",
     "model.backbone.conv_encoder.model.hidden_states_norms.stage3."),
    (r"^backbone\.0\.norm3\.",
     "model.backbone.conv_encoder.model.hidden_states_norms.stage4."),
    (r"^bert\.", "model.text_backbone."),
    (r"^feat_map\.", "model.text_projection."),
    (r"^input_proj\.(\d+)\.", r"model.input_proj_vision.\1."),
    (r"^transformer\.level_embed$", "model.level_embed"),
    # encoder: deformable / text / fusion sub-layers
    (r"^transformer\.encoder\.layers\.(\d+)\.self_attn\.",
     r"model.encoder.layers.\1.deformable_layer.self_attn."),
    (r"^transformer\.encoder\.layers\.(\d+)\.norm1\.",
     r"model.encoder.layers.\1.deformable_layer.self_attn_layer_norm."),
    (r"^transformer\.encoder\.layers\.(\d+)\.linear1\.",
     r"model.encoder.layers.\1.deformable_layer.fc1."),
    (r"^transformer\.encoder\.layers\.(\d+)\.linear2\.",
     r"model.encoder.layers.\1.deformable_layer.fc2."),
    (r"^transformer\.encoder\.layers\.(\d+)\.norm2\.",
     r"model.encoder.layers.\1.deformable_layer.final_layer_norm."),
    (r"^transformer\.encoder\.text_layers\.(\d+)\.self_attn\.out_proj\.",
     r"model.encoder.layers.\1.text_enhancer_layer.self_attn.out_proj."),
    (r"^transformer\.encoder\.text_layers\.(\d+)\.linear1\.",
     r"model.encoder.layers.\1.text_enhancer_layer.fc1."),
    (r"^transformer\.encoder\.text_layers\.(\d+)\.linear2\.",
     r"model.encoder.layers.\1.text_enhancer_layer.fc2."),
    (r"^transformer\.encoder\.text_layers\.(\d+)\.norm1\.",
     r"model.encoder.layers.\1.text_enhancer_layer.layer_norm_before."),
    (r"^transformer\.encoder\.text_layers\.(\d+)\.norm2\.",
     r"model.encoder.layers.\1.text_enhancer_layer.layer_norm_after."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.layer_norm_v\.",
     r"model.encoder.layers.\1.fusion_layer.layer_norm_vision."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.layer_norm_l\.",
     r"model.encoder.layers.\1.fusion_layer.layer_norm_text."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.gamma_v$",
     r"model.encoder.layers.\1.fusion_layer.vision_param"),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.gamma_l$",
     r"model.encoder.layers.\1.fusion_layer.text_param"),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.attn\.v_proj\.",
     r"model.encoder.layers.\1.fusion_layer.attn.vision_proj."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.attn\.l_proj\.",
     r"model.encoder.layers.\1.fusion_layer.attn.text_proj."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.attn\.values_v_proj\.",
     r"model.encoder.layers.\1.fusion_layer.attn.values_vision_proj."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.attn\.values_l_proj\.",
     r"model.encoder.layers.\1.fusion_layer.attn.values_text_proj."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.attn\.out_v_proj\.",
     r"model.encoder.layers.\1.fusion_layer.attn.out_vision_proj."),
    (r"^transformer\.encoder\.fusion_layers\.(\d+)\.attn\.out_l_proj\.",
     r"model.encoder.layers.\1.fusion_layer.attn.out_text_proj."),
    # decoder
    (r"^transformer\.decoder\.layers\.(\d+)\.cross_attn\.",
     r"model.decoder.layers.\1.encoder_attn."),
    (r"^transformer\.decoder\.layers\.(\d+)\.norm1\.",
     r"model.decoder.layers.\1.encoder_attn_layer_norm."),
    (r"^transformer\.decoder\.layers\.(\d+)\.ca_text\.out_proj\.",
     r"model.decoder.layers.\1.encoder_attn_text.out_proj."),
    (r"^transformer\.decoder\.layers\.(\d+)\.catext_norm\.",
     r"model.decoder.layers.\1.encoder_attn_text_layer_norm."),
    (r"^transformer\.decoder\.layers\.(\d+)\.self_attn\.out_proj\.",
     r"model.decoder.layers.\1.self_attn.out_proj."),
    (r"^transformer\.decoder\.layers\.(\d+)\.norm2\.",
     r"model.decoder.layers.\1.self_attn_layer_norm."),
    (r"^transformer\.decoder\.layers\.(\d+)\.linear1\.",
     r"model.decoder.layers.\1.fc1."),
    (r"^transformer\.decoder\.layers\.(\d+)\.linear2\.",
     r"model.decoder.layers.\1.fc2."),
    (r"^transformer\.decoder\.layers\.(\d+)\.norm3\.",
     r"model.decoder.layers.\1.final_layer_norm."),
    (r"^transformer\.decoder\.norm\.", "model.decoder.layer_norm."),
    (r"^transformer\.decoder\.ref_point_head\.",
     "model.decoder.reference_points_head."),
    (r"^transformer\.decoder\.bbox_embed\.(\d+)\.", r"bbox_embed.\1."),
    (r"^bbox_embed\.(\d+)\.", r"bbox_embed.\1."),
    (r"^transformer\.enc_output\.", "model.enc_output."),
    (r"^transformer\.enc_output_norm\.", "model.enc_output_norm."),
    (r"^transformer\.enc_out_bbox_embed\.",
     "model.encoder_output_bbox_embed."),
    (r"^transformer\.tgt_embed\.weight$",
     "model.query_position_embeddings.weight"),
]

# keys with no JAX counterpart (pooler, buffers, unused heads)
_IDEA_DROP = (
    "bert.pooler.", "transformer.enc_out_class_embed",
    "label_enc", ".relative_position_index", ".attn_mask",
    "bert.embeddings.position_ids",
)


def idea_to_hf_keys(state: dict) -> dict:
    """Translate IDEA-Research checkpoint keys to the HF scheme; splits the
    fused torch MultiheadAttention/Swin qkv projections into q/k/v."""
    out = {}
    for key, value in state.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if any(d in key for d in _IDEA_DROP):
            continue
        # fused projections -> split
        m = re.match(r"^backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.attn"
                     r"\.qkv\.(weight|bias)$", key)
        if m:
            s, b, kind = m.groups()
            v = _np(value)
            d = v.shape[0] // 3
            base = (f"model.backbone.conv_encoder.model.encoder.layers.{s}"
                    f".blocks.{b}.attention.self")
            for i, proj in enumerate(("query", "key", "value")):
                out[f"{base}.{proj}.{kind}"] = v[i * d:(i + 1) * d]
            continue
        m = re.match(r"^transformer\.encoder\.text_layers\.(\d+)\.self_attn"
                     r"\.in_proj_(weight|bias)$", key)
        if m:
            i, kind = m.groups()
            v = _np(value)
            d = v.shape[0] // 3
            base = f"model.encoder.layers.{i}.text_enhancer_layer.self_attn"
            for j, proj in enumerate(("query", "key", "value")):
                out[f"{base}.{proj}.{'weight' if kind == 'weight' else 'bias'}"] = \
                    v[j * d:(j + 1) * d]
            continue
        m = re.match(r"^transformer\.decoder\.layers\.(\d+)\.(self_attn|"
                     r"ca_text)\.in_proj_(weight|bias)$", key)
        if m:
            i, which, kind = m.groups()
            v = _np(value)
            d = v.shape[0] // 3
            hf_which = ("self_attn" if which == "self_attn"
                        else "encoder_attn_text")
            base = f"model.decoder.layers.{i}.{hf_which}"
            for j, proj in enumerate(("query", "key", "value")):
                out[f"{base}.{proj}.{kind}"] = v[j * d:(j + 1) * d]
            continue
        name = key
        for pat, rep in _IDEA_RULES:
            new = re.sub(pat, rep, name)
            if new != name:
                name = new
                break
        out[name] = value
    return out


def torch_gdino_to_params(state: dict, cfg: GDINOConfig) -> dict:
    """Convert either naming scheme (auto-detected)."""
    is_idea = any(k.startswith(("transformer.", "backbone.0.", "module."))
                  for k in state)
    if is_idea:
        return hf_gdino_to_params(idea_to_hf_keys(state), cfg)
    return hf_gdino_to_params(state, cfg)


def _merge_with_template(template: dict, converted: dict) -> dict:
    import numpy as _n

    report = {"missing": [], "extra": []}

    def merge(tpl, conv, path=""):
        if isinstance(tpl, dict):
            out = {}
            for k, v in tpl.items():
                if isinstance(conv, dict) and k in conv:
                    out[k] = merge(v, conv[k], f"{path}/{k}")
                else:
                    report["missing"].append(f"{path}/{k}")
                    out[k] = v
            if isinstance(conv, dict):
                for k in conv:
                    if k not in tpl:
                        report["extra"].append(f"{path}/{k}")
            return out
        arr = _n.asarray(conv)
        assert arr.shape == _n.asarray(tpl).shape, (
            f"shape mismatch at {path}: ckpt {arr.shape} vs model "
            f"{_n.asarray(tpl).shape}")
        return arr

    merged = {c: merge(template[c], converted.get(c, {}), c)
              for c in template}
    return merged, report


def conversion_coverage(template: dict, converted: dict) -> float:
    """Fraction of model leaves assigned by the conversion."""
    def leaves(tree):
        n = 0
        for v in tree.values():
            n += leaves(v) if isinstance(v, dict) else 1
        return n

    def assigned(tpl, conv):
        n = 0
        for k, v in tpl.items():
            if isinstance(conv, dict) and k in conv:
                n += assigned(v, conv[k]) if isinstance(v, dict) else 1
        return n

    total = sum(leaves(template[c]) for c in template)
    got = sum(assigned(template[c], converted.get(c, {})) for c in template)
    return got / max(total, 1)


def build_gdino_from_checkpoint(ckpt_path: str,
                                cfg: Optional[GDINOConfig] = None,
                                seed: int = 0):
    import jax
    import jax.numpy as jnp

    cfg = cfg or GDINOConfig()
    model = GroundingDINO(cfg)
    s = cfg.size_target
    img = jnp.zeros((1, s, s, 3), jnp.float32)
    pmask = jnp.ones((1, s, s), bool)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), img, pmask, ids, mask)
    report = {"coverage": 0.0, "missing": [], "extra": []}
    if ckpt_path and os.path.exists(ckpt_path):
        import torch
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        state = ckpt.get("model", ckpt)
        converted = torch_gdino_to_params(state, cfg)
        coverage = conversion_coverage(variables, converted)
        variables, mreport = _merge_with_template(variables, converted)
        report = {"coverage": coverage, **mreport}
        # converter regression floor: a silent fallback to random init for
        # any parameter family is a bug, not a degraded mode
        assert coverage >= 0.99, (
            f"GDINO conversion coverage {coverage:.3f} < 0.99; missing "
            f"{mreport['missing'][:8]}")
    return model, variables, report
