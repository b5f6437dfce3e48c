"""GDINO converter structural tests on a fabricated partial state dict."""

import numpy as np
import pytest

import jax

from sola_tpu.trackgen.gdino.convert import (convert_report,
                                             torch_gdino_to_params)
from sola_tpu.trackgen.gdino.model import GDINOConfig, GroundingDINO
from sola_tpu.trackgen.sam2.convert import _merge_with_template


@pytest.fixture(scope="module")
def tiny():
    import jax.numpy as jnp
    cfg = GDINOConfig.tiny_test()
    model = GroundingDINO(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jnp.zeros((1, 6), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, mask)
    return cfg, model, variables


def _fabricate_state(cfg, params, rng):
    """Build a torch-style partial state dict with shapes derived from the
    model tree (inverse layout transforms)."""
    state = {}

    def dense(name, node):
        state[f"{name}.weight"] = np.asarray(node["kernel"]).T + \
            rng.standard_normal(np.asarray(node["kernel"]).T.shape,
                                dtype=np.float32)
        state[f"{name}.bias"] = rng.standard_normal(
            np.asarray(node["bias"]).shape, dtype=np.float32)

    def conv(name, node):
        k = np.asarray(node["kernel"])
        state[f"{name}.weight"] = rng.standard_normal(
            (k.shape[3], k.shape[2], k.shape[0], k.shape[1]),
            dtype=np.float32)
        state[f"{name}.bias"] = rng.standard_normal(
            np.asarray(node["bias"]).shape, dtype=np.float32)

    def ln(name, node):
        state[f"{name}.weight"] = rng.standard_normal(
            np.asarray(node["scale"]).shape, dtype=np.float32)
        state[f"{name}.bias"] = rng.standard_normal(
            np.asarray(node["bias"]).shape, dtype=np.float32)

    bk = params["backbone"]
    conv("backbone.0.patch_embed.proj", bk["patch_embed"])
    ln("backbone.0.patch_embed.norm", bk["patch_norm"])
    for s, depth in enumerate(cfg.swin.depths):
        for b in range(depth):
            blk = bk[f"stage_{s}_block_{b}"]
            t = f"backbone.0.layers.{s}.blocks.{b}"
            ln(f"{t}.norm1", blk["norm1"])
            ln(f"{t}.norm2", blk["norm2"])
            dense(f"{t}.attn.qkv", blk["attn"]["qkv"])
            dense(f"{t}.attn.proj", blk["attn"]["proj"])
            state[f"{t}.attn.relative_position_bias_table"] = \
                rng.standard_normal(
                    np.asarray(blk["attn"]["rel_pos_bias"]).shape,
                    dtype=np.float32)
            dense(f"{t}.mlp.fc1", blk["mlp_0"])
            dense(f"{t}.mlp.fc2", blk["mlp_1"])
        if s < len(cfg.swin.depths) - 1:
            m = bk[f"merge_{s}"]
            t = f"backbone.0.layers.{s}.downsample"
            ln(f"{t}.norm", m["norm"])
            state[f"{t}.reduction.weight"] = np.asarray(
                m["reduction"]["kernel"]).T.copy()
    for s in cfg.swin.out_indices:
        ln(f"backbone.0.norm{s}", bk[f"out_norm_{s}"])

    # bert: reuse the roberta exporter shape conventions
    emb = params["bert"]
    state["bert.embeddings.word_embeddings.weight"] = np.asarray(
        emb["word_emb"]["embedding"])
    state["bert.embeddings.position_embeddings.weight"] = np.asarray(
        emb["pos_emb"]["embedding"])
    state["bert.embeddings.token_type_embeddings.weight"] = np.asarray(
        emb["token_type_emb"])[None]
    ln("bert.embeddings.LayerNorm", emb["emb_ln"])
    for i in range(cfg.text.num_layers):
        layer = emb[f"layer_{i}"]
        t = f"bert.encoder.layer.{i}"
        dense(f"{t}.attention.self.query", layer["query"])
        dense(f"{t}.attention.self.key", layer["key"])
        dense(f"{t}.attention.self.value", layer["value"])
        dense(f"{t}.attention.output.dense", layer["attn_out"])
        ln(f"{t}.attention.output.LayerNorm", layer["attn_ln"])
        dense(f"{t}.intermediate.dense", layer["ffn_in"])
        dense(f"{t}.output.dense", layer["ffn_out"])
        ln(f"{t}.output.LayerNorm", layer["ffn_ln"])

    dense("feat_map", params["feat_map"])
    for i in range(3):
        conv(f"input_proj.{i}.0", params[f"input_proj_{i}"])
        ln(f"input_proj.{i}.1", params[f"input_proj_norm_{i}"])
    conv("input_proj.3.0", params["input_proj_extra"])
    ln("input_proj.3.1", params["input_proj_extra_norm"])
    state["transformer.level_embed"] = rng.standard_normal(
        np.asarray(params["level_embed"]).shape, dtype=np.float32)
    state["transformer.tgt_embed.weight"] = rng.standard_normal(
        np.asarray(params["tgt_embed"]).shape, dtype=np.float32)
    for i in range(cfg.enc_layers):
        da = params[f"enc_{i}"]["deform_attn"]
        t = f"transformer.encoder.layers.{i}.self_attn"
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            dense(f"{t}.{name}", da[name])
    return state


def test_partial_convert_and_merge(tiny, rng):
    cfg, model, variables = tiny
    state = _fabricate_state(cfg, variables["params"], rng)
    converted = torch_gdino_to_params(state, cfg)
    report = convert_report(variables["params"], converted["params"])
    assert report["coverage"] > 0.5
    assert any("backbone" in k for k in report["converted"])
    assert any("fusion" in k for k in report["kept_at_init"])

    merged = _merge_with_template(variables, converted)
    # a grafted leaf must equal the (transposed) checkpoint tensor
    got = np.asarray(merged["params"]["feat_map"]["kernel"])
    np.testing.assert_array_equal(got, state["feat_map.weight"].T)
    got = np.asarray(
        merged["params"]["backbone"]["patch_embed"]["kernel"])
    np.testing.assert_array_equal(
        got, np.transpose(state["backbone.0.patch_embed.proj.weight"],
                          (2, 3, 1, 0)))
    # non-covered leaves keep init values
    fus = merged["params"]["enc_0"]["fusion"]["img_q"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(fus),
        np.asarray(variables["params"]["enc_0"]["fusion"]["img_q"]
                   ["kernel"]))


def test_merged_model_runs(tiny, rng):
    import jax.numpy as jnp
    cfg, model, variables = tiny
    state = _fabricate_state(cfg, variables["params"], rng)
    merged = _merge_with_template(variables,
                                  torch_gdino_to_params(state, cfg))
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jnp.asarray([[0, 5, 9, 2]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    out = model.apply(merged, img, ids, mask)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
