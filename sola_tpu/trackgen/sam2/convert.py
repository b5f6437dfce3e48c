"""SAM2 checkpoint conversion: torch ``sam2_hiera_*.pt`` -> JAX params.

Maps the upstream SAM2 state_dict naming (the ``model`` entry of the
checkpoints the reference loads at generate_tokens_grid.py:28-29) onto the
SAM2Model parameter tree. Layout transforms:

    torch Conv2d   (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
    torch ConvT2d  (I, O, kh, kw) -> flax ConvTranspose kernel
                                     (kh, kw, I, O), spatially flipped
    torch Linear   (O, I)         -> flax Dense kernel (I, O)
    torch LN/param vectors        -> as-is (weight -> scale)

``strict=True`` asserts every checkpoint tensor is consumed and every model
parameter is assigned — the structural contract a converter can verify
without the original weights on disk.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv(state, name):
    return {"kernel": np.transpose(_np(state[f"{name}.weight"]),
                                   (2, 3, 1, 0)),
            "bias": _np(state[f"{name}.bias"])}


def _convT(state, name):
    # torch ConvTranspose2d computes the *gradient-of-conv* (implicitly
    # flipped kernel); flax ConvTranspose(transpose_kernel=False) does a
    # fractionally-strided conv with the kernel as-is — so the spatial dims
    # must be flipped in the mapping (verified numerically vs torch in
    # tests/test_sam2_torch_oracle.py).
    w = np.transpose(_np(state[f"{name}.weight"]), (2, 3, 0, 1))
    return {"kernel": w[::-1, ::-1].copy(),
            "bias": _np(state[f"{name}.bias"])}


def _dense(state, name):
    return {"kernel": _np(state[f"{name}.weight"]).T,
            "bias": _np(state[f"{name}.bias"])}


def _ln(state, name):
    return {"scale": _np(state[f"{name}.weight"]),
            "bias": _np(state[f"{name}.bias"])}


def _mlp(state, name, n_layers):
    return {f"layer_{i}": _dense(state, f"{name}.layers.{i}")
            for i in range(n_layers)}


def _attn(state, name):
    return {proj: _dense(state, f"{name}.{proj}")
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj")}


def torch_sam2_to_params(state: dict, cfg: SAM2Config) -> dict:
    """Convert an upstream state_dict to {"params": ..., "buffers": ...}."""
    p: dict = {}
    b: dict = {}

    # ---- image encoder trunk (Hiera) ----
    from sola_tpu.trackgen.sam2.hiera import hiera_segments
    trunk = {"patch_embed": _conv(state, "image_encoder.trunk.patch_embed.proj")}
    trunk["pos_embed"] = _np(state["image_encoder.trunk.pos_embed"])[0]\
        .transpose(1, 2, 0)
    trunk["pos_embed_window"] = _np(
        state["image_encoder.trunk.pos_embed_window"])[0].transpose(1, 2, 0)

    def block_params(i):
        t = f"image_encoder.trunk.blocks.{i}"
        blk = {
            "norm1": _ln(state, f"{t}.norm1"),
            "norm2": _ln(state, f"{t}.norm2"),
            "attn": {"qkv": _dense(state, f"{t}.attn.qkv"),
                     "proj": _dense(state, f"{t}.attn.proj")},
            "mlp_0": _dense(state, f"{t}.mlp.layers.0"),
            "mlp_1": _dense(state, f"{t}.mlp.layers.1"),
        }
        if f"{t}.proj.weight" in state:
            blk["proj"] = _dense(state, f"{t}.proj")
        return blk

    def stack_tree(trees):
        import jax
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0),
                                      *trees)

    for seg in hiera_segments(cfg.image_encoder.hiera):
        if seg[0] == "single":
            trunk[f"block_{seg[1]}"] = block_params(seg[1])
        else:
            _, start, n, _ = seg
            trunk[f"run_{start}"] = {"block": stack_tree(
                [block_params(start + k) for k in range(n)])}
    # ---- FPN neck: upstream convs are coarsest-first; ours finest-first ----
    n_levels = 4
    neck = {}
    for i in range(n_levels):
        neck[f"conv_{n_levels - 1 - i}"] = _conv(
            state, f"image_encoder.neck.convs.{i}.conv")
    p["image_encoder"] = {"trunk": trunk, "neck": neck}

    # ---- prompt encoder ----
    pe = {
        "point_embeddings": np.stack([
            _np(state[f"sam_prompt_encoder.point_embeddings.{i}.weight"])[0]
            for i in range(4)], axis=0),
        "not_a_point_embed": _np(
            state["sam_prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask_embed": _np(
            state["sam_prompt_encoder.no_mask_embed.weight"])[0],
        "mask_conv1": _conv(state, "sam_prompt_encoder.mask_downscaling.0"),
        "mask_ln1": _ln(state, "sam_prompt_encoder.mask_downscaling.1"),
        "mask_conv2": _conv(state, "sam_prompt_encoder.mask_downscaling.3"),
        "mask_ln2": _ln(state, "sam_prompt_encoder.mask_downscaling.4"),
        "mask_conv3": _conv(state, "sam_prompt_encoder.mask_downscaling.6"),
    }
    pe_buf = {"pe_layer": {"positional_encoding_gaussian_matrix": _np(
        state["sam_prompt_encoder.pe_layer."
              "positional_encoding_gaussian_matrix"])}}
    p["prompt_encoder"] = pe
    b["prompt_encoder"] = pe_buf

    # ---- mask decoder ----
    md: dict = {
        "iou_token": _np(state["sam_mask_decoder.iou_token.weight"]),
        "mask_tokens": _np(state["sam_mask_decoder.mask_tokens.weight"]),
        "upscale_conv1": _convT(state,
                                "sam_mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln(state, "sam_mask_decoder.output_upscaling.1"),
        "upscale_conv2": _convT(state,
                                "sam_mask_decoder.output_upscaling.3"),
        "iou_head": _mlp(state, "sam_mask_decoder.iou_prediction_head",
                         cfg.mask_decoder.iou_head_depth),
    }
    if cfg.mask_decoder.pred_obj_scores:
        md["obj_score_token"] = _np(
            state["sam_mask_decoder.obj_score_token.weight"])
        if "sam_mask_decoder.pred_obj_score_head.layers.0.weight" in state:
            md["obj_score_head"] = _mlp(
                state, "sam_mask_decoder.pred_obj_score_head", 3)
        else:
            md["obj_score_head"] = _dense(
                state, "sam_mask_decoder.pred_obj_score_head")
    for i in range(cfg.mask_decoder.num_mask_tokens):
        md[f"hyper_mlp_{i}"] = _mlp(
            state, f"sam_mask_decoder.output_hypernetworks_mlps.{i}", 3)
    tr: dict = {}
    for i in range(cfg.mask_decoder.transformer_depth):
        t = f"sam_mask_decoder.transformer.layers.{i}"
        tr[f"layer_{i}"] = {
            "self_attn": _attn(state, f"{t}.self_attn"),
            "cross_attn_t2i": _attn(state,
                                    f"{t}.cross_attn_token_to_image"),
            "cross_attn_i2t": _attn(state,
                                    f"{t}.cross_attn_image_to_token"),
            "norm1": _ln(state, f"{t}.norm1"),
            "norm2": _ln(state, f"{t}.norm2"),
            "norm3": _ln(state, f"{t}.norm3"),
            "norm4": _ln(state, f"{t}.norm4"),
            "mlp_0": _dense(state, f"{t}.mlp.lin1"),
            "mlp_1": _dense(state, f"{t}.mlp.lin2"),
        }
    tr["final_attn"] = _attn(
        state, "sam_mask_decoder.transformer.final_attn_token_to_image")
    tr["norm_final"] = _ln(state,
                           "sam_mask_decoder.transformer.norm_final_attn")
    md["transformer"] = tr
    p["mask_decoder"] = md
    p["conv_s0"] = _conv(state, "sam_mask_decoder.conv_s0")
    p["conv_s1"] = _conv(state, "sam_mask_decoder.conv_s1")

    # ---- memory attention (scanned: per-layer params stacked) ----
    def mem_layer(i):
        t = f"memory_attention.layers.{i}"
        return {
            "self_attn": _attn(state, f"{t}.self_attn"),
            "cross_attn": _attn(state, f"{t}.cross_attn_image"),
            "norm1": _ln(state, f"{t}.norm1"),
            "norm2": _ln(state, f"{t}.norm2"),
            "norm3": _ln(state, f"{t}.norm3"),
            "linear1": _dense(state, f"{t}.linear1"),
            "linear2": _dense(state, f"{t}.linear2"),
        }

    import jax as _jax
    stacked_layers = _jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0),
        *[mem_layer(i) for i in range(cfg.memory_attention.num_layers)])
    p["memory_attention"] = {
        "norm": _ln(state, "memory_attention.norm"),
        "layers": {"layer": stacked_layers},
    }

    # ---- memory encoder ----
    n_ds = cfg.memory_encoder.mask_downsample_layers
    mds = {}
    for i in range(n_ds):
        mds[f"conv_{i}"] = _conv(
            state, f"memory_encoder.mask_downsampler.encoder.{3 * i}")
        mds[f"ln_{i}"] = _ln(
            state, f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}")
    mds["conv_out"] = _conv(
        state, f"memory_encoder.mask_downsampler.encoder.{3 * n_ds}")
    me: dict = {
        "mask_downsampler": mds,
        "pix_feat_proj": _conv(state, "memory_encoder.pix_feat_proj"),
        "out_proj": _conv(state, "memory_encoder.out_proj"),
    }
    for i in range(cfg.memory_encoder.fuser_layers):
        t = f"memory_encoder.fuser.layers.{i}"
        me[f"fuser_{i}"] = {
            "dwconv": _conv(state, f"{t}.dwconv"),
            "norm": _ln(state, f"{t}.norm"),
            "pwconv1": _dense(state, f"{t}.pwconv1"),
            "pwconv2": _dense(state, f"{t}.pwconv2"),
            "gamma": _np(state[f"{t}.gamma"]),
        }
    p["memory_encoder"] = me

    # ---- top-level params ----
    p["no_mem_embed"] = _np(state["no_mem_embed"])  # (1, 1, d), as upstream
    p["maskmem_tpos_enc"] = _np(state["maskmem_tpos_enc"])
    p["no_obj_ptr"] = _np(state["no_obj_ptr"])
    p["obj_ptr_proj"] = _mlp(state, "obj_ptr_proj", 3)

    return {"params": p, "buffers": b}


def params_to_torch_sam2(variables: dict, cfg: SAM2Config) -> dict:
    """Inverse conversion: SAM2Model variables -> upstream state_dict naming
    (torch layouts). Used for export and for converter roundtrip tests."""
    p = variables["params"]
    b = variables.get("buffers", {})
    out: dict = {}

    def put_conv(name, node):
        out[f"{name}.weight"] = np.transpose(np.asarray(node["kernel"]),
                                             (3, 2, 0, 1))
        out[f"{name}.bias"] = np.asarray(node["bias"])

    def put_convT(name, node):
        # inverse of _convT: un-flip spatial dims, then (kh,kw,I,O)->(I,O,kh,kw)
        k = np.asarray(node["kernel"])[::-1, ::-1]
        out[f"{name}.weight"] = np.transpose(k, (2, 3, 0, 1)).copy()
        out[f"{name}.bias"] = np.asarray(node["bias"])

    def put_dense(name, node):
        out[f"{name}.weight"] = np.asarray(node["kernel"]).T
        out[f"{name}.bias"] = np.asarray(node["bias"])

    def put_ln(name, node):
        out[f"{name}.weight"] = np.asarray(node["scale"])
        out[f"{name}.bias"] = np.asarray(node["bias"])

    def put_mlp(name, node, n):
        for i in range(n):
            put_dense(f"{name}.layers.{i}", node[f"layer_{i}"])

    def put_attn(name, node):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_dense(f"{name}.{proj}", node[proj])

    from sola_tpu.trackgen.sam2.hiera import hiera_segments
    trunk = p["image_encoder"]["trunk"]
    put_conv("image_encoder.trunk.patch_embed.proj", trunk["patch_embed"])
    out["image_encoder.trunk.pos_embed"] = np.asarray(
        trunk["pos_embed"]).transpose(2, 0, 1)[None]
    out["image_encoder.trunk.pos_embed_window"] = np.asarray(
        trunk["pos_embed_window"]).transpose(2, 0, 1)[None]

    def put_block(i, blk):
        t = f"image_encoder.trunk.blocks.{i}"
        put_ln(f"{t}.norm1", blk["norm1"])
        put_ln(f"{t}.norm2", blk["norm2"])
        put_dense(f"{t}.attn.qkv", blk["attn"]["qkv"])
        put_dense(f"{t}.attn.proj", blk["attn"]["proj"])
        put_dense(f"{t}.mlp.layers.0", blk["mlp_0"])
        put_dense(f"{t}.mlp.layers.1", blk["mlp_1"])
        if "proj" in blk:
            put_dense(f"{t}.proj", blk["proj"])

    for seg in hiera_segments(cfg.image_encoder.hiera):
        if seg[0] == "single":
            put_block(seg[1], trunk[f"block_{seg[1]}"])
        else:
            import jax
            _, start, n, _ = seg
            stacked = trunk[f"run_{start}"]["block"]
            for k in range(n):
                blk = jax.tree_util.tree_map(lambda x: np.asarray(x)[k],
                                             stacked)
                put_block(start + k, blk)
    for i in range(4):
        put_conv(f"image_encoder.neck.convs.{i}.conv",
                 p["image_encoder"]["neck"][f"conv_{3 - i}"])

    pe = p["prompt_encoder"]
    for i in range(4):
        out[f"sam_prompt_encoder.point_embeddings.{i}.weight"] = \
            np.asarray(pe["point_embeddings"])[i][None]
    out["sam_prompt_encoder.not_a_point_embed.weight"] = np.asarray(
        pe["not_a_point_embed"])[None]
    out["sam_prompt_encoder.no_mask_embed.weight"] = np.asarray(
        pe["no_mask_embed"])[None]
    put_conv("sam_prompt_encoder.mask_downscaling.0", pe["mask_conv1"])
    put_ln("sam_prompt_encoder.mask_downscaling.1", pe["mask_ln1"])
    put_conv("sam_prompt_encoder.mask_downscaling.3", pe["mask_conv2"])
    put_ln("sam_prompt_encoder.mask_downscaling.4", pe["mask_ln2"])
    put_conv("sam_prompt_encoder.mask_downscaling.6", pe["mask_conv3"])
    out["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        np.asarray(b["prompt_encoder"]["pe_layer"]
                   ["positional_encoding_gaussian_matrix"])

    md = p["mask_decoder"]
    out["sam_mask_decoder.iou_token.weight"] = np.asarray(md["iou_token"])
    out["sam_mask_decoder.mask_tokens.weight"] = np.asarray(
        md["mask_tokens"])
    if cfg.mask_decoder.pred_obj_scores:
        out["sam_mask_decoder.obj_score_token.weight"] = np.asarray(
            md["obj_score_token"])
        if cfg.mask_decoder.pred_obj_scores_mlp:
            put_mlp("sam_mask_decoder.pred_obj_score_head",
                    md["obj_score_head"], 3)
        else:
            put_dense("sam_mask_decoder.pred_obj_score_head",
                      md["obj_score_head"])
    put_convT("sam_mask_decoder.output_upscaling.0", md["upscale_conv1"])
    put_ln("sam_mask_decoder.output_upscaling.1", md["upscale_ln"])
    put_convT("sam_mask_decoder.output_upscaling.3", md["upscale_conv2"])
    put_mlp("sam_mask_decoder.iou_prediction_head", md["iou_head"],
            cfg.mask_decoder.iou_head_depth)
    for i in range(cfg.mask_decoder.num_mask_tokens):
        put_mlp(f"sam_mask_decoder.output_hypernetworks_mlps.{i}",
                md[f"hyper_mlp_{i}"], 3)
    for i in range(cfg.mask_decoder.transformer_depth):
        layer = md["transformer"][f"layer_{i}"]
        t = f"sam_mask_decoder.transformer.layers.{i}"
        put_attn(f"{t}.self_attn", layer["self_attn"])
        put_attn(f"{t}.cross_attn_token_to_image", layer["cross_attn_t2i"])
        put_attn(f"{t}.cross_attn_image_to_token", layer["cross_attn_i2t"])
        for n in ("norm1", "norm2", "norm3", "norm4"):
            put_ln(f"{t}.{n}", layer[n])
        put_dense(f"{t}.mlp.lin1", layer["mlp_0"])
        put_dense(f"{t}.mlp.lin2", layer["mlp_1"])
    put_attn("sam_mask_decoder.transformer.final_attn_token_to_image",
             md["transformer"]["final_attn"])
    put_ln("sam_mask_decoder.transformer.norm_final_attn",
           md["transformer"]["norm_final"])
    put_conv("sam_mask_decoder.conv_s0", p["conv_s0"])
    put_conv("sam_mask_decoder.conv_s1", p["conv_s1"])

    import jax as _jax
    ma = p["memory_attention"]
    put_ln("memory_attention.norm", ma["norm"])
    stacked = ma["layers"]["layer"]
    for i in range(cfg.memory_attention.num_layers):
        layer = _jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked)
        t = f"memory_attention.layers.{i}"
        put_attn(f"{t}.self_attn", layer["self_attn"])
        put_attn(f"{t}.cross_attn_image", layer["cross_attn"])
        for n in ("norm1", "norm2", "norm3"):
            put_ln(f"{t}.{n}", layer[n])
        put_dense(f"{t}.linear1", layer["linear1"])
        put_dense(f"{t}.linear2", layer["linear2"])

    me = p["memory_encoder"]
    n_ds = cfg.memory_encoder.mask_downsample_layers
    for i in range(n_ds):
        put_conv(f"memory_encoder.mask_downsampler.encoder.{3 * i}",
                 me["mask_downsampler"][f"conv_{i}"])
        put_ln(f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}",
               me["mask_downsampler"][f"ln_{i}"])
    put_conv(f"memory_encoder.mask_downsampler.encoder.{3 * n_ds}",
             me["mask_downsampler"]["conv_out"])
    put_conv("memory_encoder.pix_feat_proj", me["pix_feat_proj"])
    put_conv("memory_encoder.out_proj", me["out_proj"])
    for i in range(cfg.memory_encoder.fuser_layers):
        f = me[f"fuser_{i}"]
        t = f"memory_encoder.fuser.layers.{i}"
        put_conv(f"{t}.dwconv", f["dwconv"])
        put_ln(f"{t}.norm", f["norm"])
        put_dense(f"{t}.pwconv1", f["pwconv1"])
        put_dense(f"{t}.pwconv2", f["pwconv2"])
        out[f"{t}.gamma"] = np.asarray(f["gamma"])

    out["no_mem_embed"] = np.asarray(p["no_mem_embed"])
    out["maskmem_tpos_enc"] = np.asarray(p["maskmem_tpos_enc"])
    out["no_obj_ptr"] = np.asarray(p["no_obj_ptr"])
    put_mlp("obj_ptr_proj", p["obj_ptr_proj"], 3)
    return out


def load_checkpoint_state(ckpt_path: str) -> dict:
    import torch
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    return ckpt.get("model", ckpt)


def _init_variables(cfg: SAM2Config, seed: int = 0):
    import jax
    import jax.numpy as jnp
    model = SAM2Model(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    return model, model.init(jax.random.PRNGKey(seed), img)


def sam2_config_for(size: str) -> SAM2Config:
    """SAM2 model family: 'tiny' | 'small' | 'base_plus' | 'large'
    (upstream sam2_hiera_{t,s,b+,l}.yaml backbones; everything outside the
    image encoder is shared across sizes)."""
    import dataclasses

    from sola_tpu.trackgen.sam2.hiera import HieraConfig
    from sola_tpu.trackgen.sam2.image_encoder import ImageEncoderConfig

    hiera = {
        "tiny": HieraConfig.tiny, "small": HieraConfig.small,
        "base_plus": HieraConfig.base_plus, "large": HieraConfig.large,
    }[size]()
    base = SAM2Config.large()
    return dataclasses.replace(
        base, image_encoder=ImageEncoderConfig(hiera=hiera))


def build_sam2(ckpt_path: Optional[str] = None,
               cfg: Optional[SAM2Config] = None, seed: int = 0,
               size: str = "large"):
    """Build (model, variables); loads + converts the checkpoint when the
    path exists, else random init (air-gapped smoke mode). ``size`` picks
    the hiera backbone when no explicit cfg is given; the checkpoint name
    (sam2_hiera_{tiny,small,base_plus,large}.pt) selects it automatically.
    """
    if cfg is None and ckpt_path:
        stem = os.path.basename(ckpt_path)
        for s in ("tiny", "small", "base_plus", "large"):
            if s in stem:
                size = s
                break
    cfg = cfg or sam2_config_for(size)
    model, variables = _init_variables(cfg, seed)
    if ckpt_path and os.path.exists(ckpt_path):
        state = load_checkpoint_state(ckpt_path)
        converted = torch_sam2_to_params(state, cfg)
        variables = _merge_with_template(variables, converted)
    return model, variables


def _merge_with_template(template: dict, converted: dict) -> dict:
    """Graft converted arrays onto the init tree, asserting shape agreement;
    params missing from the conversion keep their init values."""
    import jax

    def merge(tpl, conv, path=""):
        if isinstance(tpl, dict):
            out = {}
            for k, v in tpl.items():
                if isinstance(conv, dict) and k in conv:
                    out[k] = merge(v, conv[k], f"{path}/{k}")
                else:
                    out[k] = v
            return out
        arr = np.asarray(conv)
        tshape = np.asarray(tpl).shape
        assert arr.shape == tshape, (
            f"shape mismatch at {path}: ckpt {arr.shape} vs model {tshape}")
        return arr

    return {c: merge(template[c], converted.get(c, {}))
            for c in template}


def load_sam2_video_predictor(ckpt_path: str, obj_batch: int = 4,
                              cfg: Optional[SAM2Config] = None):
    from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor
    model, variables = build_sam2(ckpt_path, cfg)
    return SAM2VideoPredictor(model, variables, obj_batch=obj_batch)


def load_sam2_image_predictor(ckpt_path: str,
                              cfg: Optional[SAM2Config] = None):
    from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor
    model, variables = build_sam2(ckpt_path, cfg)
    return SAM2ImagePredictor(model, variables)
