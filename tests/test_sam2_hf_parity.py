"""Weight-level SAM2 parity vs the HF transformers oracle.

The converter is run on a state_dict in the ORIGINAL facebook naming
(produced by renaming a random-init HF Sam2VideoModel — an implementation
numerically validated against facebookresearch/sam2). Every test then
compares a JAX module's forward against the oracle's at the SAME weights.
This closes VERDICT.md round-1 gap #2 ("converters structurally tested
only") for SAM2.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.sam2_hf_oracle import (build_tiny_hf_sam2, hf_to_fb_state,
                                  jax_parity_config)

ATOL = 2e-4


@pytest.fixture(scope="module")
def bundle():
    from sola_tpu.trackgen.sam2.convert import (_merge_with_template,
                                                torch_sam2_to_params)
    from sola_tpu.trackgen.sam2.model import SAM2Model

    hf = build_tiny_hf_sam2(seed=0)
    fb_state = hf_to_fb_state(hf)
    cfg = jax_parity_config()
    model = SAM2Model(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), img)
    converted = torch_sam2_to_params(fb_state, cfg)
    variables = _merge_with_template(template, converted)
    return hf, model, variables, cfg, template, converted


def _flat_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out |= _flat_paths(v, p)
        else:
            out.add(p)
    return out


def test_conversion_covers_every_parameter(bundle):
    """100% coverage: every model param comes from the checkpoint (no leaf
    silently keeps its random init) — VERDICT item 10 for SAM2."""
    _, _, _, _, template, converted = bundle
    for coll in template:
        t = _flat_paths(template[coll])
        c = _flat_paths(converted.get(coll, {}))
        missing = t - c
        extra = c - t
        assert not missing, f"{coll}: not converted: {sorted(missing)[:10]}"
        assert not extra, f"{coll}: unknown converted leaves: {sorted(extra)[:10]}"


def test_image_encoder_parity(bundle, rng):
    hf, model, variables, cfg, _, _ = bundle
    from sola_tpu.trackgen.sam2.model import SAM2Model

    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feats, pos, _, _ = hf.get_image_features(torch.from_numpy(x))
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      method=SAM2Model.encode_image)

    def seqfirst(a_bhwc):  # (B,h,w,C) -> (hw, B, C)
        b, h, w, c = a_bhwc.shape
        return np.asarray(a_bhwc).reshape(b, h * w, c).transpose(1, 0, 2)

    np.testing.assert_allclose(seqfirst(out["s0"]), feats[0].numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(seqfirst(out["s1"]), feats[1].numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(seqfirst(out["pix"]), feats[2].numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(seqfirst(out["pos"]), pos[2].numpy(),
                               atol=ATOL)
    assert float(np.abs(out["pix"]).max()) > 1e-3  # not trivially zero


def test_prompt_encoder_points_parity(bundle, rng):
    hf, model, variables, cfg, _, _ = bundle
    from sola_tpu.trackgen.sam2.prompt_encoder import PromptEncoder

    coords = (rng.random((2, 3, 2)) * 64).astype(np.float32)
    labels = np.asarray([[1, 0, -1], [1, 1, 0]], np.int32)
    with torch.no_grad():
        sparse, dense = hf.prompt_encoder(
            input_points=torch.from_numpy(coords)[:, None],
            input_labels=torch.from_numpy(labels)[:, None],
            input_boxes=None, input_masks=None)
    # HF appends one (0,0)/-1 padding point when no boxes are given
    coords_p = np.concatenate([coords, np.zeros((2, 1, 2), np.float32)], 1)
    labels_p = np.concatenate([labels, np.full((2, 1), -1, np.int32)], 1)

    pe = PromptEncoder(cfg.prompt_encoder)
    pe_vars = {"params": variables["params"]["prompt_encoder"],
               "buffers": variables["buffers"]["prompt_encoder"]}
    got_sparse, got_dense = pe.apply(pe_vars, jnp.asarray(coords_p),
                                     jnp.asarray(labels_p))
    np.testing.assert_allclose(np.asarray(got_sparse),
                               sparse[:, 0].numpy(), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(got_dense).transpose(0, 3, 1, 2), dense.detach().numpy(),
        atol=ATOL)


def test_prompt_encoder_mask_parity(bundle, rng):
    hf, model, variables, cfg, _, _ = bundle
    from sola_tpu.trackgen.sam2.prompt_encoder import PromptEncoder

    masks = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    coords = np.zeros((2, 1, 2), np.float32)
    labels = np.full((2, 1), -1, np.int32)
    with torch.no_grad():
        _, dense = hf.prompt_encoder(
            input_points=torch.from_numpy(coords)[:, None],
            input_labels=torch.from_numpy(labels)[:, None],
            input_boxes=None, input_masks=torch.from_numpy(masks))
    pe = PromptEncoder(cfg.prompt_encoder)
    pe_vars = {"params": variables["params"]["prompt_encoder"],
               "buffers": variables["buffers"]["prompt_encoder"]}
    got = pe.apply(pe_vars, jnp.asarray(masks.transpose(0, 2, 3, 1)),
                   method=PromptEncoder.embed_masks)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               dense.detach().numpy(), atol=ATOL)


def _decoder_inputs(rng, d=128, h=4):
    img = rng.standard_normal((1, d, h, h)).astype(np.float32)
    pe = rng.standard_normal((1, d, h, h)).astype(np.float32)
    sparse = rng.standard_normal((1, 2, d)).astype(np.float32)
    dense = rng.standard_normal((1, d, h, h)).astype(np.float32)
    s0 = rng.standard_normal((1, d // 8, 4 * h, 4 * h)).astype(np.float32)
    s1 = rng.standard_normal((1, d // 4, 2 * h, 2 * h)).astype(np.float32)
    return img, pe, sparse, dense, s0, s1


@pytest.mark.parametrize("multimask", [True, False])
def test_mask_decoder_parity(bundle, rng, multimask):
    hf, model, variables, cfg, _, _ = bundle
    from sola_tpu.trackgen.sam2.mask_decoder import MaskDecoder

    img, pe, sparse, dense, s0, s1 = _decoder_inputs(rng)
    with torch.no_grad():
        masks, ious, tokens, obj = hf.mask_decoder(
            image_embeddings=torch.from_numpy(img),
            image_positional_embeddings=torch.from_numpy(pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse)[:, None],
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=multimask,
            high_resolution_features=[torch.from_numpy(s0),
                                      torch.from_numpy(s1)])
    # HF convention: sam token = token 0, swapped for best-iou in multimask
    hf_token = tokens[:, 0, 0]
    if multimask:
        best = torch.argmax(ious[:, 0], dim=-1)
        hf_token = tokens[0, 0, best[0]][None]

    dec = MaskDecoder(cfg.mask_decoder)
    got_masks, got_ious, got_token, got_obj = dec.apply(
        {"params": variables["params"]["mask_decoder"]},
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(pe.transpose(0, 2, 3, 1)),
        jnp.asarray(sparse), jnp.asarray(dense.transpose(0, 2, 3, 1)),
        multimask,
        high_res_features=(jnp.asarray(s0.transpose(0, 2, 3, 1)),
                           jnp.asarray(s1.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got_masks),
                               masks[:, 0].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_ious), ious[:, 0].numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_token), hf_token.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_obj), obj[:, 0].numpy(),
                               atol=ATOL)


def test_memory_encoder_parity(bundle, rng):
    hf, model, variables, cfg, _, _ = bundle
    from sola_tpu.trackgen.sam2.memory import MemoryEncoder

    pix = rng.standard_normal((2, 128, 4, 4)).astype(np.float32)
    # pre-scaled masks (the caller applies sigmoid*20-10 in both stacks)
    masks = (rng.random((2, 1, 64, 64)).astype(np.float32) * 20.0 - 10.0)
    with torch.no_grad():
        feats, _ = hf.memory_encoder(torch.from_numpy(pix),
                                     torch.from_numpy(masks))
    enc = MemoryEncoder(cfg.memory_encoder)
    got = enc.apply({"params": variables["params"]["memory_encoder"]},
                    jnp.asarray(pix.transpose(0, 2, 3, 1)),
                    jnp.asarray(masks.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               feats.numpy(), atol=ATOL)


def test_condition_features_parity(bundle, rng):
    """The static masked memory banks must equal upstream's variable-length
    concat — validates tpos indexing, the 0.1 query-PE factor, RoPE tables,
    obj-pointer token splitting, and key masking at once."""
    hf, model, variables, cfg, _, _ = bundle
    from sola_tpu.trackgen.sam2.common import sine_position_encoding
    from sola_tpu.trackgen.sam2.model import SAM2Model

    b, h, d, mem = 1, 4, 128, 64
    hw = h * h
    pix = rng.standard_normal((b, h, h, d)).astype(np.float32)
    pos = np.asarray(sine_position_encoding(h, h, d))[None].astype(
        np.float32).repeat(b, 0)
    cond = rng.standard_normal((b, 1, h, h, mem)).astype(np.float32)
    recent = rng.standard_normal((b, 6, h, h, mem)).astype(np.float32)
    rec_valid = np.zeros((b, 6), bool)
    rec_valid[:, 0] = rec_valid[:, 3] = True
    rec_tpos = np.ones((b, 6), np.int32)
    rec_tpos[:, 0] = 2   # temporal distance 2
    rec_tpos[:, 3] = 1   # temporal distance 1
    ptrs = rng.standard_normal((b, 4, d)).astype(np.float32)
    ptr_valid = np.asarray([[True, False, True, False]])

    got = model.apply(
        variables, jnp.asarray(pix), jnp.asarray(pos), jnp.asarray(cond),
        jnp.ones((b, 1), bool), jnp.asarray(recent), jnp.asarray(rec_valid),
        jnp.asarray(rec_tpos), jnp.asarray(ptrs), jnp.asarray(ptr_valid),
        method=SAM2Model.condition_features)

    # ---- upstream-style exact concat on the HF side ----
    spatial = np.asarray(sine_position_encoding(h, h, mem)).reshape(
        hw, mem).astype(np.float32)
    tpos = hf.memory_temporal_positional_encoding.detach().numpy().reshape(
        7, mem)
    mems, poss = [], []
    for feat, idx in [(cond[:, 0], 6), (recent[:, 0], 2 - 1),
                      (recent[:, 3], 1 - 1)]:
        mems.append(feat.reshape(b, hw, mem).transpose(1, 0, 2))
        poss.append((spatial + tpos[idx])[:, None].repeat(b, 1))
    # object pointers: 2 valid, split into 128/64 = 2 tokens each
    sel = ptrs[0, [0, 2]]                      # (2, 128)
    ptr_tok = sel.reshape(2, 2, mem).reshape(4, mem)[:, None]  # (4, B, mem)
    mems.append(ptr_tok)
    poss.append(np.zeros_like(ptr_tok))
    memory = torch.from_numpy(np.concatenate(mems, 0))
    memory_pos = torch.from_numpy(np.concatenate(poss, 0))
    curr = torch.from_numpy(pix.reshape(b, hw, d).transpose(1, 0, 2))
    curr_pos = torch.from_numpy(pos.reshape(b, hw, d).transpose(1, 0, 2))
    with torch.no_grad():
        ref = hf.memory_attention(
            current_vision_features=curr, memory=memory,
            current_vision_position_embeddings=curr_pos,
            memory_posision_embeddings=memory_pos,
            num_object_pointer_tokens=4)
    ref = ref.numpy()  # (hw, B, d) or (B, hw, d) depending on HF internals
    if ref.shape[0] == hw:
        ref = ref.transpose(1, 0, 2)
    ref = ref.reshape(b, h, h, d)
    np.testing.assert_allclose(np.asarray(got), ref, atol=ATOL)


def test_condition_features_empty_memory_uses_no_mem_embed(bundle, rng):
    hf, model, variables, cfg, _, _ = bundle
    from sola_tpu.trackgen.sam2.common import sine_position_encoding
    from sola_tpu.trackgen.sam2.model import SAM2Model

    b, h, d, mem = 1, 4, 128, 64
    pix = rng.standard_normal((b, h, h, d)).astype(np.float32)
    pos = np.asarray(sine_position_encoding(h, h, d))[None].astype(
        np.float32).repeat(b, 0)
    got = model.apply(
        variables, jnp.asarray(pix), jnp.asarray(pos),
        jnp.zeros((b, 1, h, h, mem)), jnp.zeros((b, 1), bool),
        jnp.zeros((b, 6, h, h, mem)), jnp.zeros((b, 6), bool),
        jnp.ones((b, 6), jnp.int32), jnp.zeros((b, 4, d)),
        jnp.zeros((b, 4), bool), method=SAM2Model.condition_features)
    no_mem = hf.no_memory_embedding.detach().numpy()  # (1, 1, d)
    ref = pix.reshape(b, h * h, d) + no_mem
    np.testing.assert_allclose(np.asarray(got).reshape(b, h * h, d), ref,
                               atol=ATOL)
