"""GroundingDINO-in-JAX tests: deformable sampling vs a NumPy oracle, Swin
shapes, tiny end-to-end forward, get_boxes API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.trackgen.gdino import deformable
from sola_tpu.trackgen.gdino.model import (GDINOConfig, GroundingDINO,
                                           GroundingModel, build_gdino)
from sola_tpu.trackgen.gdino.swin import SwinConfig, SwinTransformer


def np_bilinear(value, loc):
    """Oracle: zero-padded bilinear sampling, align_corners=False."""
    b, h, w, c = value.shape
    out = np.zeros(loc.shape[:-1] + (c,), np.float32)
    for bi in range(b):
        for ni in range(loc.shape[1]):
            x = loc[bi, ni, 0] * w - 0.5
            y = loc[bi, ni, 1] * h - 0.5
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            for dy in (0, 1):
                for dx in (0, 1):
                    xi, yi = x0 + dx, y0 + dy
                    wgt = ((x - x0) if dx else (1 - (x - x0))) * \
                          ((y - y0) if dy else (1 - (y - y0)))
                    if 0 <= xi < w and 0 <= yi < h:
                        out[bi, ni] += wgt * value[bi, yi, xi]
    return out


def test_bilinear_sample_matches_oracle(rng):
    value = rng.standard_normal((2, 5, 7, 3), dtype=np.float32)
    loc = rng.random((2, 11, 2)).astype(np.float32) * 1.2 - 0.1  # some OOB
    ours = np.asarray(deformable.bilinear_sample(
        jnp.asarray(value), jnp.asarray(loc)))
    ref = np_bilinear(value, loc)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ms_deform_attn_core(rng):
    b, lq, nh, nl, np_, hd = 1, 3, 2, 2, 2, 4
    values = [rng.standard_normal((b, 6, 8, nh * hd), dtype=np.float32),
              rng.standard_normal((b, 3, 4, nh * hd), dtype=np.float32)]
    locs = rng.random((b, lq, nh, nl, np_, 2)).astype(np.float32)
    w = rng.random((b, lq, nh, nl, np_)).astype(np.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    out = np.asarray(deformable.ms_deform_attn_core(
        [jnp.asarray(v) for v in values], jnp.asarray(locs),
        jnp.asarray(w)))
    assert out.shape == (b, lq, nh * hd)

    # oracle: per level/head/point bilinear + weighted sum
    ref = np.zeros((b, lq, nh, hd), np.float32)
    for lvl, value in enumerate(values):
        v = value.reshape(b, *value.shape[1:3], nh, hd)
        for h in range(nh):
            vm = v[:, :, :, h]
            for p in range(np_):
                loc = locs[:, :, h, lvl, p]
                sampled = np_bilinear(vm, loc)
                ref[:, :, h] += w[:, :, h, lvl, p][..., None] * sampled
    np.testing.assert_allclose(out, ref.reshape(b, lq, nh * hd), atol=1e-4)


def test_swin_shapes():
    cfg = SwinConfig.tiny_test()
    model = SwinTransformer(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    outs = model.apply(variables, img)
    # out_indices (1, 2, 3) -> strides 8, 16, 32; dims double per stage
    assert outs[0].shape == (1, 8, 8, 32)
    assert outs[1].shape == (1, 4, 4, 64)
    assert outs[2].shape == (1, 2, 2, 128)


@pytest.fixture(scope="module")
def tiny_gdino():
    cfg = GDINOConfig.tiny_test()
    return build_gdino(cfg=cfg), cfg


def test_gdino_forward(tiny_gdino):
    (model, variables), cfg = tiny_gdino
    s = cfg.size_target
    img = jnp.zeros((1, s, s, 3), jnp.float32)
    pmask = jnp.ones((1, s, s), bool)
    ids = jnp.asarray([[0, 5, 9, 2, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    out = model.apply(variables, img, pmask, ids, mask)
    nq = out["pred_boxes"].shape[1]
    assert out["pred_logits"].shape == (1, nq, cfg.max_text_len)
    assert out["pred_boxes"].shape == (1, nq, 4)
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()
    logits = np.asarray(out["pred_logits"])
    # masked/padded text positions must be -inf
    assert np.isinf(logits[0, 0, 4:]).all()
    assert np.isfinite(logits[0, 0, :4]).all()


def test_grounding_model_get_boxes(tiny_gdino):
    (model, variables), cfg = tiny_gdino
    gm = GroundingModel(model, variables)
    image = np.zeros((48, 72, 3), np.uint8)
    preds = gm.get_boxes(image, "the red car.", box_threshold=-1.0)
    # threshold -1 keeps everything; check schema + pixel-space boxes
    assert len(preds) > 0
    p = preds[0]
    assert set(p) == {"phrase", "bbox", "token_score"}
    assert p["bbox"].shape == (4,)
    assert -72 <= p["bbox"][0] <= 144
    assert len(p["token_score"]) >= 1


def test_grounding_model_bf16_matches_fp32(tiny_gdino):
    """bf16 compute path: same proposals as fp32 within bf16 tolerance."""
    (model, variables), cfg = tiny_gdino
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)

    gm32 = GroundingModel(model, variables)
    gm16 = GroundingModel(model, variables, compute_dtype=jnp.bfloat16)
    p32 = gm32.get_boxes(image, "the red car.", box_threshold=-1.0)
    p16 = gm16.get_boxes(image, "the red car.", box_threshold=-1.0)
    assert len(p32) == len(p16)
    b32 = np.stack([p["bbox"] for p in p32])
    b16 = np.stack([p["bbox"] for p in p16])
    # boxes live in pixel units (<=72). bf16 logit drift can swap entries
    # of the two-stage top-k query selection on a RANDOM tiny net (trained
    # logits have real margins), so require: most boxes match tightly and
    # the median drift is sub-pixel-scale rather than exact equality.
    err = np.abs(b16 - b32).max(axis=1)
    assert (err < 3.0).mean() >= 0.8, err
    assert np.median(err) < 1.0, err


def test_get_boxes_many_matches_sequential(tiny_gdino):
    """Expression-batched forward (one Swin trunk, E-batched encoder/
    decoder) must reproduce the per-text get_boxes results: the batch axis
    mixes nothing (the BiMHA global-max shift cancels in softmax), and the
    padding rows of the expression bucket are discarded."""
    (model, variables), cfg = tiny_gdino
    gm = GroundingModel(model, variables)
    rng = np.random.default_rng(7)
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    texts = ["the red car.", "a dog running.", "the tallest person."]

    batched = gm.get_boxes_many(image, texts, box_threshold=-1.0)
    assert len(batched) == len(texts)
    for text, got in zip(texts, batched):
        ref = gm.get_boxes(image, text, box_threshold=-1.0)
        assert len(ref) == len(got)
        rb = np.stack([p["bbox"] for p in ref])
        gb = np.stack([p["bbox"] for p in got])
        np.testing.assert_allclose(gb, rb, atol=1e-3)
        for pr, pg in zip(ref, got):
            assert pr["phrase"] == pg["phrase"]
            np.testing.assert_allclose(pg["token_score"], pr["token_score"],
                                       atol=1e-4)


def test_get_boxes_many_chunked(tiny_gdino):
    """Above max_expr_batch the batch chunks; results must be unchanged."""
    (model, variables), cfg = tiny_gdino
    gm = GroundingModel(model, variables)
    rng = np.random.default_rng(11)
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    texts = ["the red car.", "a dog running.", "the tallest person."]
    ref = gm.get_boxes_many(image, texts, box_threshold=-1.0)
    gm.max_expr_batch = 2
    got = gm.get_boxes_many(image, texts, box_threshold=-1.0)
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.stack([p["bbox"] for p in g]),
                                   np.stack([p["bbox"] for p in r]),
                                   atol=1e-3)


def test_pipelined_video_prompts_match_sequential(tiny_gdino):
    """The prompt CLI's one-frame-lookahead pipeline (enqueue/harvest
    interleave + SAM2 feature save/restore + predict_packed) must produce
    the same prompts JSON as strictly sequential per-frame generation —
    this is the riskiest control flow of the stage and only engages with
    the REAL model surfaces (test fakes take the fallback)."""
    from sola_tpu.trackgen.prompts_gdino import (PromptGenerator,
                                                generate_video_prompts)
    from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor
    from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model

    (gmodel, gvars), _ = tiny_gdino
    gm = GroundingModel(gmodel, gvars)
    scfg = SAM2Config.tiny_test(image_size=64)
    smodel = SAM2Model(scfg)
    simg = jnp.zeros((1, 64, 64, 3), jnp.float32)
    svars = smodel.init(jax.random.PRNGKey(1), simg)
    ipred = SAM2ImagePredictor(smodel, svars,
                               compute_dtype=jnp.float32)

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
              for _ in range(3)]
    expressions = {"0": {"exp": "the red car"},
                   "1": {"exp": "a walking dog"}}

    class SequentialGrounding:  # no enqueue_boxes -> pipeline disabled
        def get_boxes(self, *a, **k):
            return gm.get_boxes(*a, **k)

    pg_pipe = PromptGenerator(gm, ipred, box_threshold=-1.0)
    pg_seq = PromptGenerator(SequentialGrounding(), ipred,
                             box_threshold=-1.0)
    info_pipe = generate_video_prompts(pg_pipe, frames, "vid",
                                       expressions, bin_size=1)
    info_seq = generate_video_prompts(pg_seq, frames, "vid",
                                      expressions, bin_size=1)

    pa, pb = info_pipe["prompt_masks"], info_seq["prompt_masks"]
    assert len(pa) == len(pb) > 0

    def key(p):
        return (p["frame_idx"], p["expression_id"], p["prompt_id"])

    for a, b in zip(sorted(pa, key=key), sorted(pb, key=key)):
        assert a["frame_idx"] == b["frame_idx"]
        assert a["expression_id"] == b["expression_id"]
        assert a["segmentation"] == b["segmentation"]
        np.testing.assert_allclose(a["pred_bbox"], b["pred_bbox"],
                                   atol=1e-2)
        np.testing.assert_allclose(a["score"], b["score"], atol=1e-4)
        np.testing.assert_allclose(a["stability_score"],
                                   b["stability_score"], atol=1e-4)
