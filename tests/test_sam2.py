"""SAM2-in-JAX smoke tests on the tiny config: module shapes, jit, and the
video-predictor protocol over a synthetic moving-square video."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model
from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor


@pytest.fixture(scope="module")
def tiny_model():
    cfg = SAM2Config.tiny_test(image_size=64)
    model = SAM2Model(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    return cfg, model, variables


def test_encode_image_shapes(tiny_model):
    cfg, model, variables = tiny_model
    img = jnp.ones((2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, img, method=SAM2Model.encode_image)
    d = cfg.d_model
    assert out["pix"].shape == (2, 4, 4, d)
    assert out["pos"].shape == (2, 4, 4, d)
    assert out["s1"].shape == (2, 8, 8, d // 4)
    assert out["s0"].shape == (2, 16, 16, d // 8)


def test_sam_heads_shapes(tiny_model):
    cfg, model, variables = tiny_model
    b = 3
    pix = jnp.ones((b, 4, 4, cfg.d_model), jnp.float32)
    s0 = jnp.zeros((b, 16, 16, cfg.d_model // 8), jnp.float32)
    s1 = jnp.zeros((b, 8, 8, cfg.d_model // 4), jnp.float32)
    coords = jnp.zeros((b, 2, 2), jnp.float32)
    labels = jnp.array([[1, -1]] * b, jnp.int32)
    out = model.apply(variables, pix, s0, s1, coords, labels, None, False,
                      method=SAM2Model.sam_heads)
    assert out["low_res_masks"].shape == (b, 1, 16, 16)
    assert out["high_res_masks"].shape == (b, 1, 64, 64)
    assert out["obj_ptr"].shape == (b, cfg.d_model)
    assert out["object_score_logits"].shape == (b, 1)
    # multimask
    out = model.apply(variables, pix, s0, s1, coords, labels, None, True,
                      method=SAM2Model.sam_heads)
    assert out["low_res_masks"].shape == (b, 3, 16, 16)
    assert out["ious"].shape == (b, 3)


def test_memory_encode_and_condition(tiny_model):
    cfg, model, variables = tiny_model
    b, h = 2, cfg.feat_hw
    pix = jnp.ones((b, h, h, cfg.d_model), jnp.float32)
    pos = jnp.zeros_like(pix)
    masks = jnp.zeros((b, 64, 64), jnp.float32)
    mem = model.apply(variables, pix, masks, method=SAM2Model.encode_memory)
    assert mem.shape == (b, h, h, cfg.mem_dim)

    cond_mem = jnp.stack([mem], axis=1)
    cond_valid = jnp.ones((b, 1), bool)
    rec = jnp.zeros((b, cfg.num_recent, h, h, cfg.mem_dim))
    rec_valid = jnp.zeros((b, cfg.num_recent), bool)
    rec_tpos = jnp.ones((b, cfg.num_recent), jnp.int32)
    ptrs = jnp.zeros((b, cfg.max_obj_ptrs, cfg.d_model))
    ptr_valid = jnp.zeros((b, cfg.max_obj_ptrs), bool)
    out = model.apply(variables, pix, pos, cond_mem, cond_valid, rec,
                      rec_valid, rec_tpos, ptrs, ptr_valid,
                      method=SAM2Model.condition_features)
    assert out.shape == pix.shape
    assert np.isfinite(np.asarray(out)).all()

    # no memory at all -> must equal the no-mem path and stay finite
    out2 = model.apply(variables, pix, pos, cond_mem,
                       jnp.zeros((b, 1), bool), rec, rec_valid, rec_tpos,
                       ptrs, ptr_valid, method=SAM2Model.condition_features)
    assert np.isfinite(np.asarray(out2)).all()


@pytest.fixture(scope="module")
def video_predictor(tiny_model):
    cfg, model, variables = tiny_model
    return SAM2VideoPredictor(model, variables, obj_batch=2)


def make_video(t=6, size=64):
    frames = []
    for i in range(t):
        f = np.zeros((size, size, 3), np.uint8)
        x = 8 + 4 * i
        f[20:36, x:x + 12] = 200
        frames.append(f)
    return frames


def test_video_protocol(video_predictor):
    pred = video_predictor
    frames = make_video()
    state = pred.init_state(frames)
    assert state.num_frames == 6

    mask = np.zeros((64, 64), np.float32)
    mask[20:36, 8:20] = 1
    f_idx, obj_ids, logits = pred.add_new_mask(state, 0, obj_id=7, mask=mask)
    assert f_idx == 0 and obj_ids == [7]
    # prompt-frame output reproduces the input mask
    assert np.array_equal(np.asarray(logits[0]) > 0, mask > 0.5)

    outputs = {}
    for frame_idx, obj_ids, out_logits in pred.propagate_in_video(state):
        assert obj_ids == [7]
        assert out_logits.shape == (1, 1, 64, 64)
        outputs[frame_idx] = np.asarray(out_logits)
    assert sorted(outputs) == [0, 1, 2, 3, 4, 5]

    for frame_idx, _, out_logits in pred.propagate_in_video(state,
                                                            reverse=True):
        outputs[frame_idx] = np.asarray(out_logits)

    tokens = pred.get_output_tokens(state)
    assert sorted(tokens) == [0, 1, 2, 3, 4, 5]
    assert tokens[0].shape == (1, pred.cfg.d_model)
    assert all(np.isfinite(t).all() for t in tokens.values())

    # reset clears everything
    pred.reset_state(state)
    assert state.banks is None and not state.prompts
    assert not state.output_tokens


def test_video_two_objects(video_predictor):
    pred = video_predictor
    frames = make_video()
    state = pred.init_state(frames)
    m1 = np.zeros((64, 64), np.float32)
    m1[20:36, 8:20] = 1
    m2 = np.zeros((64, 64), np.float32)
    m2[40:50, 40:50] = 1
    pred.add_new_mask(state, 0, 3, m1)
    pred.add_new_mask(state, 0, 9, m2)
    for frame_idx, obj_ids, logits in pred.propagate_in_video(state):
        assert obj_ids == [3, 9]
        assert logits.shape == (2, 1, 64, 64)
    tokens = pred.get_output_tokens(state)
    assert tokens[1].shape == (2, pred.cfg.d_model)


def test_encode_frames_device_matches_init_state(video_predictor):
    """encode_frames_device (one lax.map program) == the chunked
    init_state path, feature for feature."""
    pred = video_predictor
    frames = make_video(t=4)
    state = pred.init_state(frames)
    f2 = pred.encode_frames_device(jnp.asarray(np.stack(frames)))
    for k in ("pix", "s0", "s1"):
        np.testing.assert_allclose(
            np.asarray(state.features[k], np.float32),
            np.asarray(f2[k], np.float32), atol=1e-6,
            err_msg=k)


def test_masks_mode_matches_logits_mode(video_predictor):
    """output_mode="masks" (bit-packed device fetch, incl. the cond-frame
    path through _cond_pack_small) == binarized "logits" outputs, frame
    for frame, in both pass directions."""
    pred = video_predictor
    frames = make_video()
    mask = np.zeros((64, 64), np.float32)
    mask[20:36, 8:20] = 1

    def run(mode):
        state = pred.init_state(frames)
        pred.add_new_mask(state, 0, 0, mask)
        out = {}
        for rev in (False, True):
            for fidx, _, o in pred.propagate_in_video(
                    state, reverse=rev, output_mode=mode):
                if mode == "masks":
                    out[fidx] = o.astype(bool)
                else:
                    out[fidx] = np.asarray(o)[:, 0] > 0.0
        return out

    a, b = run("masks"), run("logits")
    assert sorted(a) == sorted(b)
    for f in a:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f"frame {f}")


def test_prompt_cache_invalidation(video_predictor):
    """add_new_mask after a propagation (no reset_state) must invalidate
    the cached device prompt buffer and cond-frame output — the cond yield
    reflects the NEW prompt, as the uncached path did."""
    pred = video_predictor
    frames = make_video()
    state = pred.init_state(frames)
    m1 = np.zeros((64, 64), np.float32)
    m1[20:36, 8:20] = 1
    pred.add_new_mask(state, 0, 0, m1)
    for fidx, _, o in pred.propagate_in_video(state, output_mode="masks"):
        if fidx == 0:
            np.testing.assert_array_equal(o[0] > 0, m1 > 0.5)

    m2 = np.zeros((64, 64), np.float32)
    m2[40:56, 30:44] = 1
    pred.add_new_mask(state, 0, 0, m2)  # replaces obj 0's prompt
    assert 0 not in state.prompt_dev and not state.cond_host
    for fidx, _, o in pred.propagate_in_video(state, output_mode="masks"):
        if fidx == 0:
            np.testing.assert_array_equal(o[0] > 0, m2 > 0.5)


def test_none_mode_fetches_nothing(video_predictor):
    """output_mode="none" yields None for every frame (cond included) and
    leaves output_tokens for the scan frames unfetched."""
    pred = video_predictor
    frames = make_video()
    state = pred.init_state(frames)
    mask = np.zeros((64, 64), np.float32)
    mask[20:36, 8:20] = 1
    pred.add_new_mask(state, 0, 0, mask)
    seen = []
    for fidx, _, o in pred.propagate_in_video(state, output_mode="none"):
        assert o is None
        seen.append(fidx)
    assert seen == [0, 1, 2, 3, 4, 5]


def test_hiera_global_attention_fused_matches_dense():
    """The flash-kernel route for long-sequence (global) Hiera attention
    must match the dense sdpa path (hiera.py MultiScaleAttention routes
    L >= fused_min_tokens through ops.flash_attention)."""
    from sola_tpu.trackgen.sam2.hiera import MultiScaleAttention

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 48),
                          jnp.float32)
    fused = MultiScaleAttention(dim_out=48, num_heads=2,
                                fused_min_tokens=1024)
    dense = MultiScaleAttention(dim_out=48, num_heads=2,
                                fused_min_tokens=1 << 30)
    params = fused.init(jax.random.PRNGKey(4), x)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(dense.apply(params, x)), atol=2e-5, rtol=1e-5)


def test_sam_heads_bf16_compute(tiny_model):
    """bf16 params must yield a bf16 decoder: the prompt-encoder fourier PE
    is fp32 (fp32 coords x gaussian), and before the sam_heads boundary cast
    it silently promoted every two-way-transformer/upscale matmul to fp32
    (off the MXU bf16 rate for AMG's 3k decodes/frame and propagation's
    per-frame sam_heads). obj_ptr's dtype is the canary: it is computed
    from the transformer's token output, so fp32 there means the whole
    decode ran fp32. Mask logits stay fp32 by design
    (preferred_element_type on the hypernetwork einsum)."""
    cfg, model, variables = tiny_model
    bf = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    b = 2
    pix = jnp.ones((b, 4, 4, cfg.d_model), jnp.bfloat16)
    s0 = jnp.zeros((b, 16, 16, cfg.d_model // 8), jnp.bfloat16)
    s1 = jnp.zeros((b, 8, 8, cfg.d_model // 4), jnp.bfloat16)
    coords = jnp.zeros((b, 2, 2), jnp.float32)
    labels = jnp.array([[1, -1]] * b, jnp.int32)
    # point-prompt path (AMG / propagation)
    out = model.apply(bf, pix, s0, s1, coords, labels, None, True,
                      method=SAM2Model.sam_heads)
    assert out["obj_ptr"].dtype == jnp.bfloat16
    assert out["low_res_masks"].dtype == jnp.float32
    # mask-prompt path (box-to-mask, add_new_mask)
    mask_prompt = jnp.zeros((b, 16, 16, 1), jnp.float32)
    out = model.apply(bf, pix, s0, s1, coords, labels, mask_prompt, False,
                      method=SAM2Model.sam_heads)
    assert out["obj_ptr"].dtype == jnp.bfloat16
