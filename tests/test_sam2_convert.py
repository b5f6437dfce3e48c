"""SAM2 converter structural tests: export -> import roundtrip on the tiny
config validates naming coverage and layout transposes in both directions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.trackgen.sam2 import convert
from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model


@pytest.fixture(scope="module")
def tiny():
    cfg = SAM2Config.tiny_test(image_size=64)
    model = SAM2Model(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), img)
    return cfg, model, variables


def test_roundtrip(tiny):
    cfg, model, variables = tiny
    state = convert.params_to_torch_sam2(variables, cfg)
    back = convert.torch_sam2_to_params(state, cfg)
    merged = convert._merge_with_template(variables, back)

    flat_orig = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_new = dict(jax.tree_util.tree_leaves_with_path(merged["params"]))
    for path, leaf in flat_orig:
        new = flat_new[path]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(new),
            err_msg=jax.tree_util.keystr(path))
    # buffers too
    g_orig = variables["buffers"]["prompt_encoder"]["pe_layer"][
        "positional_encoding_gaussian_matrix"]
    g_new = merged["buffers"]["prompt_encoder"]["pe_layer"][
        "positional_encoding_gaussian_matrix"]
    np.testing.assert_array_equal(np.asarray(g_orig), np.asarray(g_new))


def test_converted_params_run(tiny):
    cfg, model, variables = tiny
    state = convert.params_to_torch_sam2(variables, cfg)
    back = convert.torch_sam2_to_params(state, cfg)
    merged = convert._merge_with_template(variables, back)
    img = jnp.ones((1, 64, 64, 3), jnp.float32)
    a = model.apply(variables, img, method=SAM2Model.encode_image)
    b = model.apply(merged, img, method=SAM2Model.encode_image)
    np.testing.assert_allclose(np.asarray(a["pix"]), np.asarray(b["pix"]),
                               atol=1e-6)


def test_merge_rejects_shape_mismatch(tiny):
    cfg, model, variables = tiny
    state = convert.params_to_torch_sam2(variables, cfg)
    state["no_obj_ptr"] = np.zeros((2, 7), np.float32)
    back = convert.torch_sam2_to_params(state, cfg)
    with pytest.raises(AssertionError, match="shape mismatch"):
        convert._merge_with_template(variables, back)


def test_build_sam2_without_checkpoint():
    model, variables = convert.build_sam2(
        ckpt_path="/nonexistent/sam2.pt",
        cfg=SAM2Config.tiny_test(image_size=64))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(variables, img, method=SAM2Model.encode_image)
    assert np.isfinite(np.asarray(out["pix"])).all()


def test_model_family_configs():
    """SAM2 hiera T/S/B+/L configs match the upstream family structure and
    select from checkpoint filenames; GDINO swinb checkpoints pick Swin-B."""
    from sola_tpu.trackgen.gdino.swin import SwinConfig
    from sola_tpu.trackgen.sam2.convert import sam2_config_for
    from sola_tpu.trackgen.sam2.hiera import HieraConfig

    t = HieraConfig.tiny()
    s = HieraConfig.small()
    bp = HieraConfig.base_plus()
    l = HieraConfig.large()
    assert (t.embed_dim, sum(t.stages)) == (96, 12)
    assert (s.embed_dim, sum(s.stages)) == (96, 16)
    assert (bp.embed_dim, bp.num_heads, sum(bp.stages)) == (112, 2, 24)
    assert (l.embed_dim, sum(l.stages)) == (144, 48)
    for cfg_small, cfg_big in ((t, s), (s, bp), (bp, l)):
        assert sum(cfg_small.stages) < sum(cfg_big.stages)

    cfg = sam2_config_for("base_plus")
    assert cfg.image_encoder.hiera.embed_dim == 112
    assert cfg.d_model == 256  # neck/memory shared across sizes

    b = SwinConfig.base()
    assert (b.embed_dim, b.depths, b.window_size) == (128, (2, 2, 18, 2), 12)
