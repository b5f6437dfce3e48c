"""AMG device-side pipeline on the tiny SAM2 config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.trackgen.sam2.amg import SAM2AutomaticMaskGenerator
from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor
from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg = SAM2Config.tiny_test(image_size=64)
    model = SAM2Model(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    return SAM2ImagePredictor(model, variables)


def test_propose_and_finalize(tiny_predictor, rng):
    pred = tiny_predictor
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    pred.set_image(image)
    pts = rng.random((8, 1, 2)).astype(np.float32) * [72, 48]
    ious, stab, low = pred.propose(pts)
    assert ious.shape == (8, 3)
    assert stab.shape == (8, 3)
    assert (stab >= 0).all() and (stab <= 1).all()
    # finalize selected masks at image resolution
    sel = low[jnp.asarray([0, 1]), jnp.asarray([0, 2])]
    masks = pred.finalize_masks(sel, 48, 72)
    assert masks.shape == (2, 48, 72)
    assert masks.dtype == np.uint8


def test_finalize_packed_matches_unpacked(tiny_predictor, rng):
    """Bit-packed finalize (device boxes/areas) must agree exactly with the
    plain uint8 path + host box_from_mask."""
    from sola_tpu.trackgen.sam2.amg import box_from_mask

    pred = tiny_predictor
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    pred.set_image(image)
    pts = rng.random((8, 1, 2)).astype(np.float32) * [72, 48]
    _, _, low = pred.propose(pts)
    sel = low[jnp.asarray([0, 1, 2, 3]), jnp.asarray([0, 2, 1, 0])]
    # force one empty mask through the padded slot convention
    sel = jnp.concatenate([sel, jnp.full((1,) + sel.shape[1:], -10.0)], 0)

    ref = pred.finalize_masks(sel, 48, 72).astype(bool)
    masks, boxes, areas = pred.finalize_masks_packed(sel, 48, 72)

    np.testing.assert_array_equal(masks, ref)
    for i in range(len(ref)):
        np.testing.assert_array_equal(boxes[i], box_from_mask(ref[i]))
        assert int(areas[i]) == int(ref[i].sum())
    assert int(areas[-1]) == 0 and (boxes[-1] == 0).all()


def test_amg_generate_runs(tiny_predictor, rng):
    amg = SAM2AutomaticMaskGenerator(
        tiny_predictor, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=-10.0, stability_score_thresh=-1.0)
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    records = amg.generate(image)
    # permissive thresholds: every non-empty proposal survives to NMS
    for r in records:
        assert r["segmentation"].shape == (48, 72)
        assert r["area"] == int(r["segmentation"].sum())
        assert "stability_score" in r and "predicted_iou" in r
    areas = [r["area"] for r in records]
    assert areas == sorted(areas, reverse=True)


def test_amg_empty_when_thresholds_high(tiny_predictor, rng):
    amg = SAM2AutomaticMaskGenerator(
        tiny_predictor, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=1e9)
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    assert amg.generate(image) == []


def test_predict_packed_matches_dense(tiny_predictor, rng):
    """predict_packed must reproduce predict + host stability exactly:
    same resize/threshold path, bit-packed transfer, device stability."""
    from sola_tpu.trackgen.sam2.image import compute_stability_score

    pred = tiny_predictor
    image = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    pred.set_image(image)
    boxes = np.asarray([[5, 5, 40, 30], [10, 2, 70, 46], [0, 0, 20, 20]],
                       np.float32)
    dm, ds, dl = pred.predict(box=boxes, multimask_output=False)
    pm, ps, pstab = pred.predict_packed(box=boxes)
    assert pm.shape == (3, 48, 72) and pm.dtype == bool
    np.testing.assert_array_equal(pm, dm[:, 0])
    np.testing.assert_allclose(ps, ds[:, 0], atol=1e-5)
    ref_stab = np.asarray([compute_stability_score(lg) for lg in dl[:, 0]])
    np.testing.assert_allclose(pstab, ref_stab, atol=1e-5)
