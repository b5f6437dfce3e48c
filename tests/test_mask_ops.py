"""Mask-op parity tests against straightforward NumPy oracles implementing the
reference conventions (utils.py:131-192, evaluator.py:227-247)."""

import numpy as np
import pytest

from sola_tpu.core import mask_ops


def np_mask_metrics(pred, gt):
    """Oracle for utils.compute_mask_metrics per-frame conventions."""
    T = pred.shape[0]
    precision = np.zeros(T)
    recall = np.zeros(T)
    iou = np.zeros(T)
    for t in range(T):
        inter = (pred[t] * gt[t]).sum()
        union = (pred[t] + gt[t]).sum() - inter
        n_pred = pred[t].sum()
        n_gt = gt[t].sum()
        iou[t] = 1.0 if union == 0 else inter / union
        if n_pred == 0 and n_gt == 0:
            precision[t], recall[t] = 1.0, 1.0
        elif n_pred == 0 and n_gt > 0:
            precision[t], recall[t] = 1.0, 0.0
        elif n_pred > 0 and n_gt == 0:
            precision[t], recall[t] = 0.0, 1.0
        else:
            precision[t], recall[t] = inter / n_pred, inter / n_gt
    return precision, recall, iou


def np_J(pred, gt):
    js = []
    for t in range(pred.shape[0]):
        inter = (pred[t] * gt[t]).sum()
        union = (pred[t] + gt[t]).sum() - inter
        js.append(1.0 if union == 0 else inter / union)
    return np.mean(js)


def np_F(pred, gt):
    tp = (pred * gt).sum()
    fp = ((1 - gt) * pred).sum()
    fn = (gt * (1 - pred)).sum()
    if tp == 0:
        return 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return 2 * precision * recall / (precision + recall)


@pytest.fixture
def masklets(rng):
    pred = (rng.random((6, 32, 48)) > 0.5).astype(np.float32)
    gt = (rng.random((6, 32, 48)) > 0.5).astype(np.float32)
    # exercise the empty-frame conventions
    pred[2] = 0
    gt[3] = 0
    pred[4] = 0
    gt[4] = 0
    return pred, gt


def test_mask_metrics_matches_oracle(masklets):
    pred, gt = masklets
    p, r, i = mask_ops.mask_metrics(pred, gt, reduction="none")
    po, ro, io = np_mask_metrics(pred, gt)
    np.testing.assert_allclose(np.asarray(p), po, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r), ro, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(i), io, rtol=1e-6)
    pm, rm, im = mask_ops.mask_metrics(pred, gt, reduction="mean")
    np.testing.assert_allclose(float(pm), po.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(rm), ro.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(im), io.mean(), rtol=1e-6)


def test_J_F_match_oracle(masklets):
    pred, gt = masklets
    np.testing.assert_allclose(float(mask_ops.compute_J(pred, gt)),
                               np_J(pred, gt), rtol=1e-6)
    np.testing.assert_allclose(float(mask_ops.compute_F(pred, gt)),
                               np_F(pred, gt), rtol=1e-6)
    j, f = mask_ops.compute_JF(pred, gt)
    np.testing.assert_allclose(float(j), np_J(pred, gt), rtol=1e-6)
    np.testing.assert_allclose(float(f), np_F(pred, gt), rtol=1e-6)


def test_J_empty_union_is_one():
    z = np.zeros((3, 8, 8), dtype=np.float32)
    assert float(mask_ops.compute_J(z, z)) == 1.0
    assert float(mask_ops.compute_F(z, z)) == 0.0  # tp==0 -> F=0 convention


def test_partness(rng):
    parts = (rng.random((5, 16, 16)) > 0.4).astype(np.float32)
    full = (rng.random((16, 16)) > 0.4).astype(np.float32)
    p = np.asarray(mask_ops.partness(parts, full))
    for i in range(5):
        inter = (parts[i] * full).sum()
        np.testing.assert_allclose(p[i], inter / parts[i].sum(), rtol=1e-5)


def test_mask_iou_empty_convention():
    a = np.zeros((4, 4), dtype=np.float32)
    assert float(mask_ops.mask_iou(a, a)) == 1.0
    b = a.copy()
    b[0, 0] = 1
    assert float(mask_ops.mask_iou(a, b)) == 0.0


def test_reshape_masklet_matches_torch(rng):
    torch = pytest.importorskip("torch")
    masklet = (rng.random((3, 30, 52)) > 0.5).astype(np.float32)
    ours = np.asarray(mask_ops.reshape_masklet_auto(masklet))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(masklet).unsqueeze(0), size=(540, 960),
        mode="bilinear") > 0.5
    ref = ref.squeeze(0).float().numpy()
    # binarized outputs must agree except possibly at exact-0.5 ties
    mismatch = np.mean(ours != ref)
    assert mismatch < 5e-3, f"reshape mismatch fraction {mismatch}"


def test_reshape_orientation_rule():
    tall = np.zeros((2, 50, 30), dtype=np.float32)
    assert mask_ops.reshape_masklet_auto(tall).shape == (2, 960, 540)
    wide = np.zeros((2, 30, 50), dtype=np.float32)
    assert mask_ops.reshape_masklet_auto(wide).shape == (2, 540, 960)


def test_resize_nearest_np_matches_jax():
    """Host nearest resize is bit-identical to jax.image.resize nearest
    (it replaces a per-mask device round trip on the prompt path)."""
    import jax
    import jax.numpy as jnp

    from sola_tpu.core.mask_ops import resize_nearest_np
    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in [(480, 854, 1024, 1024), (7, 13, 64, 64),
                           (100, 100, 37, 91), (3, 5, 8, 8)]:
        x = rng.random((h, w)).astype(np.float32)
        a = np.asarray(jax.image.resize(jnp.asarray(x), (oh, ow),
                                        method="nearest"))
        b = resize_nearest_np(x, (oh, ow))
        assert np.array_equal(a, b), (h, w, oh, ow)
    # batched leading axis
    x = rng.random((3, 20, 30)).astype(np.float32)
    a = np.asarray(jax.image.resize(jnp.asarray(x), (3, 8, 9),
                                    method="nearest"))
    assert np.array_equal(a, resize_nearest_np(x, (8, 9)))
