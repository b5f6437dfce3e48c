"""Batched, jit-friendly mask metrics on device.

Replicates the reference's mask arithmetic and its empty-mask conventions
exactly, but vectorized over frames/masks so the whole (T, H, W) masklet is a
single XLA program instead of a per-frame Python loop:

* IoU with union==0 -> 1.0 and precision/recall conventions:
  track_generation/utils.py:131-174 (compute_mask_metrics)
* partness P = |part & full| / |part|: track_generation/utils.py:177-192
* J (per-frame IoU mean, union==0 -> 1.0): evaluator.py:227-237
* F (pixel F-measure over the whole masklet, tp==0 -> 0.0):
  evaluator.py:239-247  (note: pixel F, NOT the DAVIS boundary F)
* reshape_masklet (bilinear resize, >0.5 binarize, 540/960 orientation rule):
  track_generation/seg_utils.py:145-160

All functions take float or uint8 arrays with values in {0, 1} and reduce in
float32 (sums over H*W can exceed bf16 precision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def mask_iou(mask_a: jax.Array, mask_b: jax.Array) -> jax.Array:
    """IoU of two (..., H, W) masks over the last two axes; union==0 -> 1.0.

    Matches seg_utils.compute_mask_iou / compute_masklet_iou semantics
    (seg_utils.py:109-142) when given (H, W) or (T, H, W) inputs.
    """
    a = mask_a.astype(jnp.float32)
    b = mask_b.astype(jnp.float32)
    inter = jnp.sum(a * b, axis=(-2, -1))
    union = jnp.sum(a, axis=(-2, -1)) + jnp.sum(b, axis=(-2, -1)) - inter
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))


@jax.jit
def masklet_iou(masklet_a: jax.Array, masklet_b: jax.Array) -> jax.Array:
    """Whole-masklet IoU: single scalar over all of (T, H, W); union==0 -> 1.0.

    Matches seg_utils.compute_masklet_iou (seg_utils.py:109-125), which sums
    over the full tensor rather than per frame.
    """
    a = masklet_a.astype(jnp.float32)
    b = masklet_b.astype(jnp.float32)
    inter = jnp.sum(a * b)
    union = jnp.sum(a) + jnp.sum(b) - inter
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))


@functools.partial(jax.jit, static_argnames=("reduction",))
def mask_metrics(pred_masks: jax.Array, gt_masks: jax.Array,
                 reduction: str = "mean"):
    """Per-frame (precision, recall, iou) for (T, H, W) masklets.

    Vectorized port of utils.compute_mask_metrics (utils.py:131-174) with the
    exact empty-mask conventions:
        union == 0           -> iou 1.0
        n_pred==0, n_gt==0   -> precision 1.0, recall 1.0
        n_pred==0, n_gt>0    -> precision 1.0, recall 0.0
        n_pred>0,  n_gt==0   -> precision 0.0, recall 1.0
    """
    p = pred_masks.astype(jnp.float32)
    g = gt_masks.astype(jnp.float32)
    inter = jnp.sum(p * g, axis=(-2, -1))
    n_pred = jnp.sum(p, axis=(-2, -1))
    n_gt = jnp.sum(g, axis=(-2, -1))
    union = n_pred + n_gt - inter
    iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))
    precision = jnp.where(n_pred == 0, 1.0, inter / jnp.maximum(n_pred, 1.0))
    precision = jnp.where((n_pred > 0) & (n_gt == 0), 0.0, precision)
    recall = jnp.where(n_gt == 0, 1.0, inter / jnp.maximum(n_gt, 1.0))
    recall = jnp.where((n_gt > 0) & (n_pred == 0), 0.0, recall)
    if reduction == "mean":
        return precision.mean(), recall.mean(), iou.mean()
    elif reduction == "none":
        return precision, recall, iou
    raise ValueError(f"Invalid reduction method: {reduction}")


@jax.jit
def partness(part_masks: jax.Array, full_mask: jax.Array) -> jax.Array:
    """P = |part & full| / |part| for (N, H, W) parts vs one (H, W) full mask.

    Port of utils.compute_P (utils.py:177-192); the intersection is a single
    (N, HW) @ (HW, 1) matmul, which XLA maps onto the MXU.
    """
    n = part_masks.shape[0]
    parts = part_masks.astype(jnp.float32).reshape(n, -1)
    full = full_mask.astype(jnp.float32).reshape(-1, 1)
    inter = jnp.dot(parts, full, preferred_element_type=jnp.float32)
    n_part = jnp.sum(parts, axis=1, keepdims=True)
    return (inter / n_part).squeeze(1)


@jax.jit
def compute_J(pred_masklet: jax.Array, gt_masklet: jax.Array) -> jax.Array:
    """Region similarity J: mean per-frame IoU, union==0 -> 1.0.

    Exact semantics of Evaluator.compute_J (evaluator.py:227-237) without the
    per-frame host loop.
    """
    return mask_iou(pred_masklet.astype(jnp.float32),
                    gt_masklet.astype(jnp.float32)).mean()


@jax.jit
def compute_F(pred_masklet: jax.Array, gt_masklet: jax.Array) -> jax.Array:
    """Pixel F-measure over the whole masklet, tp==0 -> 0.0.

    Exact semantics of Evaluator.compute_F (evaluator.py:239-247). This is a
    pixel-level F-score, not the DAVIS boundary F-measure — the parity target
    is the reference's definition.
    """
    p = pred_masklet.astype(jnp.float32)
    g = gt_masklet.astype(jnp.float32)
    tp = jnp.sum(p * g)
    fp = jnp.sum((1.0 - g) * p)
    fn = jnp.sum(g * (1.0 - p))
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f = 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-38)
    return jnp.where(tp == 0, 0.0, f)


@jax.jit
def compute_JF(pred_masklet: jax.Array, gt_masklet: jax.Array):
    """Fused (J, F) in one device program — one HBM pass over both masklets."""
    p = pred_masklet.astype(jnp.float32)
    g = gt_masklet.astype(jnp.float32)
    inter_t = jnp.sum(p * g, axis=(-2, -1))
    np_t = jnp.sum(p, axis=(-2, -1))
    ng_t = jnp.sum(g, axis=(-2, -1))
    union_t = np_t + ng_t - inter_t
    j = jnp.where(union_t == 0, 1.0,
                  inter_t / jnp.maximum(union_t, 1.0)).mean()
    tp = inter_t.sum()
    fp = (np_t - inter_t).sum()
    fn = (ng_t - inter_t).sum()
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f = 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-38)
    f = jnp.where(tp == 0, 0.0, f)
    return j, f


def reshape_hw(h: int, w: int) -> tuple[int, int]:
    """The reference's <=960x540 canonical size rule (seg_utils.py:153-155)."""
    return (540, 960) if h < w else (960, 540)


def resize_nearest_np(x: "np.ndarray", out_hw: tuple[int, int]):
    """Host-side nearest resize, bit-identical to
    ``jax.image.resize(x, out_hw, method='nearest')`` (half-pixel-center
    floor indexing; equality verified across shapes in tests). A nearest
    resize is an index gather — routing it through the device costs an
    upload + fetch round trip per mask (~6 MB fp32 at 1024^2), which
    dominated prompt registration over this sandbox's host link."""
    import numpy as np
    oh, ow = out_hw
    h, w = x.shape[-2:]
    ri = np.floor((np.arange(oh) + 0.5) * h / oh).astype(np.int64)
    ci = np.floor((np.arange(ow) + 0.5) * w / ow).astype(np.int64)
    return x[..., ri[:, None], ci[None, :]]


@functools.partial(jax.jit, static_argnames=("target_shape",))
def reshape_masklet(masklet: jax.Array, target_shape: tuple[int, int]) -> jax.Array:
    """Bilinear-resize a (T, H, W) masklet and binarize at 0.5.

    Port of seg_utils.reshape_masklet (seg_utils.py:145-160): torch
    F.interpolate(mode='bilinear', align_corners=False) corresponds to
    jax.image.resize(method='linear') (both use half-pixel centers).
    """
    t = masklet.shape[0]
    new_h, new_w = target_shape
    resized = jax.image.resize(masklet.astype(jnp.float32),
                               (t, new_h, new_w), method="linear")
    return (resized > 0.5).astype(jnp.float32)


def reshape_masklet_auto(masklet: jax.Array) -> jax.Array:
    """reshape_masklet with the 540/960 orientation rule applied."""
    _, h, w = masklet.shape
    return reshape_masklet(masklet, reshape_hw(h, w))
