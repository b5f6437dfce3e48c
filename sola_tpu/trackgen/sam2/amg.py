"""SAM2 automatic mask generator: dense point-grid proposal generation.

The grid-prompt source of the pipeline (generate_prompts_grid.py:66-100 uses
``SAM2AutomaticMaskGenerator.generate``). TPU-first layout: the 32x32 point
grid decodes in fixed-size batches inside one jit program per batch (3 masks
per point on the MXU); IoU/stability filtering runs on-device over low-res
logits; only survivors are upscaled to image resolution. Box NMS and RLE
conversion stay on host (tiny work).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Normalized (n^2, 2) xy grid in (0, 1), SAM's AMG layout."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1.0 - offset, n_per_side, dtype=np.float32)
    xs, ys = np.meshgrid(pts, pts)
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)


def box_from_mask(mask: np.ndarray) -> np.ndarray:
    """xyxy bounding box of a binary mask (zeros -> [0,0,0,0])."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros(4, np.float32)
    return np.asarray([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                      np.float32)


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (N, 4) and (M, 4) xyxy boxes."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def nms(boxes: np.ndarray, scores: np.ndarray,
        iou_thresh: float) -> np.ndarray:
    """Greedy NMS; returns kept indices sorted by score desc."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    ious = box_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= ious[i] > iou_thresh
        suppressed[i] = True
    return np.asarray(keep, np.int64)


class SAM2AutomaticMaskGenerator:
    def __init__(self, predictor: SAM2ImagePredictor,
                 points_per_side: int = 32,
                 # 256 points/dispatch: dispatch latency through the host
                 # link is the propose bound on TPU, and HBM affords the
                 # (256, 3, 256, 256) logit buffers (upstream's 64 is a GPU
                 # memory default)
                 points_per_batch: int = 256,
                 pred_iou_thresh: float = 0.8,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7,
                 min_mask_region_area: int = 0,
                 # survivor-buffer cap of the single-dispatch path; at
                 # reference thresholds (0.8/0.95) a frame yields O(100)
                 # survivors, so 1024 (1/3 of the 32x32 grid's absolute max)
                 # never overflows in practice — overflow falls back to the
                 # multi-dispatch path below
                 max_survivors: int = 1024):
        self.predictor = predictor
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area
        self.max_survivors = max_survivors

    def generate(self, image: np.ndarray) -> list[dict]:
        """(H, W, 3) uint8 -> list of mask records sorted by area desc, with
        the fields the grid-prompt CLI consumes (segmentation,
        stability_score, area; generate_prompts_grid.py:119-128).

        Few-dispatch path: encode (1 program) + whole-grid propose/filter
        (1 program, ``propose_filter``) + bucket-padded survivor finalize
        (1 program over O(survivors), not O(buffer)) + one bucket-padded
        gather for the post-NMS mask fetch. Falls back to the per-batch
        multi-dispatch path only if the threshold survivors overflow
        ``max_survivors`` (near-zero thresholds)."""
        return self._finish(self._dispatch_finalize(self._enqueue(image)))

    def generate_many(self, images) -> Iterator[list[dict]]:
        """Pipelined AMG over a frame sequence: frame k's finalize program
        is dispatched (after a scalar n_valid fetch that blocks only on
        its already-finished propose) BEFORE frame k+1's encode + propose
        enqueue, then the heavy host work for frame k (boxes/areas fetch,
        NMS, survivor-mask fetch) runs while the device computes frame
        k+1 (the per-frame hot loop of generate_prompts_grid.py:96-100).
        Enqueuing k+1 first would park frame k's fetches behind k+1's
        whole propose on the in-order stream."""
        prev = None
        for image in images:
            fin = self._dispatch_finalize(prev) if prev is not None else None
            prev = self._enqueue(image)
            if fin is not None:
                yield self._finish(fin)
        if prev is not None:
            yield self._finish(self._dispatch_finalize(prev))

    def _enqueue(self, image: np.ndarray):
        """Device phase: encode + whole-grid propose/filter.
        Returns a pending record; nothing is fetched to host. The small
        survivor outputs (count + per-survivor scalars) start their
        device->host copies HERE — enqueued before any later frame's
        compute, they land the moment propose finishes instead of queuing
        a synchronous round trip behind it (the r4 0.34->0.46 s/frame
        regression: the scalar fetch sat in the device-idle window)."""
        h, w = image.shape[:2]
        self.predictor.set_image(image)
        grid = build_point_grid(self.points_per_side)
        coords = grid * np.asarray([w, h], np.float32)
        out = self.predictor.propose_filter(
            coords[:, None, :], self.stability_score_offset,
            self.pred_iou_thresh, self.stability_score_thresh,
            chunk=self.points_per_batch, k_max=self.max_survivors)
        (_scores, _low_dev, flat_all, iou_all, stab_all, n_valid_dev) = out
        for dev_arr in (n_valid_dev, flat_all, iou_all, stab_all):
            try:
                dev_arr.copy_to_host_async()
            except AttributeError:
                pass  # non-jax arrays in test fakes
        return (image, coords, grid, h, w, out)

    def _harvest(self, pending) -> list[dict]:
        """Finalize-dispatch + host phase in one call (the non-pipelined
        path; generate_many interleaves the two halves around the next
        frame's enqueue)."""
        return self._finish(self._dispatch_finalize(pending))

    def _dispatch_finalize(self, pending):
        """Cheap boundary phase: fetch the scalar survivor count (blocks
        only on the already-enqueued propose program) and DISPATCH the
        bucket-padded finalize — no heavy host fetch happens here."""
        image, coords, grid, h, w, out = pending
        (_scores, low_dev, flat_all, iou_all, stab_all, n_valid_dev) = out
        k = int(n_valid_dev)
        if k > self.max_survivors:
            # rare overflow (near-zero thresholds): re-encode this image —
            # the predictor's cached features may already be a later
            # frame's in the pipelined path
            self.predictor.set_image(image)
            return ("records",
                    self._generate_multi_dispatch(image, coords, grid, h, w))
        if k == 0:
            return ("records", [])
        # the buffer is score-sorted desc, so the k survivors occupy the
        # leading rows; finalize only the next power-of-two bucket (>=64)
        # instead of the whole max_survivors buffer (~10x less resize work
        # at reference thresholds, O(1) distinct program shapes)
        k_fin = min(low_dev.shape[0], max(64, 1 << (k - 1).bit_length()))
        packed_dev, boxes_dev, areas_dev = \
            self.predictor.finalize_masks_dispatch(low_dev, h, w, k_fin=k_fin)
        # start the finalize outputs' host copies now: enqueued before the
        # NEXT frame's propose, they complete when finalize does instead of
        # waiting behind the next frame's compute on the in-order stream
        for dev_arr in (packed_dev, boxes_dev, areas_dev):
            try:
                dev_arr.copy_to_host_async()
            except AttributeError:
                pass
        return ("fin", packed_dev, boxes_dev, areas_dev, k,
                iou_all, stab_all, flat_all, coords, h, w)

    def _finish(self, fin) -> list[dict]:
        """Heavy host phase: boxes/areas fetch, NMS, survivor-mask fetch,
        record emit. In the pipelined path this runs while the device
        computes the NEXT frame's encode/propose."""
        if fin[0] == "records":
            return fin[1]
        (_, packed_dev, boxes_dev, areas_dev, k,
         iou_all, stab_all, flat_all, coords, h, w) = fin
        boxes = np.asarray(boxes_dev)[:k]
        areas = np.asarray(areas_dev)[:k]
        kept_iou = [float(x) for x in np.asarray(iou_all)[:k]]
        kept_stab = [float(x) for x in np.asarray(stab_all)[:k]]
        flat = np.asarray(flat_all)[:k]
        kept_pts = [coords[i] for i in flat // 3]
        return self._select_and_emit(packed_dev, boxes, areas, kept_iou,
                                     kept_stab, kept_pts, h, w,
                                     packed_prefetched=True)

    def _generate_multi_dispatch(self, image, coords, grid, h, w):
        """Per-point-batch dispatch path (round-2 design): only used when
        survivors overflow the single-dispatch buffer — i.e. near-zero
        thresholds where nearly all (points x 3) proposals survive and a
        bounded buffer cannot hold them."""
        bsz = self.points_per_batch
        n_pad = ((len(coords) + bsz - 1) // bsz) * bsz
        coords = np.concatenate(
            [coords, np.tile(coords[-1:], (n_pad - len(coords), 1))], axis=0)

        # device-side proposal pass: enqueue EVERY point batch before
        # fetching any result (dispatch runs ahead; the scalar fetches
        # overlap later batches' compute instead of a host round trip per
        # batch), and only (iou, stability) scalars cross to host
        pending = []
        for start in range(0, len(coords), bsz):
            batch = coords[start:start + bsz]
            valid = min(bsz, len(grid) - start)
            if valid <= 0:
                break
            ious_dev, stab_dev, low_dev = self.predictor.propose_device(
                batch[:, None, :], self.stability_score_offset)
            pending.append((batch, valid, ious_dev, stab_dev, low_dev))

        # host: one keep decision over all batches; device: ONE gather with
        # bucket-padded indices (data-dependent shapes would compile a
        # fresh program per survivor count on every real frame)
        kept_iou, kept_stab, kept_pts, kept_flat_idx = [], [], [], []
        for bi, (batch, valid, ious_dev, stab_dev, low_dev) in enumerate(
                pending):
            ious = np.asarray(ious_dev)
            stab = np.asarray(stab_dev)
            keep = (ious > self.pred_iou_thresh) & (
                stab > self.stability_score_thresh)
            keep[valid:] = False
            idx_n, idx_k = np.nonzero(keep)
            kept_flat_idx.extend(
                (bi * bsz + idx_n) * ious.shape[1] + idx_k)
            kept_iou.extend(float(x) for x in ious[idx_n, idx_k])
            kept_stab.extend(float(x) for x in stab[idx_n, idx_k])
            kept_pts.extend(batch[i] for i in idx_n)

        if not kept_flat_idx:
            return []
        k = len(kept_flat_idx)
        k_pad = ((k + 31) // 32) * 32
        # bucket-pad by repeating a real row: every device gather below has
        # one of O(1) static shapes, not one per survivor count
        idx = np.asarray(kept_flat_idx + [kept_flat_idx[0]] * (k_pad - k),
                         np.int32)
        low_full = jnp.concatenate([p[4] for p in pending], axis=0)
        lh, lw = low_full.shape[-2:]
        low_all = low_full.reshape(-1, lh, lw)[jnp.asarray(idx)]

        # upscale only the survivors, threshold on device; boxes/areas come
        # from device reductions and the bit-packed masks STAY on device —
        # NMS runs on the cheap host boxes and only the kept rows are ever
        # fetched
        packed_dev, boxes, areas = self.predictor.finalize_masks_device(
            low_all, h, w)
        boxes, areas = boxes[:k], areas[:k]
        return self._select_and_emit(packed_dev, boxes, areas, kept_iou,
                                     kept_stab, kept_pts, h, w)

    def _select_and_emit(self, packed_dev, boxes, areas, kept_iou,
                         kept_stab, kept_pts, h, w,
                         packed_prefetched: bool = False) -> list[dict]:
        """Shared AMG tail: small-region postprocess, host NMS over device
        boxes, then the kept bit-packed masks. ``packed_prefetched``:
        the single-dispatch path already started the whole (small,
        bucket-padded) packed buffer's async host copy at finalize time —
        slice it on host instead of a device gather, whose dispatch+fetch
        round trip would queue behind the NEXT frame's propose in the
        pipelined path (the r4 AMG regression). The multi-dispatch
        fallback's buffer can be ~3k masks, so it keeps the gather."""
        from sola_tpu.trackgen.sam2.image import unpack_masks

        k = len(kept_iou)
        if self.min_mask_region_area > 0:
            # CCL edits need every mask on host and change geometry
            masks = unpack_masks(np.asarray(packed_dev), h, w)[:k]
            masks, kept_iou, kept_stab, kept_pts = \
                self._postprocess_small_regions(masks, kept_iou, kept_stab,
                                                kept_pts)
            if len(masks) == 0:
                return []
            boxes = np.stack([box_from_mask(m) for m in masks], axis=0)
            areas = masks.reshape(len(masks), -1).sum(axis=1)
            fetch_masks = lambda keep: masks[keep]  # already on host
        elif packed_prefetched:
            def fetch_masks(keep):
                # materializes the copy started at finalize dispatch; no
                # new stream op, so nothing queues behind the next frame
                return unpack_masks(np.asarray(packed_dev)[keep], h, w)
        else:
            def fetch_masks(keep):
                kk = len(keep)
                kk_pad = ((kk + 15) // 16) * 16
                keep_p = np.concatenate(
                    [keep, np.full(kk_pad - kk, keep[0], keep.dtype)])
                sel = np.asarray(packed_dev[jnp.asarray(keep_p)])[:kk]
                return unpack_masks(sel, h, w)

        nonempty = areas > max(self.min_mask_region_area, 0)
        idxs = np.nonzero(nonempty)[0]
        if len(idxs) == 0:
            return []
        keep = idxs[nms(boxes[idxs], np.asarray(kept_iou)[idxs],
                        self.box_nms_thresh)]
        kept_masks = fetch_masks(keep)

        records = []
        for j, i in enumerate(keep):
            records.append({
                "segmentation": kept_masks[j],
                "area": int(areas[i]),
                "bbox": boxes[i].tolist(),
                "predicted_iou": kept_iou[i],
                "stability_score": kept_stab[i],
                "point_coords": [kept_pts[i].tolist()],
            })
        records.sort(key=lambda r: r["area"], reverse=True)
        return records

    def _postprocess_small_regions(self, masks, ious, stabs, pts):
        """Upstream postprocess_small_regions (the CUDA-CCL path,
        SURVEY.md §2.4 item 3): fill small holes, drop small islands, then
        NMS over the recomputed boxes preferring unchanged masks."""
        from sola_tpu.core.ccl import remove_small_regions

        area = self.min_mask_region_area
        new_masks, unchanged_scores = [], []
        for m in masks:
            m2, ch1 = remove_small_regions(m, area, "holes")
            m3, ch2 = remove_small_regions(m2, area, "islands")
            new_masks.append(m3)
            unchanged_scores.append(float(not (ch1 or ch2)))
        new_masks = np.stack(new_masks, axis=0)
        boxes = np.stack([box_from_mask(m) for m in new_masks], axis=0)
        keep = nms(boxes, np.asarray(unchanged_scores), self.box_nms_thresh)
        keep = np.sort(keep)
        return (new_masks[keep], [ious[i] for i in keep],
                [stabs[i] for i in keep], [pts[i] for i in keep])
