"""Per-stage AMG profile on the real chip (VERDICT round-1 item 5).

Times each stage of the production SAM2AutomaticMaskGenerator path
separately: image encode, the batched point-grid proposal pass (enqueued
async, scalars fetched after), the device finalize (upscale + pack + boxes),
host NMS, and the deferred survivor-mask fetch. Thresholds are 0 so EVERY
proposal survives — the worst case; real thresholds keep far fewer. Prints
one JSON line with the breakdown plus an end-to-end generate() timing at
reference thresholds.
"""

import json
import time

import numpy as np

from sola_tpu.utils import compcache
compcache.enable()


def main(points_per_batch: int = 128, frames: int = 4) -> None:
    import jax
    import jax.numpy as jnp

    from sola_tpu.trackgen.sam2.amg import (SAM2AutomaticMaskGenerator,
                                            build_point_grid, nms)
    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor, unpack_masks

    model, variables = build_sam2(None)
    pred = SAM2ImagePredictor(model, variables)
    amg = SAM2AutomaticMaskGenerator(pred, points_per_batch=points_per_batch,
                                     pred_iou_thresh=0.0,
                                     stability_score_thresh=0.0)
    # thresholds 0 => every proposal survives: worst-case load

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)

    # warmup / compile everything once
    amg.generate(image)

    t = {"encode": 0.0, "propose": 0.0, "finalize_nms": 0.0,
         "fetch_kept": 0.0}
    n_records = n_kept = 0
    for _ in range(frames):
        t0 = time.perf_counter()
        pred.set_image(image)
        float(pred._feats["pix"].astype(jnp.float32).sum())
        t["encode"] += time.perf_counter() - t0

        h, w = image.shape[:2]
        grid = build_point_grid(amg.points_per_side)
        coords = grid * np.asarray([w, h], np.float32)
        bsz = amg.points_per_batch

        t0 = time.perf_counter()
        pending = []
        for start in range(0, len(coords), bsz):
            batch = coords[start:start + bsz]
            if len(batch) < bsz:
                batch = np.concatenate(
                    [batch, np.tile(batch[-1:], (bsz - len(batch), 1))], 0)
            pending.append(pred.propose_device(
                batch[:, None, :], amg.stability_score_offset))
        kept_iou, kept_flat = [], []
        for bi, (ious_dev, stab_dev, _) in enumerate(pending):
            ious = np.asarray(ious_dev)
            stab = np.asarray(stab_dev)
            keep = (ious > amg.pred_iou_thresh) & (
                stab > amg.stability_score_thresh)
            idx_n, idx_k = np.nonzero(keep)
            kept_flat.extend((bi * bsz + idx_n) * ious.shape[1] + idx_k)
            kept_iou.extend(float(x) for x in ious[idx_n, idx_k])
        t["propose"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        k = len(kept_flat)
        k_pad = ((k + 31) // 32) * 32
        idx = np.asarray(kept_flat + [kept_flat[0]] * (k_pad - k), np.int32)
        low_full = jnp.concatenate([p[2] for p in pending], axis=0)
        lh, lw = low_full.shape[-2:]
        low_all = low_full.reshape(-1, lh, lw)[jnp.asarray(idx)]
        packed_dev, boxes, areas = pred.finalize_masks_device(low_all, h, w)
        boxes, areas = boxes[:k], areas[:k]
        idxs = np.nonzero(areas > 0)[0]
        keep_idx = idxs[nms(boxes[idxs], np.asarray(kept_iou)[idxs],
                            amg.box_nms_thresh)] if len(idxs) else idxs
        t["finalize_nms"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        if len(keep_idx):
            sel = np.asarray(packed_dev[jnp.asarray(keep_idx)])
            unpack_masks(sel, h, w)
        t["fetch_kept"] += time.perf_counter() - t0
        n_records = int(k)
        n_kept = int(len(keep_idx))

    out = {k2: round(v / frames, 4) for k2, v in t.items()}
    out["total_s_per_frame"] = round(sum(t.values()) / frames, 4)
    out["survivors"] = n_records
    out["nms_kept"] = n_kept
    out["points_per_batch"] = points_per_batch

    # end-to-end generate() at REFERENCE thresholds (the production call)
    amg_real = SAM2AutomaticMaskGenerator(pred,
                                          points_per_batch=points_per_batch)
    amg_real.generate(image)  # may hit new shapes -> compile
    t0 = time.perf_counter()
    recs = amg_real.generate(image)
    out["generate_s_ref_thresholds"] = round(time.perf_counter() - t0, 4)
    out["records_ref_thresholds"] = len(recs)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    main(points_per_batch=int(sys.argv[1]) if len(sys.argv) > 1 else 128)
