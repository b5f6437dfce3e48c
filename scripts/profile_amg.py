"""Per-stage AMG profile on the real chip (VERDICT round-1 item 5).

Times each stage of SAM2AutomaticMaskGenerator.generate separately:
image encode, the batched point-grid proposal pass (device), the
survivor finalize (upscale+threshold), and host postprocessing
(boxes/NMS/records). Prints one JSON line with the breakdown.
"""

import json
import time

import numpy as np


def main(points_per_batch: int = 128, frames: int = 4) -> None:
    import jax
    import jax.numpy as jnp

    from sola_tpu.trackgen.sam2.amg import SAM2AutomaticMaskGenerator
    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor

    model, variables = build_sam2(None)
    pred = SAM2ImagePredictor(model, variables)
    amg = SAM2AutomaticMaskGenerator(pred, points_per_batch=points_per_batch,
                                     pred_iou_thresh=0.0,
                                     stability_score_thresh=0.0)
    # thresholds 0 => every proposal survives: worst-case finalize load

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)

    # warmup / compile everything once
    amg.generate(image)

    t = {"encode": 0.0, "propose": 0.0, "finalize": 0.0, "host_post": 0.0}
    n_records = 0
    for _ in range(frames):
        t0 = time.perf_counter()
        pred.set_image(image)
        jax.block_until_ready(pred._feats["pix"])
        t["encode"] += time.perf_counter() - t0

        h, w = image.shape[:2]
        from sola_tpu.trackgen.sam2.amg import build_point_grid
        grid = build_point_grid(amg.points_per_side)
        coords = grid * np.asarray([w, h], np.float32)
        bsz = amg.points_per_batch

        t0 = time.perf_counter()
        kept_dev, kept_iou, kept_stab = [], [], []
        for start in range(0, len(coords), bsz):
            batch = coords[start:start + bsz]
            if len(batch) < bsz:
                batch = np.concatenate(
                    [batch, np.tile(batch[-1:], (bsz - len(batch), 1))], 0)
            ious, stab, low_dev = pred.propose(batch[:, None, :],
                                               amg.stability_score_offset)
            keep = (ious > amg.pred_iou_thresh) & (
                stab > amg.stability_score_thresh)
            idx_n, idx_k = np.nonzero(keep)
            if len(idx_n):
                kept_dev.append(low_dev[jnp.asarray(idx_n),
                                        jnp.asarray(idx_k)])
                kept_iou.extend(float(x) for x in ious[idx_n, idx_k])
                kept_stab.extend(float(x) for x in stab[idx_n, idx_k])
        jax.block_until_ready(kept_dev[-1])
        t["propose"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        low_all = jnp.concatenate(kept_dev, axis=0)
        k = low_all.shape[0]
        k_pad = ((k + 31) // 32) * 32
        low_all = jnp.pad(low_all, ((0, k_pad - k), (0, 0), (0, 0)),
                          constant_values=-10.0)
        masks, boxes, areas = pred.finalize_masks_packed(low_all, h, w)
        masks, boxes, areas = masks[:k], boxes[:k], areas[:k]
        t["finalize"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        from sola_tpu.trackgen.sam2.amg import nms
        idxs = np.nonzero(areas > 0)[0]
        if len(idxs):
            nms(boxes[idxs], np.asarray(kept_iou)[idxs], amg.box_nms_thresh)
        t["host_post"] += time.perf_counter() - t0
        n_records = int(k)

    out = {k2: round(v / frames, 4) for k2, v in t.items()}
    out["total_s_per_frame"] = round(sum(t.values()) / frames, 4)
    out["survivors"] = n_records
    out["points_per_batch"] = points_per_batch
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    main(points_per_batch=int(sys.argv[1]) if len(sys.argv) > 1 else 128)
