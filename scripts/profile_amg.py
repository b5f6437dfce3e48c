"""Per-stage AMG profile on the real chip.

Times the production single-dispatch AMG path stage by stage: image encode,
the whole-grid propose/filter program (one dispatch), the finalize dispatch
(scalar survivor-count fetch + bucket-padded finalize enqueue), and the host
finish (boxes/areas fetch + NMS + bucket-padded survivor-mask fetch) — plus
the end-to-end ``generate()`` and the pipelined ``generate_many`` steady state
(the number the driver bench reports). Run this to see where
``amg_s_per_frame`` goes before optimizing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_amg.py
       [--points_per_batch 256] [--frames 4]
"""

import argparse
import json
import time

import numpy as np

from sola_tpu.utils import compcache

compcache.enable()


def main(points_per_batch: int = 256, frames: int = 4) -> None:
    import jax

    from sola_tpu.trackgen.sam2.amg import SAM2AutomaticMaskGenerator
    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor

    model, variables = build_sam2(None)
    pred = SAM2ImagePredictor(model, variables)
    amg = SAM2AutomaticMaskGenerator(pred, points_per_batch=points_per_batch)

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)

    amg.generate(image)  # compile everything once

    t = {"encode": 0.0, "propose_filter": 0.0, "finalize_dispatch": 0.0,
         "finish": 0.0}
    n_records = 0
    for _ in range(frames):
        t0 = time.perf_counter()
        pred.set_image(image)
        jax.block_until_ready(pred._feats["pix"])
        t["encode"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        pending = amg._enqueue(image)
        jax.block_until_ready(pending[5][0])  # survivor buffer ready
        t["propose_filter"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        fin = amg._dispatch_finalize(pending)
        t["finalize_dispatch"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        records = amg._finish(fin)
        t["finish"] += time.perf_counter() - t0
        n_records = len(records)

    out = {k: round(v / frames, 4) for k, v in t.items()}
    # NOTE: propose_filter above re-runs set_image inside _enqueue,
    # so it includes a second encode; enc-corrected figure:
    out["propose_minus_encode"] = round(
        out["propose_filter"] - out["encode"], 4)
    out["records"] = n_records
    out["points_per_batch"] = points_per_batch

    # end-to-end generate() (single-frame latency)
    t0 = time.perf_counter()
    amg.generate(image)
    out["generate_s"] = round(time.perf_counter() - t0, 4)

    # pipelined steady state over distinct frames (the driver-bench number)
    imgs = [rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)
            for _ in range(frames)]
    for _ in amg.generate_many(imgs):
        pass  # warm distinct-shape paths
    t0 = time.perf_counter()
    for _ in amg.generate_many(imgs):
        pass
    out["generate_many_s_per_frame"] = round(
        (time.perf_counter() - t0) / len(imgs), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--points_per_batch", type=int, default=256)
    ap.add_argument("--frames", type=int, default=4)
    a = ap.parse_args()
    main(points_per_batch=a.points_per_batch, frames=a.frames)
