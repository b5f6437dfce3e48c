"""Measure the cross-video packed-propagation win on chip.

Scenario: two videos whose next prompt batches carry 4 objects each — the
reference's per-video ceiling (generate_tokens_grid.py:181-186). The
sequential path runs two propagation rounds at 4/8 slot utilization (or
at obj_batch=4, paying the per-frame fixed overhead twice); the packed
path runs ONE round with all 8 slots live.

Reports seconds per (video, direction) pass and aggregate object-frames/s
for: sequential obj_batch=4 (reference operating point), sequential
obj_batch=8 (half slots padded), packed 2x4 at obj_batch=8.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_packed.py
       [--frames 32] [--hw 480x854] [--repeats 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sola_tpu.utils import compcache  # noqa: E402

compcache.enable()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--hw", default="480x854")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))
    T = args.frames

    from sola_tpu.trackgen import engine, packed_engine
    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor

    model, variables = build_sam2(None)
    rng = np.random.default_rng(0)

    def make_frames(seed):
        r = np.random.default_rng(seed)
        return [r.integers(0, 255, (H, W, 3), dtype=np.uint8)
                for _ in range(T)]

    def make_prompts(k=4):
        ps = []
        for i in range(k):
            m = np.zeros((H, W), np.uint8)
            y = 40 + (i * 97) % (H - 140)
            x = 60 + (i * 211) % (W - 220)
            m[y:y + 100, x:x + 160] = 1
            ps.append(engine.PromptMask(prompt_id=i, frame_idx=0,
                                        segmentation=m))
        return ps

    videos = [make_frames(0), make_frames(1)]

    def run_sequential(obj_batch):
        pred = SAM2VideoPredictor(model, variables, obj_batch=obj_batch)
        states = [pred.init_state(v) for v in videos]
        def once():
            t0 = time.perf_counter()
            for st in states:
                engine.generate_tracks(
                    pred, st, make_prompts(), n_frames=T, batch_size=4,
                    miou_thresh=2.0,  # no dedup: isolate propagation
                    n_max_tracks=4)
            return time.perf_counter() - t0
        once()  # warm/compile
        return min(once() for _ in range(args.repeats))

    def run_packed():
        pred = SAM2VideoPredictor(model, variables, obj_batch=8)
        states = [pred.init_state(v) for v in videos]
        def once():
            jobs = [packed_engine.VideoJob(
                video_id=f"v{i}", state=st, prompts=make_prompts(),
                n_frames=T, batch_size=4, miou_thresh=2.0, n_max_tracks=4)
                for i, st in enumerate(states)]
            t0 = time.perf_counter()
            packed_engine.generate_tracks_packed(pred, jobs)
            return time.perf_counter() - t0
        once()
        return min(once() for _ in range(args.repeats))

    obj_frames = 2 * 4 * T  # 2 videos x 4 objects x T frames (fwd covers T)
    t_seq4 = run_sequential(4)
    print(f"sequential obj_batch=4: {t_seq4:.2f}s "
          f"({obj_frames / t_seq4:.1f} object-fps)", flush=True)
    t_seq8 = run_sequential(8)
    print(f"sequential obj_batch=8 (4 padded): {t_seq8:.2f}s "
          f"({obj_frames / t_seq8:.1f} object-fps)", flush=True)
    t_packed = run_packed()
    print(f"packed 2x4 @ obj_batch=8: {t_packed:.2f}s "
          f"({obj_frames / t_packed:.1f} object-fps)", flush=True)
    print(f"packed speedup vs sequential@4: {t_seq4 / t_packed:.2f}x | "
          f"vs sequential@8: {t_seq8 / t_packed:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
