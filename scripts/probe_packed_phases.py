"""Decompose packed-vs-sequential engine wall time on chip.

The bench's engine-level comparison (bench.py bench_packed) showed packed
0.89x sequential despite packing halving the scan compute — this probe
times each phase to locate the overhead: conditioning, scan segments,
output collect (mask fetch + small-masklet assembly), and the host-side
finalize/dedup.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_packed_phases.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sola_tpu.utils import compcache  # noqa: E402

compcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sola_tpu.trackgen import engine, packed_engine  # noqa: E402
from sola_tpu.trackgen.sam2 import packed as packed_mod  # noqa: E402
from sola_tpu.trackgen.sam2.convert import build_sam2  # noqa: E402
from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor  # noqa: E402

H, W, T = 480, 854, 32


def make_frames(seed):
    r = np.random.default_rng(seed)
    return [r.integers(0, 255, (H, W, 3), dtype=np.uint8)
            for _ in range(T)]


def make_prompts():
    ps = []
    for i in range(4):
        m = np.zeros((H, W), np.uint8)
        y = 40 + (i * 97) % (H - 140)
        x = 60 + (i * 211) % (W - 220)
        m[y:y + 100, x:x + 160] = 1
        ps.append(engine.PromptMask(prompt_id=i, frame_idx=0,
                                    segmentation=m))
    return ps


def main():
    model, variables = build_sam2(None)
    pred = SAM2VideoPredictor(model, variables, obj_batch=8)
    states = [pred.init_state(make_frames(i)) for i in range(2)]

    # --- instrument PackedPropagator phases ---
    prop = packed_mod.PackedPropagator(pred)
    pack = packed_mod.PackedFeatures.build(states)
    size = pred.cfg.image_size

    video = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    cond = np.zeros(8, np.int64)
    length = np.full(8, T)
    cond_masks = np.zeros((8, size, size), np.float32)
    for s, p in enumerate(make_prompts() + make_prompts()):
        cond_masks[s] = packed_engine._resize_prompt(p.segmentation, size)
    plan = packed_mod.SlotPlan(video=video, cond=cond, length=length)

    # warm everything once
    prop.run_round(pack, plan, cond_masks)

    # phase timing: replicate run_round with blocking between phases
    for rep in range(2):
        t = {}
        t0 = time.perf_counter()
        v = pred.compute_variables
        vid = np.maximum(plan.video, 0)
        cond_gidx = jnp.asarray(
            (pack.offsets[vid] + plan.cond).astype(np.int32))
        cond_u8 = jnp.asarray((cond_masks > 0.5).astype(np.uint8))
        mem, cond_ptr = prop._cond_step(v, pack.feats, cond_gidx, cond_u8)
        jax.block_until_ready(mem)
        t["cond"] = time.perf_counter() - t0

        banks = list(pred._empty_banks())
        banks[0] = banks[0].at[:, 0].set(mem)
        banks[1] = banks[1].at[:, 0].set(True)
        pslot = jnp.asarray((plan.cond % pred.cfg.max_obj_ptrs)
                            .astype(np.int32))
        poh = jax.nn.one_hot(pslot, pred.cfg.max_obj_ptrs, dtype=bool)
        banks[5] = jnp.where(poh[..., None],
                             cond_ptr.astype(prop.cdt)[:, None], banks[5])
        banks[6] = jnp.where(poh,
                             jnp.asarray(plan.cond, jnp.int32)[:, None],
                             banks[6])
        banks[7] = banks[7] | poh
        h = pred.cfg.feat_hw
        seed0 = jnp.zeros((pred.cfg.num_recent, 8, h, h, pred.cfg.mem_dim),
                          prop.cdt)
        cond_min = jnp.asarray(plan.cond.astype(np.int32))
        carry = tuple(banks) + (seed0, cond_min)

        t0 = time.perf_counter()
        passes = {}
        fwd = prop._schedule(plan, False, pack.offsets)
        gidx, fidx, active, lens = fwd
        carry, outs = prop._run_segments(v, pack.feats, carry, gidx, fidx,
                                         active, False)
        jax.block_until_ready(outs[-1][0])
        t["scan_fwd"] = time.perf_counter() - t0
        passes[False] = (outs, fidx, active)

        t0 = time.perf_counter()
        out = prop._collect(pack, plan, passes, cond_u8, cond_ptr)
        # force the device-side smalls too
        for s in out["smalls"]:
            jax.block_until_ready(out["smalls"][s])
        t["collect"] = time.perf_counter() - t0
        print(f"packed rep{rep}: " + "  ".join(
            f"{k}={v:.3f}s" for k, v in t.items()), flush=True)

    # --- sequential engine phases for contrast ---
    for rep in range(2):
        t0 = time.perf_counter()
        for st in states:
            engine.generate_tracks(
                pred, st, make_prompts(), n_frames=T, batch_size=4,
                miou_thresh=2.0, n_max_tracks=4)
        print(f"sequential engine rep{rep}: "
              f"{time.perf_counter() - t0:.3f}s", flush=True)

    # packed engine end-to-end for contrast
    for rep in range(2):
        jobs = [packed_engine.VideoJob(
            video_id=f"v{i}", state=st, prompts=make_prompts(),
            n_frames=T, batch_size=4, miou_thresh=2.0, n_max_tracks=4)
            for i, st in enumerate(states)]
        t0 = time.perf_counter()
        packed_engine.generate_tracks_packed(pred, jobs)
        print(f"packed engine rep{rep}: "
              f"{time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
