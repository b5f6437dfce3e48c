"""GT-prompted token generation (training labels).

Port of generate_tokens_GT_{mevis,ytbvos}.py: each GT object is seeded with
its own mask at every appearance onset (gt_utils.get_prompt_masks — the
function the reference calls but never defines, SURVEY.md §2.5), propagated
bidirectionally, and saved as a ``gt_tracks`` artifact keyed by the GT
anno id with ``prompt_type: "GT MASK"``.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Callable, Optional

import numpy as np

from sola_tpu.core import mask_ops, rle
from sola_tpu.data import meta as meta_lib
from sola_tpu.data import tracks as tracks_lib
from sola_tpu.trackgen import gt_utils
from sola_tpu.trackgen.prefetch import StatePrefetcher
from sola_tpu.trackgen.tokens_grid import DATA_DIR_DICT


def run_gt_object(predictor, state, anno_id, gt_masklet: np.ndarray,
                  n_frames: int, *, max_seeds: Optional[int] = None) -> dict:
    """Track one GT object; returns {"masklet", "masklet_small", "tokens"}."""
    seeds = gt_utils.get_prompt_masks(gt_masklet, max_seeds=max_seeds)
    assert seeds, f"GT masklet for anno {anno_id} is empty"
    predictor.reset_state(state)
    masklet = [None] * n_frames
    for seed in seeds:
        _, _, logits = predictor.add_new_mask(
            state, seed["frame_idx"], 0, seed["mask"])
        masklet[seed["frame_idx"]] = (
            np.asarray(logits[0]) > 0.0).astype(np.uint8)
    for frame_idx, _, logits in predictor.propagate_in_video(state):
        masklet[frame_idx] = (np.asarray(logits[0, 0]) > 0.0).astype(
            np.uint8)
    for frame_idx, _, logits in predictor.propagate_in_video(state,
                                                             reverse=True):
        masklet[frame_idx] = (np.asarray(logits[0, 0]) > 0.0).astype(
            np.uint8)
    assert all(m is not None for m in masklet)
    masklet = np.stack(masklet, axis=0)
    tokens_by_frame = predictor.get_output_tokens(state)
    tokens = np.stack([np.asarray(tokens_by_frame[f][0])
                       for f in range(n_frames)], axis=0)
    small = np.asarray(mask_ops.reshape_masklet_auto(
        masklet.astype(np.float32)))
    return {"masklet": masklet, "masklet_small": small, "tokens": tokens}


def run_video(predictor, state, video_id: str, gt_masklets: dict,
              n_frames: int, track_root: str, dataset: str, data_type: str,
              *, save_prec_rec_iou: bool = False,
              gt_small: Optional[dict] = None,
              output_dir_name: str = "gt_tracks",
              log: Callable[[str], None] = print) -> dict:
    census = {}
    for anno_id, gt_masklet in gt_masklets.items():
        start = time.time()
        out = run_gt_object(predictor, state, anno_id, gt_masklet, n_frames)
        metrics = None
        if save_prec_rec_iou and gt_small is not None:
            metrics = gt_utils.metrics_vs_gt(out["masklet_small"], gt_small)
        tracks_lib.save_track(
            track_root, output_dir_name, dataset, data_type, video_id,
            int(anno_id), rle.encode_masklet(out["masklet"]), "GT MASK",
            out["tokens"], metrics=metrics)
        census[str(anno_id)] = {
            "time": time.time() - start,
            "n_frames": n_frames,
        }
        log(f"video {video_id} anno {anno_id}: "
            f"{census[str(anno_id)]['time']:.2f}s")
    return census


def run_videos_packed_gt(predictor, items, track_root: str, dataset: str,
                         data_type: str, *, save_prec_rec_iou: bool = False,
                         output_dir_name: str = "gt_tracks",
                         log: Callable[[str], None] = print) -> dict:
    """Pack several videos' GT objects into shared propagation rounds.

    The reference tracks one GT object per propagation pass
    (generate_tokens_GT_mevis.py:110-116, obj_id=0) — 1/obj_batch slot
    utilization on the TPU object axis. Each single-seed GT object is an
    independent (video, object) slot, so ``PackedPropagator`` rounds carry
    up to ``obj_batch`` of them at once, across videos. Objects with
    multiple appearance onsets (re-appearing objects need several
    conditioning frames) fall back to the sequential ``run_gt_object``.
    Artifacts are identical to per-object ``run_video`` calls.

    ``items``: [{"video_id", "state", "gt_masklets", "n_frames",
    "gt_small"}] — states already encoded.
    """
    from sola_tpu.trackgen import packed_engine
    from sola_tpu.trackgen.sam2.packed import (PackedFeatures,
                                               PackedPropagator, SlotPlan)
    b = predictor.obj_batch
    size = predictor.cfg.image_size
    prop = PackedPropagator(predictor)
    pack = PackedFeatures.build([it["state"] for it in items])
    censuses = {it["video_id"]: {} for it in items}

    units = []
    for vi, it in enumerate(items):
        for anno_id, gt in it["gt_masklets"].items():
            seeds = gt_utils.get_prompt_masks(gt)
            assert seeds, f"GT masklet for anno {anno_id} is empty"
            units.append((vi, anno_id, seeds))
    packed_units = [u for u in units if len(u[2]) == 1]
    multi_units = [u for u in units if len(u[2]) > 1]
    # longest-first: a round's scan length is the max of its slots' video
    # lengths, so grouping similar-length videos minimizes padded idle
    # steps (same policy as packed_engine's request packing). Artifact
    # content is per-object and unaffected by round membership.
    packed_units.sort(key=lambda u: -items[u[0]]["n_frames"])

    def finish(vi, anno_id, out, elapsed):
        it = items[vi]
        metrics = None
        if save_prec_rec_iou and it.get("gt_small") is not None:
            metrics = gt_utils.metrics_vs_gt(out["masklet_small"],
                                             it["gt_small"])
        tracks_lib.save_track(
            track_root, output_dir_name, dataset, data_type,
            it["video_id"], int(anno_id),
            rle.encode_masklet(out["masklet"]), "GT MASK", out["tokens"],
            metrics=metrics)
        censuses[it["video_id"]][str(anno_id)] = {
            "time": elapsed,
            "n_frames": it["n_frames"],
        }

    for g0 in range(0, len(packed_units), b):
        group = packed_units[g0:g0 + b]
        start = time.time()
        video = np.full((b,), -1, np.int64)
        cond = np.zeros((b,), np.int64)
        length = np.ones((b,), np.int64)
        cond_masks = np.zeros((b, size, size), np.float32)
        for s, (vi, anno_id, seeds) in enumerate(group):
            video[s] = vi
            cond[s] = seeds[0]["frame_idx"]
            length[s] = items[vi]["n_frames"]
            cond_masks[s] = packed_engine._resize_prompt(seeds[0]["mask"],
                                                         size)
        log(f"gt pack: {len(group)}/{b} slots from "
            f"{sorted({items[vi]['video_id'] for vi, _, _ in group})}")
        out = prop.run_round(
            pack, SlotPlan(video=video, cond=cond, length=length),
            cond_masks)
        # per-object cost attribution: the round's wall time is shared by
        # its slots (sequential semantics report per-object times; a
        # group total per object would inflate runtime_info obj_batch-fold)
        share = (time.time() - start) / max(len(group), 1)
        for s, (vi, anno_id, seeds) in enumerate(group):
            t = items[vi]["n_frames"]
            masklet = np.stack(
                [np.asarray(out["masks"][s][f], np.uint8)
                 for f in range(t)], axis=0)
            tokens = np.stack(
                [np.asarray(out["tokens"][s][f], np.float32)
                 for f in range(t)], axis=0)
            finish(vi, anno_id,
                   {"masklet": masklet,
                    "masklet_small": np.asarray(out["smalls"][s]),
                    "tokens": tokens}, share)

    for vi, anno_id, seeds in multi_units:
        start = time.time()
        it = items[vi]
        out = run_gt_object(predictor, it["state"], anno_id,
                            it["gt_masklets"][anno_id], it["n_frames"])
        finish(vi, anno_id, out, time.time() - start)
    return censuses


def main(argv=None, predictor_factory=None) -> None:
    from sola_tpu.utils import compcache
    compcache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="mevis",
                        choices=["mevis", "ref-ytbvos", "ref-davis"])
    parser.add_argument("--data_type", type=str, default="train")
    parser.add_argument("--sam2_cfg", type=str, default=None,
                        help="accepted for reference CLI compatibility; the architecture is code-defined")
    parser.add_argument("--sam2_ckpt", type=str,
                        default="pretrained_models/sam2_hiera_large.pt")
    parser.add_argument("--save_prec_rec_iou", action="store_true")
    parser.add_argument("--pid", type=int, default=0)
    parser.add_argument("--prefetch_videos", type=int, default=1,
                        help="encode the next video while the current one "
                             "propagates (0 to serialize)")
    parser.add_argument("--video_pack", type=int, default=1,
                        help="videos per packed GT round: >1 packs several "
                             "videos' single-seed GT objects into one SAM2 "
                             "scan program (the reference runs obj_id=0 "
                             "alone per pass; results are identical)")
    parser.add_argument("--obj_batch", type=int, default=0,
                        help="SAM2 object slots per scan program; 0 = 1 "
                             "(sequential) or 8 (packed)")
    parser.add_argument("--n_pids", "--n_pid", dest="n_pids",
                        type=int, default=1)
    parser.add_argument("--data_root", type=str, default=".")
    parser.add_argument("--output_root", type=str, default=".")
    args = parser.parse_args(argv)

    assert args.data_type in meta_lib.DATA_TYPES[args.dataset]
    data_dir = os.path.join(args.data_root, DATA_DIR_DICT[args.dataset],
                            args.data_type)
    track_root = os.path.join(args.output_root, "sam2_tracks")
    out_dir = os.path.join(track_root, "gt_tracks", args.dataset,
                           args.data_type)

    if args.dataset == "mevis":
        with open(os.path.join(data_dir, "meta_expressions.json")) as f:
            meta = json.load(f)
        with open(os.path.join(data_dir, "mask_dict.json")) as f:
            mask_dict = json.load(f)
    else:
        with open(os.path.join(args.data_root, DATA_DIR_DICT[args.dataset],
                               "meta_expressions", args.data_type,
                               "meta_expressions.json")) as f:
            meta = json.load(f)
        mask_dict = None

    obj_batch = args.obj_batch or (1 if args.video_pack <= 1 else 8)
    if predictor_factory is None:
        from sola_tpu.trackgen.sam2.convert import load_sam2_video_predictor
        predictor_factory = lambda: load_sam2_video_predictor(
            args.sam2_ckpt, obj_batch=obj_batch)
    predictor = predictor_factory()

    runtime_path = os.path.join(out_dir, "runtime_info.json")
    runtime_info = {}
    if os.path.exists(runtime_path):
        with open(runtime_path) as f:
            runtime_info = json.load(f)

    work = [v for i, v in enumerate(meta["videos"])
            if i % args.n_pids == args.pid and v not in runtime_info]

    def frames_dir_of(video_id):
        return os.path.join(data_dir, "JPEGImages", video_id)

    def gt_of(video_id):
        if args.dataset == "mevis":
            return gt_utils.get_masklets(video_id, meta, mask_dict)
        return gt_utils.get_masklets_ytbvos(
            os.path.join(data_dir, "Annotations", video_id))

    def small_of(gt_masklets):
        if not args.save_prec_rec_iou:
            return None
        return {k: np.asarray(mask_ops.reshape_masklet_auto(v))
                for k, v in gt_masklets.items()}

    def write_runtime():
        os.makedirs(out_dir, exist_ok=True)
        with open(runtime_path, "w") as f:
            json.dump(runtime_info, f, indent=4)

    prefetcher = StatePrefetcher(predictor,
                                 enabled=bool(args.prefetch_videos))
    if args.video_pack > 1:
        for g0 in range(0, len(work), args.video_pack):
            group = work[g0:g0 + args.video_pack]
            for vid in group:
                prefetcher.schedule(vid, frames_dir_of(vid))
            # overlap the WHOLE next group's encodes with this group's
            # (long) packed rounds, not just its first video
            for nxt in work[g0 + args.video_pack:
                            g0 + 2 * args.video_pack]:
                prefetcher.schedule(nxt, frames_dir_of(nxt))
            items = []
            for vid in group:
                gt_masklets = gt_of(vid)
                items.append({
                    "video_id": vid,
                    "state": prefetcher.get(vid, frames_dir_of(vid)),
                    "gt_masklets": gt_masklets,
                    "gt_small": small_of(gt_masklets),
                    "n_frames": len(os.listdir(frames_dir_of(vid))),
                })
            censuses = run_videos_packed_gt(
                predictor, items, track_root, args.dataset, args.data_type,
                save_prec_rec_iou=args.save_prec_rec_iou)
            runtime_info.update(censuses)
            write_runtime()
    else:
        for work_idx, video_id in enumerate(work):
            prefetcher.schedule(video_id, frames_dir_of(video_id))
            if work_idx + 1 < len(work):
                prefetcher.schedule(work[work_idx + 1],
                                    frames_dir_of(work[work_idx + 1]))
            frames_dir = frames_dir_of(video_id)
            n_frames = len(os.listdir(frames_dir))
            gt_masklets = gt_of(video_id)
            state = prefetcher.get(video_id, frames_dir)
            census = run_video(
                predictor, state, video_id, gt_masklets, n_frames,
                track_root, args.dataset, args.data_type,
                save_prec_rec_iou=args.save_prec_rec_iou,
                gt_small=small_of(gt_masklets))
            runtime_info[video_id] = census
            write_runtime()
    prefetcher.close()


if __name__ == "__main__":
    main()
