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

    if predictor_factory is None:
        from sola_tpu.trackgen.sam2.convert import load_sam2_video_predictor
        predictor_factory = lambda: load_sam2_video_predictor(
            args.sam2_ckpt, obj_batch=1)
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

    prefetcher = StatePrefetcher(predictor,
                                 enabled=bool(args.prefetch_videos))
    for work_idx, video_id in enumerate(work):
        prefetcher.schedule(video_id, frames_dir_of(video_id))
        if work_idx + 1 < len(work):
            prefetcher.schedule(work[work_idx + 1],
                                frames_dir_of(work[work_idx + 1]))
        frames_dir = frames_dir_of(video_id)
        n_frames = len(os.listdir(frames_dir))
        if args.dataset == "mevis":
            gt_masklets = gt_utils.get_masklets(video_id, meta, mask_dict)
        else:
            gt_masklets = gt_utils.get_masklets_ytbvos(
                os.path.join(data_dir, "Annotations", video_id))
        gt_small = {k: np.asarray(mask_ops.reshape_masklet_auto(v))
                    for k, v in gt_masklets.items()} \
            if args.save_prec_rec_iou else None
        state = prefetcher.get(video_id, frames_dir)
        census = run_video(
            predictor, state, video_id, gt_masklets, n_frames, track_root,
            args.dataset, args.data_type,
            save_prec_rec_iou=args.save_prec_rec_iou, gt_small=gt_small)
        runtime_info[video_id] = census
        os.makedirs(out_dir, exist_ok=True)
        with open(runtime_path, "w") as f:
            json.dump(runtime_info, f, indent=4)
    prefetcher.close()


if __name__ == "__main__":
    main()
