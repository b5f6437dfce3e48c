"""Track-generation orchestration tests with fake backends (SURVEY.md §4.2):
greedy batching, dedup, n_max_tracks, censuses, artifact formats."""

import json
import os

import numpy as np
import pytest

from sola_tpu.core import rle
from sola_tpu.data import tracks as tracks_lib
from sola_tpu.trackgen import engine
from sola_tpu.trackgen.protocol import FakeVideoPredictor

H, W, T = 32, 48, 8


def square_mask(x, y, size=8):
    m = np.zeros((H, W), np.float32)
    m[y:y + size, x:x + size] = 1
    return m


def make_prompts(specs):
    """specs: [(prompt_id, frame_idx, x, y)]"""
    return [engine.PromptMask(pid, fi, square_mask(x, y))
            for pid, fi, x, y in specs]


@pytest.fixture
def predictor():
    return FakeVideoPredictor(velocity=(2, 0), token_dim=16)


def run(predictor, prompts, **kw):
    state = predictor.init_state(num_frames=T, hw=(H, W))
    results = []
    census = engine.generate_tracks(
        predictor, state, prompts, n_frames=T,
        on_track=results.append, **kw)
    return census, results


def test_basic_tracking(predictor):
    prompts = make_prompts([(0, 0, 4, 4), (1, 0, 20, 20)])
    census, results = run(predictor, prompts, batch_size=4)
    assert census["n_tracked"] == 2
    assert census["tracked_prompt_ids"] == [0, 1]
    assert len(results) == 2
    r = results[0]
    assert r.masklet.shape == (T, H, W)
    assert r.tokens.shape == (T, 16)
    # the fake translates the square 2 px/frame
    assert r.masklet[0, 4:12, 4:12].all()
    assert r.masklet[3, 4:12, 10:18].all()


def test_dedup_filters_duplicates(predictor):
    # prompt 1 at frame 2 is exactly where prompt 0's track will be
    prompts = make_prompts([(0, 0, 4, 4), (1, 2, 8, 4), (2, 0, 30, 20)])
    census, results = run(predictor, prompts, batch_size=1,
                          miou_thresh=0.7)
    assert 1 in census["filtered_prompt_ids"]
    assert census["n_filtered"] == 1
    assert prompts[1].filtered_by == 0
    # dedup compares at the <=960x540 canonical size, so resize artifacts
    # keep this slightly below 1.0
    assert prompts[1].filtered_iou > 0.9


def test_n_max_tracks_cap(predictor):
    prompts = make_prompts([(i, 0, 2 + 3 * i, 2 + 3 * i)
                            for i in range(6)])
    census, results = run(predictor, prompts, batch_size=2, n_max_tracks=3,
                          miou_thresh=2.0)  # no dedup
    assert census["n_tracked"] == 3
    assert len(census["not_tracked_prompt_ids"]) == 3


def test_same_frame_batching(predictor):
    # prompts on different frames: batches must be same-frame only
    prompts = make_prompts([(0, 0, 4, 4), (1, 4, 20, 20), (2, 0, 30, 8)])
    batches = []
    orig_reset = predictor.reset_state

    def spy_reset(state):
        batches.append([])
        orig_reset(state)

    orig_add = predictor.add_new_mask

    def spy_add(state, frame_idx, obj_id, mask):
        batches[-1].append((frame_idx, obj_id))
        return orig_add(state, frame_idx, obj_id, mask)

    predictor.reset_state = spy_reset
    predictor.add_new_mask = spy_add
    census, _ = run(predictor, prompts, batch_size=4, miou_thresh=2.0)
    # grid flavor scans the whole list: batch 1 = prompts 0+2 (frame 0)
    assert batches[0] == [(0, 0), (0, 2)]
    assert batches[1] == [(4, 1)]


def test_large_video_batch_limit():
    predictor = FakeVideoPredictor(token_dim=8)
    prompts = [engine.PromptMask(i, 0, square_mask(2 + 4 * i, 2))
               for i in range(4)]
    state = predictor.init_state(num_frames=250, hw=(H, W))
    seen = []
    orig = predictor.add_new_mask

    def spy(state, frame_idx, obj_id, mask):
        seen.append(obj_id)
        return orig(state, frame_idx, obj_id, mask)

    predictor.add_new_mask = spy
    engine.generate_tracks(predictor, state, prompts, n_frames=250,
                           batch_size=4, miou_thresh=2.0,
                           large_video_threshold=200, large_video_batch=2)
    # first reset->add cycle must contain at most 2 objects
    assert seen[:2] == [0, 1]


def test_mark_not_used():
    prompts = make_prompts([(0, 0, 2, 2), (1, 3, 2, 2), (2, 4, 2, 2)])
    n = engine.mark_not_used(prompts, bin_size=4)
    assert n == 1
    assert prompts[1].status == 3
    # gdino flavor: also stability filtering
    prompts = make_prompts([(0, 0, 2, 2), (1, 0, 12, 2)])
    n = engine.mark_not_used(prompts, bin_size=4,
                             stability_scores=[0.9, 0.5],
                             stability_score_thresh=0.85)
    assert n == 1 and prompts[1].status == 3


def test_tokens_grid_run_video(tmp_path, predictor):
    # prompts JSON on disk in the reference schema
    prompts = [{
        "segmentation": rle.encode(square_mask(4, 4).astype(np.uint8)),
        "stability_score": 0.97, "area": 64, "area_ratio": 0.04,
        "frame_idx": 0, "prompt_id": 0,
    }, {
        "segmentation": rle.encode(square_mask(20, 20).astype(np.uint8)),
        "stability_score": 0.96, "area": 64, "area_ratio": 0.04,
        "frame_idx": 0, "prompt_id": 1,
    }]
    prompt_path = tmp_path / "vid0.json"
    prompt_path.write_text(json.dumps(
        {"video_id": "vid0", "bin_size": 4, "prompt_masks": prompts}))

    from sola_tpu.trackgen.tokens_grid import run_video
    out_root = str(tmp_path / "sam2_tracks" / "grid_tracks" / "mevis" /
                   "valid_u")
    state = predictor.init_state(num_frames=T, hw=(H, W))
    census = run_video(
        predictor, "vid0", None, str(prompt_path), out_root, "mevis",
        "valid_u", state=state, log=lambda s: None)
    assert census["n_tracked"] == 2

    records = tracks_lib.load_track_records(
        str(tmp_path / "sam2_tracks"), "grid_tracks", "mevis", "valid_u",
        "vid0")
    assert len(records) == 2
    assert records[0].prompt_type == "SAM2 AMG MASK"
    toks = np.load(records[0].token_path)
    assert toks.shape == (T, 16)
    with open(records[0].masklet_path) as f:
        info = json.load(f)
    masklet = rle.decode_masklet(info["rle"])
    assert masklet.shape == (T, H, W)


def test_tokens_gdino_run_expression(tmp_path, predictor):
    prompts = []
    pid = 0
    for expr_id, x in (("0", 4), ("1", 20)):
        for fi, stab in ((0, 0.9), (0, 0.5), (2, 0.95)):
            prompts.append({
                "segmentation": rle.encode(
                    square_mask(x + 2 * fi, 4).astype(np.uint8)),
                "stability_score": stab, "area": 64, "area_ratio": 0.04,
                "frame_idx": fi, "expression_id": expr_id,
                "prompt_id": pid,
            })
            pid += 1
    prompt_path = tmp_path / "vid0.json"
    prompt_path.write_text(json.dumps(
        {"video_id": "vid0", "bin_size": 2, "prompt_masks": prompts}))

    from sola_tpu.trackgen.tokens_gdino import run_expression
    state = predictor.init_state(num_frames=T, hw=(H, W))
    census = run_expression(
        predictor, state, "vid0", "0", str(prompt_path),
        str(tmp_path / "sam2_tracks"), "mevis", "valid_u", T,
        bin_size=2, n_max_tracks=16, log=lambda s: None)
    # expression 0 has 3 prompts; one fails stability -> not used;
    # the frame-2 prompt is where the tracked square will be -> deduped
    assert census["n_total"] == 3
    assert census["n_not_used"] == 1
    assert census["n_tracked"] == 1
    assert census["n_filtered"] == 1

    records = tracks_lib.load_track_records(
        str(tmp_path / "sam2_tracks"), "gdino_tracks", "mevis", "valid_u",
        "vid0", expression_id="0")
    assert len(records) == 1


def test_tokens_gt_appearance_onset(predictor):
    from sola_tpu.trackgen.gt_utils import get_prompt_masks
    from sola_tpu.trackgen.tokens_gt import gt_seed_units, run_gt_seed
    gt = np.zeros((T, H, W), np.float32)
    gt[0:3, 4:12, 4:12] = 1     # appears frames 0-2
    gt[5:8, 4:12, 14:22] = 1    # re-appears frames 5-7
    seeds = get_prompt_masks(gt)
    assert [s["frame_idx"] for s in seeds] == [0, 5]

    # reference output order: one track PER onset with a running counter
    units = gt_seed_units({"7": gt})
    assert [(u[0], u[1], u[2]["frame_idx"]) for u in units] == [
        (0, "7", 0), (1, "7", 5)]

    state = predictor.init_state(num_frames=T, hw=(H, W))
    for _, _, seed in units:
        out = run_gt_seed(predictor, state, seed, T)
        assert out["masklet"].shape == (T, H, W)
        assert out["tokens"].shape == (T, 16)


def test_prompts_grid_generation():
    from sola_tpu.trackgen.prompts_grid import (generate_video_prompts,
                                                suppress_parts)

    class FakeAMG:
        def generate(self, frame):
            big = np.zeros(frame.shape[:2], bool)
            big[4:20, 4:20] = True
            part = np.zeros(frame.shape[:2], bool)
            part[6:14, 6:14] = True  # fully inside big -> suppressed
            other = np.zeros(frame.shape[:2], bool)
            other[24:30, 30:44] = True
            return [
                {"segmentation": big, "area": int(big.sum()),
                 "stability_score": 0.99},
                {"segmentation": other, "area": int(other.sum()),
                 "stability_score": 0.97},
                {"segmentation": part, "area": int(part.sum()),
                 "stability_score": 0.98},
            ]

    frames = [np.zeros((H, W, 3), np.uint8) for _ in range(8)]
    info = generate_video_prompts(FakeAMG(), frames, None, "vid0",
                                  bin_size=4)
    assert info["bin_size"] == 4
    # 2 frames sampled (0, 4), part suppressed on each -> 4 prompts
    assert len(info["prompt_masks"]) == 4
    assert [p["prompt_id"] for p in info["prompt_masks"]] == [0, 1, 2, 3]
    areas = [p["area"] for p in info["prompt_masks"]]
    assert areas == sorted(areas, reverse=True)
    assert info["prompt_masks"][0]["frame_idx"] in (0, 4)

    masks = np.stack([np.zeros((H, W)), np.ones((H, W))], axis=0)
    keep = suppress_parts(masks[::-1])  # big first
    assert keep[0]


def test_prompts_gdino_generation():
    from sola_tpu.trackgen.prompts_gdino import (PromptGenerator,
                                                 generate_video_prompts,
                                                 normalize_expression)

    assert normalize_expression(" The Red Car") == "the red car."

    class FakeGrounding:
        def get_boxes(self, image, text, box_threshold, text_threshold):
            return [{"bbox": np.asarray([4., 4., 16., 16.]),
                     "phrase": text.rstrip("."),
                     "token_score": [0.9]}]

    class FakeSam2Image:
        def set_image(self, image):
            self.hw = image.shape[:2]

        def predict(self, box=None, multimask_output=False, **kw):
            n = len(box)
            masks = np.zeros((n, 1) + self.hw, bool)
            for i, b in enumerate(box):
                x0, y0, x1, y1 = [int(v) for v in b]
                masks[i, 0, y0:y1, x0:x1] = True
            scores = np.full((n, 1), 0.9)
            logits = np.where(masks, 8.0, -8.0).astype(np.float32)
            return masks, scores, logits

    gen = PromptGenerator(FakeGrounding(), FakeSam2Image())
    frames = [np.zeros((H, W, 3), np.uint8) for _ in range(4)]
    expressions = {"0": {"exp": "the red car"},
                   "1": {"exp": "a person walking"}}
    info = generate_video_prompts(gen, frames, "vid0", expressions,
                                  bin_size=2)
    assert len(info["prompt_masks"]) == 4  # 2 frames x 2 expressions
    pm = info["prompt_masks"][0]
    assert pm["expression_id"] in ("0", "1")
    assert pm["stability_score"] == 1.0  # hard logits -> perfectly stable
    assert rle.decode(pm["segmentation"])[5, 5] == 1
