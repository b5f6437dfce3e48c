"""Full two-stage pipeline: prompt generation -> track generation -> data
layer -> selection eval with J&F, all through the on-disk contracts.

Uses an oracle video predictor (replays the GT masklet whose first frame
matches the prompt) so GT-matching tracks get IoU 1.0 labels and oracle
selection provably yields J&F 1.0 end-to-end through the real artifacts.
"""

import json
import os

import numpy as np
import pytest

from sola_tpu.core import mask_ops, rle
from sola_tpu.data.dataset import AlignDataset
from sola_tpu.data.synthetic import square_masklet, tokens_for_masklet
from sola_tpu.trackgen import gt_utils
from sola_tpu.trackgen.prompts_grid import generate_video_prompts
from sola_tpu.trackgen.tokens_grid import run_video

H, W, T = 48, 64, 10


class OracleVideoPredictor:
    """Replays the GT masklet matching the prompt mask; unknown prompts stay
    static. Implements the video-predictor protocol."""

    def __init__(self, gt_masklets, token_dim=256):
        self.gt = gt_masklets
        self.token_dim = token_dim

    def init_state(self, frames=None, video_path=None, num_frames=T,
                   hw=(H, W)):
        from sola_tpu.trackgen.protocol import FakeState
        return FakeState(num_frames=num_frames, hw=hw)

    def reset_state(self, state):
        state.prompts = {}
        state.obj_ids = []
        state.tokens = {}

    def add_new_mask(self, state, frame_idx, obj_id, mask):
        mask = (np.asarray(mask) > 0.5).astype(np.float32)
        state.prompts.setdefault(int(frame_idx), {})[int(obj_id)] = mask
        if obj_id not in state.obj_ids:
            state.obj_ids.append(obj_id)
        return frame_idx, list(state.obj_ids), mask[None] * 20.0 - 10.0

    def _masklet_for(self, state, obj_id):
        cond = min(state.prompts.keys())
        prompt = state.prompts[cond][obj_id]
        for gm in self.gt.values():
            if np.array_equal(gm[cond] > 0, prompt > 0):
                return gm
        return np.tile(prompt[None], (state.num_frames, 1, 1))

    def propagate_in_video(self, state, reverse=False):
        cond = min(state.prompts.keys())
        rng = range(cond, -1, -1) if reverse else range(cond,
                                                        state.num_frames)
        for fi in rng:
            logits = np.stack([
                self._masklet_for(state, o)[fi] * 20.0 - 10.0
                for o in state.obj_ids], axis=0)[:, None]
            state.tokens[fi] = np.stack([
                tokens_for_masklet(
                    self._masklet_for(state, o).astype(np.uint8),
                    dim=self.token_dim, seed=o)[fi]
                for o in state.obj_ids], axis=0)
            yield fi, list(state.obj_ids), logits

    def get_output_tokens(self, state):
        return dict(state.tokens)


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    data_root = root / "datasets"
    split = data_root / "mevis" / "valid_u"
    split.mkdir(parents=True)

    # GT: two moving squares per video
    gt = {
        0: square_masklet(T, H, W, 4, 4, 10, 2, 0),
        1: square_masklet(T, H, W, 40, 20, 8, -1, 1),
    }
    meta = {"videos": {"vid0": {
        "frames": [f"{i:05d}" for i in range(T)],
        "expressions": {
            "0": {"exp": "the square moving right", "anno_id": [0]},
            "1": {"exp": "the square moving left and down", "anno_id": [1]},
        },
    }}}
    mask_dict = {str(k): [rle.encode(m) if m.any() else None for m in v]
                 for k, v in gt.items()}
    (split / "meta_expressions.json").write_text(json.dumps(meta))
    (split / "mask_dict.json").write_text(json.dumps(mask_dict))

    # ---- stage 1a: grid prompt generation with an oracle AMG ----
    class OracleAMG:
        def generate(self, frame):
            fi = frame[0, 0, 0]  # frame index smuggled in pixel 0
            out = []
            for masklet in gt.values():
                m = masklet[fi].astype(bool)
                if m.any():
                    out.append({"segmentation": m, "area": int(m.sum()),
                                "stability_score": 0.99})
            # a distractor region matching no GT
            d = np.zeros((H, W), bool)
            d[40:46, 2:10] = True
            out.append({"segmentation": d, "area": int(d.sum()),
                        "stability_score": 0.9})
            return out

    frames = []
    for i in range(T):
        f = np.zeros((H, W, 3), np.uint8)
        f[0, 0, 0] = i
        frames.append(f)
    prompt_info = generate_video_prompts(OracleAMG(), frames, None, "vid0",
                                         bin_size=4)
    prompt_dir = root / "sam2_prompts" / "grid_prompts" / "mevis" / "valid_u"
    prompt_dir.mkdir(parents=True)
    (prompt_dir / "vid0.json").write_text(json.dumps(prompt_info))

    # ---- stage 1b: track generation with the oracle predictor ----
    predictor = OracleVideoPredictor(gt)
    state = predictor.init_state()
    gt_small = {k: np.asarray(mask_ops.reshape_masklet_auto(v))
                for k, v in gt.items()}
    out_dir = str(root / "sam2_tracks" / "grid_tracks" / "mevis" / "valid_u")
    census = run_video(predictor, "vid0", None,
                       str(prompt_dir / "vid0.json"), out_dir, "mevis",
                       "valid_u", bin_size=4, gt_masklets=gt_small,
                       state=state, log=lambda s: None)
    return {"root": root, "census": census, "gt": gt}


def test_trackgen_census(pipeline_root):
    census = pipeline_root["census"]
    # 2 GT tracks + distractor tracked or deduped; later-frame duplicates
    # of the same objects must be deduped
    assert census["n_tracked"] >= 3
    assert census["n_filtered"] >= 1


def test_selection_consumes_artifacts(pipeline_root):
    root = pipeline_root["root"]
    ds = AlignDataset({
        "data_name": "mevis", "data_type": "valid_u",
        "data_root": str(root / "datasets"),
        "track_root": str(root / "sam2_tracks"),
        "sam2_output_dirs": "grid_tracks",
    })
    assert len(ds) == 2
    s = ds.get_sample(0)
    n = s["object_tokens"].shape[0]
    assert s["object_tokens"].shape == (n, T, 256)
    # exactly one track per expression matches its GT object at IoU ~1
    assert (s["labels"]["iou"] > 0.95).sum() == 1


def test_oracle_selection_gives_perfect_JF(pipeline_root):
    root = pipeline_root["root"]
    ds = AlignDataset({
        "data_name": "mevis", "data_type": "valid_u",
        "data_root": str(root / "datasets"),
        "track_root": str(root / "sam2_tracks"),
        "sam2_output_dirs": "grid_tracks",
    })
    for idx in range(len(ds)):
        s = ds.get_sample(idx)
        preds = (s["labels"]["iou"] > 0.95).astype(np.float32)
        ds.set_video(s["video_id"])
        gt = ds.get_gt_masklet(s["video_id"], s["expression_id"])
        pred = ds.get_sam2_masklet(s["video_id"], s["expression_id"], preds,
                                   s["root_type"], s["prompt_type"],
                                   s["sam2_anno_id"])
        j, f = mask_ops.compute_JF(pred.astype(np.float32),
                                   gt.astype(np.float32))
        assert float(j) == 1.0 and float(f) == 1.0
