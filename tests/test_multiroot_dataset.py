"""Multi-root track loading: "grid_tracks,gdino_tracks" concatenation order
and the gdino per-expression nesting (dataloader.py:119-127 parity)."""

import numpy as np
import pytest

from sola_tpu.core import rle
from sola_tpu.data import tracks as tracks_lib
from sola_tpu.data.dataset import AlignDataset
from sola_tpu.data.synthetic import generate, square_masklet


@pytest.fixture(scope="module")
def two_root_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("multiroot")
    ds = generate(str(root), n_videos=1, n_frames=12, n_objects=1,
                  n_distractors=1, track_output_dir="grid_tracks")
    # add a gdino root: per-expression nesting, 2 tracks for expression "0"
    t, h, w = 12, 64, 96
    for track_id in range(2):
        masklet = square_masklet(t, h, w, 10 + 20 * track_id, 10, 8, 1, 0)
        tracks_lib.save_track(
            ds["track_root"], "gdino_tracks", "mevis", "valid_u",
            "video_000", track_id, rle.encode_masklet(masklet),
            "SAM2 AMG MASK",
            np.random.default_rng(track_id).standard_normal(
                (t, 256)).astype(np.float32),
            expression_id="0",
            metrics={"iou": {"0": 0.1 * track_id},
                     "precision": {"0": 0.1}, "recall": {"0": 0.1}})
    return ds


def test_multiroot_concatenation_order(two_root_dataset):
    ds = two_root_dataset
    configs = {
        "data_name": "mevis", "data_type": "valid_u",
        "data_root": ds["data_root"], "track_root": ds["track_root"],
        "sam2_output_dirs": "grid_tracks,gdino_tracks",
    }
    dataset = AlignDataset(configs)
    s = dataset.get_sample(0)  # expression "0"
    # grid root contributed 2 tracks (1 GT-match + 1 distractor), gdino 2
    assert s["object_tokens"].shape[0] == 4
    assert s["root_type"][:2] == ["grid_tracks", "grid_tracks"]
    assert s["root_type"][2:] == ["gdino_tracks", "gdino_tracks"]
    assert s["sam2_anno_id"][2:] == [0, 1]
    # labels follow the same ordering
    np.testing.assert_allclose(s["labels"]["iou"][2:], [0.0, 0.1],
                               atol=1e-6)


def test_merged_masklet_across_roots(two_root_dataset):
    ds = two_root_dataset
    dataset = AlignDataset({
        "data_name": "mevis", "data_type": "valid_u",
        "data_root": ds["data_root"], "track_root": ds["track_root"],
        "sam2_output_dirs": "grid_tracks,gdino_tracks",
    })
    s = dataset.get_sample(0)
    # select the first grid track and the last gdino track
    preds = np.zeros(4, np.float32)
    preds[0] = 1
    preds[3] = 1
    merged = dataset.get_sam2_masklet(
        s["video_id"], s["expression_id"], preds, s["root_type"],
        s["prompt_type"], s["sam2_anno_id"])
    assert merged is not None and merged.sum() > 0
    # the merged mask must cover the gdino track's square at frame 0
    assert merged[0, 12, 32] == 1  # gdino track 1 at (30+2? ...) region
