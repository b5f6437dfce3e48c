"""GT-format loaders: YTVOS palette PNGs, ref-davis dataset paths, MeViS
mask_dict helpers (seg_utils parity, dataloader ref-davis path)."""

import json
import os

import numpy as np
import pytest

from sola_tpu.core import rle
from sola_tpu.trackgen import gt_utils


def save_palette_png(img: np.ndarray, path) -> None:
    """Save an index image as a palette PNG (DAVIS/YTVOS annotation style);
    without an explicit palette PIL's convert("P") collapses indices."""
    from PIL import Image
    pal = []
    for i in range(256):
        pal += [i * 37 % 256, i * 67 % 256, i * 97 % 256]
    im = Image.fromarray(img, mode="P")
    im.putpalette(pal)
    im.save(path)


@pytest.fixture
def palette_dir(tmp_path):
    d = tmp_path / "Annotations" / "vid0"
    d.mkdir(parents=True)
    for t in range(3):
        img = np.zeros((20, 30), np.uint8)
        img[2:8, 2 + t:10 + t] = 1      # object 1 moving
        if t > 0:
            img[12:18, 20:28] = 2       # object 2 appears at t=1
        save_palette_png(img, d / f"{t:05d}.png")
    return str(d)


def test_ytbvos_palette_loader(palette_dir):
    masklets = gt_utils.get_masklets_ytbvos(palette_dir)
    assert set(masklets) == {"1", "2"}
    m1 = masklets["1"]
    assert m1.shape == (3, 20, 30)
    assert m1[0, 3, 3] == 1
    assert m1[0].sum() == m1[1].sum()
    m2 = masklets["2"]
    assert m2[0].sum() == 0 and m2[1].sum() > 0
    # reshape variant
    masklets_r = gt_utils.get_masklets_ytbvos(palette_dir, reshape=True)
    assert masklets_r["1"].shape == (3, 540, 960)


def test_mevis_gt_masklets():
    masklet = np.zeros((4, 16, 16), np.uint8)
    masklet[1:3, 4:10, 4:10] = 1
    mask_dict = {"5": [None if not m.any() else rle.encode(m)
                       for m in masklet]}
    meta = {"videos": {"v": {"expressions": {
        "0": {"exp": "x", "anno_id": [5]}}}}}
    out = gt_utils.get_masklets("v", meta, mask_dict)
    assert set(out) == {5}
    np.testing.assert_array_equal(out[5], masklet.astype(np.float32))


def test_prompt_seeds_cap():
    gt = np.zeros((10, 8, 8), np.float32)
    for start in (0, 3, 6, 9):
        gt[start, 2:5, 2:5] = 1
    seeds = gt_utils.get_prompt_masks(gt)
    assert [s["frame_idx"] for s in seeds] == [0, 3, 6, 9]
    seeds = gt_utils.get_prompt_masks(gt, max_seeds=2)
    assert len(seeds) == 2


def test_refdavis_dataset_gt_cache(tmp_path):
    """AlignDataset ref-davis GT path: palette PNGs, per-object cache (the
    reference aliases one buffer for all objects — we must not)."""
    from PIL import Image

    from sola_tpu.data.dataset import AlignDataset

    davis = tmp_path / "ref-davis"
    anno = davis / "valid" / "Annotations" / "vid0"
    anno.mkdir(parents=True)
    for t in range(2):
        img = np.zeros((12, 16), np.uint8)
        img[1:4, 1:5] = 1
        img[6:10, 8:14] = 2
        save_palette_png(img, anno / f"{t:05d}.png")
    meta_dir = davis / "meta_expressions" / "valid"
    meta_dir.mkdir(parents=True)
    meta = {"videos": {"vid0": {
        "frames": ["00000", "00001"],
        "expressions": {"0": {"exp": "left thing", "obj_id": [1]},
                        "1": {"exp": "right thing", "obj_id": [2]}},
    }}}
    (meta_dir / "meta_expressions.json").write_text(json.dumps(meta))

    ds = AlignDataset.__new__(AlignDataset)
    ds.data_name = "ref-davis"
    ds.data_type = "valid"
    ds.data_root = str(tmp_path)
    ds.track_root = str(tmp_path)
    ds.sam2_output_dirs = []
    ds.meta = meta
    ds.mask_dict = None
    ds._video_id = None
    ds._gt_cache = {}

    ds.set_video("vid0")
    m1 = ds.get_gt_masklet("vid0", "0")
    m2 = ds.get_gt_masklet("vid0", "1")
    # distinct objects -> distinct masklets (no aliasing)
    assert m1[0, 2, 2] and not m1[0, 7, 9]
    assert m2[0, 7, 9] and not m2[0, 2, 2]
    assert m1.shape == (2, 12, 16)
