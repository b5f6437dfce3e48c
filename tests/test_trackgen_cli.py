"""Trackgen CLI mains driven end-to-end on disk with fake backends:
prompts_grid.main -> tokens_grid.main, sharding, runtime_info, resume."""

import json
import os

import numpy as np
import pytest

from sola_tpu.core import rle
from sola_tpu.trackgen import prompts_grid, tokens_grid
from sola_tpu.trackgen.protocol import FakeVideoPredictor

H, W, T = 32, 48, 8


@pytest.fixture
def workspace(tmp_path):
    """MeViS-layout data dir with JPEG frames for 2 videos."""
    from PIL import Image
    data_dir = tmp_path / "datasets" / "mevis" / "valid_u"
    meta = {"videos": {}}
    for v in range(2):
        vid = f"vid{v}"
        frames_dir = data_dir / "JPEGImages" / vid
        frames_dir.mkdir(parents=True)
        for t in range(T):
            img = np.zeros((H, W, 3), np.uint8)
            img[0, 0, 0] = t
            Image.fromarray(img).save(frames_dir / f"{t:05d}.jpg")
        meta["videos"][vid] = {
            "frames": [f"{t:05d}" for t in range(T)],
            "expressions": {"0": {"exp": f"thing {v}", "anno_id": [v]}},
        }
    (data_dir / "meta_expressions.json").write_text(json.dumps(meta))
    return tmp_path


class StubAMG:
    def generate(self, frame):
        m = np.zeros(frame.shape[:2], bool)
        m[4:16, 4:20] = True
        return [{"segmentation": m, "area": int(m.sum()),
                 "stability_score": 0.99}]


class StubPredictorFactory:
    def __call__(self):
        return _DiskFake()


class _DiskFake(FakeVideoPredictor):
    """Fake that accepts init_state(None, video_path=...) like the real one."""

    def init_state(self, frames=None, video_path=None, **kw):
        if video_path is not None:
            n = len(os.listdir(video_path))
            from PIL import Image
            first = np.asarray(Image.open(os.path.join(
                video_path, sorted(os.listdir(video_path))[0])))
            return super().init_state(num_frames=n, hw=first.shape[:2])
        return super().init_state(frames=frames, **kw)


def test_prompts_then_tokens_cli(workspace):
    root = str(workspace)
    prompts_grid.main(
        ["--dataset", "mevis", "--data_type", "valid_u", "--bin_size", "4",
         "--data_root", root, "--output_root", root],
        amg_factory=lambda: StubAMG())
    for vid in ("vid0", "vid1"):
        p = os.path.join(root, "sam2_prompts/grid_prompts/mevis/valid_u",
                         f"{vid}.json")
        assert os.path.exists(p)
        info = json.load(open(p))
        assert info["bin_size"] == 4
        assert len(info["prompt_masks"]) == 2  # frames 0 and 4

    tokens_grid.main(
        ["--dataset", "mevis", "--data_type", "valid_u", "--bin_size", "4",
         "--data_root", root, "--output_root", root],
        predictor_factory=StubPredictorFactory())
    out = os.path.join(root, "sam2_tracks/grid_tracks/mevis/valid_u")
    runtime = json.load(open(os.path.join(out, "runtime_info_4.json")))
    assert set(runtime) == {"vid0", "vid1"}
    assert runtime["vid0"]["n_tracked"] >= 1
    # masklets + tokens written
    masklets = os.listdir(os.path.join(out, "sam2_masklets", "vid0"))
    assert any(m.endswith(".json") for m in masklets)


def test_tokens_cli_sharding(workspace):
    root = str(workspace)
    prompts_grid.main(
        ["--dataset", "mevis", "--data_type", "valid_u", "--bin_size", "4",
         "--data_root", root, "--output_root", root],
        amg_factory=lambda: StubAMG())
    # shard 0 of 2 processes only vid0
    tokens_grid.main(
        ["--dataset", "mevis", "--data_type", "valid_u", "--bin_size", "4",
         "--data_root", root, "--output_root", root,
         "--pid", "0", "--n_pids", "2"],
        predictor_factory=StubPredictorFactory())
    out = os.path.join(root, "sam2_tracks/grid_tracks/mevis/valid_u")
    runtime = json.load(open(os.path.join(out, "runtime_info_4.json")))
    assert set(runtime) == {"vid0"}
    assert not os.path.exists(os.path.join(out, "sam2_masklets", "vid1"))


def test_prompts_cli_resume_skips_existing(workspace):
    root = str(workspace)
    prompt_dir = os.path.join(root, "sam2_prompts/grid_prompts/mevis",
                              "valid_u")
    os.makedirs(prompt_dir)
    sentinel = {"video_id": "vid0", "bin_size": 4, "prompt_masks": []}
    with open(os.path.join(prompt_dir, "vid0.json"), "w") as f:
        json.dump(sentinel, f)
    prompts_grid.main(
        ["--dataset", "mevis", "--data_type", "valid_u", "--bin_size", "4",
         "--data_root", root, "--output_root", root],
        amg_factory=lambda: StubAMG())
    # existing file untouched (resumability, generate_prompts_grid.py:74-75)
    kept = json.load(open(os.path.join(prompt_dir, "vid0.json")))
    assert kept == sentinel
    # the other video was generated
    assert os.path.exists(os.path.join(prompt_dir, "vid1.json"))
