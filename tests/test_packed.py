"""Cross-video packed propagation parity vs the sequential engine.

The packed scan program must not change any video's results: no op mixes
slots, so slot s's compute stream is identical whether its neighbors are
the same video's other objects, another video, or padding. Here three
videos with different lengths, resolutions, and prompt layouts run through
both paths at fp32 and must produce the same masklets, tokens, dedup
decisions, and censuses.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.trackgen import engine, packed_engine
from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model
from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor


@pytest.fixture(scope="module")
def predictor():
    cfg = SAM2Config.tiny_test(image_size=64)
    model = SAM2Model(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    return SAM2VideoPredictor(model, variables, obj_batch=4,
                              compute_dtype=jnp.float32, scan_chunk=4)


def make_video(t, hw, seed):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(t):
        f = rng.integers(0, 60, (hw[0], hw[1], 3), dtype=np.uint8)
        x = (4 + 3 * i) % (hw[1] - 12)
        f[6:min(20, hw[0]), x:x + 10] = 220
        frames.append(f)
    return frames


def box_mask(hw, y0, y1, x0, x1):
    m = np.zeros(hw, np.float32)
    m[y0:y1, x0:x1] = 1.0
    return m


VIDEOS = [
    dict(t=6, hw=(48, 72), seed=0,
         prompts=[(0, box_mask((48, 72), 6, 20, 4, 14)),
                  (0, box_mask((48, 72), 24, 40, 30, 52)),
                  (0, box_mask((48, 72), 2, 12, 50, 68)),
                  (2, box_mask((48, 72), 30, 44, 2, 20))]),
    dict(t=4, hw=(64, 64), seed=1,
         prompts=[(1, box_mask((64, 64), 6, 20, 7, 17)),
                  (1, box_mask((64, 64), 40, 60, 40, 60))]),
    dict(t=9, hw=(40, 56), seed=2,
         prompts=[(0, box_mask((40, 56), 6, 20, 4, 14)),
                  (0, box_mask((40, 56), 22, 38, 30, 50)),
                  (3, box_mask((40, 56), 2, 14, 36, 52)),
                  (4, box_mask((40, 56), 20, 36, 4, 24)),
                  (4, box_mask((40, 56), 4, 18, 20, 34))]),
]


def build_prompts(spec):
    return [engine.PromptMask(prompt_id=i, frame_idx=f, segmentation=m)
            for i, (f, m) in enumerate(spec["prompts"])]


def run_sequential(pred):
    out = []
    for spec in VIDEOS:
        frames = make_video(spec["t"], spec["hw"], spec["seed"])
        state = pred.init_state(frames)
        prompts = build_prompts(spec)
        results = {}
        census = engine.generate_tracks(
            pred, state, prompts, n_frames=spec["t"], batch_size=4,
            miou_thresh=0.7, n_max_tracks=16,
            on_track=lambda r, d=results: d.__setitem__(r.prompt_id, r))
        out.append((census, results, prompts))
    return out


def run_packed(pred):
    jobs = []
    collected = [dict() for _ in VIDEOS]
    prompt_lists = []
    for i, spec in enumerate(VIDEOS):
        frames = make_video(spec["t"], spec["hw"], spec["seed"])
        state = pred.init_state(frames)
        prompts = build_prompts(spec)
        prompt_lists.append(prompts)
        jobs.append(packed_engine.VideoJob(
            video_id=f"v{i}", state=state, prompts=prompts,
            n_frames=spec["t"], batch_size=4, miou_thresh=0.7,
            n_max_tracks=16,
            on_track=lambda r, d=collected[i]: d.__setitem__(
                r.prompt_id, r)))
    censuses = packed_engine.generate_tracks_packed(pred, jobs)
    return list(zip(censuses, collected, prompt_lists))


def test_packed_matches_sequential(predictor):
    seq = run_sequential(predictor)
    packed = run_packed(predictor)
    for vi, ((cs, rs, ps), (cp, rp, pp)) in enumerate(zip(seq, packed)):
        # same census modulo wall-clock fields
        for k in ("n_frames", "n_tracked", "n_filtered", "n_not_used",
                  "n_total", "tracked_prompt_ids", "filtered_prompt_ids",
                  "not_used_prompt_ids", "not_tracked_prompt_ids"):
            assert cs[k] == cp[k], f"video {vi} census[{k}]: " \
                f"{cs[k]} != {cp[k]}"
        # same dedup bookkeeping on the prompt objects
        for a, b in zip(ps, pp):
            assert a.status == b.status, f"video {vi} prompt {a.prompt_id}"
            assert a.filtered_by == b.filtered_by
        assert set(rs) == set(rp)
        for pid in rs:
            a, b = rs[pid], rp[pid]
            assert a.masklet.shape == b.masklet.shape
            # the paths run distinct-but-equivalent fp32 programs
            # (broadcast vs gather step); only rounding-level drift is
            # allowed. The pre-fix ungated padded-tail bank pushes showed
            # up here as ~1e-3 token drift — keep the bound tight
            diff = (a.masklet != b.masklet).mean()
            assert diff < 1e-4, f"video {vi} track {pid}: {diff:.4f}"
            np.testing.assert_allclose(a.tokens, b.tokens, atol=1e-4,
                                       rtol=1e-4)


def test_packed_single_video_full_batch(predictor):
    """A pack of one video behaves like the sequential engine."""
    spec = VIDEOS[1]
    frames = make_video(spec["t"], spec["hw"], spec["seed"])
    state = pred_state = predictor.init_state(frames)
    prompts = build_prompts(spec)
    results = {}
    job = packed_engine.VideoJob(
        video_id="solo", state=pred_state, prompts=prompts,
        n_frames=spec["t"], batch_size=4, n_max_tracks=16,
        on_track=lambda r: results.__setitem__(r.prompt_id, r))
    census, = packed_engine.generate_tracks_packed(predictor, [job])
    assert census["n_tracked"] == 2
    for pid, r in results.items():
        assert r.masklet.shape == (spec["t"],) + spec["hw"]
        assert r.tokens.shape[0] == spec["t"]
        assert np.isfinite(r.tokens).all()


def test_tokens_grid_cli_packed(tmp_path, predictor):
    """--video_pack drives the real CLI: same artifacts as sequential."""
    import json
    import os

    from PIL import Image

    from sola_tpu.core import rle
    from sola_tpu.trackgen import tokens_grid

    root = tmp_path
    data_dir = root / "datasets" / "mevis" / "valid_u"
    prompt_dirs = []
    for out_root in ("seq", "packed"):
        d = (root / out_root / "sam2_prompts" / "grid_prompts" / "mevis"
             / "valid_u")
        d.mkdir(parents=True)
        prompt_dirs.append(d)
    meta = {"videos": {}}
    rng = np.random.default_rng(3)
    for v in range(3):
        vid = f"vid{v}"
        frames_dir = data_dir / "JPEGImages" / vid
        frames_dir.mkdir(parents=True)
        t_v = 4 + 2 * v
        for t in range(t_v):
            img = rng.integers(0, 50, (40, 56, 3), dtype=np.uint8)
            img[8:20, 4 + 4 * t:16 + 4 * t] = 210
            Image.fromarray(img.astype(np.uint8)).save(
                frames_dir / f"{t:05d}.jpg")
        meta["videos"][vid] = {
            "frames": [f"{t:05d}" for t in range(t_v)],
            "expressions": {"0": {"exp": "thing", "anno_id": [v]}},
        }
        prompts = []
        for i in range(v + 1):
            m = np.zeros((40, 56), np.uint8)
            m[8 + 10 * i:20 + 10 * i, 4:20] = 1
            prompts.append({"prompt_id": i, "frame_idx": 0,
                            "segmentation": rle.encode(m)})
        for prompt_dir in prompt_dirs:
            (prompt_dir / f"{vid}.json").write_text(json.dumps(
                {"video_id": vid, "bin_size": 4, "prompt_masks": prompts}))
    (data_dir / "meta_expressions.json").write_text(json.dumps(meta))

    def run(out_root, extra):
        tokens_grid.main(
            ["--dataset", "mevis", "--data_type", "valid_u",
             "--bin_size", "4", "--data_root", str(root),
             "--output_root", out_root, "--n_max_tracks", "8"] + extra,
            predictor_factory=lambda: predictor)
        out = os.path.join(out_root, "sam2_tracks/grid_tracks/mevis/valid_u")
        return out, json.load(open(os.path.join(out, "runtime_info_4.json")))

    seq_out, seq_info = run(str(root / "seq"), [])
    pk_out, pk_info = run(str(root / "packed"), ["--video_pack", "3"])

    assert set(seq_info) == set(pk_info) == {"vid0", "vid1", "vid2"}
    for vid in seq_info:
        for k in ("n_tracked", "n_filtered", "n_total",
                  "tracked_prompt_ids", "filtered_prompt_ids"):
            assert seq_info[vid][k] == pk_info[vid][k], (vid, k)
        mdir = os.path.join(seq_out, "sam2_masklets", vid)
        assert (sorted(os.listdir(mdir))
                == sorted(os.listdir(os.path.join(
                    pk_out, "sam2_masklets", vid))))
        for name in os.listdir(mdir):
            a = json.load(open(os.path.join(mdir, name)))
            b = json.load(open(os.path.join(pk_out, "sam2_masklets", vid,
                                            name)))
            ma = np.stack([rle.decode(r) for r in a["rle"]])
            mb = np.stack([rle.decode(r) for r in b["rle"]])
            assert (ma != mb).mean() < 5e-3


def test_gdino_expressions_packed(tmp_path, predictor):
    """Expression packing (shared video state) matches run_expression."""
    import json

    from sola_tpu.core import rle as rle_lib
    from sola_tpu.data import tracks as tracks_lib
    from sola_tpu.trackgen.tokens_gdino import (run_expression,
                                                run_expressions_packed)

    T, hw = 5, (48, 64)
    frames = make_video(T, hw, seed=5)
    prompts = []
    pid = 0
    for expr_id, x in (("0", 4), ("1", 24)):
        for fi in (0, 1):
            m = np.zeros(hw, np.uint8)
            m[6 + 6 * fi:20 + 6 * fi, x:x + 14] = 1
            prompts.append({
                "segmentation": rle_lib.encode(m), "stability_score": 0.95,
                "area": int(m.sum()), "area_ratio": 0.05,
                "frame_idx": fi, "expression_id": expr_id,
                "prompt_id": pid})
            pid += 1
    prompt_path = tmp_path / "vid0.json"
    prompt_path.write_text(json.dumps(
        {"video_id": "vid0", "bin_size": 1, "prompt_masks": prompts}))

    seq_root = tmp_path / "seq" / "sam2_tracks"
    state = predictor.init_state(frames)
    seq_census = {}
    for expr in ("0", "1"):
        seq_census[expr] = run_expression(
            predictor, state, "vid0", expr, str(prompt_path),
            str(seq_root), "mevis", "valid_u", T, bin_size=1,
            n_max_tracks=8, log=lambda s: None)

    pk_root = tmp_path / "packed" / "sam2_tracks"
    state2 = predictor.init_state(frames)
    pk_census = run_expressions_packed(
        predictor, state2, "vid0", ["0", "1"], str(prompt_path),
        str(pk_root), "mevis", "valid_u", T, bin_size=1,
        n_max_tracks=8, log=lambda s: None)

    for expr in ("0", "1"):
        a, b = seq_census[expr], pk_census[expr]
        for k in ("n_total", "n_not_used", "n_tracked", "n_filtered",
                  "tracked_prompt_ids", "filtered_prompt_ids"):
            assert a[k] == b[k], (expr, k, a[k], b[k])
        ra = tracks_lib.load_track_records(
            str(seq_root), "gdino_tracks", "mevis", "valid_u", "vid0",
            expression_id=expr)
        rb = tracks_lib.load_track_records(
            str(pk_root), "gdino_tracks", "mevis", "valid_u", "vid0",
            expression_id=expr)
        assert len(ra) == len(rb) >= 1


def test_run_round_collect_false_banks(predictor):
    """collect=False returns the same final banks as a full round (the
    bench's scan-only mode must run the identical compute)."""
    from sola_tpu.trackgen.sam2.packed import (PackedFeatures,
                                               PackedPropagator, SlotPlan)

    T, hw = 5, (48, 64)
    frames = make_video(T, hw, seed=9)
    state = predictor.init_state(frames)
    prop = PackedPropagator(predictor)
    pack = PackedFeatures.build([state])
    size = predictor.cfg.image_size
    cond_masks = np.zeros((4, size, size), np.float32)
    cond_masks[0] = packed_engine._resize_prompt(
        box_mask(hw, 6, 20, 4, 14), size)
    plan = SlotPlan(video=np.asarray([0, -1, -1, -1]),
                    cond=np.zeros(4, np.int64),
                    length=np.asarray([T, 1, 1, 1]))
    full = prop.run_round(pack, plan, cond_masks, collect=True)
    assert 0 in full["masks"] and len(full["masks"][0]) == T
    scan_only = prop.run_round(pack, plan, cond_masks, collect=False)
    assert set(scan_only) == {"banks"}
    ring = np.asarray(scan_only["banks"][2], np.float32)
    assert np.isfinite(ring).all()
    # deterministic: the scan compute is identical run to run (collect
    # only adds output-fetch programs on top of the same scans)
    again = prop.run_round(pack, plan, cond_masks, collect=False)
    np.testing.assert_array_equal(
        ring, np.asarray(again["banks"][2], np.float32))


def test_gt_packed_matches_sequential(tmp_path, predictor):
    """Packed GT rounds (several videos' seeds in one scan) must write
    bit-identical artifacts to the sequential per-seed path; a re-appearing
    object's onsets are independent single-cond slots and pack too."""
    import json as json_lib
    import os

    from sola_tpu.trackgen import tokens_gt

    def gt_obj(t, hw, y0, y1, x0, x1, absent=()):
        m = np.zeros((t,) + hw, np.uint8)
        for f in range(t):
            if f not in absent:
                x = (x0 + 2 * f) % max(hw[1] - (x1 - x0), 1)
                m[f, y0:y1, x:x + (x1 - x0)] = 1
        return m

    videos = [
        ("vidA", 5, (48, 72), 13, {
            "1": gt_obj(5, (48, 72), 6, 20, 4, 14),
            "2": gt_obj(5, (48, 72), 24, 40, 30, 42),
        }),
        ("vidB", 7, (40, 56), 29, {
            "3": gt_obj(7, (40, 56), 6, 20, 4, 14),
            # absent at frame 2 -> two appearance onsets -> multi-seed
            "4": gt_obj(7, (40, 56), 22, 36, 20, 32, absent=(2,)),
            # absent frames 0-2 -> SINGLE onset at frame 3: packed slot
            # with cond > 0 whose forward pass (frames 4..6) needs padding
            # at scan_chunk=4 — the case where the sequential pass's
            # ungated padded-tail bank pushes diverged from the packed
            # (gated, upstream-faithful) semantics before the video.py fix
            "5": gt_obj(7, (40, 56), 8, 22, 30, 44, absent=(0, 1, 2)),
        }),
    ]

    states = {}
    for vid, t, hw, seed, _ in videos:
        states[vid] = predictor.init_state(make_video(t, hw, seed=seed))

    def collect(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for fn in sorted(files):
                p = os.path.join(dirpath, fn)
                rel = os.path.relpath(p, root)
                if fn.endswith(".json"):
                    with open(p) as f:
                        out[rel] = json_lib.load(f)
                elif fn.endswith(".npy"):
                    out[rel] = np.load(p)
        return out

    seq_root = str(tmp_path / "seq")
    for vid, t, hw, _seed, gts in videos:
        tokens_gt.run_video(predictor, states[vid], vid, gts, t, seq_root,
                            "mevis", "train", save_prec_rec_iou=True,
                            log=lambda s: None)

    pk_root = str(tmp_path / "pk")
    items = [{"video_id": vid, "state": states[vid], "gt_masklets": gts,
              "n_frames": t}
             for vid, t, hw, _seed, gts in videos]
    censuses = tokens_gt.run_videos_packed_gt(
        predictor, items, pk_root, "mevis", "train",
        save_prec_rec_iou=True, log=lambda s: None)

    a, b = collect(seq_root), collect(pk_root)
    # 6 seeds (object "4" re-appears -> one track per onset) x (json + npy)
    assert set(a) == set(b) and len(a) >= 12
    for rel in a:
        if rel.endswith(".npy"):
            np.testing.assert_allclose(b[rel], a[rel], atol=1e-5)
        else:
            va, vb = a[rel], b[rel]
            assert va["rle"] == vb["rle"], rel
            assert va["prompt_type"] == vb["prompt_type"] == "GT MASK"
            for key in ("precision", "recall", "iou"):
                for gid in va.get(key, {}):
                    np.testing.assert_allclose(
                        np.asarray(list(vb[key][gid]), float)
                        if isinstance(vb[key][gid], list)
                        else vb[key][gid],
                        np.asarray(list(va[key][gid]), float)
                        if isinstance(va[key][gid], list)
                        else va[key][gid], atol=1e-5)
    from sola_tpu.trackgen.tokens_gt import gt_seed_units
    for vid, t, hw, _seed, gts in videos:
        units = gt_seed_units(gts)
        # census keyed by the running per-seed output id (reference naming)
        assert set(censuses[vid]) == {str(u[0]) for u in units}
        for out_id, gt_anno_id, seed in units:
            entry = censuses[vid][str(out_id)]
            assert entry["gt_anno_id"] == str(gt_anno_id)
            assert entry["seed_frame"] == seed["frame_idx"]
