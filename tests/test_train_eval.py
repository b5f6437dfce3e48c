"""Integration: train 2 epochs on the synthetic fixture, checkpoint, evaluate
with J&F, run inference PNG export (SURVEY.md §4.3)."""

import json
import os

import numpy as np
import pytest

from sola_tpu.data import synthetic
from sola_tpu.models.text import HashTextEncoder


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    ds = synthetic.generate(str(root), n_videos=2, n_frames=24, n_objects=2,
                            n_distractors=2)
    configs = {
        "exp_name": "ittest",
        "model": {
            "object_token_dim": 256,
            "lang_token_dim": 64,
            "n_layers": 1,
            "max_temporal_length": 100,
            "n_negative": 8,
            "dropout_p": 0.1,
            "norm_type": "group",
            "n_groups": 8,
            "n_groups_module": 8,
        },
        "train": {
            "n_epochs": 2,
            "pred_threshold": 0.5,
            "temperature": 0.07,
            "alignment_weight": 0.3,
            "lr": 1e-4,
            "lr_factor": 0.5,
            "lr_patience": 5,
            "grad_clip_norm": 1.0,
            "positive_metric": "iou",
            "positive_threshold": 0.7,
            "positive_weight": 1.5,
        },
        "dataset": ds["configs"],
        "eval": {"pred_threshold": 0.5},
        "results": {
            "output_dir": str(root / "TRAIN"),
            "eval_output_dir": str(root / "EVAL"),
            "test_output_dir": str(root / "INFER"),
        },
    }
    text_encoder = HashTextEncoder(hidden_size=64, vocab_size=256)
    return {"configs": configs, "text": text_encoder, "root": root}


@pytest.fixture(scope="module")
def trained(workspace):
    from sola_tpu.train.loop import train
    state = train(workspace["configs"], text_encoder=workspace["text"],
                  log_fn=lambda *a: None)
    return state


def test_training_produces_artifacts(workspace, trained):
    out_dir = os.path.join(str(workspace["root"] / "TRAIN"), "ittest", "mevis")
    log = os.path.join(out_dir, "log.txt")
    assert os.path.exists(log)
    content = open(log).read()
    assert "TRAIN EPOCH 001" in content
    assert "VALID EPOCH 002" in content
    assert "TP:" in content
    assert os.path.isdir(os.path.join(out_dir, "epoch_1"))
    assert os.path.isdir(os.path.join(out_dir, "epoch_2"))


def test_checkpoint_roundtrip(workspace, trained):
    from sola_tpu.models.selection import SelectionConfig
    from sola_tpu.train import state as state_lib
    out_dir = os.path.join(str(workspace["root"] / "TRAIN"), "ittest", "mevis")
    cfg = SelectionConfig.from_dict(workspace["configs"]["model"])
    optimizer = state_lib.make_optimizer(1e-4, 1.0)
    fresh = state_lib.create_train_state(cfg, optimizer)
    restored, epoch, sched = state_lib.restore_checkpoint(out_dir, 2, fresh)
    assert epoch == 2
    import jax
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(trained.params), jax.device_get(restored.params))
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_evaluator_end_to_end(workspace, trained):
    from sola_tpu.eval.evaluator import Evaluator
    eval_dir = str(workspace["root"] / "EVAL" / "run")
    ev = Evaluator(trained.params, trained.buffers, workspace["configs"],
                   eval_weight_epoch=2, text_encoder=workspace["text"],
                   eval_output_dir=eval_dir)
    metrics = ev.evaluate()
    for key in ("accuracy", "precision", "recall", "f1", "mean_J", "mean_F",
                "mean_JF"):
        assert key in metrics
        assert np.isfinite(metrics[key])
    assert 0.0 <= metrics["mean_J"] <= 1.0
    mpath = os.path.join(eval_dir, "valid_u_metrics_2epoch.json")
    jfpath = os.path.join(eval_dir, "valid_u_JF_metrics_2epoch.json")
    assert os.path.exists(mpath)
    assert os.path.exists(jfpath)
    jf = json.load(open(jfpath))
    assert "video_000" in jf
    entry = next(iter(jf["video_000"].values()))
    assert set(entry) == {"expression", "J", "F", "JF"}


def test_oracle_predictions_give_perfect_JF(workspace, trained):
    """Force oracle preds through the evaluator's JF machinery -> J&F == 1."""
    from sola_tpu.eval.evaluator import Evaluator
    eval_dir = str(workspace["root"] / "EVAL" / "oracle")
    ev = Evaluator(trained.params, trained.buffers, workspace["configs"],
                   eval_weight_epoch=99, text_encoder=workspace["text"],
                   eval_output_dir=eval_dir)
    dataset = ev.loader_dict["valid"].dataset
    ev.metrics = {}
    ev.pred_dict = {}
    for idx in range(len(dataset)):
        s = dataset.get_sample(idx)
        oracle = (s["labels"]["iou"] > 0.99).astype(np.float32)
        ev.pred_dict.setdefault(s["video_id"], {})[s["expression_id"]] = {
            "expression": s["expression"],
            "anno_ids": s["anno_ids"],
            "pred": oracle,
            "pred_score": oracle,
            "root_type": s["root_type"],
            "prompt_type": s["prompt_type"],
            "sam2_anno_id": s["sam2_anno_id"],
        }
    ev.compute_JF_metrics()
    assert ev.metrics["mean_J"] == 1.0
    assert ev.metrics["mean_F"] == 1.0
    assert ev.metrics["mean_JF"] == 1.0


def test_inference_png_export(workspace, trained):
    from sola_tpu.eval.inference import run_inference
    out_dir = str(workspace["root"] / "INFER" / "run")
    pred_dict = run_inference(trained.params, trained.buffers,
                              workspace["configs"], out_dir,
                              text_encoder=workspace["text"])
    assert "video_000" in pred_dict
    png = os.path.join(out_dir, "video_000", "0", "00000.png")
    assert os.path.exists(png)
    from PIL import Image
    img = np.array(Image.open(png))
    assert img.dtype == np.uint8
    assert set(np.unique(img)).issubset({0, 255})


def test_mesh_train_loop_with_tensor_parallel(tmp_path):
    """train() over the virtual 8-device mesh with n_model=2 (dp=4 x tp=2):
    the full loop (pad -> shard -> step -> checkpoint) must run and produce
    finite losses. Single-device parity of the tp math is covered by
    tests/test_parallel.py; this exercises the loop integration."""
    from sola_tpu.train.loop import train

    ds = synthetic.generate(str(tmp_path), n_videos=2, n_frames=24,
                            n_objects=2, n_distractors=2)
    configs = {
        "exp_name": "meshtp",
        "model": {"object_token_dim": 256, "lang_token_dim": 64,
                  "n_layers": 1, "max_temporal_length": 100,
                  "n_negative": 8, "dropout_p": 0.1, "norm_type": "group",
                  "n_groups": 8, "n_groups_module": 8},
        "train": {"n_epochs": 1, "pred_threshold": 0.5, "temperature": 0.07,
                  "alignment_weight": 0.3, "lr": 1e-4, "lr_factor": 0.5,
                  "lr_patience": 5, "grad_clip_norm": 1.0,
                  "positive_metric": "iou", "positive_threshold": 0.7,
                  "positive_weight": 1.5, "n_model": 2},
        "dataset": ds["configs"],
        "eval": {"pred_threshold": 0.5},
        "results": {"output_dir": str(tmp_path / "TRAIN"),
                    "eval_output_dir": str(tmp_path / "EVAL"),
                    "test_output_dir": str(tmp_path / "INFER")},
    }
    text_encoder = HashTextEncoder(hidden_size=64, vocab_size=256)
    state = train(configs, text_encoder=text_encoder, log_fn=lambda *a: None)
    assert int(state.step) > 0
    log = os.path.join(str(tmp_path / "TRAIN"), "meshtp", "mevis", "log.txt")
    content = open(log).read()
    assert "TRAIN EPOCH 001" in content
    loss = float(content.split("LOSS:")[1].split()[0])
    assert np.isfinite(loss)


def test_selection_recall_metrics():
    from sola_tpu.eval.metrics import recall_per_exp, recall_per_track
    gt_ids = [10, 20]
    corr = [10, 10, 20, -1]
    labels = [1, 1, 1, 0]
    preds = [1, 0, 0, 1]
    per_track = recall_per_track(gt_ids, preds, labels, corr)
    assert per_track == [0.5, 0.0]
    assert recall_per_exp(gt_ids, preds, labels, corr) == 0.5
