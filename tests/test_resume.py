"""Training resume: restored run continues from the checkpointed epoch with
schedule state intact."""

import os

import numpy as np

from sola_tpu.data import synthetic
from sola_tpu.models.text import HashTextEncoder


def make_configs(root, n_epochs):
    ds = synthetic.generate(str(root), n_videos=1, n_frames=16, n_objects=1,
                            n_distractors=1)
    return {
        "exp_name": "resume",
        "model": {"object_token_dim": 256, "lang_token_dim": 64,
                  "n_layers": 1, "max_temporal_length": 100, "n_negative": 4,
                  "dropout_p": 0.0, "norm_type": "group", "n_groups": 8,
                  "n_groups_module": 8},
        "train": {"n_epochs": n_epochs, "pred_threshold": 0.5,
                  "temperature": 0.07, "alignment_weight": 0.3, "lr": 1e-4,
                  "lr_factor": 0.5, "lr_patience": 1, "grad_clip_norm": 1.0,
                  "positive_metric": "iou", "positive_threshold": 0.7,
                  "positive_weight": 1.5},
        "dataset": ds["configs"],
        "eval": {"pred_threshold": 0.5},
        "results": {"output_dir": str(root / "TRAIN"),
                    "eval_output_dir": str(root / "EVAL"),
                    "test_output_dir": str(root / "INFER")},
    }


def test_resume_equivalence(tmp_path):
    """Interrupted+resumed training is BIT-EQUAL to uninterrupted training:
    the checkpoint restores params + optimizer moments + schedule, the
    shuffle is epoch-seeded, and the dropout rng re-derives per epoch —
    so epochs [2..4) replay identically (VERDICT round-2 item 7)."""
    import jax

    from sola_tpu.train.loop import train
    text = HashTextEncoder(hidden_size=64, vocab_size=128)

    cfg_a = make_configs(tmp_path / "a", n_epochs=4)
    cfg_a["model"]["dropout_p"] = 0.2  # dropout on: rng replay matters
    straight = train(cfg_a, text_encoder=text, log_fn=lambda *a: None)

    cfg_b = make_configs(tmp_path / "b", n_epochs=2)
    cfg_b["model"]["dropout_p"] = 0.2
    train(cfg_b, text_encoder=text, log_fn=lambda *a: None)
    cfg_b["train"]["n_epochs"] = 4
    resumed = train(cfg_b, text_encoder=text, log_fn=lambda *a: None,
                    resume=True)

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)).max()),
        jax.device_get(straight.params), jax.device_get(resumed.params))
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_resume_continues(tmp_path):
    from sola_tpu.train import state as state_lib
    from sola_tpu.train.loop import train
    text = HashTextEncoder(hidden_size=64, vocab_size=128)
    configs = make_configs(tmp_path, n_epochs=1)
    train(configs, text_encoder=text, log_fn=lambda *a: None)
    out_dir = os.path.join(str(tmp_path / "TRAIN"), "resume", "mevis")
    assert state_lib.latest_checkpoint_epoch(out_dir) == 1

    configs["train"]["n_epochs"] = 2
    logs = []
    train(configs, text_encoder=text, log_fn=logs.append, resume=True)
    assert any("resumed from epoch 1" in str(x) for x in logs)
    assert state_lib.latest_checkpoint_epoch(out_dir) == 2
    # log.txt has both epochs
    content = open(os.path.join(out_dir, "log.txt")).read()
    assert "TRAIN EPOCH 001" in content and "TRAIN EPOCH 002" in content
