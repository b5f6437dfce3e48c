"""End-to-end CLI drive on the real TPU: synthetic data -> train CLI -> eval CLI."""
import os, sys, json, tempfile
root = tempfile.mkdtemp(prefix="sola_cli_")
from sola_tpu.data import synthetic
ds = synthetic.generate(root, n_videos=2, n_frames=24, n_objects=2, n_distractors=2)

# write a config file
import yaml
cfg = {
    "exp_name": "cli_e2e",
    "model": {"object_token_dim": 256, "lang_token_dim": 64, "n_layers": 1,
              "max_temporal_length": 100, "n_negative": 8, "dropout_p": 0.1,
              "norm_type": "group", "n_groups": 8, "n_groups_module": 8,
              "roberta_version": "sentence-transformers/all-roberta-large-v1"},
    "train": {"n_epochs": 2, "pred_threshold": 0.5, "temperature": 0.07,
              "alignment_weight": 0.3, "lr": 1e-4, "lr_factor": 0.5,
              "lr_patience": 5, "grad_clip_norm": 1.0, "positive_metric": "iou",
              "positive_threshold": 0.7, "positive_weight": 1.5},
    "dataset": ds["configs"],
    "eval": {"pred_threshold": 0.5},
    "results": {"output_dir": os.path.join(root, "TRAIN"),
                "eval_output_dir": os.path.join(root, "EVAL"),
                "test_output_dir": os.path.join(root, "INFER")},
}
cfg_path = os.path.join(root, "e2e.yaml")
with open(cfg_path, "w") as f:
    yaml.dump(cfg, f)

from sola_tpu.cli import train as train_cli
train_cli.main(["--config", cfg_path])
print("TRAIN CLI OK")

from sola_tpu.cli import eval as eval_cli
eval_cli.main(["--config", cfg_path, "--eval_weight_epoch", "2"])
print("EVAL CLI OK")

from sola_tpu.cli import inference as inf_cli
inf_cli.main(["--config", cfg_path, "--eval_weight_epoch", "2"])
print("INFERENCE CLI OK")

# check artifacts
out = os.path.join(root, "TRAIN", "cli_e2e", "mevis")
assert os.path.exists(os.path.join(out, "log.txt"))
eval_dir = os.path.join(root, "EVAL", "cli_e2e", "mevis", "pred_threshold_05", "epoch_2")
m = json.load(open(os.path.join(eval_dir, "valid_u_metrics_2epoch.json")))
print("metrics:", {k: m[k] for k in ("accuracy", "mean_J", "mean_F", "mean_JF")})
inf_dir = os.path.join(root, "INFER", "cli_e2e", "mevis", "pred_threshold_05", "epoch_2")
pngs = sum(len(files) for _, _, files in os.walk(inf_dir))
print("inference PNGs:", pngs)
print("ALL CLI E2E OK")
