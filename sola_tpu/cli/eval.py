"""Eval CLI: ``python -m sola_tpu.cli.eval --config mevis/default
--eval_weight_epoch N [--eval_pred_threshold t]`` (reference eval.py:95-98).

Loads either an orbax checkpoint dir (``epoch_N``) or a reference torch
``epoch_N.pth`` from the train output dir, then runs the Evaluator.
"""

from __future__ import annotations

import argparse
import os

from sola_tpu import config as config_lib
from sola_tpu.cli.train import set_seed


def get_configs(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval_weight_epoch", type=int, default=-1)
    parser.add_argument("--eval_pred_threshold", type=float, default=0.5)
    args, unknown = parser.parse_known_args(argv)
    configs = config_lib.load_config(args.config, overrides=unknown)
    configs["eval"]["pred_threshold"] = args.eval_pred_threshold
    configs["eval_weight_epoch"] = args.eval_weight_epoch
    return configs


def load_weights(configs: dict):
    """Restore params/buffers for the eval epoch from the train output dir."""
    from sola_tpu.models.selection import SelectionConfig
    from sola_tpu.train import state as state_lib

    epoch = configs["eval_weight_epoch"]
    out_dir = config_lib.train_output_dir(configs)
    cfg = SelectionConfig.from_dict(configs["model"])
    orbax_path = os.path.join(out_dir, f"epoch_{epoch}")
    torch_path = os.path.join(out_dir, f"epoch_{epoch}.pth")
    npz_path = os.path.join(out_dir, f"epoch_{epoch}.npz")
    if os.path.isdir(orbax_path):
        optimizer = state_lib.make_optimizer(1e-6)
        fresh = state_lib.create_train_state(cfg, optimizer)
        state, _, _ = state_lib.restore_checkpoint(out_dir, epoch, fresh)
        return state.params, state.buffers
    for path in (torch_path, npz_path):
        if os.path.exists(path):
            variables = state_lib.load_torch_weights(path, cfg.n_layers)
            return variables["params"], variables["buffers"]
    raise FileNotFoundError(
        f"no checkpoint for epoch {epoch} under {out_dir}")


def main(argv=None) -> None:
    from sola_tpu.utils import compcache
    compcache.enable()
    from sola_tpu.eval.evaluator import Evaluator
    configs = get_configs(argv)
    set_seed(42)
    params, buffers = load_weights(configs)
    eval_dir = config_lib.eval_output_dir(
        configs, configs["eval"]["pred_threshold"],
        configs["eval_weight_epoch"])
    os.makedirs(eval_dir, exist_ok=True)
    print(f"EVAL OUTPUTS WILL BE SAVED IN {eval_dir}")
    evaluator = Evaluator(params, buffers, configs,
                          eval_weight_epoch=configs["eval_weight_epoch"],
                          eval_output_dir=eval_dir)
    metrics = evaluator.evaluate()
    print(f"MEAN J: {metrics['mean_J']:.4f} MEAN F: {metrics['mean_F']:.4f} "
          f"MEAN JF: {metrics['mean_JF']:.4f}")


if __name__ == "__main__":
    main()
