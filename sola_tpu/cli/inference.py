"""Inference CLI: ``python -m sola_tpu.cli.inference --config mevis/default
--eval_weight_epoch N [--eval_pred_threshold t]`` (reference
inference.py:149-152). Writes leaderboard PNG masks."""

from __future__ import annotations

import os

from sola_tpu import config as config_lib
from sola_tpu.cli.eval import get_configs, load_weights
from sola_tpu.cli.train import set_seed


def main(argv=None) -> None:
    from sola_tpu.utils import compcache
    compcache.enable()
    from sola_tpu.eval.inference import run_inference
    configs = get_configs(argv)
    set_seed(42)
    params, buffers = load_weights(configs)
    out_dir = config_lib.inference_output_dir(
        configs, configs["eval"]["pred_threshold"],
        configs["eval_weight_epoch"])
    os.makedirs(out_dir, exist_ok=True)
    print(f"INFERENCE OUTPUTS WILL BE SAVED IN {out_dir}")
    run_inference(params, buffers, configs, out_dir)


if __name__ == "__main__":
    main()
