"""Config system + CLI surface tests (reference parity of the flag surface)."""

import os

import pytest
import yaml

from sola_tpu import config as config_lib


def test_load_default_config():
    configs = config_lib.load_config("mevis/default")
    assert configs["model"]["lang_token_dim"] == 1024
    assert configs["train"]["lr"] == 5e-6
    assert configs["dataset"]["train"]["sam2_output_dirs"] == \
        "gt_tracks,grid_tracks"


def test_zeroshot_differs_only_in_exp_and_test():
    d = config_lib.load_config("mevis/default")
    z = config_lib.load_config("mevis/zeroshot")
    assert z["exp_name"] == "zeroshot"
    assert z["dataset"]["test"]["data_name"] == "ref-ytbvos"
    assert z["model"] == d["model"]
    assert z["train"] == d["train"]


def test_dotted_overrides():
    configs = config_lib.load_config(
        "mevis/default",
        overrides=["--train.lr", "1e-4", "--exp_name", "abc",
                   "--model.n_layers", "3", "--flag_only"])
    assert configs["train"]["lr"] == 1e-4
    assert configs["exp_name"] == "abc"
    assert configs["model"]["n_layers"] == 3
    assert configs["flag_only"] is True


def test_coercion():
    assert config_lib.coerce_value("5") == 5
    assert config_lib.coerce_value("0.5") == 0.5
    assert config_lib.coerce_value("5e-6") == 5e-6
    assert config_lib.coerce_value("true") is True
    assert config_lib.coerce_value("False") is False
    assert config_lib.coerce_value("iou") == "iou"


def test_output_dir_templating():
    configs = config_lib.load_config("mevis/default")
    assert config_lib.train_output_dir(configs) == \
        os.path.join("SOLA/TRAIN", "default", "mevis")
    assert config_lib.eval_output_dir(configs, 0.5, 15) == os.path.join(
        "SOLA/EVAL", "default", "mevis", "pred_threshold_05", "epoch_15")
    assert config_lib.inference_output_dir(configs, 0.5, 15) == os.path.join(
        "SOLA/INFERENCE", "default", "mevis", "pred_threshold_05",
        "epoch_15")


def test_cli_get_configs(tmp_path):
    from sola_tpu.cli.eval import get_configs
    cfg = get_configs(["--config", "mevis/default",
                       "--eval_weight_epoch", "7",
                       "--eval_pred_threshold", "0.4",
                       "--train.positive_weight", "2.0"])
    assert cfg["eval_weight_epoch"] == 7
    assert cfg["eval"]["pred_threshold"] == 0.4
    assert cfg["train"]["positive_weight"] == 2.0


def test_trackgen_cli_flag_surface():
    """Canonical --pid/--n_pids pair parses on every generation CLI
    (the reference's flag mismatch crashes, SURVEY.md §2.5)."""
    import argparse

    from sola_tpu.trackgen import (prompts_gdino, prompts_grid, tokens_gdino,
                                   tokens_grid, tokens_gt)
    for module in (prompts_grid, prompts_gdino, tokens_grid, tokens_gdino,
                   tokens_gt):
        # parse args only (don't run main): extract the parser by probing
        # with --help would exit; instead check parse of the sharding flags
        import inspect
        src = inspect.getsource(module.main)
        assert "--pid" in src and "--n_pids" in src
