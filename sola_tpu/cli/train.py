"""Train CLI: ``python -m sola_tpu.cli.train --config mevis/default [...]``.

Reference surface: train.py:294-297 / scripts/train.sh. Unknown ``--key
value`` flags fold into the config; dotted keys (``--train.lr 1e-5``) reach
nested entries — fixing the reference's top-level-only folding (SURVEY §2.5).
"""

from __future__ import annotations

import argparse
import random

import numpy as np

from sola_tpu import config as config_lib


def set_seed(seed: int) -> None:
    """Host RNG seeding (train.py:248-252); device RNG is explicit PRNG keys."""
    random.seed(seed)
    np.random.seed(seed)


def get_configs(argv=None) -> tuple[dict, bool]:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the newest epoch checkpoint")
    args, unknown = parser.parse_known_args(argv)
    return config_lib.load_config(args.config, overrides=unknown), args.resume


def main(argv=None) -> None:
    from sola_tpu.utils import compcache
    compcache.enable()
    from sola_tpu.train.loop import train
    configs, resume = get_configs(argv)
    set_seed(42)
    train(configs, resume=resume)


if __name__ == "__main__":
    main()
